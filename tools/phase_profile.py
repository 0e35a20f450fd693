"""Per-phase wall-clock breakdown of the OTZ device encode pipeline.

Times each stage of the staged pipeline (front / mid / back / assembly) on
a real segment.  block_until_ready is an async ack on the axon tunnel
backend, so stages are timed with a scalar host fetch as the barrier.

    python tools/phase_profile.py [MiB] [level]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from bench import make_corpus
from orz_tpu.device import pipeline as pipe
from orz_tpu.device.spec import CHUNK_INPUT_DEFAULT


def sync_scalar(x):
    np.asarray(jax.tree.leaves(x)[0].ravel()[0])


def main():
    mb = float(sys.argv[1]) if len(sys.argv) > 1 else 4
    level = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    n = int(mb * (1 << 20))
    data = make_corpus(n)
    print(f"profile: {mb} MiB, level {level}, device {jax.devices()[0]}",
          flush=True)

    ci = CHUNK_INPUT_DEFAULT

    def run(tag):
        t0 = time.perf_counter()
        front = pipe.dispatch_segment_front(data, level, ci)
        sync_scalar(front["front"][0])
        t1 = time.perf_counter()
        mid = pipe.dispatch_segment_mid(front)
        sync_scalar(mid["items"].symbol)
        t2 = time.perf_counter()
        back = pipe.dispatch_segment_back(mid)
        if back.get("out") is not None:
            sync_scalar(back["out"].meta)
        t3 = time.perf_counter()
        payload = pipe.finish_segment(data, back, ci)
        t4 = time.perf_counter()
        print(f"{tag}: front {t1-t0:7.3f}s  mid {t2-t1:7.3f}s  "
              f"back {t3-t2:7.3f}s  asm {t4-t3:7.3f}s  "
              f"total {t4-t0:7.3f}s -> {n/(t4-t0)/1e6:6.1f} MB/s  "
              f"({len(payload)} B, {len(payload)/n*100:.2f}%)", flush=True)
        return payload

    t0 = time.perf_counter()
    run("cold")
    print(f"(cold incl. compile: {time.perf_counter()-t0:.1f}s)", flush=True)
    for i in range(3):
        payload = run(f"hot{i}")

    # round-trip gate
    from orz_tpu.device.refcodec import decode_segment_ref
    try:
        from orz_tpu.native.otz import decode_segment_native
        out = decode_segment_native(payload)
    except Exception:
        out = decode_segment_ref(payload)
    print("round-trip:", "OK" if out == data else "FAIL", flush=True)


if __name__ == "__main__":
    main()
