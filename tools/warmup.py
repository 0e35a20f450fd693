"""Warm the device-program cache for a segment-size bucket.

Compiling the OTZ2 pipeline cold over the dev harness's remote-compile
tunnel costs many minutes per program; this tool populates the persistent
compilation cache (build/jax_cache) for the exact shapes bench.py and the
container use, so later runs start hot.  Independent programs compile
CONCURRENTLY: once the front program's outputs exist, every distinct
iteration depth in the schedule plus the conform program are compiled from
same-shaped arguments in worker threads while the real iteration chain
proceeds (results of the dummy compiles are discarded; only the cache
matters).

    python tools/warmup.py [segment_mib ...]      (default: 8 2)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np


def sync(x):
    np.asarray(jax.tree.leaves(x)[0].ravel()[0])


def warm_segment(mib: float) -> None:
    from bench import bench_corpus
    from orz_tpu.device import pipeline as pipe
    from orz_tpu.device.spec import CHUNK_INPUT_DEFAULT, otz2_schedule

    n = int(mib * (1 << 20))
    data, cname = bench_corpus(n)
    schedule = otz2_schedule()
    depths = sorted(set(schedule))
    print(f"warmup {mib} MiB ({cname}): schedule={schedule}", flush=True)

    t0 = time.perf_counter()
    front = pipe.dispatch_segment_front(data, 2, CHUNK_INPUT_DEFAULT)
    starts, n_items, pk1, bestq0, bestro0, buf_d = front["front"]
    seg_len = front["seg_len"]
    sync(starts)
    print(f"  front compiled+ran in {time.perf_counter()-t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    plan = pipe.masked_plan_jit(buf_d, seg_len)
    sync(plan.sp_h2)
    print(f"  plan  compiled+ran in {time.perf_counter()-t0:.1f}s", flush=True)

    # SEQUENTIAL compiles: every distinct iteration depth + conform, all
    # shape-identical to the real chain's calls.  (Concurrent compiles from
    # threads wedged the remote-compile client for >60 min at the 8 MiB
    # bucket — measured 2026-08-19 — while sequential compiles of the same
    # programs finish in minutes each.)
    for d in depths:
        t = time.perf_counter()
        out = pipe.encode_iter2_jit(buf_d, seg_len, d, starts, n_items, plan)
        sync(out[0])
        print(f"  iter2({d}) {time.perf_counter()-t:.1f}s", flush=True)
    t = time.perf_counter()
    out = pipe.encode_conform_jit(buf_d, seg_len, depths[-1], starts,
                                  n_items, plan)
    sync(out[0])
    print(f"  conform({depths[-1]}) {time.perf_counter()-t:.1f}s", flush=True)

    # real chain for the data-dependent buckets (mid2/back), then assembly
    t0 = time.perf_counter()
    mid = pipe.dispatch_segment_mid2(front)
    back = pipe.dispatch_segment_back(mid)
    payload = pipe.finish_segment(data, back, CHUNK_INPUT_DEFAULT)
    print(f"  mid2+back+asm {time.perf_counter()-t0:.1f}s "
          f"({len(payload)} B)", flush=True)

    from orz_tpu.device.container import _decode_segment

    if _decode_segment(payload) != data:
        raise RuntimeError("warmup round-trip FAILED")
    print("  round-trip ok", flush=True)

    # the OTZ1 contrast path bench.py also measures (mid/back buckets)
    t0 = time.perf_counter()
    front = pipe.dispatch_segment_front(data, 2, CHUNK_INPUT_DEFAULT)
    mid = pipe.dispatch_segment_mid(front)
    back = pipe.dispatch_segment_back(mid)
    payload = pipe.finish_segment(data, back, CHUNK_INPUT_DEFAULT)
    print(f"  otz1 mid+back {time.perf_counter()-t0:.1f}s "
          f"({len(payload)} B)", flush=True)


def main():
    sizes = [float(a) for a in sys.argv[1:]] or [8, 2]
    t0 = time.perf_counter()
    for mib in sizes:
        warm_segment(mib)
    print(f"warmup total {time.perf_counter()-t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
