"""Aggregate native-decode benchmark over the ORZT segment container.

The OTZ decode path is host C++ (csrc/otz_core.cpp), parallelized across
segments by pipe_decode (orz_tpu/pcontainer.py) — the ctypes call releases
the GIL, so N in-flight segments use N cores.  This tool measures that
aggregate rate directly from any .otz container, optionally replicating
its first segment so small inputs still exercise full parallelism:

    python tools/decode_bench.py CONTAINER [reps] [streams,streams,...]

With reps > the container's own segment count, a synthetic container is
built with the FIRST segment repeated `reps` times (same total decode work
per segment; framing per orz_tpu/pcontainer.py).
"""

from __future__ import annotations

import io
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from orz_tpu.device.container import TPU_MAGIC, tpu_decode_bytes
from orz_tpu.ioutil import read_len, write_len
from orz_tpu.pcontainer import MAGIC_LEN


def replicate(container: bytes, reps: int) -> bytes:
    src = io.BytesIO(container)
    if src.read(MAGIC_LEN) != TPU_MAGIC:
        raise ValueError("not an ORZT container")
    seg_size = read_len(src)
    n = read_len(src)
    payload = src.read(n)
    out = io.BytesIO()
    out.write(TPU_MAGIC)
    write_len(out, seg_size)
    for _ in range(reps):
        write_len(out, len(payload))
        out.write(payload)
    write_len(out, 0)
    return out.getvalue()


def main() -> int:
    path = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    streams = ([int(s) for s in sys.argv[3].split(",")]
               if len(sys.argv) > 3 else [1, 2, 4, 8])
    data = open(path, "rb").read()
    if reps > 1:
        data = replicate(data, reps)
    for ns in streams:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = tpu_decode_bytes(data, num_streams=ns)
            best = min(best, time.perf_counter() - t0)
        print(f"streams={ns}: {len(out)} B in {best:.3f}s "
              f"= {len(out)/best/1e6:.1f} MB/s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
