"""Warm the device-program cache for the batched bench configuration.

Compiling the OTZ2 pipeline cold over the dev harness's remote-compile
tunnel costs 5-10 minutes per program; this tool populates the persistent
compilation cache (build/jax_cache) for the exact shapes `python bench.py`
dispatches — same corpus, same segment bucket, same batch size, same level
set — so the driver's bench run starts hot.  Compiles run SEQUENTIALLY
(concurrent compiles wedged the remote-compile client for >60 min at the
8 MiB bucket, measured 2026-08-19).

    python tools/warmup.py [segment_mib ...]      (default: 2)

Env: BENCH_BATCH/BENCH_LEVEL/BENCH_CORPUS as bench.py.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def warm_segment(mib: float) -> None:
    from bench import bench_corpus, make_corpus
    from orz_tpu.device.batch import encode_segments_batch
    from orz_tpu.device.container import _decode_segment, tpu_encode_bytes
    from orz_tpu.device.pipeline import _bucket_capacity

    level = int(os.environ.get("BENCH_LEVEL", "2"))
    n_batch = int(os.environ.get("BENCH_BATCH", "4"))
    seg = int(mib * (1 << 20))
    cap = _bucket_capacity(seg)
    data, cname = bench_corpus(4 * (1 << 23))  # 32 MiB, as bench.py
    print(f"warmup {mib} MiB x{n_batch} ({cname}), level {level}", flush=True)

    segs = [data[i * seg : (i + 1) * seg] for i in range(n_batch)]

    t0 = time.perf_counter()
    out = encode_segments_batch(segs, level, cap=cap)
    print(f"  l{level} OTZ2 batch compiled+ran in "
          f"{time.perf_counter()-t0:.1f}s", flush=True)
    for s, p in zip(segs, out):
        if _decode_segment(p) != s:
            raise RuntimeError("warmup round-trip FAILED")
    print("  round-trip ok", flush=True)

    t0 = time.perf_counter()
    encode_segments_batch(segs, level, rings_mode=0, cap=cap)
    print(f"  l{level} OTZ1 batch compiled+ran in "
          f"{time.perf_counter()-t0:.1f}s", flush=True)

    # the alt-corpus ratio line encodes a synthetic 8 MiB sample: its item
    # counts may land in different shape buckets than the real corpus
    t0 = time.perf_counter()
    synth = make_corpus(min(8 << 20, n_batch * seg))
    ssegs = [synth[i * seg : (i + 1) * seg] for i in range(max(1, len(synth) // seg))]
    ssegs = (ssegs * n_batch)[:n_batch]
    encode_segments_batch(ssegs, level, cap=cap)
    print(f"  synthetic-corpus batch ran in {time.perf_counter()-t0:.1f}s",
          flush=True)

    # the l0 measurement point (cheap path, different front depth)
    t0 = time.perf_counter()
    s0 = data[: min(len(data), 4 << 20)]
    comp0 = tpu_encode_bytes(s0, level=0, segment_size=seg,
                             num_streams=n_batch)
    print(f"  l0 batch compiled+ran in {time.perf_counter()-t0:.1f}s "
          f"({len(comp0)} B)", flush=True)

    # the full 32 MiB end-to-end pass hits any remaining item/round shape
    # buckets the first 4 segments missed
    t0 = time.perf_counter()
    comp = tpu_encode_bytes(data, level=level, segment_size=seg,
                            num_streams=n_batch)
    print(f"  full 32 MiB e2e in {time.perf_counter()-t0:.1f}s "
          f"({len(comp)} B)", flush=True)


def main():
    sizes = [float(a) for a in sys.argv[1:]] or [2]
    t0 = time.perf_counter()
    for mib in sizes:
        warm_segment(mib)
    print(f"warmup total {time.perf_counter()-t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
