"""On-chip microbenchmarks for the OTZ2 iteration's building blocks.

Times, at a given element count n:
  - match_depth_pallas (masked) at several shift depths
  - an 11-payload lax.sort (the cost of compacting mask rows per iteration)
  - a 3-payload permutation sort (the current per-iteration layout move)

    python tools/kernel_bench.py [n_mib_elems] [depths,comma]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np
from jax import lax

from orz_tpu.ops.match_pallas import N_DW, match_depth_pallas
from orz_tpu.utils import enable_compilation_cache

enable_compilation_cache()


def _sync(out):
    # block_until_ready is not a reliable barrier under the remote (axon)
    # plugin; a 1-element fetch is (bench.py uses the same trick)
    np.asarray(jax.tree.leaves(out)[0].ravel()[0])


def timeit(fn, *args, reps=10):
    _sync(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = fn(*args)  # queue back-to-back; the device runs in order
    _sync(out)  # one tunnel round trip for the whole batch
    return (time.perf_counter() - t0) / reps


def main():
    mi = float(sys.argv[1]) if len(sys.argv) > 1 else 2
    depths = ([int(v) for v in sys.argv[2].split(",")]
              if len(sys.argv) > 2 else [96, 192, 384])
    n = int(mi * (1 << 20))
    print(f"kernel bench: n={n} on {jax.devices()[0]}", flush=True)

    rng = np.random.default_rng(0)
    msk = jnp.asarray(np.sort(rng.integers(0, 1 << 18, n).astype(np.int32)))
    msp = jnp.asarray(rng.permutation(n).astype(np.int32))
    rank = jnp.asarray(rng.integers(0, 1 << 12, n).astype(np.int32))
    dw = tuple(jnp.asarray(rng.integers(0, 1 << 31, n, dtype=np.int64)
                           .astype(np.uint32)) for _ in range(N_DW))
    mask = jnp.asarray((rng.random(n) < 0.2).astype(np.int32))
    end = jnp.int32(n)

    for d in depths:
        t0 = time.perf_counter()
        dt = timeit(lambda: match_depth_pallas(msk, msp, rank, dw, end, d,
                                               mask_s=mask, ro_cap=4094))
        print(f"  masked kernel depth {d:4d}: {dt*1e3:7.2f} ms "
              f"(compile+first {time.perf_counter()-t0:.1f}s)", flush=True)

    arrs11 = [msk] + [msp, rank] + [d.astype(jnp.int32) for d in dw]

    @jax.jit
    def sort11(*a):
        return lax.sort(tuple(a), num_keys=2)

    dt = timeit(lambda: sort11(*arrs11))
    print(f"  11-payload 2-key sort:    {dt*1e3:7.2f} ms", flush=True)

    @jax.jit
    def sort3(*a):
        return lax.sort(tuple(a), num_keys=1)

    dt = timeit(lambda: sort3(msp, rank, mask))
    print(f"  3-payload perm sort:      {dt*1e3:7.2f} ms", flush=True)

    @jax.jit
    def scan2(first, v):
        def op(a, b):
            fa, va = a
            fb, vb = b
            return fa | fb, jnp.where(fb, vb, va + vb)
        return lax.associative_scan(op, (first, v))

    first = jnp.asarray((rng.random(n) < 0.01))
    dt = timeit(lambda: scan2(first, rank))
    print(f"  segmented add scan:       {dt*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
