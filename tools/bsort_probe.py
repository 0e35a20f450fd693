"""Micro-probe: batch-dim lax.sort vs flat segment-keyed sort on the chip.

The round-4 explicit-batch rewrite fixed gathers/scatters but left sorts
batched ((B, n) with the sort along axis -1).  If XLA:TPU lowers the
batched sort poorly, that explains the front/quality stage times; the fix
is ONE flat sort over B*n rows with a leading segment-id key (bit-identical
result after reshape).

    python tools/bsort_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

B, N = 4, (1 << 21) + 288


def timed(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.integers(0, 1 << 30, (B, N), dtype=np.int32))
    p = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (B, N))
    pay = jnp.asarray(rng.integers(0, 1 << 30, (B, N), dtype=np.int32))

    @jax.jit
    def sort_batched(k, p, pay):
        return lax.sort((k, p, pay), num_keys=2)

    @jax.jit
    def sort_flat_seg(k, p, pay):
        seg = jnp.broadcast_to(
            jnp.arange(B, dtype=jnp.int32)[:, None], (B, N)
        ).reshape(-1)
        out = lax.sort(
            (seg, k.reshape(-1), p.reshape(-1), pay.reshape(-1)), num_keys=3
        )
        return tuple(o.reshape(B, N) for o in out[1:])

    @jax.jit
    def sort_single(k, p, pay):  # one segment, for the per-seg baseline
        return lax.sort((k[0], p[0], pay[0]), num_keys=2)

    @jax.jit
    def scan_batched(k):
        def op(a, b):
            return (a[0] | b[0], jnp.where(b[0], b[1], a[1] + b[1]))

        f = k < (1 << 29)
        return lax.associative_scan(op, (f, k), axis=1)

    @jax.jit
    def gather_flat(k, p):
        return k.reshape(-1)[
            (jnp.clip(p, 0, N - 1)
             + (jnp.arange(B, dtype=jnp.int32) * N)[:, None]).reshape(-1)
        ].reshape(B, N)

    @jax.jit
    def scatter_flat(k, p):
        return jnp.zeros(B * N, jnp.int32).at[
            (p + (jnp.arange(B, dtype=jnp.int32) * N)[:, None]).reshape(-1)
        ].set(k.reshape(-1), mode="drop", unique_indices=True)

    print(f"sort batched  (B={B}, N={N}, 2key+1pay): "
          f"{timed(sort_batched, k, p, pay)*1e3:.1f} ms", flush=True)
    print(f"sort flat+seg (BN={B*N}, 3key+1pay):     "
          f"{timed(sort_flat_seg, k, p, pay)*1e3:.1f} ms", flush=True)
    print(f"sort single   (N={N}, 2key+1pay):        "
          f"{timed(sort_single, k, p, pay)*1e3:.1f} ms", flush=True)
    print(f"assoc_scan batched axis=1:               "
          f"{timed(scan_batched, k)*1e3:.1f} ms", flush=True)
    print(f"flat gather BN idx:                      "
          f"{timed(gather_flat, k, p)*1e3:.1f} ms", flush=True)
    print(f"flat scatter BN idx:                     "
          f"{timed(scatter_flat, k, p)*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
