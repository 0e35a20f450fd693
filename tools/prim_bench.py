"""Microbenchmark of the XLA primitives the encode pipeline leans on.

Times sort/gather/scatter/scan primitives at pipeline-realistic sizes on
whatever jax.devices() offers.  These numbers drive kernel design choices
(lax.sort vs Pallas radix sort, gather-based vs shift-based candidate
search, while_loop carry budgets).
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _sync(out):
    """block_until_ready is an async ack on the axon tunnel backend; a
    scalar host fetch is the only reliable completion barrier."""
    x = jax.tree.leaves(out)[0]
    np.asarray(x.ravel()[0])


def timed(label, fn, *args, n=5):
    f = jax.jit(fn)
    _sync(f(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        _sync(f(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{label:42s} {min(ts)*1000:9.2f} ms", flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else (4 << 20)
    rng = np.random.default_rng(7)
    keys = jnp.asarray(rng.integers(0, 1 << 31, n, dtype=np.int32))
    pos = jnp.arange(n, dtype=jnp.int32)
    idx = jnp.asarray(rng.integers(0, n, n, dtype=np.int32))
    vals = jnp.asarray(rng.integers(0, 1 << 20, n, dtype=np.int32))
    print(f"n = {n} ({n/2**20:.0f} Mi), device {jax.devices()[0]}")

    timed("lax.sort 1-key (i32)", lambda k: lax.sort((k,), num_keys=1), keys)
    timed("lax.sort 2-key (i32,i32)",
          lambda k, p: lax.sort((k, p), num_keys=2), keys, pos)
    timed("lax.sort 3-arr (2-key + payload)",
          lambda k, p, v: lax.sort((k, p, v), num_keys=2), keys, pos, vals)
    timed("gather n from n (random)", lambda v, i: v[i], vals, idx)
    timed("gather n from n (near-id, +-8)",
          lambda v, i: v[i], vals,
          jnp.clip(pos + jnp.asarray(rng.integers(-8, 8, n, dtype=np.int32)), 0, n - 1))
    timed("scatter-set unique", lambda v, i: jnp.zeros(n, jnp.int32).at[i].set(
        v, unique_indices=True, mode="drop"), vals, pos[::-1])
    timed("scatter-add (random idx)", lambda v, i: jnp.zeros(256, jnp.int32).at[
        i & 255].add(1, mode="drop"), vals, idx)
    timed("cumsum i32", jnp.cumsum, vals)
    timed("cummax i32", lax.cummax, vals)
    timed("cummax i64", lambda v: lax.cummax(v.astype(jnp.int64)), vals)
    timed("roll by 5", lambda v: jnp.roll(v, 5), vals)
    timed("elementwise 10-op chain",
          lambda v: ((v * 3 ^ (v >> 2)) + (v << 1) ^ (v * 5) + (v >> 3)
                     ^ (v * 7) + (v >> 1) ^ (v * 11) + v), vals)

    def wl_noop(v):
        def body(c):
            i, v = c
            return i + 1, v + 1
        return lax.while_loop(lambda c: c[0] < 1000, body, (jnp.int32(0), v))

    timed("while_loop 1000 iters, n-carry", wl_noop, vals)

    def wl_small(s):
        def body(c):
            i, s = c
            return i + 1, s + 1
        return lax.while_loop(lambda c: c[0] < 1000, body, (jnp.int32(0), s))

    timed("while_loop 1000 iters, scalar carry", wl_small, jnp.int32(0))

    def scalar_chain(v):
        def body(c):
            i, p, acc = c
            return i + 1, v[p] & 1023, acc + p
        return lax.while_loop(lambda c: c[0] < 1000, body,
                              (jnp.int32(0), jnp.int32(0), jnp.int32(0)))

    timed("scalar gather chain x1000", scalar_chain, jnp.abs(idx))

    # one-hot matmul closure: (B, 128, 128) bf16 batched matmul on MXU
    B = max(1, n // (1 << 14))
    a = jnp.asarray(rng.random((B, 128, 128), np.float32), jnp.bfloat16)

    def sq7(a):
        for _ in range(7):
            a = jnp.clip(jnp.einsum("bij,bjk->bik", a, a,
                                    preferred_element_type=jnp.float32), 0, 1
                         ).astype(jnp.bfloat16)
        return a

    timed(f"7x batched 128^3 matmul (B={B})", sq7, a)


if __name__ == "__main__":
    main()
