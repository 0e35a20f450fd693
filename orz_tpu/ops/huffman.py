"""Phase 4a — vectorized package-merge and canonical code assignment.

The jitted twin of orz_tpu/device/pm_huffman.py: identical algorithm
(boundary package-merge), identical tie-breaking (stable sort of
[leaves ++ packages] by value), so device and host derive identical code
lengths.  All tables are padded to the 431-symbol OTZ alphabet; zero-weight
padding symbols are inert and receive length 0.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from orz_tpu.constants import HUFFMAN_MAX_CODE_LEN
from orz_tpu.device.spec import SYMRANK_NUM_SYMBOLS

N_SYM = SYMRANK_NUM_SYMBOLS  # 431
# plain python int: a module-level jnp scalar would initialize the XLA
# backend at import time, breaking jax.distributed.initialize ordering
INF = 1 << 28  # weights are < 2^21; INF+INF stays < 2^31


def pm_code_lens(w: jnp.ndarray, max_len: int = HUFFMAN_MAX_CODE_LEN) -> jnp.ndarray:
    """Optimal max_len-limited code lengths for one weight vector (n,)."""
    n = w.shape[0]
    w = w.astype(jnp.int32)
    active = w > 0
    n_active = active.sum().astype(jnp.int32)

    leaf_vals = jnp.where(active, w, INF)
    sym = jnp.arange(n, dtype=jnp.int32)
    leaf_sorted, order = lax.sort((leaf_vals, sym), num_keys=2)

    m = 2 * n
    pad = jnp.full(n, INF, jnp.int32)
    ones = jnp.ones(n, jnp.int32)
    zeros = jnp.zeros(n, jnp.int32)
    vals = jnp.concatenate([leaf_sorted, pad])
    is_leaf = jnp.concatenate([ones, zeros])
    leaf_prefixes = [jnp.cumsum(is_leaf)]

    mi = jnp.arange(m, dtype=jnp.int32)
    for _ in range(max_len - 1):
        pk_vals = jnp.minimum(vals[0::2] + vals[1::2], INF)
        merged_vals = jnp.concatenate([leaf_sorted, pk_vals])
        merged_leaf = jnp.concatenate([ones, zeros])
        vals, is_leaf = lax.sort((merged_vals, mi, merged_leaf), num_keys=2)[::2]
        leaf_prefixes.append(jnp.cumsum(is_leaf))

    # backward pass over levels (static unroll, traced t/k)
    t = 2 * n_active - 2
    ranks = jnp.arange(n, dtype=jnp.int32)
    per_rank = jnp.zeros(n, jnp.int32)
    for l in range(max_len - 1, -1, -1):
        k = jnp.where(t > 0, leaf_prefixes[l][jnp.maximum(t - 1, 0)], 0)
        per_rank = per_rank + (ranks < k)
        t = 2 * (t - k)

    lens = jnp.zeros(n, jnp.int32).at[order].set(
        jnp.where(ranks < n_active, per_rank, 0), unique_indices=True
    )
    # degenerate cases: 0 or 1 active symbols
    lens = jnp.where(n_active == 1, jnp.where(active, 1, 0), lens)
    lens = jnp.where(n_active == 0, 0, lens)
    return lens


def canonical_codes(lens: jnp.ndarray) -> jnp.ndarray:
    """codes[sym] for canonical assignment ordered by (len, sym)
    (reference src/huffman.rs:118-141)."""
    n = lens.shape[0]
    codes = jnp.zeros(n, jnp.int32)
    count_per_len = jnp.zeros(HUFFMAN_MAX_CODE_LEN + 1, jnp.int32).at[lens].add(
        jnp.where(lens > 0, 1, 0)
    )

    next_code = jnp.int32(0)
    for l in range(1, HUFFMAN_MAX_CODE_LEN + 1):
        mask = lens == l
        rank = jnp.cumsum(mask) - 1
        codes = jnp.where(mask, next_code + rank, codes)
        next_code = (next_code + count_per_len[l]) << 1
    return codes
