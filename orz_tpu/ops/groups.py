"""Sort-based key-grouping primitives.

The OTZ model state is bytes-only (see orz_tpu/device/__init__), which turns
"walk a hash chain" (reference src/matcher.rs:135-192) into "find the j-th
previous position with the same key" — computable for ALL positions at once
from one stable sort by (key, position).  These helpers are the backbone of
the analyze phase:

    key = byte context        -> in-context insertion ranks (reduced offsets)
    key = word-model hash     -> previous same-context word occurrence
    key = context+dword hash  -> ROLZ match candidates
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

SENTINEL = jnp.int32(0x7FFFFFFF)


def sort_by_key(keys: jnp.ndarray, valid: jnp.ndarray):
    """Stable ascending sort of positions by (key, position); invalid
    positions sink to the end.  Returns (sorted_keys, sorted_pos)."""
    n = keys.shape[0]
    pos = jnp.arange(n, dtype=jnp.int32)
    k = jnp.where(valid, keys.astype(jnp.int32), SENTINEL)
    return lax.sort((k, pos), num_keys=2)


def group_rank_from_sorted(sk: jnp.ndarray, spos: jnp.ndarray) -> jnp.ndarray:
    """rank[p] = number of valid positions q < p with key(q) == key(p).
    Because the sort is by (key, pos), ranks are in-group indices."""
    n = sk.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    first = jnp.concatenate([jnp.ones(1, dtype=bool), sk[1:] != sk[:-1]])
    group_start = lax.cummax(jnp.where(first, idx, 0))
    rank_sorted = idx - group_start
    return jnp.zeros(n, dtype=jnp.int32).at[spos].set(
        rank_sorted, unique_indices=True
    )


def group_prev_from_sorted(sk: jnp.ndarray, spos: jnp.ndarray, j: int) -> jnp.ndarray:
    """prev_j[p] = position of the j-th previous same-key element
    (-1 if none).  j is static."""
    n = sk.shape[0]
    same = jnp.concatenate([jnp.zeros(j, dtype=bool), sk[j:] == sk[:-j]])
    cand = jnp.concatenate([jnp.full(j, -1, jnp.int32), spos[:-j]])
    prev_sorted = jnp.where(same, cand, -1)
    return jnp.full(n, -1, jnp.int32).at[spos].set(prev_sorted, unique_indices=True)
