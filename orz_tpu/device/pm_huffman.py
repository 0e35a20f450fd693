"""Length-limited optimal Huffman code lengths via package-merge.

The reference builds a Huffman tree with a heap and, when the depth exceeds
15, halves all weights and rebuilds (reference src/huffman.rs:27-111) — a
sequential, data-dependent loop.  Package-merge (Larmore & Hirschberg) gives
*optimal* 15-bit-limited lengths as 15 rounds of sort+merge over ~2n items —
fully vectorizable, so the numpy reference here and the jitted JAX twin
(orz_tpu/ops/huffman.py) run the same algorithm and must produce identical
lengths (ties are fixed by a stable sort with leaves listed before packages).

The resulting lengths satisfy Kraft equality, so the canonical code
assignment (reference src/huffman.rs:118-141) applies unchanged.
"""

from __future__ import annotations

import numpy as np

from orz_tpu.constants import HUFFMAN_MAX_CODE_LEN

INF = np.int64(1) << 40


def pm_code_lens(weights, max_len: int = HUFFMAN_MAX_CODE_LEN) -> np.ndarray:
    """weights -> optimal code lengths with max(lens) <= max_len.

    Zero-weight symbols get length 0.  Deterministic across
    implementations: items are sorted by (value, leaves-before-packages,
    insertion index) via a stable sort of [leaves ++ packages].
    """
    w = np.asarray(weights, dtype=np.int64)
    n = len(w)
    lens = np.zeros(n, dtype=np.int64)
    active = w > 0
    n_active = int(active.sum())
    if n_active == 0:
        return lens
    if n_active == 1:
        lens[np.argmax(active)] = 1
        return lens
    assert (1 << max_len) >= n_active

    leaf_vals = np.where(active, w, INF)
    order = np.lexsort((np.arange(n), leaf_vals))  # by (weight, symbol)
    leaf_sorted = leaf_vals[order]

    m = 2 * n
    # level list: values + per-item leaf-rank count vectors
    vals = np.full(m, INF, dtype=np.int64)
    cnts = np.zeros((m, n), dtype=np.int32)
    vals[:n] = leaf_sorted
    cnts[:n] = np.eye(n, dtype=np.int32)

    leaf_block_vals = np.full(m, INF, dtype=np.int64)
    leaf_block_vals[:n] = leaf_sorted
    leaf_block_cnts = np.zeros((m, n), dtype=np.int32)
    leaf_block_cnts[:n] = np.eye(n, dtype=np.int32)

    for _ in range(max_len - 1):
        pk_vals = np.minimum(vals[0::2] + vals[1::2], INF)
        pk_cnts = cnts[0::2] + cnts[1::2]
        merged_vals = np.concatenate([leaf_block_vals[:n], pk_vals])
        merged_cnts = np.concatenate([leaf_block_cnts[:n], pk_cnts])
        perm = np.argsort(merged_vals, kind="stable")
        vals = merged_vals[perm]
        cnts = merged_cnts[perm]

    take = 2 * n_active - 2
    per_rank = cnts[:take].sum(axis=0)
    lens[order[:n_active]] = per_rank[:n_active]
    return lens
