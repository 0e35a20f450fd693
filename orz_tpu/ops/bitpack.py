"""Phase 4b — parallel bitstream packing by prefix sum + word scatter.

The reference packs bits through a sequential 64-bit staging buffer
(reference src/coder.rs:159-216).  Here every item's bit cost is known up
front, so an exclusive prefix sum yields each item's absolute bit offset and
all items scatter their (up to three) bit fields into big-endian u32 words
independently — field bit ranges are disjoint, so scatter-ADD is bitwise OR.

Chunks pack back-to-back into ONE flat word buffer (each chunk starting at
its own word boundary, bit 0), so the host fetches a single size-bucketed
prefix of the buffer instead of one over-allocated region per chunk — on a
tunneled TPU every extra fetch costs a full round trip.  The host splices
chunk regions after the chunk headers (varints + serialized tables) with a
vectorized shift-merge (orz_tpu/golden/bitio.py append_bits_bulk).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Packed(NamedTuple):
    words: jnp.ndarray  # (W_total,) uint32, big-endian bit order, flat
    word_base: jnp.ndarray  # (C_max,) int32: chunk k starts at words[word_base[k]]
    bitlen: jnp.ndarray  # (C_max,) int32 payload bits per chunk
    n_items: jnp.ndarray  # (C_max,) int32


def _scatter_field(words, flat_word_idx, val_u32, t, s):
    """OR the t-bit value into the stream at word w / in-word bit offset s.
    t <= 16, s in [0, 32): the field spans at most two words."""
    over = t + s - 32  # bits spilling into the second word
    c0 = jnp.where(
        over > 0,
        val_u32 >> jnp.clip(over, 0, 31).astype(jnp.uint32),
        val_u32 << jnp.clip(-over, 0, 31).astype(jnp.uint32),
    )
    c1 = jnp.where(
        over > 0,
        val_u32 << jnp.clip(32 - over, 0, 31).astype(jnp.uint32),
        jnp.uint32(0),
    )
    nw = words.shape[0]
    words = words.at[jnp.clip(flat_word_idx, 0, nw - 1)].add(jnp.where(t > 0, c0, 0))
    words = words.at[jnp.clip(flat_word_idx + 1, 0, nw - 1)].add(
        jnp.where(over > 0, c1, 0)
    )
    return words


def pack_items(
    coded: jnp.ndarray,  # (M,) post-symrank symbol
    after_literal: jnp.ndarray,
    kind: jnp.ndarray,
    robitlen: jnp.ndarray,
    robits: jnp.ndarray,
    eml: jnp.ndarray,
    chunk_id: jnp.ndarray,  # (M,)
    n_items: jnp.ndarray,  # scalar
    codesA: jnp.ndarray,  # (C_max, 431) canonical codes, after_literal=1
    lensA: jnp.ndarray,
    codesB: jnp.ndarray,  # (C_max, 431) after_literal=0
    lensB: jnp.ndarray,
    codesC: jnp.ndarray,  # (C_max, 431 padded; first 240 used)
    lensC: jnp.ndarray,
    w_total: int,  # flat word-buffer capacity (>= worst-case payload)
    lenid_escape: int,
) -> Packed:
    m = coded.shape[0]
    c_max = codesA.shape[0]
    valid = jnp.arange(m, dtype=jnp.int32) < n_items
    cid = jnp.where(valid, chunk_id, c_max - 1)

    # flat 1d gathers (2d-index gathers lower via a slow async-slice path)
    ns = codesA.shape[1]
    ixAB = cid * ns + coded
    code1 = jnp.where(
        after_literal == 1, codesA.reshape(-1)[ixAB], codesB.reshape(-1)[ixAB]
    )
    len1 = jnp.where(
        after_literal == 1, lensA.reshape(-1)[ixAB], lensB.reshape(-1)[ixAB]
    )
    is_match = kind == 2
    has_ext = is_match & (eml >= lenid_escape)
    emlc = jnp.clip(eml, 0, codesC.shape[1] - 1)
    ixC = cid * ns + emlc
    code3 = jnp.where(has_ext, codesC.reshape(-1)[ixC], 0)
    len3 = jnp.where(has_ext, lensC.reshape(-1)[ixC], 0)
    len2 = jnp.where(is_match, robitlen, 0)
    code2 = jnp.where(is_match, robits, 0)

    t_total = jnp.where(valid, len1 + len2 + len3, 0)
    off_global = jnp.cumsum(t_total) - t_total  # exclusive prefix sum

    # base = min over chunk items; empty chunks keep huge sentinel, unused
    chunk_base = jnp.full(c_max, jnp.int32(2**30)).at[cid].min(
        jnp.where(valid, off_global.astype(jnp.int32), 2**30), mode="drop"
    )
    off = off_global.astype(jnp.int32) - chunk_base[cid]

    bitlen = jnp.zeros(c_max, jnp.int32).at[cid].add(t_total.astype(jnp.int32))
    items_per_chunk = jnp.zeros(c_max, jnp.int32).at[cid].add(
        jnp.where(valid, 1, 0)
    )
    words_per_chunk = (bitlen + 31) >> 5
    word_base = jnp.cumsum(words_per_chunk) - words_per_chunk

    # merge the (up to three) fields into one <=43-bit value held as a
    # uint32 (hi, lo) pair, then OR it into the stream with three
    # scatter-adds — half the scatters of a field-at-a-time loop (item-count
    # scatters are ~8 ms per million items on v5e)
    c1 = code1.astype(jnp.uint32)
    c2 = code2.astype(jnp.uint32)
    c3 = code3.astype(jnp.uint32)
    l23 = len2 + len3  # <= 13 + 15: always < 32
    # V = c1:c2:c3 (c1 most significant), tt = t_total <= 43 bits, held as
    # (hi, lo) with lo = V's low 32 bits
    lo = (c1 << jnp.clip(l23, 0, 31).astype(jnp.uint32)) \
        | (c2 << len3.astype(jnp.uint32)) | c3
    hi = jnp.where(
        t_total > 32,
        c1 >> jnp.clip(32 - l23, 0, 31).astype(jnp.uint32),
        jnp.uint32(0),
    )

    def _shl(v, k):  # uint32 shift with clamped traced amount
        return v << jnp.clip(k, 0, 31).astype(jnp.uint32)

    def _shr(v, k):
        return v >> jnp.clip(k, 0, 31).astype(jnp.uint32)

    tt = jnp.where(valid, t_total, 0).astype(jnp.int32)
    widx = word_base[cid] + (off >> 5)
    s = off & 31
    # V occupies stream bits [s, s+tt) of words widx.. (MSB-first): word 0
    # takes V's top 32-s bits, r = s+tt-32 bits spill into words 1 and 2
    r = s + tt - 32
    w0 = jnp.where(
        r <= 0,
        _shl(lo, -r),
        jnp.where(r < 32, _shr(lo, r) | _shl(hi, 32 - r), _shr(hi, r - 32)),
    )
    w1 = jnp.where(
        r <= 0,
        jnp.uint32(0),
        jnp.where(r <= 32, _shl(lo, 32 - r), _shr(lo, r - 32) | _shl(hi, 64 - r)),
    )
    w2 = jnp.where(r > 32, _shl(lo, 64 - r), jnp.uint32(0))
    w0 = jnp.where(tt > 0, w0, 0)

    nw = w_total
    words = jnp.zeros(w_total, jnp.uint32)
    words = words.at[jnp.clip(widx, 0, nw - 1)].add(w0)
    words = words.at[jnp.clip(widx + 1, 0, nw - 1)].add(w1)
    words = words.at[jnp.clip(widx + 2, 0, nw - 1)].add(w2)

    return Packed(words, word_base, bitlen, items_per_chunk)
