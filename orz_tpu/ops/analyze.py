"""Phase 1 — per-position analysis, all positions in parallel.

Computes, for every position of a padded segment at once, what the
sequential reference derives incrementally (orz_tpu/device/refcodec.py
analyze_ref): byte contexts, in-context insertion ranks (reduced-offset
space), word-model predictions, and the best ROLZ match per position.

This is the TPU answer to the reference's sequentially-threaded match finder
(reference src/matcher.rs:135-192 walks per-position hash chains inside the
parse loop): because OTZ model state is bytes-only, the chain walk becomes
"j-th previous same-key position" over a stable sort, and the LCP loop
becomes vectorized 4-byte block compares over all candidates at once.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from orz_tpu.device.spec import (
    LZ_MATCH_MAX_LEN,
    PAD_FRONT,
    RING,
    _ALNUM,
    min_match_len_for_ro,
)
from orz_tpu.ops.groups import group_prev_from_sorted, group_rank_from_sorted, sort_by_key

ALNUM_TABLE = jnp.asarray(_ALNUM, dtype=jnp.int32)


class ByteArrays(NamedTuple):
    cctx: jnp.ndarray  # int32 byte context per position
    h2: jnp.ndarray  # int32 15-bit word-model key AT each position
    mkey: jnp.ndarray  # int32 31-bit candidate grouping key
    dw: jnp.ndarray  # uint32 little-endian dword per position


class Analysis(NamedTuple):
    cctx: jnp.ndarray
    rank: jnp.ndarray  # in-context insertion rank
    pred: jnp.ndarray  # predicted word (int32, LE)
    wordmatch: jnp.ndarray  # bool
    bestlen: jnp.ndarray  # int32, 0 when no match
    bestro: jnp.ndarray  # int32 reduced offset (valid iff bestlen >= 4)
    bestq: jnp.ndarray  # int32 winning match position (for rep-distance)


def _shift_right(x: jnp.ndarray, k: int):
    return jnp.roll(x, k)  # front/tail pads are zero, so roll == shift


def _shift_left(x: jnp.ndarray, k: int):
    return jnp.roll(x, -k)


def byte_arrays(buf: jnp.ndarray) -> ByteArrays:
    """Vector per-position model keys (mirrors device/spec.py helpers)."""
    b = buf.astype(jnp.int32)
    prev1 = _shift_right(b, 1)
    prev2 = _shift_right(b, 2)
    cctx = (prev1 & 0x7F) | (ALNUM_TABLE[prev2] << 7)
    h2 = (b & 0x7F) | (cctx << 7)
    bu = buf.astype(jnp.uint32)
    dw = (
        bu
        | _shift_left(bu, 1) << 8
        | _shift_left(bu, 2) << 16
        | _shift_left(bu, 3) << 24
    )
    h23 = ((dw * jnp.uint32(2654435761)) >> jnp.uint32(8)).astype(jnp.int32) & 0x7FFFFF
    mkey = (cctx << 23) | h23
    return ByteArrays(cctx, h2, mkey, dw)


def word_predictions(ba: ByteArrays, buf: jnp.ndarray, end: jnp.ndarray) -> jnp.ndarray:
    """pred[p] = word-table value seen at p: the 2 bytes following the last
    position u <= p-3 whose key h2(u) equals h2(p-1); 0 if none."""
    n = buf.shape[0]
    x = jnp.arange(n, dtype=jnp.int32)
    valid_x = (x >= PAD_FRONT - 1) & (x < end)
    sk, sp = sort_by_key(ba.h2, valid_x)
    prev1 = group_prev_from_sorted(sk, sp, 1)
    prev2 = group_prev_from_sorted(sk, sp, 2)
    # the last same-key u <= x-2 (prev1 may be x-1, then prev2 qualifies)
    u = jnp.where(prev1 <= x - 2, prev1, prev2)
    u_ok = u >= PAD_FRONT
    uc = jnp.clip(u, 0, n - 1)
    b = buf.astype(jnp.int32)
    val = b[jnp.clip(uc + 1, 0, n - 1)] | b[jnp.clip(uc + 2, 0, n - 1)] << 8
    pred_at_x = jnp.where(u_ok, val, 0)
    return _shift_right(pred_at_x, 1)  # pred for position p lives at x = p-1


def _lcp_block(xor0, xor1, xor2, xor3):
    """LCP in bytes over a 16-byte block given the four dword XORs (LE)."""

    def partial(x):
        b0 = (x & 0xFF) == 0
        b1 = (x & 0xFFFF) == 0
        b2 = (x & 0xFFFFFF) == 0
        return b0.astype(jnp.int32) + (b0 & b1) + (b0 & b1 & b2)

    e0, e1, e2 = xor0 == 0, xor1 == 0, xor2 == 0
    e3 = xor3 == 0
    lcp = jnp.where(
        ~e0,
        partial(xor0),
        jnp.where(
            ~e1,
            4 + partial(xor1),
            jnp.where(~e2, 8 + partial(xor2), jnp.where(~e3, 12 + partial(xor3), 16)),
        ),
    )
    return lcp, e0 & e1 & e2 & e3


def _gather_dwords(dw: jnp.ndarray, base: jnp.ndarray, offset: int):
    n = dw.shape[0]
    return dw[jnp.clip(base + offset, 0, n - 1)]


@partial(jax.jit, static_argnames=("depth",))
def analyze(buf: jnp.ndarray, seg_len: jnp.ndarray, depth: int) -> Analysis:
    """Full phase-1 analysis of one padded segment (jit, static depth).

    Candidate search runs entirely in (key, pos)-sorted space: a position's
    j-th-previous same-key candidate sits j slots earlier in the sorted
    order, so every candidate's dwords/ranks come from vector SHIFTS of
    sorted arrays — the depth loop does no gathers at all (the sequential
    chain walk of reference src/matcher.rs:135-192, turned into lane math).
    """
    n = buf.shape[0]
    end = PAD_FRONT + seg_len
    p = jnp.arange(n, dtype=jnp.int32)
    valid = (p >= PAD_FRONT) & (p < end)

    ba = byte_arrays(buf)
    pred = word_predictions(ba, buf, end)
    b = buf.astype(jnp.int32)
    cur_word = b | _shift_left(b, 1) << 8
    wordmatch = cur_word == pred

    csk, csp = sort_by_key(ba.cctx, valid)
    rank = group_rank_from_sorted(csk, csp)

    msk, msp = sort_by_key(ba.mkey, valid)

    # sorted-space views (one gather each, reused for all depths)
    rank_s = rank[msp]
    dw_s = [ba.dw[jnp.clip(msp + 4 * k, 0, n - 1)] for k in range(4)]

    def shift_dn(x, j, fill):
        return jnp.concatenate([jnp.full(j, fill, x.dtype), x[:-j]])

    best_score = jnp.zeros(n, dtype=jnp.int32)
    best_q_s = jnp.full(n, -1, jnp.int32)
    best_ro_s = jnp.zeros(n, dtype=jnp.int32)
    for j in range(1, depth + 1):
        same = shift_dn(msk, j, -1) == msk
        q = shift_dn(msp, j, -1)
        ro = rank_s - 1 - shift_dn(rank_s, j, 0)
        ok = same & (ro < RING)
        x0 = shift_dn(dw_s[0], j, 0) ^ dw_s[0]
        x1 = shift_dn(dw_s[1], j, 0) ^ dw_s[1]
        x2 = shift_dn(dw_s[2], j, 0) ^ dw_s[2]
        x3 = shift_dn(dw_s[3], j, 0) ^ dw_s[3]
        lcp16, _ = _lcp_block(x0, x1, x2, x3)
        ok = ok & (lcp16 >= min_match_len_for_ro(ro))  # far-offset price gate
        score = jnp.where(ok, lcp16 * 64 + (depth - j), -1)
        better = score > best_score  # strict: ties keep the more recent j
        best_score = jnp.maximum(best_score, score)
        best_q_s = jnp.where(better, q, best_q_s)
        best_ro_s = jnp.where(better, ro, best_ro_s)

    # back to position space
    best_q = jnp.full(n, -1, jnp.int32).at[msp].set(best_q_s, unique_indices=True)
    best_ro = jnp.zeros(n, jnp.int32).at[msp].set(best_ro_s, unique_indices=True)
    score_pos = jnp.zeros(n, jnp.int32).at[msp].set(best_score, unique_indices=True)
    lcp16_best = score_pos >> 6

    # extend winners past 16 bytes.  Two static 16-byte rounds (static roll
    # shifts, cheap) retire the vast majority of matches; the few survivors
    # (len >= 48) are COMPACTED to the front of a K-sized working set and
    # extended there — all tail gathers run at n/16 size instead of n
    # (the full-width while_loop version spent ~80% of analyze here).
    cur = lcp16_best
    alive = lcp16_best >= 16
    for k in (1, 2):
        off = 16 * k
        qb = jnp.where(alive, best_q, 0)
        x0 = _gather_dwords(ba.dw, qb, off) ^ jnp.roll(ba.dw, -off)
        x1 = _gather_dwords(ba.dw, qb, off + 4) ^ jnp.roll(ba.dw, -(off + 4))
        x2 = _gather_dwords(ba.dw, qb, off + 8) ^ jnp.roll(ba.dw, -(off + 8))
        x3 = _gather_dwords(ba.dw, qb, off + 12) ^ jnp.roll(ba.dw, -(off + 12))
        lcp, full = _lcp_block(x0, x1, x2, x3)
        cur = jnp.where(alive, cur + lcp, cur)
        alive = alive & full

    k_sub = max(1024, n // 16)
    _, alive_first = lax.sort(
        ((~alive).astype(jnp.int32), jnp.arange(n, dtype=jnp.int32)), num_keys=2
    )
    # pad with unique out-of-bounds indices so the last chunk's slice never
    # clamps back onto already-extended lanes (re-extension double-counts)
    alive_first = jnp.concatenate(
        [alive_first, n + jnp.arange(k_sub, dtype=jnp.int32)]
    )
    n_alive = alive.sum()

    def chunk_cond(carry):
        c, cur = carry
        return c * k_sub < n_alive

    def chunk_body(carry):
        c, cur = carry
        sub_p = lax.dynamic_slice(alive_first, (c * k_sub,), (k_sub,))
        sub_pc = jnp.clip(sub_p, 0, n - 1)
        sub_q = best_q[sub_pc]
        sub_cur = cur[sub_pc]
        sub_alive = alive[sub_pc] & (sub_p < n)

        def tail_cond(tc):
            k, scur, salive = tc
            return (k < LZ_MATCH_MAX_LEN // 16) & salive.any()

        def tail_round(tc):
            k, scur, salive = tc
            off = 16 * k
            qb = jnp.where(salive, sub_q, 0)
            pb = jnp.where(salive, sub_p, 0)
            x0 = _gather_dwords(ba.dw, qb, off) ^ _gather_dwords(ba.dw, pb, off)
            x1 = _gather_dwords(ba.dw, qb, off + 4) ^ _gather_dwords(ba.dw, pb, off + 4)
            x2 = _gather_dwords(ba.dw, qb, off + 8) ^ _gather_dwords(ba.dw, pb, off + 8)
            x3 = _gather_dwords(ba.dw, qb, off + 12) ^ _gather_dwords(ba.dw, pb, off + 12)
            lcp, full = _lcp_block(x0, x1, x2, x3)
            scur = jnp.where(salive, scur + lcp, scur)
            return k + 1, scur, salive & full

        _, sub_cur, _ = lax.while_loop(tail_cond, tail_round, (jnp.int32(3), sub_cur, sub_alive))
        cur = cur.at[sub_p].set(sub_cur, mode="drop", unique_indices=True)
        return c + 1, cur

    _, cur = lax.while_loop(chunk_cond, chunk_body, (jnp.int32(0), cur))

    # no truncation at the segment end (mirrors refcodec; keeps the len_min
    # invariant behind length prediction)
    blen = jnp.minimum(cur, LZ_MATCH_MAX_LEN)
    has = (
        (best_q >= 0)
        & (blen >= min_match_len_for_ro(best_ro))
        & (p + blen <= end)
        & valid
    )
    bestlen = jnp.where(has, blen, 0)
    bestro = jnp.where(has, best_ro, 0)
    bestq = jnp.where(has, best_q, 0)
    return Analysis(ba.cctx, rank, pred, wordmatch, bestlen, bestro, bestq)
