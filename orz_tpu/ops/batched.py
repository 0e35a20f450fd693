"""Explicitly-batched analysis/parse bodies for the multi-segment pipeline.

`jax.vmap` of the per-segment bodies (ops/analyze.py, ops/parse.py) is
semantically perfect but performance-fatal on TPU: every 1-d gather/scatter
becomes a batched (2-d) gather/scatter, which XLA:TPU lowers through a
serialized async-slice path — the round-4 trace showed the vmapped
iteration scan at ~2.2 s/iteration (B=4, 2 MiB segments) with the time in
`while` loops full of `copy-start` pairs, ~15x the per-segment cost.

These variants take arrays with an explicit leading batch axis and keep
every gather/scatter on the fast 1-d path by flattening (B, n) operands
and offsetting indices by b*n (bgather/bscatter_*).  Batched `lax.sort` /
`associative_scan` / elementwise ops are fast as-is and stay batched.
Pallas kernels go through `jax.vmap` (the batch axis becomes the leading
grid dimension — tile-local compute, no gathers).

Semantics are pinned to the per-segment functions they mirror (cited per
function); tests/test_batched_ops.py asserts equality against them.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from orz_tpu.device.spec import (
    FENCE,
    LZ_MATCH_MAX_LEN,
    PAD_FRONT,
    RING,
    min_match_len_for_ro,
)
from orz_tpu.ops.analyze import (
    EXT_W,
    LCP0,
    N_DW,
    Analysis,
    MaskedPlan,
    byte_arrays,
)

# --- flat-index helpers ------------------------------------------------------


def bgather(arr: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """arr (B, n), idx (B, m) int32 in [0, n) -> (B, m) via ONE flat 1-d
    gather (the fast TPU path; a batched gather serializes)."""
    b, n = arr.shape
    off = (jnp.arange(b, dtype=jnp.int32) * n)[:, None]
    flat = arr.reshape(-1)[(jnp.clip(idx, 0, n - 1) + off).reshape(-1)]
    return flat.reshape(idx.shape)


def bscatter_set(dst: jnp.ndarray, idx: jnp.ndarray, val,
                 unique: bool = True) -> jnp.ndarray:
    """dst (B, n) .at[b, idx[b]] = val with drop semantics for idx outside
    [0, n) — one flat 1-d scatter.  Out-of-range entries map to UNIQUE
    out-of-bounds sentinels (b*n + flat slot) so two invalid entries never
    collide under the unique_indices promise (UB per JAX docs otherwise;
    same discipline as ops/symrank_pallas.py's OOB sentinels)."""
    b, n = dst.shape
    off = (jnp.arange(b, dtype=jnp.int32) * n)[:, None]
    ok = (idx >= 0) & (idx < n)
    flat_slot = jnp.arange(idx.size, dtype=jnp.int32).reshape(idx.shape)
    gidx = jnp.where(ok, idx + off, b * n + flat_slot)
    if not isinstance(val, jnp.ndarray) or val.ndim == 0:
        val = jnp.broadcast_to(val, idx.shape)
    flat = dst.reshape(-1).at[gidx.reshape(-1)].set(
        val.reshape(-1), mode="drop", unique_indices=unique
    )
    return flat.reshape(dst.shape)


def bscatter_max(dst: jnp.ndarray, idx: jnp.ndarray, val: jnp.ndarray,
                 unique: bool = False) -> jnp.ndarray:
    b, n = dst.shape
    off = (jnp.arange(b, dtype=jnp.int32) * n)[:, None]
    ok = (idx >= 0) & (idx < n)
    gidx = jnp.where(ok, idx + off, b * n)
    flat = dst.reshape(-1).at[gidx.reshape(-1)].max(
        val.reshape(-1), mode="drop", unique_indices=unique
    )
    return flat.reshape(dst.shape)


def bscatter_add(dst: jnp.ndarray, idx: jnp.ndarray, val: jnp.ndarray,
                 unique: bool = False) -> jnp.ndarray:
    b, n = dst.shape
    off = (jnp.arange(b, dtype=jnp.int32) * n)[:, None]
    ok = (idx >= 0) & (idx < n)
    gidx = jnp.where(ok, idx + off, b * n)
    flat = dst.reshape(-1).at[gidx.reshape(-1)].add(
        val.reshape(-1), mode="drop", unique_indices=unique
    )
    return flat.reshape(dst.shape)


def _rollr(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Batched right-shift via roll on the position axis.  The wrap-around
    brings another segment's pad (or data into pad) — every consumer masks
    by the per-segment valid range, same as the per-segment roll relying on
    zero pads (ops/analyze.py _shift_right)."""
    return jnp.roll(x, k, axis=-1)


def _rolll(x: jnp.ndarray, k: int) -> jnp.ndarray:
    return jnp.roll(x, -k, axis=-1)


def _first_marks(sk: jnp.ndarray) -> jnp.ndarray:
    b = sk.shape[0]
    return jnp.concatenate(
        [jnp.ones((b, 1), bool), sk[:, 1:] != sk[:, :-1]], axis=-1
    )


def _sort_back_b(pos: jnp.ndarray, payloads):
    out = lax.sort((pos,) + tuple(payloads), num_keys=1)
    return out[1:]


def byte_arrays_b(bufs: jnp.ndarray):
    """Batched ops/analyze.byte_arrays (elementwise + axis-local rolls)."""
    b = bufs.astype(jnp.int32)
    prev1 = _rollr(b, 1)
    prev2 = _rollr(b, 2)
    digit = (prev2 >= 48) & (prev2 <= 57)
    letter = ((prev2 | 32) >= 97) & ((prev2 | 32) <= 122)
    alnum2 = (digit | letter).astype(jnp.int32)
    cctx = (prev1 & 0x7F) | (alnum2 << 7)
    h2 = (b & 0x7F) | (cctx << 7)
    bu = bufs.astype(jnp.uint32)
    dw = (
        bu
        | _rolll(bu, 1) << 8
        | _rolll(bu, 2) << 16
        | _rolll(bu, 3) << 24
    )
    h23 = ((dw * jnp.uint32(2654435761)) >> jnp.uint32(8)).astype(jnp.int32) & 0x7FFFFF
    mkey = (cctx << 23) | h23
    from orz_tpu.ops.analyze import ByteArrays

    return ByteArrays(cctx, h2, mkey, dw)


# --- masked plan -------------------------------------------------------------


def _inverse_perm_b(sp: jnp.ndarray) -> jnp.ndarray:
    b, n = sp.shape
    return bscatter_set(
        jnp.zeros((b, n), jnp.int32), sp,
        jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (b, n)),
    )


def masked_plan_b(bufs: jnp.ndarray, seg_lens: jnp.ndarray) -> MaskedPlan:
    """Batched ops/analyze.masked_plan (per-segment sorted layouts)."""
    bsz, n = bufs.shape
    end = (PAD_FRONT + seg_lens)[:, None]
    x = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (bsz, n))
    valid = (x >= PAD_FRONT) & (x < end)
    ba = byte_arrays_b(bufs)

    rows_h2 = (x >= PAD_FRONT - 2) & (x < end)
    b32 = bufs.astype(jnp.int32)
    val_at = _rolll(b32, 1) | _rolll(b32, 2) << 8
    k = jnp.where(rows_h2, ba.h2, jnp.int32(0x7FFFFFFF))
    sk, sp_h2, sval_h2 = lax.sort((k, x, val_at), num_keys=2)
    first_h2 = _first_marks(sk)

    kc = jnp.where(valid, ba.cctx, jnp.int32(0x7FFFFFFF))
    skc, sp_ctx = lax.sort((kc, x), num_keys=2)
    first_ctx = _first_marks(skc)

    mk = jnp.where(valid, ba.mkey, jnp.int32(0x7FFFFFFF))
    dws = [_rolll(ba.dw, 4 * t).astype(jnp.int32) for t in range(N_DW)]
    sorted_all = lax.sort((mk, x) + tuple(dws), num_keys=2)
    msk, msp = sorted_all[:2]
    dw_s = tuple(a.astype(jnp.uint32) for a in sorted_all[2:])

    return MaskedPlan(
        sp_h2, sval_h2, first_h2, _inverse_perm_b(sp_h2),
        sp_ctx, first_ctx, _inverse_perm_b(sp_ctx),
        msk, msp, dw_s, _inverse_perm_b(msp),
    )


# --- word predictions / context counts --------------------------------------


def _words1_scan_b(first, sp, sval, supd):
    """Batched ops/analyze._words1_scan (segmented newest-3 trail)."""
    neg = jnp.full(sp.shape, -1, jnp.int32)
    zero = jnp.zeros(sp.shape, jnp.int32)
    leaf_u = jnp.where(supd == 1, sp, -1)
    leaf_v = jnp.where(supd == 1, sval, 0)

    def op(l, r):
        fl, l1u, l1v, l2u, l2v, l3u, l3v = l
        fr, r1u, r1v, r2u, r2v, r3u, r3v = r
        c1 = r1u >= 0
        c2 = r2u >= 0
        c3 = r3u >= 0
        m1u = jnp.where(c1, r1u, l1u)
        m1v = jnp.where(c1, r1v, l1v)
        m2u = jnp.where(c2, r2u, jnp.where(c1, l1u, l2u))
        m2v = jnp.where(c2, r2v, jnp.where(c1, l1v, l2v))
        m3u = jnp.where(c3, r3u, jnp.where(c2, l1u, jnp.where(c1, l2u, l3u)))
        m3v = jnp.where(c3, r3v, jnp.where(c2, l1v, jnp.where(c1, l2v, l3v)))
        return (
            fl | fr,
            jnp.where(fr, r1u, m1u), jnp.where(fr, r1v, m1v),
            jnp.where(fr, r2u, m2u), jnp.where(fr, r2v, m2v),
            jnp.where(fr, r3u, m3u), jnp.where(fr, r3v, m3v),
        )

    _, u1, v1, u2, v2, u3, v3 = lax.associative_scan(
        op, (first, leaf_u, leaf_v, neg, zero, neg, zero), axis=1
    )
    lim = sp - 2
    return jnp.where(
        u1 <= lim, jnp.where(u1 >= 0, v1, 0),
        jnp.where(u2 <= lim, jnp.where(u2 >= 0, v2, 0),
                  jnp.where((u3 <= lim) & (u3 >= 0), v3, 0)),
    )


def word_predictions_masked_planned_b(plan: MaskedPlan, end: jnp.ndarray,
                                      mask: jnp.ndarray) -> jnp.ndarray:
    """Batched ops/analyze.word_predictions_masked_planned.  end: (B, 1)."""
    bsz, n = mask.shape
    x = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (bsz, n))
    upd_ok = (x >= PAD_FRONT - 2) & (x < end) & _rolll(mask, 3)
    upd = upd_ok.astype(jnp.int32)
    _, supd = lax.sort((plan.dest_h2, upd), num_keys=1)
    pred_s = _words1_scan_b(plan.first_h2, plan.sp_h2, plan.sval_h2, supd)
    (pred_at_x,) = _sort_back_b(plan.sp_h2, (pred_s,))
    pred = _rollr(pred_at_x, 1)
    return jnp.where((x >= PAD_FRONT) & (x < end), pred, 0)


def word_predictions_b(ba, bufs: jnp.ndarray, end: jnp.ndarray) -> jnp.ndarray:
    """Batched ops/analyze.word_predictions (unmasked, front program)."""
    bsz, n = bufs.shape
    x = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (bsz, n))
    valid_x = (x >= PAD_FRONT - 1) & (x < end)
    b32 = bufs.astype(jnp.int32)
    val_at = _rolll(b32, 1) | _rolll(b32, 2) << 8

    k = jnp.where(valid_x, ba.h2, jnp.int32(0x7FFFFFFF))
    sk, sp, sval = lax.sort((k, x, val_at), num_keys=2)

    def shift_dn(arr, j, fill):
        pad = jnp.full((bsz, j), fill, arr.dtype)
        return jnp.concatenate([pad, arr[:, :-j]], axis=-1)

    same1 = shift_dn(sk, 1, -1) == sk
    same2 = shift_dn(sk, 2, -1) == sk
    p1 = jnp.where(same1, shift_dn(sp, 1, -1), -1)
    p2 = jnp.where(same2, shift_dn(sp, 2, -1), -1)
    v1 = shift_dn(sval, 1, 0)
    v2 = shift_dn(sval, 2, 0)
    use2 = p1 > sp - 2
    u = jnp.where(use2, p2, p1)
    uval = jnp.where(use2, v2, v1)
    pred_s = jnp.where(u >= PAD_FRONT, uval, 0)
    (pred_at_x,) = _sort_back_b(sp, (pred_s,))
    pred = _rollr(pred_at_x, 1)
    return jnp.where((x >= PAD_FRONT) & (x < end), pred, 0)


def _seg_add(a, b):
    fa, va = a
    fb, vb = b
    return fa | fb, jnp.where(fb, vb, va + vb)


def context_ranks_b(ba, valid: jnp.ndarray) -> jnp.ndarray:
    """Batched ops/analyze.context_ranks."""
    bsz, n = valid.shape
    x = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (bsz, n))
    k = jnp.where(valid, ba.cctx, jnp.int32(0x7FFFFFFF))
    sk, sp = lax.sort((k, x), num_keys=2)
    first = _first_marks(sk)
    gstart = lax.cummax(jnp.where(first, x, 0), axis=1)
    rank_s = x - gstart
    (rank,) = _sort_back_b(sp, (rank_s,))
    return jnp.where(valid, rank, 0)


def masked_context_counts_planned_b(plan: MaskedPlan, valid: jnp.ndarray,
                                    mask: jnp.ndarray) -> jnp.ndarray:
    """Batched ops/analyze.masked_context_counts_planned."""
    _, sm = lax.sort(
        (plan.dest_ctx, (mask & valid).astype(jnp.int32)), num_keys=1
    )
    _, incl = lax.associative_scan(_seg_add, (plan.first_ctx, sm), axis=1)
    excl = incl - sm
    (scnt,) = _sort_back_b(plan.sp_ctx, (excl,))
    return jnp.where(valid, scnt, 0)


# --- analysis ---------------------------------------------------------------


def _gather_dwords_b(dw: jnp.ndarray, base: jnp.ndarray, offset: int):
    return bgather(dw, base + offset)


def _lcp_round_b(dw, qb, pb, width):
    """Batched ops/analyze._lcp_round (flat per-dword gathers)."""

    def partial_bytes(v):
        b0 = (v & 0xFF) == 0
        b1 = (v & 0xFFFF) == 0
        b2 = (v & 0xFFFFFF) == 0
        return b0.astype(jnp.int32) + (b0 & b1) + (b0 & b1 & b2)

    xors = [
        _gather_dwords_b(dw, qb, 4 * t) ^ _gather_dwords_b(dw, pb, 4 * t)
        for t in range(width // 4)
    ]
    lcp = jnp.full(xors[0].shape, width, jnp.int32)
    for t in range(len(xors) - 1, -1, -1):
        lcp = jnp.where(xors[t] != 0, 4 * t + partial_bytes(xors[t]), lcp)
    return lcp, lcp >= width


def analyze_b(bufs: jnp.ndarray, seg_lens: jnp.ndarray, depth: int,
              mask: jnp.ndarray | None, words_mode: bool = False,
              plan: MaskedPlan | None = None,
              ro_cap: int | None = None) -> Analysis:
    """Batched ops/analyze._analyze — same staging, flat-index data
    movement.  bufs (B, n) uint8; mask (B, n) bool or None."""
    bsz, n = bufs.shape
    end = (PAD_FRONT + seg_lens)[:, None]
    p = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (bsz, n))
    valid = (p >= PAD_FRONT) & (p < end)

    ba = byte_arrays_b(bufs)
    if words_mode:
        assert plan is not None
        pred = word_predictions_masked_planned_b(plan, end, mask)
    else:
        pred = word_predictions_b(ba, bufs, end)
    b32 = bufs.astype(jnp.int32)
    cur_word = b32 | _rolll(b32, 1) << 8
    wordmatch = cur_word == pred

    if mask is None:
        rank = context_ranks_b(ba, valid)
    else:
        assert plan is not None
        rank = masked_context_counts_planned_b(plan, valid, mask)

    if plan is not None:
        _, rank_s, mask_si = lax.sort(
            (plan.dest_cand, rank, mask.astype(jnp.int32)), num_keys=1
        )
        msk, msp = plan.msk, plan.msp
        dw_s = list(plan.dw_s)
        mask_s = mask_si
    else:
        mk = jnp.where(valid, ba.mkey, jnp.int32(0x7FFFFFFF))
        dws = [_rolll(ba.dw, 4 * k).astype(jnp.int32) for k in range(N_DW)]
        extra = () if mask is None else (mask.astype(jnp.int32),)
        sorted_all = lax.sort(
            (mk, p, rank) + tuple(dws) + extra, num_keys=2
        )
        msk, msp, rank_s = sorted_all[:3]
        dw_s = [a.astype(jnp.uint32) for a in sorted_all[3 : 3 + N_DW]]
        mask_s = sorted_all[3 + N_DW] if mask is not None else None

    from orz_tpu.device.spec import OTZ2_NEAR, OTZ2_RO_CAP
    from orz_tpu.ops.match_pallas import match_depth_pallas

    ro_cap_near = None
    if ro_cap is None:
        ro_cap = OTZ2_RO_CAP if mask is not None else RING
    elif mask is not None and ro_cap > OTZ2_RO_CAP:
        ro_cap_near = OTZ2_RO_CAP

    kern = partial(
        match_depth_pallas, depth=depth, ro_cap=ro_cap,
        ro_cap_near=ro_cap_near,
        near_depth=(OTZ2_NEAR if mask is not None and depth > OTZ2_NEAR
                    else 0),
    )
    dw_stack = jnp.stack(dw_s, axis=1)  # (B, N_DW, n)
    if mask_s is None:
        best_q_s, best_ro_s, best_len_s = jax.vmap(
            lambda mk_, mp_, rk_, dws_, e_: kern(
                mk_, mp_, rk_, tuple(dws_), e_
            )
        )(msk, msp, rank_s, dw_stack, end[:, 0])
    else:
        best_q_s, best_ro_s, best_len_s = jax.vmap(
            lambda mk_, mp_, rk_, dws_, e_, ms_: kern(
                mk_, mp_, rk_, tuple(dws_), e_, mask_s=ms_
            )
        )(msk, msp, rank_s, dw_stack, end[:, 0], mask_s)

    best_q, best_ro, lcp_best = _sort_back_b(
        msp, (best_q_s, best_ro_s, best_len_s)
    )
    cap_back = jnp.minimum(
        FENCE - ((p - PAD_FRONT) & (FENCE - 1)), end - p
    ).astype(jnp.int32)

    # extension (see ops/analyze.py stages): chain stitching + exact tails
    cur = lcp_best
    full = (lcp_best >= LCP0) & (cap_back > LCP0) & (best_q >= 0)
    link = full & (_rolll(best_q, LCP0) == best_q + LCP0)
    alive = full & ~link

    k_a = max(1024, n // 64)
    _, alive_first = lax.sort(
        ((~alive).astype(jnp.int32), p), num_keys=2
    )
    alive_first = jnp.concatenate(
        [alive_first,
         n + jnp.broadcast_to(jnp.arange(k_a, dtype=jnp.int32), (bsz, k_a))],
        axis=-1,
    )
    n_alive = alive.sum(axis=-1)  # (B,)

    def _chunk_body(sub_p, cur, alive_in, first_round, last_round):
        """Extend the alive_first entries `sub_p` over rounds
        [first_round, last_round) — STRAIGHT-LINE (dead lanes are masked,
        not skipped): on this runtime a dynamic while round costs ~100x its
        arithmetic, so static rounds win whenever most lanes die early."""
        sub_pc = jnp.clip(sub_p, 0, n - 1)
        sub_q = bgather(best_q, sub_pc)
        scur = bgather(cur, sub_pc)
        sub_cap = bgather(cap_back, sub_pc)
        salive = bgather(alive_in.astype(jnp.int32), sub_pc).astype(
            bool
        ) & (sub_p < n)
        for _k in range(first_round, last_round):
            qb = jnp.where(salive, sub_q + scur, 0)
            pb = jnp.where(salive, sub_pc + scur, 0)
            lcp, full_w = _lcp_round_b(ba.dw, qb, pb, EXT_W)
            scur = jnp.where(salive, scur + lcp, scur)
            scur = jnp.minimum(scur, sub_cap)
            salive = salive & full_w & (scur < sub_cap)
        return scur, salive

    def _stage(cur, alive_in, alive_out, k_sub, first_round, last_round,
               n_fast=1):
        def one_chunk(c, cur, aout):
            sub_p = lax.dynamic_slice_in_dim(alive_first, c * k_sub, k_sub,
                                             axis=1)
            sub_cur, sub_alive = _chunk_body(sub_p, cur, alive_in,
                                             first_round, last_round)
            cur = bscatter_set(cur, sub_p, sub_cur)
            if aout is not None:
                aout = bscatter_set(
                    aout.astype(jnp.int32), sub_p, sub_alive.astype(jnp.int32)
                ).astype(bool)
            return cur, aout

        def fast(cur, aout):
            for c in range(n_fast):
                cur, aout = one_chunk(jnp.int32(c), cur, aout)
            return cur, aout

        def general(cur, aout):
            def chunk_cond(carry):
                return carry[0] * k_sub < n_alive.max()

            def chunk_body(carry):
                c, cur, aout = carry
                cur, aout = one_chunk(c, cur, aout)
                return c + 1, cur, aout

            _, cur, aout = lax.while_loop(
                chunk_cond, chunk_body, (jnp.int32(0), cur, aout)
            )
            return cur, aout

        return lax.cond(n_alive.max() <= n_fast * k_sub, fast, general,
                        cur, alive_out)

    import os as _os

    n_rounds = -(-(LZ_MATCH_MAX_LEN - LCP0) // EXT_W)
    if _os.environ.get("OTZ_ABLATE_EXT"):  # timing ablation only: wrong
        pass  # lengths for >LCP0 matches; never use for real encodes
    else:
        alive_b = jnp.zeros((bsz, n), bool)
        cur, alive_b = _stage(cur, alive, alive_b, k_a, 0, 1, n_fast=2)
        # stage B: wide chunks beat many narrow ones here — op COUNT is the
        # cost (wide elementwise ops are nearly free), so 2 x k_a chunks
        # replace the old 8 x k_a/4 at 1/4 the straight-line op count
        cur, _ = _stage(cur, alive_b, None, k_a, 1, n_rounds, n_fast=2)

    for _ in range(-(-LZ_MATCH_MAX_LEN // LCP0)):
        cur = jnp.where(link, LCP0 + _rolll(cur, LCP0), cur)

    blen = jnp.minimum(cur, LZ_MATCH_MAX_LEN)
    has = (
        (best_q >= 0)
        & (blen >= min_match_len_for_ro(best_ro))
        & valid
    )
    bestlen = jnp.where(has, blen, 0)
    bestro = jnp.where(has, best_ro, 0)
    bestq = jnp.where(has, best_q, 0)
    return Analysis(ba.cctx, rank, pred, wordmatch, bestlen, bestro, bestq)


# --- parse (decisions / walk / fields) --------------------------------------


def decisions_b(an: Analysis, seg_lens: jnp.ndarray, n: int):
    """Batched ops/parse.decisions (elementwise + axis-local rolls)."""
    from orz_tpu.device.spec import (
        LAZY_LEN_CAP,
        LZ_MATCH_MIN_LEN,
        ROBITS_CHEAP,
    )
    from orz_tpu.ops.parse import Decisions, roid_of_ro

    bsz = an.bestlen.shape[0]
    p = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (bsz, n))
    end = (PAD_FRONT + seg_lens)[:, None]
    is_m = an.bestlen >= LZ_MATCH_MIN_LEN
    _, robitlen, _ = roid_of_ro(an.bestro)
    lazy_len1 = an.bestlen + 1 + (robitlen < ROBITS_CHEAP)
    bl1 = _rolll(an.bestlen, 1)
    bl2 = _rolll(an.bestlen, 2)
    short = an.bestlen < LAZY_LEN_CAP
    lazy1 = is_m & short & (bl1 >= lazy_len1)
    lazy2 = is_m & short & (bl2 >= lazy_len1 - an.wordmatch.astype(jnp.int32))
    m_emit = is_m & ~lazy1 & ~lazy2
    fence_room = (FENCE - ((p - PAD_FRONT) & (FENCE - 1))) >= 2
    w_emit = ~m_emit & an.wordmatch & ~lazy1 & (p + 2 <= end) & fence_room
    kind = jnp.where(m_emit, 2, jnp.where(w_emit, 1, 0)).astype(jnp.int32)
    length = jnp.where(m_emit, an.bestlen,
                       jnp.where(w_emit, 2, 1)).astype(jnp.int32)
    nxt = jnp.minimum(p + length, end).astype(jnp.int32)
    return Decisions(kind, length, nxt)


def walk_items_b(nxt: jnp.ndarray, seg_lens: jnp.ndarray, n: int):
    """Batched ops/parse.walk_items: the per-step gather over the lockstep
    fence blocks runs as ONE flat 1-d gather across all B segments (the
    vmapped 2-d gather per step was the single hottest cost of the vmapped
    iteration scan — ~2 s/iteration at B=4, 2 MiB)."""
    from orz_tpu.ops.parse import WALK_CHUNK

    bsz = nxt.shape[0]
    m = n - PAD_FRONT
    n_blocks = -(-m // FENCE)
    end = (PAD_FRONT + seg_lens)[:, None]  # (B, 1)
    base = jnp.broadcast_to(
        PAD_FRONT + FENCE * jnp.arange(n_blocks, dtype=jnp.int32),
        (bsz, n_blocks),
    )
    blk_end = jnp.minimum(base + FENCE, end)

    def step(cur, _):
        active = cur < blk_end
        rec_t = jnp.where(active, cur, end)
        nxtv = bgather(nxt, cur)
        return jnp.where(active, nxtv, cur), rec_t

    def run_chunk(cur):
        return lax.scan(step, cur, None, length=WALK_CHUNK)

    def skip_chunk(cur):
        return cur, jnp.broadcast_to(
            end[None, :, :], (WALK_CHUNK, bsz, n_blocks)
        )

    cur = base
    recs = []
    for _ in range(FENCE // WALK_CHUNK):
        cur, rec = lax.cond(jnp.any(cur < blk_end), run_chunk, skip_chunk,
                            cur)
        recs.append(rec)
    rec = jnp.concatenate(recs, axis=0)  # (FENCE, B, n_blocks)

    flat = rec.transpose(1, 2, 0).reshape(bsz, n_blocks * FENCE)
    starts = lax.sort(flat)
    n_items = (starts < end).sum(axis=-1).astype(jnp.int32)
    if flat.shape[1] >= m:
        starts = starts[:, :m]
    else:
        starts = jnp.concatenate(
            [starts,
             jnp.full((bsz, m - flat.shape[1]), 1 << 30, jnp.int32)],
            axis=-1,
        )
    return starts, n_items


def pack_fields_b(an: Analysis, dec, bufs: jnp.ndarray) -> jnp.ndarray:
    """Batched ops/parse.pack_fields (pure elementwise)."""
    lob = jnp.where(dec.kind == 2, dec.length, bufs.astype(jnp.int32))
    return (
        dec.kind
        | (lob << 2)
        | (an.cctx << 10)
        | ((an.pred & 0xFF) << 18)
    )


# --- pipeline bodies ---------------------------------------------------------


def mask_from_starts_b(starts, n_items, n: int):
    """(B, m) starts -> (B, n) bool mask (one flat scatter)."""
    bsz = starts.shape[0]
    valid = (
        jnp.arange(starts.shape[1], dtype=jnp.int32)[None, :]
        < n_items[:, None]
    )
    idx = jnp.where(valid, starts, n)
    return bscatter_set(
        jnp.zeros((bsz, n), jnp.int32), idx, jnp.ones_like(idx)
    ).astype(bool)


def front_body_b(bufs: jnp.ndarray, seg_lens: jnp.ndarray, depth: int):
    """Batched device/pipeline._front_body (+ the start mask, which seeds
    the OTZ2 iteration scan without an extra scatter)."""
    from orz_tpu.ops.walk_pallas import walk_items_pallas

    n = bufs.shape[1]
    an = analyze_b(bufs, seg_lens, depth, None)
    dec = decisions_b(an, seg_lens, n)
    starts, n_items, mask = walk_items_pallas(dec.nxt, seg_lens, n)
    pk1 = pack_fields_b(an, dec, bufs)
    return starts, n_items, pk1, an.bestq, an.bestro, bufs, mask


def iter2_mask_step_b(bufs, seg_lens, depth: int, mask_prev, plan):
    """One masked re-parse, mask-in / mask-out: the iteration scan's fast
    carry (no start sort, no mask scatter — the walk kernel emits the mask
    tile directly)."""
    from orz_tpu.ops.walk_pallas import walk_mask_pallas

    n = bufs.shape[1]
    an = analyze_b(bufs, seg_lens, depth, mask_prev, words_mode=True,
                   plan=plan)
    dec = decisions_b(an, seg_lens, n)
    mask, n_items = walk_mask_pallas(dec.nxt, seg_lens, n)
    return mask, n_items


def iter2_full_step_b(bufs, seg_lens, depth: int, mask_prev, plan):
    """Masked re-parse emitting sorted starts + packed fields + the new
    mask (for the final iterates, which mid2 consumes)."""
    from orz_tpu.ops.walk_pallas import walk_items_pallas

    n = bufs.shape[1]
    an = analyze_b(bufs, seg_lens, depth, mask_prev, words_mode=True,
                   plan=plan)
    dec = decisions_b(an, seg_lens, n)
    starts, n_items, mask = walk_items_pallas(dec.nxt, seg_lens, n)
    return starts, n_items, pack_fields_b(an, dec, bufs), mask


def iter2_step_b(bufs, seg_lens, depth: int, starts_prev, n_items_prev,
                 plan):
    """Batched device/pipeline._iter2_step (one masked re-parse), from
    sorted starts (compat wrapper over the mask-carry steps)."""
    n = bufs.shape[1]
    mask = mask_from_starts_b(starts_prev, n_items_prev, n)
    st, ni, pk, _ = iter2_full_step_b(bufs, seg_lens, depth, mask, plan)
    return st, ni, pk


def conform_mask_b(bufs, seg_lens, depth: int, mask, plan):
    """Full-ring conform analysis from a position mask."""
    from orz_tpu.device.spec import OTZ2_CONFORM_CAP

    an2 = analyze_b(bufs, seg_lens, depth, mask, words_mode=True, plan=plan,
                    ro_cap=OTZ2_CONFORM_CAP)
    return an2.bestq, an2.bestlen


def conform_body_b(bufs, seg_lens, depth: int, starts, n_items, plan):
    """Batched device/pipeline._conform_body (full-ring conform analysis)."""
    mask = mask_from_starts_b(starts, n_items, bufs.shape[1])
    return conform_mask_b(bufs, seg_lens, depth, mask, plan)


# --- item-space helpers (batched ops/otz2.py) -------------------------------


def _expand_b(start, kind, q, head_len, tail_len, n_items):
    """Batched ops/otz2._expand (head + tail-literal rewrite)."""
    bsz, mc = start.shape
    idx = jnp.broadcast_to(jnp.arange(mc, dtype=jnp.int32), (bsz, mc))
    valid = idx < n_items[:, None]
    reps = jnp.where(valid, 1 + tail_len, 0)
    off = jnp.cumsum(reps, axis=1) - reps
    total = (off[:, -1] + reps[:, -1]).astype(jnp.int32)

    offc = jnp.where(valid, off, mc)
    owner = bscatter_max(
        jnp.zeros((bsz, mc + 1), jnp.int32), offc, jnp.where(valid, idx, 0)
    )[:, :mc]
    owner = lax.cummax(owner, axis=1)
    o_start = bgather(start, owner)
    o_hlen = bgather(head_len, owner)
    within = idx - bgather(off, owner)
    is_head = within == 0
    start2 = jnp.where(is_head, o_start, o_start + o_hlen + within - 1)
    kind2 = jnp.where(is_head, bgather(kind, owner), 0)
    len2 = jnp.where(is_head, bgather(head_len, owner), 1)
    q2 = jnp.where(is_head & (kind2 == 2), bgather(q, owner), 0)
    live = idx < total[:, None]
    return (
        jnp.where(live, start2, 0x7FFFFFFE),
        jnp.where(live, kind2, 0),
        jnp.where(live, len2, 0),
        jnp.where(live, q2, 0),
        total,
    )


def _ranks_and_membership_b(start, kind, q, pk1, n_items):
    """Batched ops/otz2._ranks_and_membership."""
    bsz, mc = start.shape
    idx = jnp.broadcast_to(jnp.arange(mc, dtype=jnp.int32), (bsz, mc))
    valid = idx < n_items[:, None]
    cctx = (bgather(pk1, jnp.where(valid, start, 0)) >> 10) & 0xFF

    key = jnp.where(valid, cctx, 0x7FFF)
    sk, si = lax.sort((key, idx), num_keys=2)
    first = _first_marks(sk)
    gstart = lax.cummax(jnp.where(first, idx, 0), axis=1)
    srank = bscatter_set(jnp.zeros((bsz, mc), jnp.int32), si, idx - gstart)

    is_m = (kind == 2) & valid
    q_key = jnp.where(is_m, q, jnp.int32(0x7FFFFFFF))
    skey = jnp.concatenate(
        [jnp.where(valid, start, 0x7FFFFFFE), q_key], axis=1
    )
    srole = jnp.concatenate(
        [jnp.zeros((bsz, mc), jnp.int32), jnp.ones((bsz, mc), jnp.int32)],
        axis=1,
    )
    spay = jnp.concatenate([idx, idx], axis=1)
    _, o_role, o_pay = lax.sort((skey, srole, spay), num_keys=2)
    last_item = lax.cummax(jnp.where(o_role == 0, o_pay, -1), axis=1)
    qslot = jnp.where(o_role == 1, o_pay, mc)
    cand = bscatter_max(
        jnp.zeros((bsz, mc + 1), jnp.int32), qslot, jnp.maximum(last_item, 0)
    )[:, :mc]
    hit = is_m & (bgather(start, cand) == q)
    ro = jnp.where(hit, srank - bgather(srank, cand) - 1, 0)
    return srank, hit, ro, cand


def _h2_at_b(pk1, bufs, x):
    cctx = (bgather(pk1, x) >> 10) & 0xFF
    return (bgather(bufs, x).astype(jnp.int32) & 0x7F) | (cctx << 7)


def _pred_at_items_b(start, kind, length, pk1, bufs, n_items):
    """Batched ops/otz2._pred_at_items (decoder-exact word predictions)."""
    bsz, mc = start.shape
    n = bufs.shape[1]
    idx = jnp.broadcast_to(jnp.arange(mc, dtype=jnp.int32), (bsz, mc))
    valid = idx < n_items[:, None]
    s = jnp.where(valid, start, 0)
    e = jnp.clip(s + length, 0, n - 1)

    ukey = jnp.where(valid & (kind != 1), _h2_at_b(pk1, bufs, e - 3),
                     jnp.int32(0x7FFFFFFF))
    uval = (bgather(bufs, jnp.clip(e - 2, 0, n - 1)).astype(jnp.int32)
            | bgather(bufs, jnp.clip(e - 1, 0, n - 1)).astype(jnp.int32) << 8)
    qkey = jnp.where(valid, _h2_at_b(pk1, bufs, jnp.maximum(s - 1, 0)),
                     jnp.int32(0x7FFFFFFF))

    upos = jnp.where(valid & (kind != 1), e, jnp.int32(0x3FFFFFFF))
    key2 = jnp.concatenate([(upos << 1), (s << 1) | 1], axis=1)
    key1 = jnp.concatenate([ukey, qkey], axis=1)
    pay = jnp.concatenate([uval, idx], axis=1)
    k1, k2, p_ = lax.sort((key1, key2, pay), num_keys=2)
    is_q = (k2 & 1) == 1
    first = _first_marks(k1)

    def op(a, b):
        fa, ha, va = a
        fb, hb, vb = b
        return (
            fa | fb,
            jnp.where(fb, hb, ha | hb),
            jnp.where(fb, vb, jnp.where(hb == 1, vb, va)),
        )

    has = jnp.where(is_q, 0, 1)
    _, hasv, lastv = lax.associative_scan(
        op, (first, has, jnp.where(is_q, 0, p_)), axis=1
    )
    val = jnp.where(hasv == 1, lastv, 0)
    qslot = jnp.where(is_q, p_, mc)
    return bscatter_max(
        jnp.zeros((bsz, mc + 1), jnp.int32), qslot, val
    )[:, :mc]


def _rep0_b(start, kind, q, n_items):
    bsz, mc = start.shape
    idx = jnp.broadcast_to(jnp.arange(mc, dtype=jnp.int32), (bsz, mc))
    valid = idx < n_items[:, None]
    is_m = (kind == 2) & valid
    dist = jnp.where(is_m, start - q, 0)
    last_match = lax.cummax(jnp.where(is_m, idx, -1), axis=1)
    prev_match = jnp.concatenate(
        [jnp.full((bsz, 1), -1, jnp.int32), last_match[:, :-1]], axis=1
    )
    prev_dist = jnp.where(
        prev_match >= 0, bgather(dist, jnp.clip(prev_match, 0, mc - 1)), 0
    )
    return is_m & (dist == prev_dist) & (prev_dist > 0)


def conform_repair_b(starts, n_items, pk1, bestq2, bestlen2, bufs, seg_lens,
                     repair_passes: int = 6, words_mode: bool = False):
    """Batched ops/otz2.conform_repair.  starts (B, m2_cap), pk1/bufs
    (B, n); returns per-segment ok flags (B,)."""
    from orz_tpu.device.spec import LZ_MATCH_MIN_LEN

    bsz, mc = starts.shape
    idx = jnp.broadcast_to(jnp.arange(mc, dtype=jnp.int32), (bsz, mc))
    valid = idx < n_items[:, None]
    start = jnp.where(valid, starts, 0)

    f = bgather(pk1, start)
    kind = jnp.where(valid, f & 3, 0)
    lob = (f >> 2) & 0xFF
    length = jnp.where(
        valid, jnp.where(kind == 2, lob, jnp.where(kind == 1, 2, 1)), 0
    )

    is_m = kind == 2
    q2 = jnp.where(is_m, bgather(bestq2, start), 0)
    bl2 = jnp.where(is_m, bgather(bestlen2, start), 0)
    has = is_m & (bl2 >= LZ_MATCH_MIN_LEN)
    new_len = jnp.where(has, jnp.minimum(length, bl2), length)
    demote = is_m & ~has
    head_kind = jnp.where(demote, 0, kind)
    head_len = jnp.where(demote, 1, new_len)
    tail_len = jnp.where(is_m, length - head_len, 0)

    start, kind, length, q, n2 = _expand_b(
        start, head_kind, q2, head_len, tail_len, n_items
    )
    ok = n2 <= mc

    n = bufs.shape[1]

    def violations(start, kind, length, q, n2):
        rep0 = _rep0_b(start, kind, q, n2)
        srank, hit, ro, _ = _ranks_and_membership_b(start, kind, q, pk1, n2)
        live = (
            jnp.arange(mc, dtype=jnp.int32)[None, :] < n2[:, None]
        )
        viol = (kind == 2) & live & ~rep0 & (~hit | (ro >= RING))
        predi = jnp.zeros((bsz, mc), jnp.int32)
        if words_mode:
            predi = _pred_at_items_b(start, kind, length, pk1, bufs, n2)
            sc = jnp.where(live, start, 0)
            pair = (bgather(bufs, sc).astype(jnp.int32)
                    | bgather(bufs, jnp.clip(sc + 1, 0, n - 1)).astype(
                        jnp.int32) << 8)
            viol = viol | ((kind == 1) & live & (predi != pair))
        return viol, rep0, hit, ro, predi

    def pass_body(state):
        start, kind, length, q, n2, ok, _ = state
        viol, _, _, _, _ = violations(start, kind, length, q, n2)
        any_viol = viol.any()

        def do_demote(args):
            start, kind, length, q, n2 = args
            hk = jnp.where(viol, 0, kind)
            hl = jnp.where(viol, 1, length)
            tl = jnp.where(viol, length - 1, 0)
            return _expand_b(start, hk, q, hl, tl, n2)

        def no_demote(args):
            start, kind, length, q, n2 = args
            return start, kind, length, q, n2

        start, kind, length, q, n2 = lax.cond(
            any_viol, do_demote, no_demote, (start, kind, length, q, n2)
        )
        return start, kind, length, q, n2, ok & (n2 <= mc), any_viol

    state = (start, kind, length, q, n2, ok, jnp.bool_(True))
    for _ in range(repair_passes):
        state = lax.cond(
            state[6] & state[5].any(), pass_body, lambda s: s, state
        )
    start, kind, length, q, n2, ok, _ = state

    resid, rep0, hit, ro, predi = violations(start, kind, length, q, n2)
    ok = ok & ~resid.any(axis=1)
    ro = jnp.where((kind == 2) & ~rep0 & hit, ro, 0)
    return start, kind, length, q, rep0, ro, predi, n2, ok


def emit_items2_b(start, kind, length, q, rep0, ro, n_items, pk1, bufs,
                  seg_lens, predi=None):
    """Batched ops/otz2.emit_items2."""
    from orz_tpu.device.spec import (
        LZ_LENID_SIZE,
        LZ_MATCH_MIN_LEN,
        NEG_EML_BASE,
        NEG_EML_DEPTH,
        REP0_BASE,
        WORD_SYMBOL,
    )
    from orz_tpu.ops.parse import Items, roid_of_ro

    bsz, mc = start.shape
    end = (PAD_FRONT + seg_lens)[:, None]
    idx = jnp.broadcast_to(jnp.arange(mc, dtype=jnp.int32), (bsz, mc))
    valid = idx < n_items[:, None]
    startc = jnp.where(valid, start, 0)
    f = bgather(pk1, startc)
    cctx = (f >> 10) & 0xFF
    pred8 = (f >> 18) & 0xFF if predi is None else predi & 0xFF
    kind = jnp.where(valid, kind, 0)
    is_match = kind == 2

    after_literal = jnp.concatenate(
        [jnp.ones((bsz, 1), jnp.int32),
         (kind[:, :-1] == 0).astype(jnp.int32)], axis=1
    )
    roid, robitlen_all, robits_all = roid_of_ro(ro)
    robitlen = jnp.where(is_match & ~rep0, robitlen_all, 0)
    robits = jnp.where(is_match & ~rep0, robits_all, 0)

    q_key = jnp.where(is_match & valid, q, jnp.int32(0x7FFFFFFF))
    skey = jnp.concatenate(
        [jnp.where(valid, start, 0x7FFFFFFE), q_key], axis=1
    )
    srole = jnp.concatenate(
        [jnp.zeros((bsz, mc), jnp.int32), jnp.ones((bsz, mc), jnp.int32)],
        axis=1,
    )
    spay = jnp.concatenate([idx, idx], axis=1)
    slen = jnp.concatenate(
        [jnp.zeros((bsz, mc), jnp.int32), jnp.where(is_match, length, 0)],
        axis=1,
    )
    o_key, o_role, o_pay, o_len = lax.sort(
        (skey, srole, spay, slen), num_keys=2
    )
    last_item = lax.cummax(jnp.where(o_role == 0, o_pay, -1), axis=1)
    qslot = jnp.where(o_role == 1, o_pay, mc)
    cand = bscatter_max(
        jnp.zeros((bsz, mc + 1), jnp.int32), qslot,
        jnp.maximum(last_item, 0),
    )[:, :mc]
    candc = jnp.clip(cand, 0, mc - 1)
    hit = (bgather(startc, candc) == q) & is_match
    expected_q = jnp.where(
        hit & (bgather(kind, candc) == 2), bgather(length, candc), 0
    )
    first = jnp.concatenate([
        jnp.ones((bsz, 1), bool),
        (o_key[:, 1:] != o_key[:, :-1]) | (o_role[:, 1:] != o_role[:, :-1]),
    ], axis=1)

    def _seg_max(a, b):
        fa, ma = a
        fb, mb = b
        return fa | fb, jnp.where(fb, mb, jnp.maximum(ma, mb))

    _, incl = lax.associative_scan(_seg_max, (first, o_len), axis=1)
    excl = jnp.where(
        first, 0,
        jnp.concatenate([jnp.zeros((bsz, 1), jnp.int32), incl[:, :-1]],
                        axis=1),
    )
    prev_max_l = bscatter_max(
        jnp.zeros((bsz, mc + 1), jnp.int32), qslot,
        jnp.where(o_role == 1, excl, 0),
    )[:, :mc]
    len_min_q = jnp.where(prev_max_l > 0, jnp.minimum(prev_max_l + 1, 127), 0)

    fence_room = jnp.minimum(
        FENCE - ((startc - PAD_FRONT) & (FENCE - 1)), end - startc
    )
    lm = jnp.minimum(jnp.maximum(len_min_q, LZ_MATCH_MIN_LEN), fence_room)
    ex = jnp.maximum(expected_q, LZ_MATCH_MIN_LEN)
    e_pred = jnp.where(
        length < lm,
        NEG_EML_BASE + (lm - 1 - length),
        jnp.where(
            length > ex, length - lm,
            jnp.where(length < ex, length - lm + 1, 0)
        ),
    )
    pred_ok = ~jnp.any(is_match & (lm - length > NEG_EML_DEPTH), axis=1)
    eml_raw = jnp.where(is_match, length - LZ_MATCH_MIN_LEN, 0)
    eml = jnp.where(is_match & pred_ok[:, None], e_pred, eml_raw)
    lenid = jnp.minimum(eml, LZ_LENID_SIZE - 1)
    symbol = jnp.where(
        is_match,
        jnp.where(rep0, REP0_BASE + lenid, 256 + roid * LZ_LENID_SIZE + lenid),
        jnp.where(kind == 1, WORD_SYMBOL, bgather(bufs, startc).astype(
            jnp.int32)),
    )
    sr_ctx = cctx | (after_literal << 8)
    return Items(
        jnp.where(valid, start, end), n_items, kind, length, symbol, sr_ctx,
        pred8, after_literal, robitlen, robits, eml, pred_ok,
    )


def build_items_b(starts, n_items, pk1, bestq, bestro, bufs, seg_lens):
    """Batched ops/parse.build_items (OTZ1 mid: item fields from starts)."""
    from orz_tpu.device.spec import (
        LZ_LENID_SIZE,
        LZ_MATCH_MIN_LEN,
        NEG_EML_BASE,
        NEG_EML_DEPTH,
        REP0_BASE,
        WORD_SYMBOL,
    )
    from orz_tpu.ops.parse import Items, roid_of_ro

    bsz, mc = starts.shape
    end = (PAD_FRONT + seg_lens)[:, None]
    idx = jnp.broadcast_to(jnp.arange(mc, dtype=jnp.int32), (bsz, mc))
    valid = idx < n_items[:, None]
    start = jnp.where(valid, starts, 0)

    f = bgather(pk1, start)
    kind = jnp.where(valid, f & 3, 0)
    lob = (f >> 2) & 0xFF
    length = jnp.where(
        valid, jnp.where(kind == 2, lob, jnp.where(kind == 1, 2, 1)), 0
    )
    cctx = (f >> 10) & 0xFF
    pred8 = (f >> 18) & 0xFF
    after_literal = jnp.concatenate(
        [jnp.ones((bsz, 1), jnp.int32),
         (kind[:, :-1] == 0).astype(jnp.int32)], axis=1
    )

    q_item = jnp.where(kind == 2, bgather(bestq, start), 0)
    dist = jnp.where(kind == 2, start - q_item, 0)
    last_match = lax.cummax(jnp.where(kind == 2, idx, -1), axis=1)
    prev_match = jnp.concatenate(
        [jnp.full((bsz, 1), -1, jnp.int32), last_match[:, :-1]], axis=1
    )
    prev_dist = jnp.where(
        prev_match >= 0, bgather(dist, jnp.clip(prev_match, 0, mc - 1)), 0
    )
    rep0 = (kind == 2) & (dist == prev_dist) & (prev_dist > 0)

    ro = jnp.where(kind == 2, bgather(bestro, start), 0)
    roid, robitlen_all, robits_all = roid_of_ro(ro)
    robitlen = jnp.where((kind == 2) & ~rep0, robitlen_all, 0)
    robits = jnp.where((kind == 2) & ~rep0, robits_all, 0)

    is_match = kind == 2
    q_key = jnp.where(is_match & valid, q_item, jnp.int32(0x7FFFFFFF))
    skey = jnp.concatenate(
        [jnp.where(valid, starts, 0x7FFFFFFE), q_key], axis=1
    )
    srole = jnp.concatenate(
        [jnp.zeros((bsz, mc), jnp.int32), jnp.ones((bsz, mc), jnp.int32)],
        axis=1,
    )
    spay = jnp.concatenate([idx, idx], axis=1)
    slen = jnp.concatenate(
        [jnp.zeros((bsz, mc), jnp.int32), jnp.where(is_match, length, 0)],
        axis=1,
    )
    o_key, o_role, o_pay, o_len = lax.sort(
        (skey, srole, spay, slen), num_keys=2
    )
    last_item = lax.cummax(jnp.where(o_role == 0, o_pay, -1), axis=1)
    qslot = jnp.where(o_role == 1, o_pay, mc)
    cand = bscatter_max(
        jnp.zeros((bsz, mc + 1), jnp.int32), qslot,
        jnp.maximum(last_item, 0),
    )[:, :mc]
    hit = (bgather(start, cand) == q_item) & is_match
    expected_q = jnp.where(
        hit & (bgather(kind, cand) == 2), bgather(length, cand), 0
    )

    first = jnp.concatenate([
        jnp.ones((bsz, 1), bool),
        (o_key[:, 1:] != o_key[:, :-1]) | (o_role[:, 1:] != o_role[:, :-1]),
    ], axis=1)

    def _seg_op(a, b):
        fa, ma = a
        fb, mb = b
        return fa | fb, jnp.where(fb, mb, jnp.maximum(ma, mb))

    _, incl = lax.associative_scan(_seg_op, (first, o_len), axis=1)
    excl = jnp.where(
        first, 0,
        jnp.concatenate([jnp.zeros((bsz, 1), jnp.int32), incl[:, :-1]],
                        axis=1),
    )
    prev_max_l = bscatter_max(
        jnp.zeros((bsz, mc + 1), jnp.int32), qslot,
        jnp.where(o_role == 1, excl, 0),
    )[:, :mc]
    len_min_q = jnp.where(prev_max_l > 0, jnp.minimum(prev_max_l + 1, 127), 0)

    fence_room = jnp.minimum(
        FENCE - ((start - PAD_FRONT) & (FENCE - 1)), end - start
    )
    lm = jnp.minimum(jnp.maximum(len_min_q, LZ_MATCH_MIN_LEN), fence_room)
    ex = jnp.maximum(expected_q, LZ_MATCH_MIN_LEN)
    e_pred = jnp.where(
        length < lm,
        NEG_EML_BASE + (lm - 1 - length),
        jnp.where(
            length > ex, length - lm,
            jnp.where(length < ex, length - lm + 1, 0)
        ),
    )
    pred_ok = ~jnp.any(is_match & (lm - length > NEG_EML_DEPTH), axis=1)
    eml_raw = jnp.where(kind == 2, length - LZ_MATCH_MIN_LEN, 0)
    eml = jnp.where(is_match & pred_ok[:, None], e_pred, eml_raw)
    lenid = jnp.minimum(eml, LZ_LENID_SIZE - 1)
    symbol = jnp.where(
        kind == 2,
        jnp.where(rep0, REP0_BASE + lenid, 256 + roid * LZ_LENID_SIZE + lenid),
        jnp.where(kind == 1, WORD_SYMBOL, lob),
    )
    sr_ctx = cctx | (after_literal << 8)
    return Items(
        jnp.where(valid, starts, end), n_items, kind, length, symbol, sr_ctx,
        pred8, after_literal, robitlen, robits, eml, pred_ok,
    )


# --- symrank / entropy / packing (batched back program) ---------------------


def plan_stats_b(sr_ctx, n_items):
    """Batched ops/symrank_pallas.plan_stats."""
    from orz_tpu.ops.symrank_pallas import C, C_MID

    bsz, m = sr_ctx.shape
    idx = jnp.broadcast_to(jnp.arange(m, dtype=jnp.int32), (bsz, m))
    ctx = jnp.where(idx < n_items[:, None], sr_ctx.astype(jnp.int32), C)
    cnt_g = bscatter_add(
        jnp.zeros((bsz, C + 1), jnp.int32), ctx,
        jnp.ones((bsz, m), jnp.int32),
    )[:, :C]
    c_sorted = -lax.sort(-cnt_g)
    return c_sorted[:, C_MID], c_sorted[:, 0]


def symrank_pallas_b(symbol, sr_unlikely, sr_ctx, n_items, init_perm,
                     r1_cap: int, rm_cap: int):
    """Batched ops/symrank_pallas.symrank_pallas: schedule construction via
    flat scatters; the phase kernels run under vmap (tile-local compute)."""
    from orz_tpu.ops.symrank_pallas import (
        C,
        C_MID,
        S,
        S_PAD,
        _phase_call,
    )

    bsz, m = symbol.shape
    idx = jnp.broadcast_to(jnp.arange(m, dtype=jnp.int32), (bsz, m))
    valid = idx < n_items[:, None]
    ctx = jnp.where(valid, sr_ctx.astype(jnp.int32), C)

    cnt_g = bscatter_add(
        jnp.zeros((bsz, C + 1), jnp.int32), ctx,
        jnp.ones((bsz, m), jnp.int32),
    )[:, :C]
    arange_c = jnp.broadcast_to(jnp.arange(C, dtype=jnp.int32), (bsz, C))
    neg_sorted, perm = lax.sort((-cnt_g, arange_c), num_keys=2)
    lane_of_ctx = bscatter_set(
        jnp.zeros((bsz, C), jnp.int32), perm, arange_c
    )
    r1 = -neg_sorted[:, C_MID]  # (B,)

    key = jnp.where(valid, ctx, C)
    sk, si = lax.sort((key, idx), num_keys=2)
    first = _first_marks(sk)
    gstart = lax.cummax(jnp.where(first, idx, 0), axis=1)
    r_item = bscatter_set(jnp.zeros((bsz, m), jnp.int32), si, idx - gstart)
    lane = bgather(lane_of_ctx, jnp.clip(ctx, 0, C - 1))

    pack = (
        symbol.astype(jnp.int32)
        | (sr_unlikely.astype(jnp.int32) << 9)
        | (1 << 17)
    )
    r1c = jnp.minimum(r1, r1_cap)  # (B,)
    in_w = valid & (r_item < r1c[:, None])
    flat_w = jnp.where(in_w, r_item * C + lane, r1_cap * C + idx)
    sched_w = bscatter_set(
        jnp.zeros((bsz, r1_cap * C), jnp.int32), flat_w, pack
    ).reshape(bsz, r1_cap, C)
    in_m = valid & (r_item >= r1c[:, None]) & (
        r_item - r1c[:, None] < rm_cap
    )
    flat_m = jnp.where(
        in_m, (r_item - r1c[:, None]) * C_MID + lane, rm_cap * C_MID + idx
    )
    sched_m = bscatter_set(
        jnp.zeros((bsz, rm_cap * C_MID), jnp.int32), flat_m, pack
    ).reshape(bsz, rm_cap, C_MID)

    va0 = jnp.concatenate(
        [
            jnp.broadcast_to(
                init_perm.astype(jnp.int32)[:, :, None], (bsz, S, C)
            ),
            jnp.full((bsz, S_PAD - S, C), S_PAD, jnp.int32),
        ],
        axis=1,
    )
    cnt0 = jnp.zeros((bsz, 1, C), jnp.int32)
    isum0 = jnp.full((bsz, 1, C), 1000000, jnp.int32)

    out_w, va1, cnt1, isum1 = jax.vmap(
        lambda s_, r_, v_, c_, i_: _phase_call(s_, r_, v_, c_, i_, C)
    )(sched_w, r1c, va0, cnt0, isum0)
    rm = jnp.maximum(
        jnp.max(jnp.where(valid, r_item + 1, 0), axis=1) - r1c, 0
    )
    out_m, _, _, _ = jax.vmap(
        lambda s_, r_, v_, c_, i_: _phase_call(s_, r_, v_, c_, i_, C_MID)
    )(sched_m, rm, va1, cnt1, isum1)

    w_rows = out_w.shape[1]
    m_rows = out_m.shape[1]
    codes_w = bgather(
        out_w.reshape(bsz, -1), jnp.clip(r_item, 0, w_rows - 1) * C + lane
    )
    codes_m = bgather(
        out_m.reshape(bsz, -1),
        jnp.clip(r_item - r1c[:, None], 0, m_rows - 1) * C_MID
        + jnp.clip(lane, 0, C_MID - 1),
    )
    return jnp.where(r_item < r1c[:, None], codes_w, codes_m)


def bscatter_min(dst, idx, val):
    b, n = dst.shape
    off = (jnp.arange(b, dtype=jnp.int32) * n)[:, None]
    ok = (idx >= 0) & (idx < n)
    gidx = jnp.where(ok, idx + off, b * n)
    flat = dst.reshape(-1).at[gidx.reshape(-1)].min(
        val.reshape(-1), mode="drop"
    )
    return flat.reshape(dst.shape)


def pack_items_b(coded, after_literal, kind, robitlen, robits, eml, chunk_id,
                 n_items, codesA, lensA, codesB, lensB, codesC, lensC,
                 w_total: int, lenid_escape: int):
    """Batched ops/bitpack.pack_items (flat scatters/gathers per batch)."""
    from orz_tpu.ops.bitpack import Packed

    bsz, m = coded.shape
    c_max = codesA.shape[1]
    idx = jnp.broadcast_to(jnp.arange(m, dtype=jnp.int32), (bsz, m))
    valid = idx < n_items[:, None]
    cid = jnp.where(valid, chunk_id, c_max - 1)

    ns = codesA.shape[2]
    ixAB = cid * ns + coded
    code1 = jnp.where(
        after_literal == 1,
        bgather(codesA.reshape(bsz, -1), ixAB),
        bgather(codesB.reshape(bsz, -1), ixAB),
    )
    len1 = jnp.where(
        after_literal == 1,
        bgather(lensA.reshape(bsz, -1), ixAB),
        bgather(lensB.reshape(bsz, -1), ixAB),
    )
    is_match = kind == 2
    has_ext = is_match & (eml >= lenid_escape)
    emlc = jnp.clip(eml, 0, codesC.shape[2] - 1)
    ixC = cid * ns + emlc
    code3 = jnp.where(has_ext, bgather(codesC.reshape(bsz, -1), ixC), 0)
    len3 = jnp.where(has_ext, bgather(lensC.reshape(bsz, -1), ixC), 0)
    len2 = jnp.where(is_match, robitlen, 0)
    code2 = jnp.where(is_match, robits, 0)

    t_total = jnp.where(valid, len1 + len2 + len3, 0)
    off_global = jnp.cumsum(t_total, axis=1) - t_total

    chunk_base = bscatter_min(
        jnp.full((bsz, c_max), jnp.int32(2**30)), cid,
        jnp.where(valid, off_global.astype(jnp.int32), 2**30),
    )
    off = off_global.astype(jnp.int32) - bgather(chunk_base, cid)

    bitlen = bscatter_add(
        jnp.zeros((bsz, c_max), jnp.int32), cid, t_total.astype(jnp.int32)
    )
    items_per_chunk = bscatter_add(
        jnp.zeros((bsz, c_max), jnp.int32), cid,
        jnp.where(valid, 1, 0).astype(jnp.int32),
    )
    words_per_chunk = (bitlen + 31) >> 5
    word_base = jnp.cumsum(words_per_chunk, axis=1) - words_per_chunk

    c1 = code1.astype(jnp.uint32)
    c2 = code2.astype(jnp.uint32)
    c3 = code3.astype(jnp.uint32)
    l23 = len2 + len3
    lo = (c1 << jnp.clip(l23, 0, 31).astype(jnp.uint32)) \
        | (c2 << len3.astype(jnp.uint32)) | c3
    hi = jnp.where(
        t_total > 32,
        c1 >> jnp.clip(32 - l23, 0, 31).astype(jnp.uint32),
        jnp.uint32(0),
    )

    def _shl(v, k):
        return v << jnp.clip(k, 0, 31).astype(jnp.uint32)

    def _shr(v, k):
        return v >> jnp.clip(k, 0, 31).astype(jnp.uint32)

    tt = jnp.where(valid, t_total, 0).astype(jnp.int32)
    widx = bgather(word_base, cid) + (off >> 5)
    s = off & 31
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

    words = jnp.zeros((bsz, w_total), jnp.uint32)
    words = bscatter_add(words, widx, w0)
    words = bscatter_add(words, widx + 1, w1)
    words = bscatter_add(words, widx + 2, w2)

    return Packed(words, word_base, bitlen, items_per_chunk)


def entropy_stage_b(items, coded, valid, chunk_id, num_counted, census_order,
                    chunk_input: int, c_max: int):
    """Batched device/pipeline._entropy_stage."""
    from orz_tpu.device.pipeline import SegmentOut, _w_total
    from orz_tpu.device.spec import LZ_LENID_SIZE, SYMRANK_NUM_SYMBOLS, TABC_SIZE
    from orz_tpu.ops.huffman import canonical_codes, pm_code_lens

    n_sym = SYMRANK_NUM_SYMBOLS
    bsz, m = coded.shape
    rowAB = jnp.where(
        valid,
        jnp.where(items.after_literal == 1, chunk_id, c_max + chunk_id),
        2 * c_max,
    )
    has_ext = valid & (items.kind == 2) & (items.eml >= LZ_LENID_SIZE - 1)
    rowC = jnp.where(has_ext, chunk_id, c_max)
    codedc = jnp.clip(coded, 0, n_sym - 1)
    emlc = jnp.clip(items.eml, 0, n_sym - 1)
    ones = jnp.ones((bsz, m), jnp.int32)
    wAB = bscatter_add(
        jnp.zeros((bsz, (2 * c_max + 1) * n_sym), jnp.int32),
        rowAB * n_sym + codedc, ones,
    ).reshape(bsz, 2 * c_max + 1, n_sym)
    wA, wB = wAB[:, :c_max], wAB[:, c_max : 2 * c_max]
    wC = bscatter_add(
        jnp.zeros((bsz, (c_max + 1) * n_sym), jnp.int32),
        rowC * n_sym + emlc, ones,
    ).reshape(bsz, c_max + 1, n_sym)[:, :c_max]

    all_w = jnp.concatenate([wA, wB, wC], axis=1).reshape(-1, n_sym)
    all_lens = jax.vmap(pm_code_lens)(all_w)
    all_codes = jax.vmap(canonical_codes)(all_lens)
    all_lens = all_lens.reshape(bsz, 3 * c_max, n_sym)
    all_codes = all_codes.reshape(bsz, 3 * c_max, n_sym)
    lensA, lensB, lensC = (
        all_lens[:, :c_max], all_lens[:, c_max : 2 * c_max],
        all_lens[:, 2 * c_max :],
    )
    codesA, codesB, codesC = (
        all_codes[:, :c_max], all_codes[:, c_max : 2 * c_max],
        all_codes[:, 2 * c_max :],
    )

    packed = pack_items_b(
        coded, items.after_literal, items.kind, items.robitlen, items.robits,
        items.eml, chunk_id, items.n_items, codesA, lensA, codesB, lensB,
        codesC, lensC, _w_total(c_max, chunk_input), LZ_LENID_SIZE - 1,
    )
    total_words = ((packed.bitlen + 31) >> 5).sum(axis=1)
    meta = jnp.concatenate([
        jnp.stack([
            num_counted,
            items.pred_len.astype(jnp.int32),
            items.n_items,
            total_words.astype(jnp.int32),
        ], axis=1),
        packed.n_items,
        packed.bitlen,
        packed.word_base,
        census_order,
        lensA.reshape(bsz, -1),
        lensB.reshape(bsz, -1),
        lensC.reshape(bsz, -1),
    ], axis=1)
    return SegmentOut(meta, packed.words)


def back_body_b(items, chunk_input: int, c_max: int, r1_cap: int,
                rm_cap: int):
    """Batched device/pipeline._back_body."""
    from orz_tpu.device.spec import SYMRANK_NUM_SYMBOLS

    n_sym = SYMRANK_NUM_SYMBOLS
    bsz, m = items.start.shape
    idx = jnp.broadcast_to(jnp.arange(m, dtype=jnp.int32), (bsz, m))
    valid = idx < items.n_items[:, None]
    chunk_id = jnp.clip(
        (items.start - PAD_FRONT) // chunk_input, 0, c_max - 1
    )

    cens_idx = jnp.where(valid & (chunk_id == 0), items.symbol, n_sym)
    counts = bscatter_add(
        jnp.zeros((bsz, n_sym + 1), jnp.int32), cens_idx,
        jnp.ones((bsz, m), jnp.int32),
    )[:, :n_sym]
    primary = -jnp.maximum(counts, 1)
    _, census_order = lax.sort(
        (primary,
         jnp.broadcast_to(jnp.arange(n_sym, dtype=jnp.int32), (bsz, n_sym))),
        num_keys=2,
    )
    num_counted = (counts > 1).sum(axis=1).astype(jnp.int32)

    coded = symrank_pallas_b(
        items.symbol, items.sr_unlikely, items.sr_ctx, items.n_items,
        census_order, r1_cap, rm_cap,
    )
    return entropy_stage_b(items, coded, valid, chunk_id, num_counted,
                           census_order, chunk_input, c_max)


def mid_body_b(starts, n_items, pk1, bestq, bestro, bufs, seg_lens,
               m_cap: int):
    """Batched device/pipeline._mid_body (OTZ1)."""
    items = build_items_b(
        starts[:, :m_cap], n_items, pk1, bestq, bestro, bufs, seg_lens
    )
    r1, rounds = plan_stats_b(items.sr_ctx, items.n_items)
    return items, r1, rounds
