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

v2 design rules (driven by measured primitive costs on TPU v5e — see
tools/prim_bench.py: lax.sort ~8 ms @ 4Mi with payloads nearly free,
gather ~30 ms, scatter ~24 ms, elementwise ~free):

- NO full-size gathers or scatters.  Every change of ordering is a stable
  sort that CARRIES its operands as payload arrays, and results return to
  position order by sorting on the stored position (7.5 ms) instead of
  scattering (24 ms).
- The candidate depth loop runs on sorted arrays via vector shifts only.
- Initial LCP window is 32 bytes (8 payload dwords), so the slow
  gather-based extension only runs for the ~1-2% of positions whose match
  reaches 32 bytes, on compacted arrays.
- alnum() is arithmetic (a 256-entry table lookup is a gather).
- Match lengths are capped at the parse fence (spec.FENCE): no item crosses
  a fence, which is what makes phase-2 item extraction a parallel per-block
  walk.  The cap applies BEFORE candidate scoring so far offsets are not
  wasted on capped lengths.
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

LCP0 = 64  # initial (sort-payload) LCP window in bytes.  64 (round 4, was
# 32): scoring candidates over the wider window recovers ~0.17 pt of ratio
# vs orz -l2 (STATUS r3 lever sweep) AND shrinks the gather-extension
# terminal set severalfold — only matches filling the whole window reach
# the extension stages, whose capacity-limited fast path then almost
# always suffices (the dynamic fallback was the hottest construct left in
# the round-4 batched iteration trace).  Costs 8 more sort payload arrays.
N_DW = LCP0 // 4


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
    bestlen: jnp.ndarray  # int32, 0 when no match (fence/end-capped)
    bestro: jnp.ndarray  # int32 reduced offset (valid iff bestlen >= 4)
    bestq: jnp.ndarray  # int32 winning match position (for rep-distance)


def _shift_right(x: jnp.ndarray, k: int):
    return jnp.roll(x, k)  # front/tail pads are zero, so roll == shift


def _shift_left(x: jnp.ndarray, k: int):
    return jnp.roll(x, -k)


def _alnum(b: jnp.ndarray) -> jnp.ndarray:
    """is-ASCII-alphanumeric, arithmetically (no table gather)."""
    digit = (b >= 48) & (b <= 57)
    letter = ((b | 32) >= 97) & ((b | 32) <= 122)
    return (digit | letter).astype(jnp.int32)


def byte_arrays(buf: jnp.ndarray) -> ByteArrays:
    """Vector per-position model keys (mirrors device/spec.py helpers)."""
    b = buf.astype(jnp.int32)
    prev1 = _shift_right(b, 1)
    prev2 = _shift_right(b, 2)
    cctx = (prev1 & 0x7F) | (_alnum(prev2) << 7)
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


def _sort_back(pos: jnp.ndarray, payloads):
    """Return payloads to position order: sort by the stored position."""
    out = lax.sort((pos,) + tuple(payloads), num_keys=1)
    return out[1:]


def word_predictions(ba: ByteArrays, buf: jnp.ndarray, end: jnp.ndarray) -> jnp.ndarray:
    """pred[p] = word-table value seen at p: the 2 bytes following the last
    position u <= p-3 whose key h2(u) equals h2(p-1); 0 if none."""
    n = buf.shape[0]
    x = jnp.arange(n, dtype=jnp.int32)
    valid_x = (x >= PAD_FRONT - 1) & (x < end)
    b = buf.astype(jnp.int32)
    val_at = _shift_left(b, 1) | _shift_left(b, 2) << 8  # (b[x+1], b[x+2])

    k = jnp.where(valid_x, ba.h2, jnp.int32(0x7FFFFFFF))
    sk, sp, sval = lax.sort((k, x, val_at), num_keys=2)

    def shift_dn(arr, j, fill):
        return jnp.concatenate([jnp.full(j, fill, arr.dtype), arr[:-j]])

    same1 = shift_dn(sk, 1, -1) == sk
    same2 = shift_dn(sk, 2, -1) == sk
    p1 = jnp.where(same1, shift_dn(sp, 1, -1), -1)
    p2 = jnp.where(same2, shift_dn(sp, 2, -1), -1)
    v1 = shift_dn(sval, 1, 0)
    v2 = shift_dn(sval, 2, 0)
    # the last same-key u <= x-2 (prev1 may be x-1, then prev2 qualifies)
    use2 = p1 > sp - 2
    u = jnp.where(use2, p2, p1)
    uval = jnp.where(use2, v2, v1)
    pred_s = jnp.where(u >= PAD_FRONT, uval, 0)
    (pred_at_x,) = _sort_back(sp, (pred_s,))
    pred = _shift_right(pred_at_x, 1)  # pred for position p lives at x = p-1
    p = jnp.arange(n, dtype=jnp.int32)
    return jnp.where((p >= PAD_FRONT) & (p < end), pred, 0)


class MaskedPlan(NamedTuple):
    """Per-segment sorted-space layouts reused across OTZ2 iterations.

    Every sort key in the masked analysis is a pure function of `buf`
    (h2/cctx/mkey and positions), so the expensive multi-payload sorts are
    computed ONCE per segment; each iteration then moves only its
    mask-derived payloads into the fixed layouts via `dest_*` permutation
    sorts (2-3 arrays instead of 12)."""

    # h2 (word-model) sort over rows x in [PAD_FRONT-2, end)
    sp_h2: jnp.ndarray  # sorted x
    sval_h2: jnp.ndarray  # sorted (b[x+1], b[x+2]) value
    first_h2: jnp.ndarray  # bool group starts
    dest_h2: jnp.ndarray  # position -> sorted slot (permutation key)
    # (cctx, x) sort over valid rows
    sp_ctx: jnp.ndarray
    first_ctx: jnp.ndarray
    dest_ctx: jnp.ndarray
    # (mkey, p) candidate sort
    msk: jnp.ndarray
    msp: jnp.ndarray
    dw_s: tuple  # N_DW sorted dword arrays (uint32)
    dest_cand: jnp.ndarray


def _inverse_perm(sp: jnp.ndarray) -> jnp.ndarray:
    n = sp.shape[0]
    return jnp.zeros(n, jnp.int32).at[sp].set(
        jnp.arange(n, dtype=jnp.int32), unique_indices=True
    )


def masked_plan(buf: jnp.ndarray, seg_len: jnp.ndarray) -> MaskedPlan:
    """Build the fixed sorted layouts (see MaskedPlan)."""
    n = buf.shape[0]
    end = PAD_FRONT + seg_len
    x = jnp.arange(n, dtype=jnp.int32)
    valid = (x >= PAD_FRONT) & (x < end)
    ba = byte_arrays(buf)

    # h2 sort: superset row domain [PAD_FRONT-2, end) — covers valid_x and
    # every possible upd row; extra rows are query-only (upd=0) and change
    # no other row's scan result
    rows_h2 = (x >= PAD_FRONT - 2) & (x < end)
    b = buf.astype(jnp.int32)
    val_at = _shift_left(b, 1) | _shift_left(b, 2) << 8
    k = jnp.where(rows_h2, ba.h2, jnp.int32(0x7FFFFFFF))
    sk, sp_h2, sval_h2 = lax.sort((k, x, val_at), num_keys=2)
    first_h2 = jnp.concatenate([jnp.ones(1, bool), sk[1:] != sk[:-1]])

    kc = jnp.where(valid, ba.cctx, jnp.int32(0x7FFFFFFF))
    skc, sp_ctx = lax.sort((kc, x), num_keys=2)
    first_ctx = jnp.concatenate([jnp.ones(1, bool), skc[1:] != skc[:-1]])

    mk = jnp.where(valid, ba.mkey, jnp.int32(0x7FFFFFFF))
    dws = [_shift_left(ba.dw, 4 * t).astype(jnp.int32) for t in range(N_DW)]
    sorted_all = lax.sort((mk, x) + tuple(dws), num_keys=2)
    msk, msp = sorted_all[:2]
    dw_s = tuple(a.astype(jnp.uint32) for a in sorted_all[2:])

    return MaskedPlan(
        sp_h2, sval_h2, first_h2, _inverse_perm(sp_h2),
        sp_ctx, first_ctx, _inverse_perm(sp_ctx),
        msk, msp, dw_s, _inverse_perm(msp),
    )


def word_predictions_masked(ba: ByteArrays, buf: jnp.ndarray,
                            end: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """words_mode=1 predictions under a start mask (oracle analyze_ref
    words_mode=1): the table updates only at u = s-3 for mask starts s, so
    pred[p] is the value of the LAST masked same-key u <= p-3.  The plain
    version's fixed 1-2-row lookback becomes a segmented newest-3 trail
    (rows u = p-1 and p-2 may be masked but are not yet visible)."""
    n = buf.shape[0]
    x = jnp.arange(n, dtype=jnp.int32)
    valid_x = (x >= PAD_FRONT - 1) & (x < end)
    b = buf.astype(jnp.int32)
    val_at = _shift_left(b, 1) | _shift_left(b, 2) << 8

    upd_ok = (x >= PAD_FRONT - 2) & (x < end) & _shift_left(mask, 3)
    upd = jnp.where(upd_ok, 1, 0).astype(jnp.int32)
    k = jnp.where(valid_x | upd_ok, ba.h2, jnp.int32(0x7FFFFFFF))
    sk, sp, sval, supd = lax.sort((k, x, val_at, upd), num_keys=2)
    first = jnp.concatenate([jnp.ones(1, bool), sk[1:] != sk[:-1]])
    pred_s = _words1_scan(first, sp, sval, supd)
    (pred_at_x,) = _sort_back(sp, (pred_s,))
    pred = _shift_right(pred_at_x, 1)
    p = jnp.arange(n, dtype=jnp.int32)
    return jnp.where((p >= PAD_FRONT) & (p < end), pred, 0)


def word_predictions_masked_planned(plan: MaskedPlan, end: jnp.ndarray,
                                    mask: jnp.ndarray) -> jnp.ndarray:
    """word_predictions_masked over the precomputed h2 layout: only the upd
    payload rides a 2-array permutation sort (bit-identical output)."""
    n = mask.shape[0]
    x = jnp.arange(n, dtype=jnp.int32)
    upd_ok = (x >= PAD_FRONT - 2) & (x < end) & _shift_left(mask, 3)
    upd = jnp.where(upd_ok, 1, 0).astype(jnp.int32)
    _, supd = lax.sort((plan.dest_h2, upd), num_keys=1)
    pred_s = _words1_scan(plan.first_h2, plan.sp_h2, plan.sval_h2, supd)
    (pred_at_x,) = _sort_back(plan.sp_h2, (pred_s,))
    pred = _shift_right(pred_at_x, 1)
    return jnp.where((x >= PAD_FRONT) & (x < end), pred, 0)


def _words1_scan(first, sp, sval, supd):
    """Segmented newest-3-updates trail over the h2-sorted rows; returns
    each row's prediction (the last update u <= x-2 in its group)."""
    n = sp.shape[0]
    neg = jnp.full(n, -1, jnp.int32)
    zero = jnp.zeros(n, jnp.int32)
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
        op, (first, leaf_u, leaf_v, neg, zero, neg, zero)
    )
    lim = sp - 2  # u <= x-2 (update at s visible from p >= s; x = p-1)
    pred_s = jnp.where(
        u1 <= lim, jnp.where(u1 >= 0, v1, 0),
        jnp.where(u2 <= lim, jnp.where(u2 >= 0, v2, 0),
                  jnp.where((u3 <= lim) & (u3 >= 0), v3, 0)),
    )
    return pred_s


def context_ranks(ba: ByteArrays, valid: jnp.ndarray) -> jnp.ndarray:
    """rank[p] = number of valid positions q < p with cctx(q) == cctx(p)."""
    n = ba.cctx.shape[0]
    x = jnp.arange(n, dtype=jnp.int32)
    k = jnp.where(valid, ba.cctx, jnp.int32(0x7FFFFFFF))
    sk, sp = lax.sort((k, x), num_keys=2)
    first = jnp.concatenate([jnp.ones(1, bool), sk[1:] != sk[:-1]])
    gstart = lax.cummax(jnp.where(first, x, 0))
    rank_s = x - gstart
    (rank,) = _sort_back(sp, (rank_s,))
    return jnp.where(valid, rank, 0)


EXT_W = 32  # bytes compared per extension round

# NOTE on fetch shape: element (4-byte) gathers are the only fast gather
# path on TPU — slice-mode gathers (slice_sizes=(16,)/(64,)) and 2-D row
# gathers measured 6-9x SLOWER per byte at 65K-262K indices on v5e, and
# wide-element (c64) gathers are unimplemented.  So extension rounds fetch
# EXT_W bytes as EXT_W/4 per-dword gathers per side.


def _gather_dwords(dw: jnp.ndarray, base: jnp.ndarray, offset: int):
    n = dw.shape[0]
    return dw[jnp.clip(base + offset, 0, n - 1)]


def _lcp_round(dw, qb, pb, width):
    """(lcp, full): common-prefix bytes of buf[qb:qb+width] vs
    buf[pb:pb+width] via per-dword gathers of the dword array."""

    def partial_bytes(v):
        b0 = (v & 0xFF) == 0
        b1 = (v & 0xFFFF) == 0
        b2 = (v & 0xFFFFFF) == 0
        return b0.astype(jnp.int32) + (b0 & b1) + (b0 & b1 & b2)

    xors = [
        _gather_dwords(dw, qb, 4 * t) ^ _gather_dwords(dw, pb, 4 * t)
        for t in range(width // 4)
    ]
    lcp = jnp.full(xors[0].shape, width, jnp.int32)
    for t in range(len(xors) - 1, -1, -1):
        lcp = jnp.where(xors[t] != 0, 4 * t + partial_bytes(xors[t]), lcp)
    return lcp, lcp >= width


def _analyze(buf: jnp.ndarray, seg_len: jnp.ndarray, depth: int,
             mask: jnp.ndarray | None, words_mode: bool = False,
             plan: MaskedPlan | None = None,
             ro_cap: int | None = None) -> Analysis:
    """Full phase-1 analysis of one padded segment (jit, static depth).

    mask (OTZ2, spec.py): when given, candidates are restricted to masked
    positions (the previous parse's item starts), `rank` becomes the MASKED
    in-context prefix count (so reduced offsets are start-rank estimates,
    oracle analyze_ref start_mask), offsets gate at OTZ2_RO_CAP, and
    `depth` counts sorted-space shifts over the mixed rows.

    Candidate search runs entirely in (key, pos)-sorted space: a position's
    j-th-previous same-key candidate sits j slots earlier in the sorted
    order, so every candidate's dwords/ranks come from vector SHIFTS of
    sorted arrays — the depth loop does no gathers at all (the sequential
    chain walk of reference src/matcher.rs:135-192, turned into lane math).
    All candidate operands ride the sort as payloads; results ride a
    position-keyed sort back.
    """
    n = buf.shape[0]
    end = PAD_FRONT + seg_len
    p = jnp.arange(n, dtype=jnp.int32)
    valid = (p >= PAD_FRONT) & (p < end)

    ba = byte_arrays(buf)
    if words_mode:
        if plan is not None:
            pred = word_predictions_masked_planned(plan, end, mask)
        else:
            pred = word_predictions_masked(ba, buf, end, mask)
    else:
        pred = word_predictions(ba, buf, end)
    b = buf.astype(jnp.int32)
    cur_word = b | _shift_left(b, 1) << 8
    wordmatch = cur_word == pred

    if mask is None:
        rank = context_ranks(ba, valid)
    elif plan is not None:
        rank = masked_context_counts_planned(plan, valid, mask)
    else:
        rank = masked_context_counts(ba, valid, mask)

    if plan is not None:
        # fixed layouts: only the mask-derived payloads ride a sort
        _, rank_s, mask_si = lax.sort(
            (plan.dest_cand, rank, mask.astype(jnp.int32)), num_keys=1
        )
        msk, msp = plan.msk, plan.msp
        dw_s = list(plan.dw_s)
        mask_s = mask_si
    else:
        # one sort carries every candidate operand into (mkey, pos) space;
        # the fence/end length cap is an elementwise function of the sorted
        # positions, so it does not ride the sort as a payload
        mk = jnp.where(valid, ba.mkey, jnp.int32(0x7FFFFFFF))
        dws = [_shift_left(ba.dw, 4 * k).astype(jnp.int32) for k in range(N_DW)]
        extra = () if mask is None else (mask.astype(jnp.int32),)
        sorted_all = lax.sort(
            (mk, p, rank) + tuple(dws) + extra, num_keys=2
        )
        msk, msp, rank_s = sorted_all[:3]
        dw_s = [a.astype(jnp.uint32) for a in sorted_all[3 : 3 + N_DW]]
        mask_s = sorted_all[3 + N_DW] if mask is not None else None

    # Depth loop: a Pallas kernel runs all `depth` shift-compare rounds over
    # VMEM tiles, reading each sorted operand from HBM exactly once (the XLA
    # fori_loop streamed every array once per round — ~50 ms at 4 MiB).
    from orz_tpu.device.spec import OTZ2_NEAR, OTZ2_RO_CAP
    from orz_tpu.ops.match_pallas import match_depth_pallas

    ro_cap_near = None
    if ro_cap is None:
        ro_cap = OTZ2_RO_CAP if mask is not None else RING
    elif mask is not None and ro_cap > OTZ2_RO_CAP:
        # widened (conform) search: far candidates rank strictly below all
        # near ones — rescue-only (see ops/match_pallas.py two-tier cap)
        ro_cap_near = OTZ2_RO_CAP
    best_q_s, best_ro_s, best_len_s = match_depth_pallas(
        msk, msp, rank_s, tuple(dw_s), end, depth, mask_s=mask_s,
        ro_cap=ro_cap, ro_cap_near=ro_cap_near,
        # gating only bites past OTZ2_NEAR shifts; at depth <= near the
        # condition is vacuous and would just bloat the kernel
        near_depth=(OTZ2_NEAR if mask is not None and depth > OTZ2_NEAR
                    else 0),
    )

    # back to position space (sort on stored position, no scatters); the
    # fence/end cap is elementwise in position space
    best_q, best_ro, lcp_best = _sort_back(
        msp, (best_q_s, best_ro_s, best_len_s)
    )
    cap_back = jnp.minimum(
        FENCE - ((p - PAD_FRONT) & (FENCE - 1)), end - p
    ).astype(jnp.int32)

    # Extend winners past the LCP0-byte window, in two parts:
    #
    # 1. CHAIN STITCHING (elementwise, exact): if the kernel's winner at
    #    p+16 is exactly q+16, then lcp(p, q) = 16 + lcp(p+16, q+16) — and
    #    this holds under the fence/end caps too, because cap(p+16) =
    #    cap(p) - 16 whenever cap(p) > 16.  Long matches' interior
    #    positions almost always pick the shifted winner (identical
    #    content, same recency), so full lengths propagate backwards
    #    through 15 select-and-shift passes (LZ_MATCH_MAX_LEN/16) with no
    #    gathers at all.
    # 2. EXACT TAIL for chain TERMINALS only: positions whose window fully
    #    matched but whose p+16 winner is some other candidate.  Those are
    #    compacted and extended by real 16-byte gather compares (the
    #    pre-stitching design ran this for every full-window position:
    #    ~4-5% of n at LCP0=16, ~150 ms of gathers at 4 MiB; terminals are
    #    several times rarer).
    cur = lcp_best
    full = (lcp_best >= LCP0) & (cap_back > LCP0) & (best_q >= 0)
    link = full & (_shift_left(best_q, LCP0) == best_q + LCP0)
    alive = full & ~link

    k_a = max(1024, n // 64)
    _, alive_first = lax.sort(
        ((~alive).astype(jnp.int32), jnp.arange(n, dtype=jnp.int32)), num_keys=2
    )
    # pad with unique out-of-bounds indices so the last chunk's slice never
    # clamps back onto already-extended lanes (re-extension double-counts)
    alive_first = jnp.concatenate(
        [alive_first, n + jnp.arange(k_a, dtype=jnp.int32)]
    )
    n_alive = alive.sum()

    def _stage(cur, alive_in, alive_out, k_sub, first_round, last_round,
               n_fast=1):
        """Extend survivors by EXT_W-byte rounds over [first_round,
        last_round) in chunks of k_sub entries of alive_first; alive_out
        records who still lives at last_round (None on the final stage).
        Each round fetches ONE contiguous EXT_W-byte slice per side
        (slice-mode gather: per-16-bytes-compared it costs 1/8th the gather
        ops of the old per-dword fetches) and advances by the row LCP.
        The single-chunk case (survivors fit k_sub — virtually always) runs
        straight-line under lax.cond: a chunk WHILE-loop would carry the
        full-size cur/alive arrays and XLA brackets every dynamic loop with
        memory-space copies of its carries (~90 ms each at 4Mi); the
        multi-chunk fallback keeps exactness at any survivor count."""

        def one_chunk(c, cur, aout):
            sub_p = lax.dynamic_slice(alive_first, (c * k_sub,), (k_sub,))
            sub_pc = jnp.clip(sub_p, 0, n - 1)
            sub_q = best_q[sub_pc]
            sub_cur = cur[sub_pc]
            sub_cap = cap_back[sub_pc]
            sub_alive = alive_in[sub_pc] & (sub_p < n)

            def tail_cond(tc):
                k, scur, salive = tc
                return (k < last_round) & salive.any()

            def tail_round(tc):
                k, scur, salive = tc
                qb = jnp.where(salive, sub_q + scur, 0)
                pb = jnp.where(salive, sub_pc + scur, 0)
                lcp, full_w = _lcp_round(ba.dw, qb, pb, EXT_W)
                scur = jnp.where(salive, scur + lcp, scur)
                scur = jnp.minimum(scur, sub_cap)
                return k + 1, scur, salive & full_w & (scur < sub_cap)

            _, sub_cur, sub_alive = lax.while_loop(
                tail_cond, tail_round,
                (jnp.int32(first_round), sub_cur, sub_alive),
            )
            cur = cur.at[sub_p].set(sub_cur, mode="drop", unique_indices=True)
            if aout is not None:
                aout = aout.at[sub_p].set(sub_alive, mode="drop",
                                          unique_indices=True)
            return cur, aout

        def fast(cur, aout):
            for c in range(n_fast):
                cur, aout = one_chunk(jnp.int32(c), cur, aout)
            return cur, aout

        def general(cur, aout):
            def chunk_cond(carry):
                return carry[0] * k_sub < n_alive

            def chunk_body(carry):
                c, cur, aout = carry
                cur, aout = one_chunk(c, cur, aout)
                return c + 1, cur, aout

            _, cur, aout = lax.while_loop(
                chunk_cond, chunk_body, (jnp.int32(0), cur, aout)
            )
            return cur, aout

        return lax.cond(n_alive <= n_fast * k_sub, fast, general,
                        cur, alive_out)

    # Stage A: one EXT_W round over the terminal set (covers matches to
    # LCP0+EXT_W bytes); stage B: the remaining rounds over the same
    # compaction order in 4x smaller chunks, so the sparse long-match tail
    # only keeps ITS chunk's gathers running.
    n_rounds = -(-(LZ_MATCH_MAX_LEN - LCP0) // EXT_W)  # 7 at 240/32/32
    aliveB = jnp.zeros(n, bool)
    cur, aliveB = _stage(cur, alive, aliveB, k_a, 0, 1, n_fast=2)
    cur, _ = _stage(cur, aliveB, None, max(1024, k_a // 4), 1, n_rounds,
                    n_fast=8)

    # backward stitch: chains are at most LZ_MATCH_MAX_LEN/LCP0 links long
    for _ in range(-(-LZ_MATCH_MAX_LEN // LCP0)):
        cur = jnp.where(link, LCP0 + _shift_left(cur, LCP0), cur)

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


@partial(jax.jit, static_argnames=("depth",))
def analyze(buf: jnp.ndarray, seg_len: jnp.ndarray, depth: int) -> Analysis:
    return _analyze(buf, seg_len, depth, None)


@partial(jax.jit, static_argnames=("depth", "words_mode"))
def analyze_masked(buf: jnp.ndarray, seg_len: jnp.ndarray, depth: int,
                   mask: jnp.ndarray, words_mode: bool = False) -> Analysis:
    """OTZ2 masked analysis (see _analyze; oracle analyze_ref start_mask)."""
    return _analyze(buf, seg_len, depth, mask, words_mode)


def masked_context_counts(ba: ByteArrays, valid: jnp.ndarray,
                          mask: jnp.ndarray) -> jnp.ndarray:
    """scnt[p] = number of MASKED valid positions q < p with
    cctx(q) == cctx(p) (oracle analyze_ref's scnt_ctx/scnt_pos: for masked
    q this exclusive count is exactly its start-rank)."""
    n = ba.cctx.shape[0]
    x = jnp.arange(n, dtype=jnp.int32)
    k = jnp.where(valid, ba.cctx, jnp.int32(0x7FFFFFFF))
    sk, sp, sm = lax.sort(
        (k, x, (mask & valid).astype(jnp.int32)), num_keys=2
    )
    first = jnp.concatenate([jnp.ones(1, bool), sk[1:] != sk[:-1]])

    def _seg_add(a, b):
        fa, va = a
        fb, vb = b
        return fa | fb, jnp.where(fb, vb, va + vb)

    _, incl = lax.associative_scan(_seg_add, (first, sm))
    excl = incl - sm
    (scnt,) = _sort_back(sp, (excl,))
    return jnp.where(valid, scnt, 0)


def masked_context_counts_planned(plan: MaskedPlan, valid: jnp.ndarray,
                                  mask: jnp.ndarray) -> jnp.ndarray:
    """masked_context_counts over the precomputed (cctx, x) layout."""

    def _seg_add(a, b):
        fa, va = a
        fb, vb = b
        return fa | fb, jnp.where(fb, vb, va + vb)

    _, sm = lax.sort(
        (plan.dest_ctx, (mask & valid).astype(jnp.int32)), num_keys=1
    )
    _, incl = lax.associative_scan(_seg_add, (plan.first_ctx, sm))
    excl = incl - sm
    (scnt,) = _sort_back(plan.sp_ctx, (excl,))
    return jnp.where(valid, scnt, 0)
