"""OTZ2 device conform / repair / emission (rings_mode=1).

Mirrors the oracle path refcodec.parse_ref(rings_mode=1) == conform_items
+ repair_items + _emit_items, entirely in item space at a fixed capacity:

- CONFORM: the walk's item boundaries stay fixed; every match re-targets
  to the conform analysis's candidate (mask = the FINAL start set, so the
  target is an item start by construction).  A shorter candidate shrinks
  the match; the tail — and fully-candidateless matches — demote to
  length-1 literal items.  Demotion only ADDS item starts.
- REPAIR: exact start-rank reduced offsets are recomputed over the grown
  start set; matches whose target stopped being reachable (ro >= RING) or
  whose rep0 chain broke demote, for a fixed number of passes (monotone:
  demotion only adds starts).
- EMIT: symbols / reduced-offset fields / length prediction over the final
  items, with EXACT start ranks (what the decoder replays).

Everything is sorts, segmented scans and expand-scatters at the item
capacity — no sequential state.  Oracle: orz_tpu/device/refcodec.py
conform_items / repair_items / _emit_items.
"""

from __future__ import annotations

import jax
from jax import lax
import jax.numpy as jnp

from orz_tpu.device.spec import (
    FENCE,
    LZ_LENID_SIZE,
    LZ_MATCH_MIN_LEN,
    NEG_EML_BASE,
    NEG_EML_DEPTH,
    PAD_FRONT,
    REP0_BASE,
    RING,
    WORD_SYMBOL,
)
from orz_tpu.ops.parse import Items, roid_of_ro


def _seg_max(a, b):
    fa, ma = a
    fb, mb = b
    return fa | fb, jnp.where(fb, mb, jnp.maximum(ma, mb))


def _expand(start, kind, q, head_len, tail_len, n_items):
    """Rewrite the item arrays so item i becomes a head (kind/​head_len)
    followed by tail_len length-1 literals.  Returns the new arrays (same
    capacity) and the new item count (which may exceed capacity — caller
    checks).  Invalid rows (>= n_items) keep reps=0 and drop out."""
    mc = start.shape[0]
    idx = jnp.arange(mc, dtype=jnp.int32)
    valid = idx < n_items
    reps = jnp.where(valid, 1 + tail_len, 0)
    off = jnp.cumsum(reps) - reps  # exclusive
    total = off[-1] + reps[-1]

    offc = jnp.where(valid, off, mc)  # drop invalid heads
    owner = jnp.zeros(mc + 1, jnp.int32).at[offc].max(
        jnp.where(valid, idx, 0), mode="drop"
    )[:mc]
    owner = lax.cummax(owner)  # fill: slots inherit the last head's item
    o_start = start[owner]
    o_hlen = head_len[owner]
    within = idx - off[owner]
    is_head = within == 0
    start2 = jnp.where(is_head, o_start, o_start + o_hlen + within - 1)
    kind2 = jnp.where(is_head, kind[owner], 0)
    len2 = jnp.where(is_head, head_len[owner], 1)
    q2 = jnp.where(is_head & (kind2 == 2), q[owner], 0)
    live = idx < total
    return (
        jnp.where(live, start2, 0x7FFFFFFE),
        jnp.where(live, kind2, 0),
        jnp.where(live, len2, 0),
        jnp.where(live, q2, 0),
        total.astype(jnp.int32),
    )


def _ranks_and_membership(start, kind, q, cctx_all_pk, n_items):
    """(srank, hit, ro): exact start ranks (occurrence index of the item's
    cctx among starts), target membership, and start-rank reduced offsets
    for match items (rep0-agnostic; caller masks)."""
    mc = start.shape[0]
    idx = jnp.arange(mc, dtype=jnp.int32)
    valid = idx < n_items
    cctx = (cctx_all_pk[jnp.where(valid, start, 0)] >> 10) & 0xFF

    # srank: occurrence index within cctx groups, in item order
    key = jnp.where(valid, cctx, 0x7FFF)
    sk, si = lax.sort((key, idx), num_keys=2)
    pos = jnp.arange(mc, dtype=jnp.int32)
    first = jnp.concatenate([jnp.ones(1, bool), sk[1:] != sk[:-1]])
    gstart = lax.cummax(jnp.where(first, pos, 0))
    srank = jnp.zeros(mc, jnp.int32).at[si].set(pos - gstart,
                                                unique_indices=True)

    # membership + target rank via one merge sort (items first at equal key)
    is_m = (kind == 2) & valid
    q_key = jnp.where(is_m, q, jnp.int32(0x7FFFFFFF))
    skey = jnp.concatenate([jnp.where(valid, start, 0x7FFFFFFE), q_key])
    srole = jnp.concatenate([jnp.zeros(mc, jnp.int32), jnp.ones(mc, jnp.int32)])
    spay = jnp.concatenate([idx, idx])
    _, o_role, o_pay = lax.sort((skey, srole, spay), num_keys=2)
    last_item = lax.cummax(jnp.where(o_role == 0, o_pay, -1))
    qslot = jnp.where(o_role == 1, o_pay, mc)
    cand = jnp.zeros(mc + 1, jnp.int32).at[qslot].max(
        jnp.maximum(last_item, 0), mode="drop"
    )[:mc]
    hit = is_m & (start[cand] == q)
    ro = jnp.where(hit, srank - srank[cand] - 1, 0)
    return srank, hit, ro, cand


def _h2_at(pk1, buf, x):
    """h2 key at positions x (cctx rides pk1; the byte comes from buf)."""
    cctx = (pk1[x] >> 10) & 0xFF
    return (buf[x].astype(jnp.int32) & 0x7F) | (cctx << 7)


def _pred_at_items(start, kind, length, pk1, buf, n_items):
    """The decoder's words_mode=1 word prediction at each item start: the
    table updates once per item END (key h2(e-3), value bytes e-2..e-1),
    skipping WORD items' ends (oracle _words1_pred_at_items)."""
    mc = start.shape[0]
    n = buf.shape[0]
    idx = jnp.arange(mc, dtype=jnp.int32)
    valid = idx < n_items
    s = jnp.where(valid, start, 0)
    e = jnp.clip(s + length, 0, n - 1)

    ukey = jnp.where(valid & (kind != 1), _h2_at(pk1, buf, e - 3),
                     jnp.int32(0x7FFFFFFF))
    uval = (buf[jnp.clip(e - 2, 0, n - 1)].astype(jnp.int32)
            | buf[jnp.clip(e - 1, 0, n - 1)].astype(jnp.int32) << 8)
    qkey = jnp.where(valid, _h2_at(pk1, buf, jnp.maximum(s - 1, 0)),
                     jnp.int32(0x7FFFFFFF))

    # merge updates (at position e, first at equal pos) and queries (at s):
    # packed second key (pos << 1 | role) keeps one 2-key sort
    upos = jnp.where(valid & (kind != 1), e, jnp.int32(0x3FFFFFFF))
    key2 = jnp.concatenate([(upos << 1), (s << 1) | 1])
    key1 = jnp.concatenate([ukey, qkey])
    pay = jnp.concatenate([uval, idx])  # update value / query's item index
    k1, k2, p_ = lax.sort((key1, key2, pay), num_keys=2)
    is_q = (k2 & 1) == 1
    first = jnp.concatenate([jnp.ones(1, bool), k1[1:] != k1[:-1]])

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
        op, (first, has, jnp.where(is_q, 0, p_))
    )
    val = jnp.where(hasv == 1, lastv, 0)  # no update yet in group: 0
    qslot = jnp.where(is_q, p_, mc)
    return jnp.zeros(mc + 1, jnp.int32).at[qslot].max(val, mode="drop")[:mc]


def _rep0(start, kind, q, n_items):
    mc = start.shape[0]
    idx = jnp.arange(mc, dtype=jnp.int32)
    valid = idx < n_items
    is_m = (kind == 2) & valid
    dist = jnp.where(is_m, start - q, 0)
    last_match = lax.cummax(jnp.where(is_m, idx, -1))
    prev_match = jnp.concatenate([jnp.full(1, -1, jnp.int32), last_match[:-1]])
    prev_dist = jnp.where(
        prev_match >= 0, dist[jnp.clip(prev_match, 0, mc - 1)], 0
    )
    return is_m & (dist == prev_dist) & (prev_dist > 0)


def conform_repair(starts, n_items, pk1, bestq2, bestlen2, buf, seg_len,
                   repair_passes: int = 6, words_mode: bool = False):
    """Device conform + repair (see module docstring).

    starts: (m2_cap,) the final walk's item starts (stream order).
    pk1: (n,) packed per-position fields (ops/parse.pack_fields).
    bestq2/bestlen2: (n,) the CONFORM analysis (masked by these starts).

    words_mode: each repair pass ALSO validates word items against the
    decoder's exact item-end word state (demotions change item ends, so
    offset and word violations iterate to a joint fixed point — both only
    add starts; word validity itself is not monotone, so the combined
    per-pass demotion schedule is part of the oracle contract,
    refcodec.parse_ref words_mode=1).

    Returns (start, kind, length, q, rep0, ro, predi, n_items2, ok): final
    item arrays at the same capacity, exact reduced offsets, the exact
    word predictions per item (words_mode only; zeros otherwise), and
    ok=False when capacity overflowed or violations survived the passes
    (caller falls back to rings_mode=0)."""
    mc = starts.shape[0]
    idx = jnp.arange(mc, dtype=jnp.int32)
    valid = idx < n_items
    start = jnp.where(valid, starts, 0)

    f = pk1[start]
    kind = jnp.where(valid, f & 3, 0)
    lob = (f >> 2) & 0xFF
    length = jnp.where(
        valid, jnp.where(kind == 2, lob, jnp.where(kind == 1, 2, 1)), 0
    )

    # conform: re-target matches onto the conform analysis's candidates
    is_m = kind == 2
    q2 = jnp.where(is_m, bestq2[start], 0)
    bl2 = jnp.where(is_m, bestlen2[start], 0)
    has = is_m & (bl2 >= LZ_MATCH_MIN_LEN)
    new_len = jnp.where(has, jnp.minimum(length, bl2), length)
    demote = is_m & ~has
    head_kind = jnp.where(demote, 0, kind)
    head_len = jnp.where(demote, 1, new_len)
    tail_len = jnp.where(is_m, length - head_len, 0)

    start, kind, length, q, n2 = _expand(
        start, head_kind, q2, head_len, tail_len, n_items
    )
    ok = n2 <= mc

    n = buf.shape[0]

    def violations(start, kind, length, q, n2):
        rep0 = _rep0(start, kind, q, n2)
        srank, hit, ro, _ = _ranks_and_membership(start, kind, q, pk1, n2)
        live = jnp.arange(mc, dtype=jnp.int32) < n2
        viol = (kind == 2) & live & ~rep0 & (~hit | (ro >= RING))
        predi = jnp.zeros(mc, jnp.int32)
        if words_mode:
            predi = _pred_at_items(start, kind, length, pk1, buf, n2)
            sc = jnp.where(live, start, 0)
            pair = (buf[sc].astype(jnp.int32)
                    | buf[jnp.clip(sc + 1, 0, n - 1)].astype(jnp.int32) << 8)
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
            return _expand(start, hk, q, hl, tl, n2)

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
            state[6] & state[5], pass_body, lambda s: s, state
        )
    start, kind, length, q, n2, ok, _ = state

    # final exactness check + fields
    resid, rep0, hit, ro, predi = violations(start, kind, length, q, n2)
    ok = ok & ~resid.any()
    ro = jnp.where((kind == 2) & ~rep0 & hit, ro, 0)
    return start, kind, length, q, rep0, ro, predi, n2, ok


def emit_items2(start, kind, length, q, rep0, ro, n_items, pk1, buf,
                seg_len, predi=None) -> Items:
    """Item emission from repaired OTZ2 arrays (oracle _emit_items with
    rings_mode=1 reduced offsets).  Shares the length-prediction rules with
    ops/parse.build_items.  predi (words_mode=1): the decoder-exact word
    predictions per item — sr_unlikely must come from them, not from the
    analysis's mask-approximate model."""
    mc = start.shape[0]
    n = pk1.shape[0]
    end = PAD_FRONT + seg_len
    idx = jnp.arange(mc, dtype=jnp.int32)
    valid = idx < n_items
    startc = jnp.where(valid, start, 0)
    f = pk1[startc]
    cctx = (f >> 10) & 0xFF
    pred8 = (f >> 18) & 0xFF if predi is None else predi & 0xFF
    kind = jnp.where(valid, kind, 0)
    is_match = kind == 2

    after_literal = jnp.concatenate(
        [jnp.ones(1, jnp.int32), (kind[:-1] == 0).astype(jnp.int32)]
    )
    roid, robitlen_all, robits_all = roid_of_ro(ro)
    robitlen = jnp.where(is_match & ~rep0, robitlen_all, 0)
    robits = jnp.where(is_match & ~rep0, robits_all, 0)

    # length prediction over the final items (same merge-sort machinery as
    # build_items: expected/len_min per target, fence-room capped)
    q_key = jnp.where(is_match & valid, q, jnp.int32(0x7FFFFFFF))
    skey = jnp.concatenate([jnp.where(valid, start, 0x7FFFFFFE), q_key])
    srole = jnp.concatenate([jnp.zeros(mc, jnp.int32), jnp.ones(mc, jnp.int32)])
    spay = jnp.concatenate([idx, idx])
    slen = jnp.concatenate([
        jnp.zeros(mc, jnp.int32), jnp.where(is_match, length, 0)
    ])
    o_key, o_role, o_pay, o_len = lax.sort(
        (skey, srole, spay, slen), num_keys=2
    )
    last_item = lax.cummax(jnp.where(o_role == 0, o_pay, -1))
    qslot = jnp.where(o_role == 1, o_pay, mc)
    cand = jnp.zeros(mc + 1, jnp.int32).at[qslot].max(
        jnp.maximum(last_item, 0), mode="drop"
    )[:mc]
    hit = (startc[jnp.clip(cand, 0, mc - 1)] == q) & is_match
    expected_q = jnp.where(
        hit & (kind[jnp.clip(cand, 0, mc - 1)] == 2),
        length[jnp.clip(cand, 0, mc - 1)], 0,
    )
    first = jnp.concatenate([
        jnp.ones(1, bool),
        (o_key[1:] != o_key[:-1]) | (o_role[1:] != o_role[:-1]),
    ])
    _, incl = lax.associative_scan(_seg_max, (first, o_len))
    excl = jnp.where(
        first, 0, jnp.concatenate([jnp.zeros(1, jnp.int32), incl[:-1]])
    )
    prev_max_l = jnp.zeros(mc + 1, jnp.int32).at[qslot].max(
        jnp.where(o_role == 1, excl, 0), mode="drop"
    )[:mc]
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
    pred_ok = ~jnp.any(is_match & (lm - length > NEG_EML_DEPTH))
    eml_raw = jnp.where(is_match, length - LZ_MATCH_MIN_LEN, 0)
    eml = jnp.where(is_match & pred_ok, e_pred, eml_raw)
    lenid = jnp.minimum(eml, LZ_LENID_SIZE - 1)
    symbol = jnp.where(
        is_match,
        jnp.where(rep0, REP0_BASE + lenid, 256 + roid * LZ_LENID_SIZE + lenid),
        jnp.where(kind == 1, WORD_SYMBOL,
                  buf[startc].astype(jnp.int32)),
    )
    sr_ctx = cctx | (after_literal << 8)
    return Items(
        jnp.where(valid, start, end), n_items, kind, length, symbol, sr_ctx,
        pred8, after_literal, robitlen, robits, eml, pred_ok,
    )
