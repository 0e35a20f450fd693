"""Phase 2 — parse decisions and item extraction.

The reference's parse loop advances a cursor by a data-dependent amount per
item (reference src/lz.rs:131-235) — inherently serial.  In OTZ every
position's decision ("IF an item started here, what would it be?") is a pure
function of phase-1 arrays, so the item sequence is the orbit of
next(p) = p + len(p) from the segment start: a functional-graph traversal,
extracted in O(log n) parallel steps by pointer doubling (item i's position
is the i-fold composition of `next`, built from jump tables J_{2^k}).

Oracle: orz_tpu/device/refcodec.py parse_ref.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
from jax import lax
import jax.numpy as jnp

from orz_tpu.device.spec import (
    LAZY_LEN_CAP,
    LZ_LENID_SIZE,
    LZ_MATCH_MIN_LEN,
    PAD_FRONT,
    REP0_BASE,
    ROBITS_CHEAP,
    ROID_ENC,
    WORD_SYMBOL,
)
from orz_tpu.ops.analyze import Analysis, _shift_left

ROID_ENC_J = jnp.asarray(ROID_ENC)  # (32766, 3): roid, robitlen, robits


class Decisions(NamedTuple):
    kind: jnp.ndarray  # per position: 0 literal, 1 word, 2 match
    length: jnp.ndarray  # per position item length
    nxt: jnp.ndarray  # next item-start position (fixed point at end)


class Items(NamedTuple):
    start: jnp.ndarray  # (M,) item start positions (== end when past last)
    n_items: jnp.ndarray  # scalar
    kind: jnp.ndarray
    length: jnp.ndarray
    symbol: jnp.ndarray  # pre-symrank symbol
    sr_ctx: jnp.ndarray
    sr_unlikely: jnp.ndarray
    after_literal: jnp.ndarray
    robitlen: jnp.ndarray
    robits: jnp.ndarray
    eml: jnp.ndarray
    pred_len: jnp.ndarray  # scalar bool: length prediction active


def decisions(an: Analysis, seg_len: jnp.ndarray, n: int) -> Decisions:
    """Per-position parse decisions (mirrors refcodec parse_ref rules)."""
    p = jnp.arange(n, dtype=jnp.int32)
    end = PAD_FRONT + seg_len
    is_m = an.bestlen >= LZ_MATCH_MIN_LEN
    robitlen = ROID_ENC_J[jnp.clip(an.bestro, 0, ROID_ENC_J.shape[0] - 1), 1]
    lazy_len1 = an.bestlen + 1 + (robitlen < ROBITS_CHEAP)
    bl1 = _shift_left(an.bestlen, 1)
    bl2 = _shift_left(an.bestlen, 2)
    short = an.bestlen < LAZY_LEN_CAP
    lazy1 = is_m & short & (bl1 >= lazy_len1)
    lazy2 = is_m & short & (bl2 >= lazy_len1 - an.wordmatch.astype(jnp.int32))
    m_emit = is_m & ~lazy1 & ~lazy2
    w_emit = ~m_emit & an.wordmatch & ~lazy1 & (p + 2 <= end)
    kind = jnp.where(m_emit, 2, jnp.where(w_emit, 1, 0)).astype(jnp.int32)
    length = jnp.where(m_emit, an.bestlen, jnp.where(w_emit, 2, 1)).astype(jnp.int32)
    nxt = jnp.minimum(p + length, end).astype(jnp.int32)
    return Decisions(kind, length, nxt)


def extract_items(dec: Decisions, an: Analysis, buf: jnp.ndarray, seg_len: jnp.ndarray) -> Items:
    """Pointer-doubling orbit extraction: start[i] = next^i(PAD_FRONT).

    Two-level scheme to keep full-size (n,) gathers to a minimum: only
    LOCAL_BITS jump tables are squared at full size; the orbit is walked at
    stride 2^LOCAL_BITS on an (m / 2^LOCAL_BITS)-sized coarse chain, then
    each coarse anchor expands its 2^LOCAL_BITS successors with the small
    tables.  ~5 full-size gathers instead of ~log2(n)."""
    n = dec.nxt.shape[0]
    m = n - PAD_FRONT  # max possible items
    end = PAD_FRONT + seg_len

    LOCAL_BITS = 5
    stride = 1 << LOCAL_BITS
    jumps = [dec.nxt]
    for _ in range(LOCAL_BITS):
        jumps.append(jumps[-1][jumps[-1]])
    jump_stride = jumps[-1]  # advance 2^LOCAL_BITS items

    # coarse chain: anchor c = position of item c*stride, walked as a SCALAR
    # chain (~n_items/32 latency-bound steps — far cheaper than doubling,
    # which needs log2(m) more full-size jump-table squarings)
    mc = -(-m // stride)

    def walk_cond(carry):
        c, pos, _ = carry
        return (c < mc) & (pos < end)

    def walk_body(carry):
        c, pos, anchors = carry
        anchors = anchors.at[c].set(pos)
        return c + 1, jump_stride[pos], anchors

    anchors0 = jnp.full((mc,), 0, jnp.int32) + end  # unreached -> end
    _, _, cpos = lax.while_loop(
        walk_cond, walk_body, (jnp.int32(0), jnp.int32(PAD_FRONT), anchors0)
    )

    # expand: item i = anchor(i >> LOCAL_BITS) advanced by the low bits
    i_idx = jnp.arange(m, dtype=jnp.int32)
    pos = cpos[i_idx >> LOCAL_BITS]
    for k in range(LOCAL_BITS):
        bit = (i_idx >> k) & 1
        pos = jnp.where(bit == 1, jumps[k][pos], pos)

    valid = pos < end
    n_items = valid.sum().astype(jnp.int32)

    start = pos
    kind = jnp.where(valid, dec.kind[start], 0)
    length = jnp.where(valid, dec.length[start], 0)
    after_literal = jnp.concatenate(
        [jnp.ones(1, jnp.int32), (kind[:-1] == 0).astype(jnp.int32)]
    )

    # rep0: previous match's distance, found via a running max of match
    # item indices (cummax compiles far leaner than an associative scan)
    dist = jnp.where(kind == 2, start - an.bestq[start], 0)
    m_ids = jnp.arange(m, dtype=jnp.int32)
    last_match = jax.lax.cummax(jnp.where(kind == 2, m_ids, -1))
    prev_match = jnp.concatenate([jnp.full(1, -1, jnp.int32), last_match[:-1]])
    prev_dist = jnp.where(prev_match >= 0, dist[jnp.clip(prev_match, 0, m - 1)], 0)
    rep0 = (kind == 2) & (dist == prev_dist) & (prev_dist > 0)

    ro = an.bestro[start]
    roid = ROID_ENC_J[ro, 0]
    robitlen = jnp.where((kind == 2) & ~rep0, ROID_ENC_J[ro, 1], 0)
    robits = jnp.where((kind == 2) & ~rep0, ROID_ENC_J[ro, 2], 0)

    # length prediction (refcodec parse_ref): expected(q) = length coded at
    # item q if it was a match; len_min(q) at item i = min(127, 1 + max
    # length of EARLIER matches targeting q) — an exclusive segmented
    # running max over match items grouped by target.
    n = dec.nxt.shape[0]
    is_match = kind == 2
    q_pos = jnp.where(is_match, an.bestq[start], 0)
    is_item = jnp.zeros(n, bool).at[jnp.where(valid, start, n - 1)].set(True)
    item_is_match = jnp.zeros(n, bool).at[
        jnp.where(valid & is_match, start, n - 1)
    ].set(True)
    expected_q = jnp.where(
        is_item[q_pos] & item_is_match[q_pos], dec.length[q_pos], 0
    )

    key = jnp.where(is_match & valid, q_pos, n)  # group match items by target
    skey, sidx = lax.sort((key, m_ids), num_keys=2)
    L_sorted = jnp.where(is_match, length, 0)[sidx]
    first = jnp.concatenate([jnp.ones(1, bool), skey[1:] != skey[:-1]])
    gid = jnp.cumsum(first.astype(jnp.int32))
    # keyed cummax in int64: lengths are < 512, so gid*512 keys the groups;
    # int32 would overflow once gid exceeds ~4.2M (segment_size >= ~16 MiB
    # with dense 4-byte matches) and silently corrupt eml values
    incl = (
        lax.cummax(L_sorted.astype(jnp.int64) + gid.astype(jnp.int64) * 512)
        - gid.astype(jnp.int64) * 512
    ).astype(jnp.int32)  # in-group cummax
    excl = jnp.where(
        first, 0, jnp.concatenate([jnp.zeros(1, jnp.int32), incl[:-1]])
    )
    prev_max_l = jnp.zeros(m, jnp.int32).at[sidx].set(excl, unique_indices=True)
    len_min_q = jnp.where(prev_max_l > 0, jnp.minimum(prev_max_l + 1, 127), 0)

    lm = jnp.maximum(len_min_q, LZ_MATCH_MIN_LEN)
    ex = jnp.maximum(expected_q, LZ_MATCH_MIN_LEN)
    e_pred = jnp.where(
        length > ex, length - lm, jnp.where(length < ex, length - lm + 1, 0)
    )
    pred_ok = ~jnp.any(is_match & (length < lm))
    eml_raw = jnp.where(kind == 2, length - LZ_MATCH_MIN_LEN, 0)
    eml = jnp.where(is_match & pred_ok, e_pred, eml_raw)
    lenid = jnp.minimum(eml, LZ_LENID_SIZE - 1)
    symbol = jnp.where(
        kind == 2,
        jnp.where(rep0, REP0_BASE + lenid, 256 + roid * LZ_LENID_SIZE + lenid),
        jnp.where(kind == 1, WORD_SYMBOL, buf[start].astype(jnp.int32)),
    )
    sr_ctx = an.cctx[start] | (after_literal << 8)
    sr_unlikely = an.pred[start] & 0xFF
    return Items(
        start, n_items, kind, length, symbol, sr_ctx, sr_unlikely,
        after_literal, robitlen, robits, eml, pred_ok,
    )
