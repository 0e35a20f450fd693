"""Phase 2 — parse decisions and item extraction.

The reference's parse loop advances a cursor by a data-dependent amount per
item (reference src/lz.rs:131-235) — inherently serial.  In OTZ every
position's decision ("IF an item started here, what would it be?") is a pure
function of phase-1 arrays, so the item sequence is the orbit of
next(p) = p + len(p) from the segment start.

v2: matches never cross a parse FENCE (a fixed spec.FENCE grid; enforced by
the fence cap in ops/analyze.py), so every fence line is an item start and
the orbit decomposes into ~n/FENCE independent per-block walks that run in
lockstep as one batched-gather loop — no pointer-doubling jump tables (each
squaring was a full-size gather, ~30 ms at 4Mi) and no serial coarse chain.

Item-field construction is split out (build_items) so the pipeline can run
it at a bucketed item capacity M_CAP << n after syncing n_items: all
item-space sorts/gathers then cost ~n_items, not n.

Oracle: orz_tpu/device/refcodec.py parse_ref.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
from jax import lax
import jax.numpy as jnp

from orz_tpu.device.spec import (
    FENCE,
    LAZY_LEN_CAP,
    LZ_LENID_SIZE,
    LZ_MATCH_MIN_LEN,
    NEG_EML_BASE,
    NEG_EML_DEPTH,
    PAD_FRONT,
    REP0_BASE,
    ROBITS_CHEAP,
    ROID_GROUP_BITS,
    WORD_SYMBOL,
)
from orz_tpu.ops.analyze import Analysis, _shift_left


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


def _ilog2(v: jnp.ndarray) -> jnp.ndarray:
    """floor(log2(v)) for int32 1 <= v < 2^24 via the f32 exponent."""
    f = v.astype(jnp.float32)
    return (lax.bitcast_convert_type(f, jnp.int32) >> 23) - 127


def roid_of_ro(ro: jnp.ndarray):
    """(roid, robitlen, robits) arithmetically from the reduced offset.

    The schedule (reference src/lz.rs:494-534, extended in spec.py): ids come
    in pairs per bit-length level L, each id covering 2^L offsets, so level
    L starts at offset 2^(L+1) - 2.  A table lookup here would be a 30 ms
    full-size gather; this is ~8 elementwise ops.
    """
    v = jnp.maximum(ro, 0) + 2
    lvl = _ilog2(v) - 1
    base = (jnp.int32(1) << (lvl + 1)) - 2
    off = ro - base
    roid = (lvl << ROID_GROUP_BITS) + (off >> lvl)
    robits = off & ((jnp.int32(1) << lvl) - 1)
    return roid, lvl, robits


def decisions(an: Analysis, seg_len: jnp.ndarray, n: int) -> Decisions:
    """Per-position parse decisions (mirrors refcodec parse_ref rules)."""
    p = jnp.arange(n, dtype=jnp.int32)
    end = PAD_FRONT + seg_len
    is_m = an.bestlen >= LZ_MATCH_MIN_LEN
    _, robitlen, _ = roid_of_ro(an.bestro)
    lazy_len1 = an.bestlen + 1 + (robitlen < ROBITS_CHEAP)
    bl1 = _shift_left(an.bestlen, 1)
    bl2 = _shift_left(an.bestlen, 2)
    short = an.bestlen < LAZY_LEN_CAP
    lazy1 = is_m & short & (bl1 >= lazy_len1)
    lazy2 = is_m & short & (bl2 >= lazy_len1 - an.wordmatch.astype(jnp.int32))
    m_emit = is_m & ~lazy1 & ~lazy2
    # word items may not cross the parse fence (or the segment end)
    fence_room = (FENCE - ((p - PAD_FRONT) & (FENCE - 1))) >= 2
    w_emit = ~m_emit & an.wordmatch & ~lazy1 & (p + 2 <= end) & fence_room
    kind = jnp.where(m_emit, 2, jnp.where(w_emit, 1, 0)).astype(jnp.int32)
    length = jnp.where(m_emit, an.bestlen, jnp.where(w_emit, 2, 1)).astype(jnp.int32)
    nxt = jnp.minimum(p + length, end).astype(jnp.int32)
    return Decisions(kind, length, nxt)


WALK_CHUNK = 256  # scan steps per straight-line chunk


def walk_items(dec: Decisions, seg_len: jnp.ndarray, n: int):
    """Fence-block item walk: item start positions in stream order.

    Every fence line is an item start (no item crosses a fence), so block k
    walks nxt() from PAD_FRONT + k*FENCE until it leaves the block; the
    blocks advance in lockstep (one n_blocks-sized gather per step).  The
    step loop runs as FENCE/WALK_CHUNK separate lax.scan calls, each
    skippable once every block is done: scan stacks the per-step records as
    OUTPUTS, so nothing large rides a loop carry (a while_loop carrying the
    (n_blocks, FENCE) record was bracketed by XLA with a memory-space copy
    of the record on every iteration).

    Returns (starts, n_items): starts is (m,) int32, the item start
    positions sorted in stream order with the tail filled with `end`.
    """
    m = n - PAD_FRONT
    n_blocks = -(-m // FENCE)
    end = PAD_FRONT + seg_len
    base = PAD_FRONT + FENCE * jnp.arange(n_blocks, dtype=jnp.int32)
    blk_end = jnp.minimum(base + FENCE, end)

    def step(cur, _):
        active = cur < blk_end
        rec_t = jnp.where(active, cur, end)
        nxt = dec.nxt[jnp.clip(cur, 0, n - 1)]
        return jnp.where(active, nxt, cur), rec_t

    def run_chunk(cur):
        return lax.scan(step, cur, None, length=WALK_CHUNK)

    def skip_chunk(cur):
        return cur, jnp.full((WALK_CHUNK, n_blocks), end, jnp.int32)

    cur = base
    recs = []
    for _ in range(FENCE // WALK_CHUNK):
        cur, rec = lax.cond(jnp.any(cur < blk_end), run_chunk, skip_chunk,
                            cur)
        recs.append(rec)
    rec = jnp.concatenate(recs, axis=0)  # (FENCE, n_blocks), step-major

    # compact to stream order: one sort by (position, .) — items of block k
    # all precede block k+1's and are recorded in increasing order
    flat = rec.T.reshape(-1)
    starts = lax.sort(flat)
    n_items = (starts < end).sum().astype(jnp.int32)
    if flat.shape[0] >= m:
        starts = starts[:m]
    else:  # n_blocks*FENCE < m cannot happen (FENCE tiles m), but be safe
        starts = jnp.concatenate(
            [starts, jnp.full(m - flat.shape[0], 1 << 30, jnp.int32)]
        )
    return starts, n_items


def pack_fields(an: Analysis, dec: Decisions, buf: jnp.ndarray) -> jnp.ndarray:
    """Pack the per-position fields build_items needs into one int32 so the
    item-space view costs one gather instead of several.  Bits 2..9 hold
    the match length for matches and the LITERAL BYTE for non-matches
    (length is implied by kind for literals/words), which saves build_items
    a separate buf[start] gather."""
    lob = jnp.where(dec.kind == 2, dec.length, buf.astype(jnp.int32))
    return (
        dec.kind
        | (lob << 2)
        | (an.cctx << 10)
        | ((an.pred & 0xFF) << 18)
    )


def build_items(
    starts: jnp.ndarray,  # (M_CAP,) item starts (stream order, end-filled)
    n_items: jnp.ndarray,
    pk1: jnp.ndarray,  # (n,) packed kind/len-or-byte/cctx/pred8
    bestq: jnp.ndarray,  # (n,)
    bestro: jnp.ndarray,  # (n,)
    seg_len: jnp.ndarray,
) -> Items:
    """Item arrays from compacted starts (runs at the M_CAP bucket)."""
    mc = starts.shape[0]
    n = pk1.shape[0]
    end = PAD_FRONT + seg_len
    valid = jnp.arange(mc, dtype=jnp.int32) < n_items
    start = jnp.where(valid, starts, 0)

    f = pk1[start]
    kind = jnp.where(valid, f & 3, 0)
    lob = (f >> 2) & 0xFF  # match length / literal byte (see pack_fields)
    length = jnp.where(
        valid, jnp.where(kind == 2, lob, jnp.where(kind == 1, 2, 1)), 0
    )
    cctx = (f >> 10) & 0xFF
    pred8 = (f >> 18) & 0xFF
    after_literal = jnp.concatenate(
        [jnp.ones(1, jnp.int32), (kind[:-1] == 0).astype(jnp.int32)]
    )

    # rep0: previous match's distance, found via a running max of match
    # item indices (cummax compiles far leaner than an associative scan)
    q_item = jnp.where(kind == 2, bestq[start], 0)
    dist = jnp.where(kind == 2, start - q_item, 0)
    m_ids = jnp.arange(mc, dtype=jnp.int32)
    last_match = lax.cummax(jnp.where(kind == 2, m_ids, -1))
    prev_match = jnp.concatenate([jnp.full(1, -1, jnp.int32), last_match[:-1]])
    prev_dist = jnp.where(prev_match >= 0, dist[jnp.clip(prev_match, 0, mc - 1)], 0)
    rep0 = (kind == 2) & (dist == prev_dist) & (prev_dist > 0)

    ro = jnp.where(kind == 2, bestro[start], 0)
    roid, robitlen_all, robits_all = roid_of_ro(ro)
    robitlen = jnp.where((kind == 2) & ~rep0, robitlen_all, 0)
    robits = jnp.where((kind == 2) & ~rep0, robits_all, 0)

    # length prediction (refcodec parse_ref): expected(q) = length coded at
    # item q if it was a match; len_min(q) at item i = min(127, 1 + max
    # length of EARLIER matches targeting q); both capped by the fence room
    # at the *consuming* position p (truncated matches stay predictable).
    # "is q an item start, and which item?" via merge-sort against starts
    # (starts are sorted): no n-space scatter needed.
    is_match = kind == 2
    q_key = jnp.where(is_match & valid, q_item, jnp.int32(0x7FFFFFFF))
    skey = jnp.concatenate([jnp.where(valid, starts, 0x7FFFFFFE), q_key])
    srole = jnp.concatenate([  # 0 = item, 1 = query: items first at equal key
        jnp.zeros(mc, jnp.int32), jnp.ones(mc, jnp.int32)
    ])
    spay = jnp.concatenate([m_ids, m_ids])  # item idx / query's item idx
    slen = jnp.concatenate([  # query rows carry their match length
        jnp.zeros(mc, jnp.int32), jnp.where(is_match, length, 0)
    ])
    o_key, o_role, o_pay, o_len = lax.sort(
        (skey, srole, spay, slen), num_keys=2
    )
    last_item = lax.cummax(jnp.where(o_role == 0, o_pay, -1))
    # deliver each query row's candidate back to its item slot
    qslot = jnp.where(o_role == 1, o_pay, mc)
    cand = jnp.zeros(mc + 1, jnp.int32).at[qslot].max(
        jnp.maximum(last_item, 0), mode="drop"
    )[:mc]
    hit = (start[cand] == q_item) & is_match
    expected_q = jnp.where(hit & (kind[cand] == 2), length[cand], 0)

    # len_min: exclusive running max over matches grouped by target — the
    # query rows of the SAME merge sort are contiguous per target key and
    # stably ordered by item index, so a segmented scan over the carried
    # lengths replaces the separate (target, item)-keyed sort + scatter.
    first = jnp.concatenate([
        jnp.ones(1, bool),
        (o_key[1:] != o_key[:-1]) | (o_role[1:] != o_role[:-1]),
    ])

    def _seg_op(a, b):
        fa, ma = a
        fb, mb = b
        return fa | fb, jnp.where(fb, mb, jnp.maximum(ma, mb))

    _, incl = lax.associative_scan(_seg_op, (first, o_len))
    excl = jnp.where(
        first, 0, jnp.concatenate([jnp.zeros(1, jnp.int32), incl[:-1]])
    )
    prev_max_l = jnp.zeros(mc + 1, jnp.int32).at[qslot].max(
        jnp.where(o_role == 1, excl, 0), mode="drop"
    )[:mc]
    len_min_q = jnp.where(prev_max_l > 0, jnp.minimum(prev_max_l + 1, 127), 0)

    fence_room = jnp.minimum(
        FENCE - ((start - PAD_FRONT) & (FENCE - 1)), end - start
    )
    lm = jnp.minimum(
        jnp.maximum(len_min_q, LZ_MATCH_MIN_LEN), fence_room
    )
    ex = jnp.maximum(expected_q, LZ_MATCH_MIN_LEN)
    e_pred = jnp.where(
        length < lm,  # below the floor: negative band (spec.NEG_EML_BASE)
        NEG_EML_BASE + (lm - 1 - length),
        jnp.where(
            length > ex, length - lm,
            jnp.where(length < ex, length - lm + 1, 0)
        ),
    )
    pred_ok = ~jnp.any(is_match & (lm - length > NEG_EML_DEPTH))
    eml_raw = jnp.where(kind == 2, length - LZ_MATCH_MIN_LEN, 0)
    eml = jnp.where(is_match & pred_ok, e_pred, eml_raw)
    lenid = jnp.minimum(eml, LZ_LENID_SIZE - 1)
    symbol = jnp.where(
        kind == 2,
        jnp.where(rep0, REP0_BASE + lenid, 256 + roid * LZ_LENID_SIZE + lenid),
        jnp.where(kind == 1, WORD_SYMBOL, lob),  # literal byte from pk1
    )
    sr_ctx = cctx | (after_literal << 8)
    sr_unlikely = pred8
    return Items(
        jnp.where(valid, starts, end), n_items, kind, length, symbol, sr_ctx,
        sr_unlikely, after_literal, robitlen, robits, eml, pred_ok,
    )


def extract_items(dec: Decisions, an: Analysis, buf: jnp.ndarray, seg_len: jnp.ndarray) -> Items:
    """Single-program extraction at full size (fallback / monolithic path);
    the staged pipeline runs walk_items and build_items separately so
    build_items can use a bucketed item capacity."""
    n = dec.nxt.shape[0]
    starts, n_items = walk_items(dec, seg_len, n)
    pk1 = pack_fields(an, dec, buf)
    return build_items(starts, n_items, pk1, an.bestq, an.bestro, seg_len)
