"""The OTZ device encode pipeline: one jitted program per segment shape.

Device side (encode_segment_jit): analyze -> parse -> census -> symrank ->
package-merge Huffman -> bitpack, entirely inside jit with static shapes.
Host side (DeviceSegmentCodec): pads/buckets segments, launches the jit,
then assembles the final bit stream (headers are a few hundred bits; item
payloads splice in via a vectorized shift-merge).

Decode currently runs through the sequential reference decoder (numpy) or
the native C++ OTZ decoder; OTZ targets encode throughput on-device, decode
is host work parallelized across segments (SURVEY.md section 7, hard part 3).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from orz_tpu.device.spec import (
    CHUNK_INPUT_DEFAULT,
    TABC_SIZE,
    LZ_LENID_SIZE,
    LZ_MATCH_MAX_LEN,
    PAD_FRONT,
    PAD_TAIL,
    SYMRANK_NUM_SYMBOLS,
    candidate_depth,
    n_chunks_for,
)
from orz_tpu.golden.bitio import BitEncoder
from orz_tpu.ops.analyze import analyze
from orz_tpu.utils import enable_compilation_cache, tpu_jit

enable_compilation_cache()  # device programs are huge; cache them on disk
from orz_tpu.ops.bitpack import pack_items
from orz_tpu.ops.huffman import canonical_codes, pm_code_lens
from orz_tpu.ops.parse import build_items, decisions, extract_items
from orz_tpu.ops.symrank import transform as symrank_transform

N_SYM = SYMRANK_NUM_SYMBOLS


class SegmentOut(NamedTuple):
    """Device outputs, packed for exactly TWO host fetches (each host fetch
    costs a full tunnel round trip): `meta` carries every scalar/table, and
    `words` is the flat payload the host slices by meta's word counts.

    meta layout (int32): [num_counted, pred_len, n_items, total_words,
    chunk_items(C), bitlen(C), word_base(C), census_order(N_SYM),
    lensA(C*N_SYM), lensB(C*N_SYM), lensC(C*N_SYM)].
    """

    meta: jnp.ndarray  # (4 + 3C + N_SYM + 3*C*N_SYM,) int32
    words: jnp.ndarray  # (W_total,) uint32, chunks back to back


def _w_total(c_max: int, chunk_input: int) -> int:
    # worst case ~15 bits per input byte (all rare literals); +margin
    return (c_max * chunk_input) // 2 + 64 * c_max


@partial(tpu_jit, static_argnames=("depth", "chunk_input", "c_max"))
def encode_segment_jit(
    buf: jnp.ndarray, seg_len: jnp.ndarray, depth: int, chunk_input: int, c_max: int
) -> SegmentOut:
    n = buf.shape[0]
    an = analyze(buf, seg_len, depth)
    dec = decisions(an, seg_len, n)
    items = extract_items(dec, an, buf, seg_len)
    m = items.start.shape[0]
    valid = jnp.arange(m, dtype=jnp.int32) < items.n_items
    chunk_id = jnp.clip((items.start - PAD_FRONT) // chunk_input, 0, c_max - 1)

    # chunk-0 symbol census -> shared symrank init (reference src/lz.rs:238-265)
    cens_idx = jnp.where(valid & (chunk_id == 0), items.symbol, N_SYM)
    counts = jnp.zeros(N_SYM, jnp.int32).at[cens_idx].add(1, mode="drop")
    primary = -jnp.maximum(counts, 1)
    _, census_order = jax.lax.sort(
        (primary, jnp.arange(N_SYM, dtype=jnp.int32)), num_keys=2
    )
    num_counted = (counts > 1).sum().astype(jnp.int32)

    coded = symrank_transform(
        items.symbol, items.sr_unlikely, items.sr_ctx, items.n_items, census_order
    )
    return _entropy_stage(
        items, coded, valid, chunk_id, num_counted, census_order, chunk_input, c_max
    )


def _entropy_stage(items, coded, valid, chunk_id, num_counted, census_order,
                   chunk_input: int, c_max: int) -> SegmentOut:
    """Per-chunk Huffman weights + package-merge + canonical codes + packing."""
    # flat 1d scatter indices (2d-index scatters lower via a slow path).
    # A and B are disjoint per item (after_literal selects the table), so
    # one scatter fills both; C (match length extension) is its own.
    rowAB = jnp.where(
        valid,
        jnp.where(items.after_literal == 1, chunk_id, c_max + chunk_id),
        2 * c_max,
    )
    has_ext = valid & (items.kind == 2) & (items.eml >= LZ_LENID_SIZE - 1)
    rowC = jnp.where(has_ext, chunk_id, c_max)
    codedc = jnp.clip(coded, 0, N_SYM - 1)
    emlc = jnp.clip(items.eml, 0, N_SYM - 1)
    wAB = jnp.zeros((2 * c_max + 1) * N_SYM, jnp.int32).at[
        rowAB * N_SYM + codedc
    ].add(1).reshape(2 * c_max + 1, N_SYM)
    wA, wB = wAB[:c_max], wAB[c_max : 2 * c_max]
    wC = jnp.zeros((c_max + 1) * N_SYM, jnp.int32).at[
        rowC * N_SYM + emlc
    ].add(1).reshape(c_max + 1, N_SYM)[:c_max]

    all_w = jnp.concatenate([wA, wB, wC], axis=0)
    all_lens = jax.vmap(pm_code_lens)(all_w)
    all_codes = jax.vmap(canonical_codes)(all_lens)
    lensA, lensB, lensC = jnp.split(all_lens, 3, axis=0)
    codesA, codesB, codesC = jnp.split(all_codes, 3, axis=0)

    packed = pack_items(
        coded,
        items.after_literal,
        items.kind,
        items.robitlen,
        items.robits,
        items.eml,
        chunk_id,
        items.n_items,
        codesA,
        lensA,
        codesB,
        lensB,
        codesC,
        lensC,
        _w_total(c_max, chunk_input),
        LZ_LENID_SIZE - 1,
    )
    total_words = ((packed.bitlen + 31) >> 5).sum()
    meta = jnp.concatenate([
        jnp.stack([
            num_counted,
            items.pred_len.astype(jnp.int32),
            items.n_items,
            total_words.astype(jnp.int32),
        ]),
        packed.n_items,
        packed.bitlen,
        packed.word_base,
        census_order,
        lensA.reshape(-1),
        lensB.reshape(-1),
        lensC.reshape(-1),
    ])
    return SegmentOut(meta, packed.words)


def _bucket_capacity(n: int) -> int:
    """Segment-length bucket so jit compiles a handful of shapes."""
    cap = 1 << 12
    while cap < n:
        cap *= 2
    return cap


# --- staged path: three jit programs --------------------------------------
#
# FRONT (n-space): analyze + decisions + fence-block walk -> compacted item
#   starts and n_items.  Host syncs n_items and picks the item-capacity
#   bucket M_CAP, so every item-space op downstream costs ~n_items, not n.
# MID (M_CAP): gathers per-item fields, builds the Items arrays, and
#   computes the symrank plan scalars (r1, rounds) for the host to bucket.
# BACK (M_CAP, r1_cap, rm_cap): census + Pallas symrank + entropy + packing.
#
# Each host sync is one small fetch (~tunnel latency); with several
# segments in flight the syncs of one segment overlap device work of the
# others.


def _front_body(buf: jnp.ndarray, seg_len: jnp.ndarray, depth: int):
    from orz_tpu.ops.analyze import _analyze
    from orz_tpu.ops.parse import pack_fields, walk_items

    n = buf.shape[0]
    an = _analyze(buf, seg_len, depth, None)
    dec = decisions(an, seg_len, n)
    starts, n_items = walk_items(dec, seg_len, n)
    pk1 = pack_fields(an, dec, buf)
    return starts, n_items, pk1, an.bestq, an.bestro, buf


@partial(tpu_jit, static_argnames=("depth",), donate_argnums=(0,))
def encode_front_jit(buf: jnp.ndarray, seg_len: jnp.ndarray, depth: int):
    return _front_body(buf, seg_len, depth)


def _mid_body(starts, n_items, pk1, bestq, bestro, buf, seg_len, m_cap: int):
    from orz_tpu.ops.symrank_pallas import plan_stats

    items = build_items(
        starts[:m_cap], n_items, pk1, bestq, bestro, seg_len
    )
    r1, rounds = plan_stats(items.sr_ctx, items.n_items)
    return items, r1, rounds


@partial(jax.jit, static_argnames=("m_cap",), donate_argnums=(0, 2, 3, 4))
def encode_mid_jit(starts, n_items, pk1, bestq, bestro, buf, seg_len,
                   m_cap: int):
    return _mid_body(starts, n_items, pk1, bestq, bestro, buf, seg_len, m_cap)


def _back_body(items, chunk_input: int, c_max: int, r1_cap: int,
               rm_cap: int) -> SegmentOut:
    from orz_tpu.ops.symrank_pallas import symrank_pallas

    m = items.start.shape[0]
    valid = jnp.arange(m, dtype=jnp.int32) < items.n_items
    chunk_id = jnp.clip((items.start - PAD_FRONT) // chunk_input, 0, c_max - 1)

    cens_idx = jnp.where(valid & (chunk_id == 0), items.symbol, N_SYM)
    counts = jnp.zeros(N_SYM, jnp.int32).at[cens_idx].add(1, mode="drop")
    primary = -jnp.maximum(counts, 1)
    _, census_order = jax.lax.sort(
        (primary, jnp.arange(N_SYM, dtype=jnp.int32)), num_keys=2
    )
    num_counted = (counts > 1).sum().astype(jnp.int32)

    coded = symrank_pallas(
        items.symbol, items.sr_unlikely, items.sr_ctx, items.n_items,
        census_order, r1_cap, rm_cap,
    )
    return _entropy_stage(items, coded, valid, chunk_id, num_counted,
                          census_order, chunk_input, c_max)


@partial(jax.jit, static_argnames=("chunk_input", "c_max", "r1_cap", "rm_cap"),
         donate_argnums=(0,))
def encode_back_jit(items, chunk_input: int, c_max: int, r1_cap: int,
                    rm_cap: int) -> SegmentOut:
    return _back_body(items, chunk_input, c_max, r1_cap, rm_cap)


# --- OTZ2 (rings_mode=1) staged path ---------------------------------------
#
# The parse<->ring fixed point (spec.py OTZ2, docs/OTZ2_DESIGN.md) runs as
# OTZ2_ITERS dispatches of ONE compiled iteration program (masked analyze ->
# decisions -> walk), chained on device with no host sync; a final CONFORM
# dispatch re-analyzes with the final start set as the mask, and the mid2
# program re-targets/repairs/emits in item space (ops/otz2.py).  A repair
# failure (ok=False) falls back to the OTZ1 (rings_mode=0) mid/back using
# the retained front-0 outputs.


@jax.jit
def masked_plan_jit(buf, seg_len):
    from orz_tpu.ops.analyze import masked_plan

    return masked_plan(buf, seg_len)


def _iter2_step(buf, seg_len, depth: int, starts_prev, n_items_prev, plan):
    """One masked re-parse: previous item starts gate the ring candidates."""
    from orz_tpu.ops.analyze import _analyze
    from orz_tpu.ops.parse import pack_fields, walk_items

    n = buf.shape[0]
    m = starts_prev.shape[0]
    valid = jnp.arange(m, dtype=jnp.int32) < n_items_prev
    mask = jnp.zeros(n, bool).at[
        jnp.where(valid, starts_prev, n)
    ].set(True, mode="drop")
    an = _analyze(buf, seg_len, depth, mask, words_mode=True, plan=plan)
    dec = decisions(an, seg_len, n)
    starts, n_items = walk_items(dec, seg_len, n)
    return starts, n_items, pack_fields(an, dec, buf)


@partial(tpu_jit, static_argnames=("depth",))
def encode_iter2_jit(buf, seg_len, depth: int, starts_prev, n_items_prev,
                     plan=None):
    return _iter2_step(buf, seg_len, depth, starts_prev, n_items_prev, plan)


@partial(tpu_jit, static_argnames=("depth", "steps"))
def encode_iter2_scan_jit(buf, seg_len, depth: int, steps: int, starts0,
                          n_items0, pk1_0, plan=None):
    """`steps` masked re-parses chained inside ONE program via lax.scan.

    The iterate state (starts, n_items, pk1) is shape-stable across
    iterations, so a same-depth run of the schedule collapses into a single
    dispatch: the body is traced once (compile cost ~ the single-iteration
    program) and the host pays one dispatch round trip instead of `steps`
    (~170 ms each through the dev harness's relay tunnel — the dominant
    per-segment cost of the OTZ2 quality path, STATUS.md round 3)."""
    def body(carry, _):
        st, ni, pk = carry
        return _iter2_step(buf, seg_len, depth, st, ni, plan), None

    (st, ni, pk), _ = jax.lax.scan(
        body, (starts0, n_items0, pk1_0), None, length=steps
    )
    return st, ni, pk


def _conform_body(buf, seg_len, depth: int, starts, n_items, plan=None):
    from orz_tpu.device.spec import OTZ2_CONFORM_CAP
    from orz_tpu.ops.analyze import _analyze

    n = buf.shape[0]
    m = starts.shape[0]
    valid = jnp.arange(m, dtype=jnp.int32) < n_items
    mask = jnp.zeros(n, bool).at[
        jnp.where(valid, starts, n)
    ].set(True, mode="drop")
    # full-ring search (spec.OTZ2_CONFORM_CAP): a match whose near candidate
    # died is far cheaper re-targeted at 11-13 raw offset bits than demoted
    # to literals; far candidates still pay min_match_len_for_ro gates
    an2 = _analyze(buf, seg_len, depth, mask, words_mode=True, plan=plan,
                   ro_cap=OTZ2_CONFORM_CAP)
    return an2.bestq, an2.bestlen


@partial(tpu_jit, static_argnames=("depth",))
def encode_conform_jit(buf, seg_len, depth: int, starts, n_items, plan=None):
    return _conform_body(buf, seg_len, depth, starts, n_items, plan)


@partial(jax.jit, static_argnames=("m2_cap",))
def encode_mid2_jit(starts, n_items, pk1, bestq2, bestlen2, buf, seg_len,
                    m2_cap: int):
    from orz_tpu.ops.otz2 import conform_repair, emit_items2
    from orz_tpu.ops.symrank_pallas import plan_stats

    start, kind, length, q, rep0, ro, predi, n2, ok = conform_repair(
        starts[:m2_cap], n_items, pk1, bestq2, bestlen2, buf, seg_len,
        words_mode=True,
    )
    items = emit_items2(start, kind, length, q, rep0, ro, n2, pk1, buf,
                        seg_len, predi=predi)
    r1, rounds = plan_stats(items.sr_ctx, items.n_items)
    return items, ok, r1, rounds


def dispatch_segment_front(data: bytes, level: int, chunk_input: int,
                           staged_buf=None):
    """Asynchronously dispatch the front program; returns opaque state.

    staged_buf: optional padded device-resident uint8 buffer for `data`
    (benchmarks use it to measure compute without the host->device put;
    it is copied on device since the front program donates its input)."""
    if not data:
        return {"empty": True, "data": data, "chunk_input": chunk_input}
    cap = _bucket_capacity(len(data))
    if staged_buf is not None:
        dev_buf = staged_buf + jnp.uint8(0)  # device-side copy (donated)
    else:
        buf = np.zeros(PAD_FRONT + cap + PAD_TAIL, dtype=np.uint8)
        buf[PAD_FRONT : PAD_FRONT + len(data)] = np.frombuffer(data, dtype=np.uint8)
        dev_buf = jnp.asarray(buf)
    seg_len = jnp.int32(len(data))
    starts, n_items, pk1, bestq, bestro, buf_d = encode_front_jit(
        dev_buf, seg_len, candidate_depth(level)
    )
    return {
        "empty": False,
        "data": data,
        "level": level,
        "chunk_input": chunk_input,
        "c_max": n_chunks_for(cap, chunk_input),
        "seg_len": seg_len,
        "front": (starts, n_items, pk1, bestq, bestro, buf_d),
    }


def dispatch_segment_mid(front):
    """Sync n_items, dispatch the item-build program at the M_CAP bucket."""
    if front["empty"]:
        return front
    starts, n_items, pk1, bestq, bestro, buf_d = front["front"]
    m_cap = _bucket(max(int(n_items), 1), 1 << 14, 2)
    items, r1, rounds = encode_mid_jit(
        starts, n_items, pk1, bestq, bestro, buf_d, front["seg_len"],
        m_cap,
    )
    out = dict(front)
    out["items"] = items
    out["r1"] = r1
    out["rounds"] = rounds
    return out


def _bucket(n: int, lo: int, factor: int = 4) -> int:
    """Power-of-`factor` shape bucket starting at `lo` (coarse buckets keep
    the number of compiled kernel variants small)."""
    cap = lo
    while cap < n:
        cap *= factor
    return cap


def dispatch_segment_mid2(front):
    """OTZ2 mid: chain the masked-iteration schedule (device-only, no host
    syncs), then evaluate the conform/repair/emit program for the LAST TWO
    iterates and keep the one with fewer repair demotions.  The fixed point
    converges in start-set churn but individual iterates can land on a
    phase whose emission demotes bursts of items (measured ~2 pt of ratio
    at 8 MiB); demotion count is a monotone proxy for that damage, and the
    repair only ADDS items, so emitted-minus-walk items counts it exactly.
    Falls back to the OTZ1 mid when neither repair converged or the
    capacity bucket overflowed (the front-0 outputs are still live —
    nothing here donates them)."""
    if front["empty"]:
        return front
    from orz_tpu.device.spec import otz2_schedule

    starts, n_items, pk1, bestq0, bestro0, buf_d = front["front"]
    seg_len = front["seg_len"]
    plan = masked_plan_jit(buf_d, seg_len)
    st, ni = starts, n_items
    schedule = otz2_schedule(front["level"])
    # The last (up to) 3 iterations run as separate dispatches so their
    # pre-states are host-visible for the best-of-N emission fallback below;
    # everything before them collapses into one lax.scan dispatch per
    # same-depth run (12-iteration default: 12 dispatches -> 2 scans + 3).
    n_tail = min(3, len(schedule))
    head, tail = schedule[:len(schedule) - n_tail], schedule[-n_tail:]
    hist = []  # (st, ni, pk1) of recent iterates, newest last
    i = 0
    while i < len(head):
        j = i
        while j < len(head) and head[j] == head[i]:
            j += 1
        if j - i == 1:  # single iteration: reuse the eager program
            st, ni, pk1 = encode_iter2_jit(buf_d, seg_len, head[i], st, ni,
                                           plan)
        else:
            st, ni, pk1 = encode_iter2_scan_jit(buf_d, seg_len, head[i],
                                                j - i, st, ni, pk1, plan)
        i = j
    for shifts in tail:
        hist = hist[-2:] + [(st, ni, pk1)]
        st, ni, pk1 = encode_iter2_jit(buf_d, seg_len, shifts, st, ni,
                                       plan)

    def emit_at(st, ni, pk1):
        from orz_tpu.device.spec import OTZ2_CONFORM_SHIFTS

        c_shifts = OTZ2_CONFORM_SHIFTS or schedule[-1]
        bq2, bl2 = encode_conform_jit(buf_d, seg_len, c_shifts, st, ni,
                                      plan)
        ni_host = max(int(ni), 1)
        m2_cap = _bucket(ni_host + max(ni_host // 4, 4096), 1 << 14, 2)
        items, ok, r1, rounds = encode_mid2_jit(
            st, ni, pk1, bq2, bl2, buf_d, seg_len, m2_cap
        )
        demoted = int(items.n_items) - int(ni)
        return items, bool(ok), r1, rounds, demoted

    cand = [emit_at(st, ni, pk1)]
    # only pay for extra evaluations when the newest iterate's demotions
    # look anomalous (> ~0.8% of items; good iterates measure 0.2-0.6%);
    # fall back through up to two older iterates — consecutive bad phases
    # were observed (uniform-384 scan: iterates 13 AND 14 both spiked)
    thr = max(1024, int(ni) >> 7)
    for older in reversed(hist):
        if cand[-1][1] and cand[-1][4] <= thr:
            break
        cand.append(emit_at(*older))
    del plan  # ~18 n-sized arrays; free before the back program runs
    cand = [c for c in cand if c[1]]
    if not cand:
        out = dict(dispatch_segment_mid(front))
        out["rings_mode"] = 0
        return out
    items, _, r1, rounds, _ = min(cand, key=lambda c: c[4])
    out = dict(front)
    out["items"] = items
    out["r1"] = r1
    out["rounds"] = rounds
    out["rings_mode"] = 1
    return out


def dispatch_segment_back(mid):
    """Sync the symrank plan scalars, dispatch the back program (async)."""
    from orz_tpu.ops.symrank_pallas import R_CAP_MAX, RB_BLK

    if mid["empty"]:
        return mid
    r1 = int(mid["r1"])
    r = int(mid["rounds"])
    if r - r1 > R_CAP_MAX:  # pathological skew: all items in one context
        return {
            "empty": False,
            "fallback": encode_segment_device(
                mid["data"], level=mid["level"], chunk_input=mid["chunk_input"]
            ),
        }
    r1_cap = _bucket(r1, RB_BLK)
    rm_cap = _bucket(max(r - r1, 1), 4 * RB_BLK)
    out = encode_back_jit(mid["items"], mid["chunk_input"], mid["c_max"],
                          r1_cap, rm_cap)
    return {"empty": False, "fallback": None, "out": out,
            "rings_mode": mid.get("rings_mode", 0)}


def finish_segment(data: bytes, back, chunk_input: int) -> bytes:
    """Assemble the final payload (forces the back program's outputs)."""
    if back.get("empty"):
        enc = BitEncoder()
        enc.encode_varint(0)
        enc.encode_varint(chunk_input)
        return enc.finish()
    if back.get("fallback") is not None:
        return back["fallback"]
    enc = BitEncoder()
    enc.encode_varint(len(data))
    enc.encode_varint(chunk_input)
    return assemble_segment(enc, back["out"], len(data), chunk_input,
                            rings_mode=back.get("rings_mode", 0))


def encode_segment_staged(
    data: bytes, level: int = 1, chunk_input: int = CHUNK_INPUT_DEFAULT,
    rings_mode: int | None = None,
) -> bytes:
    """Device encode via the staged (Pallas symrank) path.

    rings_mode: None follows the level default (spec.otz2_enabled); 0/1
    force the bytes-ring (OTZ1) / item-start-ring (OTZ2) modes explicitly
    (cleaner than mutating the OTZ2 env var around a call)."""
    from orz_tpu.device.spec import otz2_enabled

    if rings_mode is None:
        rings_mode = int(otz2_enabled(level))
    front = dispatch_segment_front(data, level, chunk_input)
    if rings_mode:
        mid = dispatch_segment_mid2(front)
    else:
        mid = dispatch_segment_mid(front)
    back = dispatch_segment_back(mid)
    return finish_segment(data, back, chunk_input)


def encode_segment_device(
    data: bytes, level: int = 1, chunk_input: int = CHUNK_INPUT_DEFAULT
) -> bytes:
    """Encode one OTZ segment on the device; returns the segment payload."""
    enc = BitEncoder()
    enc.encode_varint(len(data))
    enc.encode_varint(chunk_input)
    if not data:
        return enc.finish()

    cap = _bucket_capacity(len(data))
    buf = np.zeros(PAD_FRONT + cap + PAD_TAIL, dtype=np.uint8)
    buf[PAD_FRONT : PAD_FRONT + len(data)] = np.frombuffer(data, dtype=np.uint8)
    c_max = n_chunks_for(cap, chunk_input)
    out = encode_segment_jit(
        jnp.asarray(buf), jnp.int32(len(data)), candidate_depth(level), chunk_input, c_max
    )
    return assemble_segment(enc, out, len(data), chunk_input)


_FETCH_GRANULE = 1 << 14  # words (64 KiB): word-fetch slice size bucket


@partial(jax.jit, static_argnames=("k",))
def _take_words(words: jnp.ndarray, k: int) -> jnp.ndarray:
    return jax.lax.slice(words, (0,), (k,))


def assemble_segment(enc: BitEncoder, out: SegmentOut, raw_len: int, chunk_input: int,
                     rings_mode: int = 0) -> bytes:
    """Host stream assembly from device outputs (headers + payload splice).

    Exactly two device fetches: the packed meta array and a size-bucketed
    prefix of the flat payload words (each fetch is a tunnel round trip).
    """
    meta = np.asarray(out.meta)
    total_words = int(meta[3])
    k_fetch = min(
        out.words.shape[0],
        -(-max(total_words, 1) // _FETCH_GRANULE) * _FETCH_GRANULE,
    )
    words = np.asarray(_take_words(out.words, k_fetch))
    return assemble_segment_np(enc, meta, words, raw_len, chunk_input,
                               rings_mode)


def assemble_segment_np(enc: BitEncoder, meta: np.ndarray, words: np.ndarray,
                        raw_len: int, chunk_input: int,
                        rings_mode: int = 0) -> bytes:
    """Assembly core over host-resident meta/words arrays (shared by the
    per-segment and batched paths)."""
    c_max = (meta.shape[0] - 4 - N_SYM) // (3 + 3 * N_SYM)
    num_counted, pred_len, _n_items, total_words = (int(v) for v in meta[:4])
    o = 4
    chunk_items = meta[o : o + c_max]; o += c_max
    bitlen = meta[o : o + c_max]; o += c_max
    word_base = meta[o : o + c_max]; o += c_max
    order = meta[o : o + N_SYM]; o += N_SYM
    lensA = meta[o : o + c_max * N_SYM].reshape(c_max, N_SYM); o += c_max * N_SYM
    lensB = meta[o : o + c_max * N_SYM].reshape(c_max, N_SYM); o += c_max * N_SYM
    lensC = meta[o : o + c_max * N_SYM].reshape(c_max, N_SYM)

    enc.encode_raw_bits(pred_len, 1)  # prediction flag
    enc.encode_raw_bits(rings_mode, 1)  # ring insertion rule (spec.py OTZ2)
    # word-table update rule (refcodec header): OTZ2 couples item-end
    # word sampling with item-start rings; OTZ1 keeps the bytes-only rule
    enc.encode_raw_bits(rings_mode, 1)
    enc.encode_varint(num_counted)
    for s in order[:num_counted]:
        enc.encode_raw_bits(int(s), 9)

    n_chunks = n_chunks_for(raw_len, chunk_input)
    for k in range(n_chunks):
        enc.encode_varint(int(chunk_items[k]))
        enc.encode_huffman_table(lensA[k].tolist())
        enc.encode_huffman_table(lensB[k].tolist())
        enc.encode_huffman_table(lensC[k, :TABC_SIZE].tolist())
        nw = (int(bitlen[k]) + 31) // 32
        base = int(word_base[k])
        enc.append_bits_bulk(words[base : base + nw], int(bitlen[k]))
    return enc.finish()
