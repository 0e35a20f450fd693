"""Batched OTZ device encode: B same-bucket segments per dispatch.

Round 3 measured the per-segment staged pipeline at ~15 host->device
dispatches per 2 MiB segment, each costing a full round trip through the
dev harness's relay tunnel (~170 ms) — ~6x the real on-chip compute.
Threads cannot hide this (the tunnel serializes RPCs), so the fix is fewer,
fatter dispatches: stack B segments on a leading batch axis and vmap the
per-segment bodies (orz_tpu/device/pipeline.py) into four programs:

  FRONT    (1 dispatch): unmasked analyze + parse walk, all B segments.
  QUALITY  (1 dispatch): masked plan + the whole OTZ2 iteration schedule as
           lax.scan runs + the conform analyses of the LAST TWO iterates
           (the emission best-of-2 of pipeline.dispatch_segment_mid2, moved
           on-device).
  MID2     (1 dispatch): conform/repair/emit for both iterates, per-segment
           demotion-ranked selection, symrank plan stats.
  BACK     (1 dispatch): census + Pallas symrank + entropy + bit packing.

plus 4 small host syncs (n_items for the item bucket, symrank rounds for
the schedule buckets, meta, payload words) — ~8 round trips per B segments
instead of ~15 per segment.  The batch axis is also the unit the multi-chip
mesh shards (orz_tpu/parallel/mesh.py).

The per-segment fallbacks survive: a segment whose OTZ2 repair failed
re-runs through the per-segment OTZ1 mid/back (pipeline.py) from the batch
front outputs; a pathologically skewed batch (symrank rounds past
R_CAP_MAX) falls back to the per-segment staged path wholesale.

Levels without OTZ2 (l0/l1, or rings_mode=0) skip QUALITY/MID2 and run the
vmapped OTZ1 mid instead: 3 dispatches + 3 syncs per batch.
"""

from __future__ import annotations

from functools import partial

import jax
from jax import lax
import jax.numpy as jnp
import numpy as np

from orz_tpu.device import pipeline as pipe
from orz_tpu.device.pipeline import (
    SegmentOut,
    _bucket,
    _bucket_capacity,
)
from orz_tpu.device.spec import (
    CHUNK_INPUT_DEFAULT,
    PAD_FRONT,
    PAD_TAIL,
    candidate_depth,
    n_chunks_for,
    otz2_enabled,
    otz2_schedule,
)
from orz_tpu.golden.bitio import BitEncoder
from orz_tpu.ops.symrank_pallas import R_CAP_MAX, RB_BLK
from orz_tpu.utils import tpu_jit

DEFAULT_BATCH = 4


def _runs(schedule):
    """Group the iteration schedule into (depth, count) runs (static)."""
    runs: list[list[int]] = []
    for d in schedule:
        if runs and runs[-1][0] == d:
            runs[-1][1] += 1
        else:
            runs.append([d, 1])
    return tuple((d, c) for d, c in runs)


@partial(tpu_jit, static_argnames=("depth",), donate_argnums=(0,))
def b_front_jit(bufs, seg_lens, depth: int):
    from orz_tpu.ops.batched import front_body_b

    return front_body_b(bufs, seg_lens, depth)


def quality_scan_body(bufs, seg_lens, mask0, ni0, head):
    """Masked plan + the head of the iteration schedule (all but the last
    two steps) as mask-carry scans.  Returns (plan, mask, ni).  Plain
    traceable body — shared by the batched jits below and the shard_map
    mesh chain (orz_tpu/parallel/mesh.py): ONE source of truth."""
    from orz_tpu.ops.batched import iter2_mask_step_b, masked_plan_b

    plan = masked_plan_b(bufs, seg_lens)
    mask, ni = mask0, ni0

    def scan_run(depth, steps, mask, ni):
        def sbody(carry, _):
            m, _ni = carry
            return iter2_mask_step_b(bufs, seg_lens, depth, m, plan), None

        (mask, ni), _ = jax.lax.scan(sbody, (mask, ni), None, length=steps)
        return mask, ni

    i = 0
    while i < len(head):
        j = i
        while j < len(head) and head[j] == head[i]:
            j += 1
        mask, ni = scan_run(head[i], j - i, mask, ni)
        i = j
    return plan, mask, ni


def quality_tail_body(bufs, seg_lens, plan, starts0, ni0, pk0, mask, tail,
                      c_shifts: int):
    """The final two full iterates + their conform analyses.  Returns two
    iterate tuples (starts, n_items, pk1, bestq2, bestlen2): A = second-to-
    last, B = last.  Shared body (see quality_scan_body)."""
    from orz_tpu.ops.batched import conform_mask_b, iter2_full_step_b

    if len(tail) == 2:
        st_a, ni_a, pk_a, mask_a = iter2_full_step_b(
            bufs, seg_lens, tail[0], mask, plan
        )
    else:  # single-step schedule: iterate A is the front parse itself
        st_a, ni_a, pk_a, mask_a = starts0, ni0, pk0, mask
    st_b, ni_b, pk_b, mask_b = iter2_full_step_b(
        bufs, seg_lens, tail[-1], mask_a, plan
    )
    bq_a, bl_a = conform_mask_b(bufs, seg_lens, c_shifts, mask_a, plan)
    bq_b, bl_b = conform_mask_b(bufs, seg_lens, c_shifts, mask_b, plan)
    return (st_a, ni_a, pk_a, bq_a, bl_a), (st_b, ni_b, pk_b, bq_b, bl_b)


# Two separate programs (scan head / tail) halve the peak compile memory of
# the former single quality program, whose XLA compile OOMed the local AOT
# helper at N_DW=16.  (Named wrappers, not partial(tpu_jit)(body): the jit
# name feeds the compiled-program name, keeping compile-cache entries
# stable.)


@partial(tpu_jit, static_argnames=("head",))
def b_scan_jit(bufs, seg_lens, mask0, ni0, head):
    return quality_scan_body(bufs, seg_lens, mask0, ni0, head)


@partial(tpu_jit, static_argnames=("tail", "c_shifts"))
def b_tail_jit(bufs, seg_lens, plan, starts0, ni0, pk0, mask, tail,
               c_shifts: int):
    return quality_tail_body(bufs, seg_lens, plan, starts0, ni0, pk0, mask,
                             tail, c_shifts)


def b_quality(bufs, seg_lens, starts0, ni0, pk0, mask0, runs,
              c_shifts: int):
    """Two-dispatch quality chain (see b_scan_jit / b_tail_jit)."""
    flat = [d for d, c in runs for _ in range(c)]
    head, tail = tuple(flat[:-2]), tuple(flat[-2:])
    plan, mask, ni = b_scan_jit(bufs, seg_lens, mask0, ni0, head)
    return b_tail_jit(bufs, seg_lens, plan, starts0, ni0, pk0, mask, tail,
                      c_shifts)


def mid2_body(bufs, seg_lens, it_a, it_b, m2_cap: int):
    """Conform/repair/emit both iterates; demotion-ranked per-segment pick
    (the host best-of-2 of pipeline.dispatch_segment_mid2, on-device).
    Shared body (see quality_scan_body): the batched jit below and the
    shard_map mesh chain both run exactly this selection rule."""
    from orz_tpu.ops.batched import (
        conform_repair_b,
        emit_items2_b,
        plan_stats_b,
    )

    def emit_one(st, ni, pk, bq, bl):
        start, kind, length, q, rep0, ro, predi, n2, ok = conform_repair_b(
            st[:, :m2_cap], ni, pk, bq, bl, bufs, seg_lens, words_mode=True
        )
        items = emit_items2_b(start, kind, length, q, rep0, ro, n2, pk,
                              bufs, seg_lens, predi=predi)
        return items, ok, items.n_items - ni

    items_b, ok_b, dem_b = emit_one(*it_b)
    # newest-first pick: keep B unless anomalous and A is ok with fewer
    # demotions (pipeline.dispatch_segment_mid2's thr heuristic).  The
    # WHOLE second conform/repair/emit runs only when some segment's
    # newest iterate is anomalous (lax.cond on a scalar — the common case
    # skips half the mid2 program).
    thr = jnp.maximum(jnp.int32(1024), it_b[1] >> 7)
    anomalous = (~ok_b | (dem_b > thr)).any()

    def with_a(_):
        items_a, ok_a, dem_a = emit_one(*it_a)
        use_b = ok_b & ((dem_b <= thr) | ~ok_a | (dem_b <= dem_a))

        def sel(a, b):
            u = use_b.reshape((-1,) + (1,) * (a.ndim - 1)) if a.ndim > 1 \
                else use_b
            return jnp.where(u, b, a)

        return jax.tree.map(sel, items_a, items_b), ok_a | ok_b, dem_a

    def without_a(_):
        return items_b, ok_b, dem_b

    items, ok, dem_a = lax.cond(anomalous, with_a, without_a, 0)
    r1, rounds = plan_stats_b(items.sr_ctx, items.n_items)
    return items, ok, r1, rounds, dem_a, dem_b


@partial(jax.jit, static_argnames=("m2_cap",))
def b_mid2_jit(bufs, seg_lens, it_a, it_b, m2_cap: int):
    return mid2_body(bufs, seg_lens, it_a, it_b, m2_cap)


@partial(jax.jit, static_argnames=("m_cap",))
def b_mid_jit(starts, n_items, pk1, bestq, bestro, bufs, seg_lens,
              m_cap: int):
    from orz_tpu.ops.batched import mid_body_b

    return mid_body_b(starts, n_items, pk1, bestq, bestro, bufs, seg_lens,
                      m_cap)


@partial(jax.jit, static_argnames=("chunk_input", "c_max", "r1_cap",
                                   "rm_cap"), donate_argnums=(0,))
def b_back_jit(items, chunk_input: int, c_max: int, r1_cap: int,
               rm_cap: int) -> SegmentOut:
    from orz_tpu.ops.batched import back_body_b

    return back_body_b(items, chunk_input, c_max, r1_cap, rm_cap)


@partial(jax.jit, static_argnames=("k",))
def _b_take_words(words, k: int):
    return jax.lax.slice(words, (0, 0), (words.shape[0], k))


@jax.jit
def _stack2(a, b):
    return jnp.stack([a, b])


def _pad_batch(datas: list[bytes], cap: int):
    b = len(datas)
    arr = np.zeros((b, PAD_FRONT + cap + PAD_TAIL), dtype=np.uint8)
    for i, d in enumerate(datas):
        arr[i, PAD_FRONT : PAD_FRONT + len(d)] = np.frombuffer(d, np.uint8)
    return arr


def encode_segments_batch(
    datas: list[bytes],
    level: int = 2,
    chunk_input: int = CHUNK_INPUT_DEFAULT,
    rings_mode: int | None = None,
    staged_bufs=None,
    cap: int | None = None,
) -> list[bytes]:
    """Encode B segments through the batched pipeline; returns payloads in
    order.  All segments must fit the same `cap` bucket (default: the
    bucket of the largest).  staged_bufs: optional pre-padded (B, n) uint8
    device array (benchmarks: measures compute without the host->device
    put; copied on device since FRONT donates its input)."""
    assert datas and all(d is not None for d in datas)
    from orz_tpu.utils.memguard import maybe_relieve_jit_pressure

    maybe_relieve_jit_pressure()  # LLVM-JIT mmap exhaustion guard (round 5)
    if rings_mode is None:
        rings_mode = int(otz2_enabled(level))
    if any(len(d) == 0 for d in datas):  # empty segments: host-only framing
        return [
            pipe.encode_segment_staged(d, level, chunk_input,
                                       rings_mode=rings_mode)
            for d in datas
        ]
    if cap is None:
        cap = _bucket_capacity(max(len(d) for d in datas))
    c_max = n_chunks_for(cap, chunk_input)
    if staged_bufs is not None:
        bufs_in = staged_bufs + jnp.uint8(0)  # device copy (donated)
    else:
        bufs_in = jnp.asarray(_pad_batch(datas, cap))
    seg_lens = jnp.asarray(np.array([len(d) for d in datas], np.int32))
    depth = candidate_depth(level)

    starts, n_items, pk1, bestq, bestro, bufs_d, mask0 = b_front_jit(
        bufs_in, seg_lens, depth
    )

    if rings_mode:
        from orz_tpu.device.spec import OTZ2_CONFORM_SHIFTS

        schedule = otz2_schedule(level)
        c_shifts = OTZ2_CONFORM_SHIFTS or schedule[-1]
        it_a, it_b = b_quality(
            bufs_d, seg_lens, starts, n_items, pk1, mask0, _runs(schedule),
            c_shifts
        )
        ni_host = np.asarray(_stack2(it_a[1], it_b[1]))  # one fetch
        ni_max = max(int(ni_host.max()), 1)
        m2_cap = _bucket(ni_max + max(ni_max // 4, 4096), 1 << 14, 2)
        items, ok, r1, rounds, dem_a, dem_b = b_mid2_jit(
            bufs_d, seg_lens, it_a, it_b, m2_cap
        )
        ok_host = np.asarray(ok)
        # free the iterate arrays (10 n-sized buffers) and, when no segment
        # needs the OTZ1 fallback, the front outputs too — with two batches
        # in flight the retained intermediates exhausted device HBM on the
        # 16 GB chip (bench round-trip run, 2026-08-20)
        del it_a, it_b
        if ok_host.all():
            starts = pk1 = bestq = bestro = mask0 = None
    else:
        ni_host = np.asarray(n_items)
        m_cap = _bucket(max(int(ni_host.max()), 1), 1 << 14, 2)
        items, r1, rounds = b_mid_jit(
            starts, n_items, pk1, bestq, bestro, bufs_d, seg_lens, m_cap
        )
        ok_host = np.ones(len(datas), dtype=bool)

    rr = np.asarray(_stack2(r1, rounds))  # one fetch
    r1_h, r_h = rr[0], rr[1]
    if ((r_h - r1_h) > R_CAP_MAX).any():  # pathological skew: rare fallback
        return [
            pipe.encode_segment_staged(d, level, chunk_input,
                                       rings_mode=rings_mode)
            for d in datas
        ]
    r1_cap = _bucket(max(int(r1_h.max()), 1), RB_BLK)
    rm_cap = _bucket(max(int((r_h - r1_h).max()), 1), 4 * RB_BLK)
    out = b_back_jit(items, chunk_input, c_max, r1_cap, rm_cap)
    del items

    metas = np.asarray(out.meta)  # (B, L), one fetch
    total_words = int(metas[:, 3].max())
    k_fetch = min(
        out.words.shape[1],
        -(-max(total_words, 1) // pipe._FETCH_GRANULE) * pipe._FETCH_GRANULE,
    )
    words = np.asarray(_b_take_words(out.words, k_fetch))  # (B, k), one fetch

    payloads = []
    for b, data in enumerate(datas):
        if not ok_host[b]:  # OTZ2 repair failed: per-segment OTZ1 fallback
            front = {
                "empty": False, "data": data, "level": level,
                "chunk_input": chunk_input, "c_max": c_max,
                "seg_len": jnp.int32(len(data)),
                "front": (starts[b], n_items[b], pk1[b], bestq[b],
                          bestro[b], bufs_d[b]),
            }
            mid = pipe.dispatch_segment_mid(front)
            back = pipe.dispatch_segment_back(mid)
            payloads.append(pipe.finish_segment(data, back, chunk_input))
            continue
        enc = BitEncoder()
        enc.encode_varint(len(data))
        enc.encode_varint(chunk_input)
        payloads.append(
            pipe.assemble_segment_np(
                enc, metas[b], words[b], len(data), chunk_input,
                rings_mode=rings_mode,
            )
        )
    return payloads
