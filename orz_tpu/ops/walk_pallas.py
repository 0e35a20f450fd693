"""Pallas TPU kernels for the fence-block item walk.

The parse walk (ops/parse.py walk_items) follows next(p) = p + len(p) from
every FENCE-block base, in lockstep across blocks.  As XLA ops this is a
sequential scan of ~FENCE tiny gather steps, and on the dev harness every
sequential step costs ~0.3-0.8 ms of per-op overhead — the walk alone was
~1.2 s per masked iteration at (B=4, 2 MiB), the single hottest piece of
the OTZ2 schedule (round-4 chip trace).

Here the whole walk is ONE kernel: lanes are blocks (128 per grid cell),
the block's local next-table lives in VMEM as a (FENCE, 128) tile, and the
walk advances all 128 lanes per VPU step with an iota-compare-extract
(each lane reads its own cursor's jump without per-lane dynamic
addressing).  The step loop runs on-core — no per-step runtime overhead —
and exits as soon as every lane's cursor leaves its block.

Two single-output variants keep each call inside the 16 MB scoped-VMEM
budget (nxt + one output, double-buffered):

- REC kernel: per block, the LOCAL item-start offsets in walk order
  (sentinel beyond the item count); caller adds block bases and sorts per
  segment — identical start sets to walk_items / walk_items_b.
- MASK kernel: a 0/1 tile marking item-start offsets in POSITION order —
  what the OTZ2 iteration scan actually carries (no sort needed).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from orz_tpu.device.spec import FENCE, PAD_FRONT

WB = 128  # blocks (lanes) per grid cell (TPU lane width)
SENT = 0x3FFFFF  # local sentinel (>= any local offset)


def _walk_body(nxt_ref, blkend_ref, emit):
    """Shared walk loop; `emit(i, cur, active)` records the step."""
    iota_r = lax.broadcasted_iota(jnp.int32, (FENCE, WB), 0)
    blkend = blkend_ref[0:1, :]

    def cond(c):
        i, cur = c
        return (i < FENCE) & jnp.any(cur < blkend)

    def body(c):
        i, cur = c
        active = cur < blkend
        emit(i, cur, active, iota_r)
        hit = iota_r == cur  # (FENCE, WB): one-hot per lane
        nxtv = jnp.sum(jnp.where(hit, nxt_ref[:, :], 0), axis=0,
                       keepdims=True)
        # jumps always advance (next(p) >= p+1); the max guards a cursor
        # that somehow missed (cannot happen for in-range cur)
        return i + 1, jnp.where(active, jnp.maximum(nxtv, cur + 1), cur)

    lax.while_loop(cond, body, (jnp.int32(0), jnp.zeros((1, WB), jnp.int32)))


def _rec_kernel(nxt_ref, blkend_ref, rec_ref):
    rec_ref[:, :] = jnp.full((FENCE, WB), jnp.int32(SENT), jnp.int32)

    def emit(i, cur, active, iota_r):
        rec_ref[pl.ds(i, 1), :] = jnp.where(active, cur, jnp.int32(SENT))

    _walk_body(nxt_ref, blkend_ref, emit)


def _mask_kernel(nxt_ref, blkend_ref, mask_ref):
    mask_ref[:, :] = jnp.zeros((FENCE, WB), jnp.int32)

    def emit(i, cur, active, iota_r):
        mask_ref[:, :] = jnp.where(
            (iota_r == cur) & active, 1, mask_ref[:, :]
        )

    _walk_body(nxt_ref, blkend_ref, emit)


def _prep(nxt, seg_lens, n: int):
    bsz = nxt.shape[0]
    m = n - PAD_FRONT
    n_blocks = -(-m // FENCE)
    pad_to = n_blocks * FENCE
    end = (PAD_FRONT + seg_lens)[:, None]

    nxtp = nxt[:, PAD_FRONT:]
    if nxtp.shape[1] < pad_to:
        nxtp = jnp.pad(nxtp, ((0, 0), (0, pad_to - nxtp.shape[1])))
    blocks = nxtp.reshape(bsz * n_blocks, FENCE)
    base = (
        PAD_FRONT
        + FENCE * jnp.arange(n_blocks, dtype=jnp.int32)[None, :]
        + jnp.zeros((bsz, 1), jnp.int32)
    ).reshape(-1)  # (B*n_blocks,) global block bases (per-segment local)
    # local jumps: cur -> next - base, clipped into [1, FENCE] (>= blk_end
    # means "done"); rows past the real array are never reached
    local = jnp.clip(blocks - base[:, None], 1, FENCE)
    blk_end_local = jnp.clip(
        (end.reshape(bsz, 1) - base.reshape(bsz, n_blocks)), 0, FENCE
    ).reshape(-1)

    nb_total = bsz * n_blocks
    cells = -(-nb_total // WB)
    lane_pad = cells * WB - nb_total
    localT = jnp.pad(local, ((0, lane_pad), (0, 0))).T  # (FENCE, cells*WB)
    blk_endT = jnp.pad(blk_end_local, (0, lane_pad))[None, :]
    return localT, blk_endT, base, end, n_blocks, nb_total, cells


def _call(kernel, localT, blk_endT, cells: int):
    return pl.pallas_call(
        kernel,
        interpret=jax.default_backend() != "tpu",
        grid=(cells,),
        in_specs=[
            pl.BlockSpec((FENCE, WB), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, WB), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((FENCE, WB), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((FENCE, cells * WB), jnp.int32),
    )(localT, blk_endT)


def walk_items_pallas(nxt: jnp.ndarray, seg_lens: jnp.ndarray, n: int):
    """(starts, n_items, mask): sorted per-segment item starts (tail filled
    with a large sentinel) + the position mask.  Start sets identical to
    walk_items_b (tests/test_batched_ops.py).

    Off-TPU the XLA scan walk runs instead: interpreting the kernel's
    per-step while loop in Python is orders slower than the scan (the
    kernel itself is covered by dedicated small interpret-mode tests)."""
    from orz_tpu.ops.batched import mask_from_starts_b

    if jax.default_backend() != "tpu":
        from orz_tpu.ops.batched import walk_items_b

        starts, n_items = walk_items_b(nxt, seg_lens, n)
        return starts, n_items, mask_from_starts_b(starts, n_items, n)

    bsz = nxt.shape[0]
    m = n - PAD_FRONT
    localT, blk_endT, base, end, n_blocks, nb_total, cells = _prep(
        nxt, seg_lens, n
    )
    recT = _call(_rec_kernel, localT, blk_endT, cells)

    rec = recT.T[:nb_total]  # (B*n_blocks, FENCE) local offsets, walk order
    starts_all = jnp.where(
        rec >= SENT, jnp.int32(0x7FFFFFFE), rec + base[:, None]
    ).reshape(bsz, n_blocks * FENCE)
    starts = lax.sort(starts_all)
    n_items = (starts < end).sum(axis=-1).astype(jnp.int32)
    if starts.shape[1] >= m:
        starts = starts[:, :m]
    else:
        starts = jnp.concatenate(
            [starts,
             jnp.full((bsz, m - starts.shape[1]), 1 << 30, jnp.int32)],
            axis=-1,
        )
    return starts, n_items, mask_from_starts_b(starts, n_items, n)


def walk_mask_pallas(nxt: jnp.ndarray, seg_lens: jnp.ndarray, n: int):
    """(mask (B, n) bool, n_items) without any start sort — the OTZ2
    iteration scan's fast carry."""
    if jax.default_backend() != "tpu":  # see walk_items_pallas
        from orz_tpu.ops.batched import mask_from_starts_b, walk_items_b

        starts, n_items = walk_items_b(nxt, seg_lens, n)
        return mask_from_starts_b(starts, n_items, n), n_items

    bsz = nxt.shape[0]
    localT, blk_endT, base, end, n_blocks, nb_total, cells = _prep(
        nxt, seg_lens, n
    )
    maskT = _call(_mask_kernel, localT, blk_endT, cells)

    mk = maskT.T[:nb_total].reshape(bsz, n_blocks * FENCE)
    width = min(n - PAD_FRONT, n_blocks * FENCE)
    mask = jnp.concatenate(
        [jnp.zeros((bsz, PAD_FRONT), jnp.int32), mk[:, :width],
         jnp.zeros((bsz, n - PAD_FRONT - width), jnp.int32)],
        axis=-1,
    ).astype(bool)
    n_items = mask.sum(axis=-1).astype(jnp.int32)
    return mask, n_items
