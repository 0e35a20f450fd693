"""Pallas TPU kernel for the symbol-ranking scan.

The XLA lowering of the batched scan (ops/symrank.py) costs ~hundreds of µs
per round: every round re-launches gathers/scatters against HBM-resident
tables.  This kernel keeps the 512 rank tables resident in VMEM for the
whole scan and does each round as a handful of full-table VPU passes
(one-hot compares / masked selects over a (432, 512) tile), with the
round-major schedule streamed through the grid pipeline.

Design notes:
- Only the value array (rank -> symbol) is materialized; ranks are
  recovered by comparing the table against the symbol (saves half the VMEM
  and all inverse-table writes).  The update follows golden/symrank.py
  (reference src/symrank.rs:61-97) with the d==1 / d>1 cases folded into
  one 3-write priority select.
- TPU has no integer division: x*9//10 and isum//16//cnt are computed in
  f32 with an exact integer fixup (operands stay < 2^24, so the f32
  quotient is within 1 of the true floor).
- The grid streams RB_BLK rounds per step; rounds beyond the real count
  (schedule rows are bucketed to a static shape) are predicated off.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from orz_tpu.device.spec import SYMRANK_NUM_SYMBOLS

C = 512  # symrank contexts
S = SYMRANK_NUM_SYMBOLS  # 431
S_PAD = -(-S // 8) * 8  # pad to a multiple of 8 sublanes (432)
TOP = S - 1
RB_BLK = 256  # schedule rows per grid step
R_CAP_MAX = 1 << 19  # fall back to the XLA scan beyond this many rounds (schedule array stays ~1 GB)


def _exact_div(a, b):
    """floor(a / b) for int32 a < 2^24, 1 <= b < 2^24, exact."""
    q = (a.astype(jnp.float32) / b.astype(jnp.float32)).astype(jnp.int32)
    q = q - ((q * b > a) & (q > 0)).astype(jnp.int32)
    q = q + ((q + 1) * b <= a).astype(jnp.int32)
    return q


def _kernel(rounds_ref, sched_ref, va0_ref, out_ref, va, cnt, isum):
    blk = pl.program_id(0)

    @pl.when(blk == 0)
    def _init():
        va[:] = va0_ref[:]
        cnt[:] = jnp.zeros_like(cnt)
        isum[:] = jnp.full_like(isum, 1000000)  # reference src/symrank.rs:27

    rounds = rounds_ref[0, 0]
    iota_s = lax.broadcasted_iota(jnp.int32, (S_PAD, C), 0)

    def round_body(rr, carry):
        r_global = blk * RB_BLK + rr

        @pl.when(r_global < rounds)
        def _():
            row = sched_ref[pl.ds(rr, 1), :]  # (1, C) packed
            active = (row >> 17) & 1
            sym = row & 0x1FF
            unlik = (row >> 9) & 0xFF

            table = va[:]
            oh_sym = table == sym  # (S_PAD, C): one-hot by VALUE
            i_vec = jnp.sum(jnp.where(oh_sym, iota_s, 0), axis=0, keepdims=True)
            iu_vec = jnp.sum(
                jnp.where(table == unlik, iota_s, 0), axis=0, keepdims=True
            )
            coded = jnp.where(
                i_vec == iu_vec, TOP, i_vec - (i_vec > iu_vec).astype(jnp.int32)
            )
            out_ref[pl.ds(rr, 1), :] = jnp.where(active == 1, coded, 0)

            # adaptive-step update (reference src/symrank.rs:61-97)
            c0 = cnt[:]
            s0 = isum[:]
            decay = c0 > S
            c1 = jnp.where(decay, _exact_div(c0 * 9, jnp.full_like(c0, 10)), c0)
            s1 = jnp.where(decay, _exact_div(s0 * 9, jnp.full_like(s0, 10)), s0)
            c2 = c1 + 1
            s2 = s1 + i_vec
            step = (i_vec >> 4) + (_exact_div(s2 >> 4, c2) & 0xFFFF)
            next_i = jnp.maximum(jnp.maximum(i_vec - step, 0), i_vec >> 1)
            d = i_vec - next_i
            do = (active == 1) & (d > 0)

            ni2 = next_i
            ni1 = jnp.where(d == 1, i_vec, next_i + (d >> 1))
            oh_ni1 = iota_s == ni1
            oh_ni2 = iota_s == ni2
            nv1_raw = jnp.sum(jnp.where(oh_ni1, table, 0), axis=0, keepdims=True)
            nv2 = jnp.sum(jnp.where(oh_ni2, table, 0), axis=0, keepdims=True)
            nv1 = jnp.where(d == 1, nv2, nv1_raw)

            # priority select = sequential writes va[i]=nv1; va[ni1]=nv2;
            # va[ni2]=sym (later wins), matching the reference order
            oh_i = iota_s == i_vec
            va[:] = jnp.where(
                do & oh_ni2,
                sym,
                jnp.where(do & oh_ni1, nv2, jnp.where(do & oh_i, nv1, table)),
            )
            cnt[:] = jnp.where(active == 1, c2, c0)
            isum[:] = jnp.where(active == 1, s2, s0)

        return carry

    lax.fori_loop(0, RB_BLK, round_body, 0)


@partial(jax.jit, static_argnames=("r_cap",))
def symrank_pallas(
    symbol: jnp.ndarray,
    sr_unlikely: jnp.ndarray,
    sr_ctx: jnp.ndarray,
    n_items: jnp.ndarray,
    init_perm: jnp.ndarray,
    r_cap: int,
) -> jnp.ndarray:
    """coded[i] per item, matching ops/symrank.transform exactly.

    r_cap is the static schedule-row bucket (host picks from plan rounds).
    """
    m = symbol.shape[0]
    idx = jnp.arange(m, dtype=jnp.int32)
    valid = idx < n_items
    key = jnp.where(valid, sr_ctx.astype(jnp.int32), C)
    sk, si = lax.sort((key, idx), num_keys=2)

    # per-item round index = rank within its context group
    pos = jnp.arange(m, dtype=jnp.int32)
    first = jnp.concatenate([jnp.ones(1, bool), sk[1:] != sk[:-1]])
    gstart = lax.cummax(jnp.where(first, pos, 0))
    r_sorted = pos - gstart
    r_item = jnp.zeros(m, jnp.int32).at[si].set(r_sorted, unique_indices=True)
    rounds = jnp.where(valid, r_item + 1, 0).max()

    pack = (
        symbol.astype(jnp.int32)
        | (sr_unlikely.astype(jnp.int32) << 9)
        | (1 << 17)
    )
    # valid items occupy unique (round, ctx) slots; invalid items get unique
    # out-of-bounds rows so the scatter can promise uniqueness and drop them
    row = jnp.where(valid & (r_item < r_cap), r_item, r_cap + idx)
    sched = jnp.zeros((r_cap, C), jnp.int32).at[
        row, sr_ctx.astype(jnp.int32)
    ].set(pack, mode="drop", unique_indices=True)

    va0 = jnp.concatenate(
        [
            jnp.broadcast_to(init_perm.astype(jnp.int32)[:, None], (S, C)),
            jnp.full((S_PAD - S, C), S_PAD, jnp.int32),  # never matched
        ],
        axis=0,
    )

    n_blocks = max(1, -(-r_cap // RB_BLK))
    coded_rows = pl.pallas_call(
        _kernel,
        interpret=jax.default_backend() != "tpu",
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((RB_BLK, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S_PAD, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((RB_BLK, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_blocks * RB_BLK, C), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((S_PAD, C), jnp.int32),
            pltpu.VMEM((1, C), jnp.int32),
            pltpu.VMEM((1, C), jnp.int32),
        ],
    )(
        jnp.reshape(rounds, (1, 1)),
        jnp.pad(sched, ((0, n_blocks * RB_BLK - r_cap), (0, 0))),
        va0,
    )

    return coded_rows[jnp.clip(r_item, 0, r_cap - 1), jnp.clip(sr_ctx, 0, C - 1)]
