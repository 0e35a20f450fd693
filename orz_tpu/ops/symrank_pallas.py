"""Pallas TPU kernel for the symbol-ranking scan (schedule-compacted).

The symrank transform (reference src/symrank.rs) is sequential per context,
parallel across the 512 contexts.  Round r applies every context's r-th
item in lockstep; the round count equals the hottest context's item count,
so on skewed text most lanes idle in most rounds (round-1 measured ~1.4%
mean lane occupancy) and the all-lanes kernel paid full-table VPU passes
per round (~1.8 us).  This version cuts both axes of waste while producing
bit-identical output:

1. **Staircase lane compaction.**  Lanes are relabeled so contexts are
   sorted by descending item count; then round r's active lanes are exactly
   the prefix [0, K_r).  The scan runs in two phases with static lane
   widths — phase W (512 lanes) for the few rounds where K_r > 128, then
   phase M (128 lanes) for the long tail — so tail rounds do 1/4 of the
   lane work and stream 1/4 of the schedule bytes.  The rank tables carry
   across phases as kernel outputs/inputs.

2. **Tiered front scan.**  The adaptive rank tables keep hot symbols at
   small ranks, and the reference's partial-move update (src/symrank.rs:
   61-97) moves a symbol strictly toward the front: every write index is
   <= the symbol's current rank.  Hence ranks < F form a closed sub-table:
   if all active lanes' symbols rank < F, the whole round's lookup AND
   update touch only the first F rows.  Each round scans the 32-row front,
   escalating to 128 / full 432 rows only when some active lane missed —
   rare after warm-up — so the common-case cost is ~14 passes over
   (32, lanes) instead of (432, 512).

Design notes (unchanged from v1):
- Only the value array (rank -> symbol) is materialized; ranks are
  recovered by comparing the table against the symbol (saves half the VMEM
  and all inverse-table writes).  The update follows golden/symrank.py
  (reference src/symrank.rs:61-97) with the d==1 / d>1 cases folded into
  one 3-write priority select.
- TPU has no integer division: x*9//10 and isum//16//cnt are computed in
  f32 with an exact integer fixup (operands stay < 2^24, so the f32
  quotient is within 1 of the true floor).
- The grid streams RB_BLK rounds per step; rounds beyond the real count
  are predicated off.
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
F1 = 32  # front tier rows (closed under the update when all ranks < F1)
F2 = 128  # mid tier rows
C_MID = 128  # phase-M lane width
R_CAP_MAX = 1 << 20  # fall back to the XLA scan beyond this many rounds


def _exact_div(a, b):
    """floor(a / b) for int32 a < 2^24, 1 <= b < 2^24, exact."""
    q = (a.astype(jnp.float32) / b.astype(jnp.float32)).astype(jnp.int32)
    q = q - ((q * b > a) & (q > 0)).astype(jnp.int32)
    q = q + ((q + 1) * b <= a).astype(jnp.int32)
    return q


def _round_tier(va, cnt, isum, out_ref, rr, row, n_rows, c_act):
    """Process one round assuming every active lane's symbol ranks < n_rows.

    Reads/writes only va[:n_rows, :c_act]; the caller guarantees closure
    (all active symbols found among the first n_rows ranks)."""
    active = (row >> 17) & 1
    sym = row & 0x1FF
    unlik = (row >> 9) & 0xFF

    table = va[:n_rows, :c_act]
    iota_s = lax.broadcasted_iota(jnp.int32, (n_rows, c_act), 0)
    oh_sym = table == sym  # (n_rows, c_act): one-hot by VALUE
    i_vec = jnp.sum(jnp.where(oh_sym, iota_s, 0), axis=0, keepdims=True)
    oh_u = table == unlik
    u_found = jnp.any(oh_u, axis=0, keepdims=True)
    iu_vec = jnp.where(
        u_found, jnp.sum(jnp.where(oh_u, iota_s, 0), axis=0, keepdims=True),
        jnp.int32(S_PAD),  # unlikely deeper than any front rank: no shift
    )
    coded = jnp.where(
        sym == unlik, TOP, i_vec - (i_vec > iu_vec).astype(jnp.int32)
    )
    out_ref[pl.ds(rr, 1), :] = jnp.where(active == 1, coded, 0)

    # adaptive-step update (reference src/symrank.rs:61-97)
    c0 = cnt[:, :c_act]
    s0 = isum[:, :c_act]
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
    va[:n_rows, :c_act] = jnp.where(
        do & oh_ni2,
        sym,
        jnp.where(do & oh_ni1, nv2, jnp.where(do & oh_sym, nv1, table)),
    )
    cnt[:, :c_act] = jnp.where(active == 1, c2, c0)
    isum[:, :c_act] = jnp.where(active == 1, s2, s0)


def _make_kernel(c_act: int):
    """Phase kernel over a (rows, c_act) schedule; table state is carried
    in scratch, seeded from the *_in refs at the first block and emitted to
    the *_out refs at the last."""

    def kernel(meta_ref, sched_ref, va_in, cnt_in, isum_in,
               out_ref, va_out, cnt_out, isum_out, va, cnt, isum):
        blk = pl.program_id(0)

        @pl.when(blk == 0)
        def _init():
            va[:] = va_in[:]
            cnt[:] = cnt_in[:]
            isum[:] = isum_in[:]

        rounds = meta_ref[0, 0]

        def round_body(rr, carry):
            r_global = blk * RB_BLK + rr

            @pl.when(r_global < rounds)
            def _():
                row = sched_ref[pl.ds(rr, 1), :]
                active = (row >> 17) & 1
                sym = row & 0x1FF

                # tier choice: does any active lane's symbol rank >= F?
                in_f1 = jnp.any(va[:F1, :c_act] == sym, axis=0, keepdims=True)
                deep1 = jnp.any((active == 1) & ~in_f1)

                @pl.when(~deep1)
                def _fast():
                    _round_tier(va, cnt, isum, out_ref, rr, row, F1, c_act)

                @pl.when(deep1)
                def _deeper():
                    in_f2 = jnp.any(
                        va[:F2, :c_act] == sym, axis=0, keepdims=True
                    )
                    deep2 = jnp.any((active == 1) & ~in_f2)

                    @pl.when(~deep2)
                    def _mid():
                        _round_tier(va, cnt, isum, out_ref, rr, row, F2, c_act)

                    @pl.when(deep2)
                    def _full():
                        _round_tier(
                            va, cnt, isum, out_ref, rr, row, S_PAD, c_act
                        )

            return carry

        lax.fori_loop(0, RB_BLK, round_body, 0)

        @pl.when(blk == pl.num_programs(0) - 1)
        def _emit():
            va_out[:] = va[:]
            cnt_out[:] = cnt[:]
            isum_out[:] = isum[:]

    return kernel


def _phase_call(sched, rounds, va0, cnt0, isum0, c_act: int):
    """Run one phase; returns (coded_rows, va, cnt, isum)."""
    r_cap = sched.shape[0]
    n_blocks = max(1, -(-r_cap // RB_BLK))
    pad_rows = n_blocks * RB_BLK - r_cap
    sched = jnp.pad(sched, ((0, pad_rows), (0, 0)))
    state_spec = [
        pl.BlockSpec((S_PAD, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    out = pl.pallas_call(
        _make_kernel(c_act),
        interpret=jax.default_backend() != "tpu",
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((RB_BLK, c_act), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ] + state_spec,
        out_specs=[
            pl.BlockSpec((RB_BLK, c_act), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ] + state_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_blocks * RB_BLK, c_act), jnp.int32),
            jax.ShapeDtypeStruct((S_PAD, C), jnp.int32),
            jax.ShapeDtypeStruct((1, C), jnp.int32),
            jax.ShapeDtypeStruct((1, C), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((S_PAD, C), jnp.int32),
            pltpu.VMEM((1, C), jnp.int32),
            pltpu.VMEM((1, C), jnp.int32),
        ],
    )(jnp.reshape(rounds, (1, 1)), sched, va0, cnt0, isum0)
    return out


@partial(jax.jit, static_argnames=("r1_cap", "rm_cap"))
def symrank_pallas(
    symbol: jnp.ndarray,
    sr_unlikely: jnp.ndarray,
    sr_ctx: jnp.ndarray,
    n_items: jnp.ndarray,
    init_perm: jnp.ndarray,
    r1_cap: int,
    rm_cap: int,
) -> jnp.ndarray:
    """coded[i] per item, matching ops/symrank.transform exactly.

    r1_cap bounds the wide phase's rounds (those with > C_MID active
    contexts); rm_cap bounds the narrow phase's.  The host picks both
    buckets from the (r1, rounds) scalars returned by plan_stats."""
    m = symbol.shape[0]
    idx = jnp.arange(m, dtype=jnp.int32)
    valid = idx < n_items
    ctx = jnp.where(valid, sr_ctx.astype(jnp.int32), C)

    cnt_g = jnp.zeros(C + 1, jnp.int32).at[ctx].add(1)[:C]
    neg_sorted, perm = lax.sort(
        (-cnt_g, jnp.arange(C, dtype=jnp.int32)), num_keys=2
    )
    lane_of_ctx = jnp.zeros(C, jnp.int32).at[perm].set(
        jnp.arange(C, dtype=jnp.int32)
    )
    r1 = -neg_sorted[C_MID]  # rounds with > C_MID active lanes

    # per-item round index = rank within its context group
    key = jnp.where(valid, ctx, C)
    sk, si = lax.sort((key, idx), num_keys=2)
    pos = jnp.arange(m, dtype=jnp.int32)
    first = jnp.concatenate([jnp.ones(1, bool), sk[1:] != sk[:-1]])
    gstart = lax.cummax(jnp.where(first, pos, 0))
    r_sorted = pos - gstart
    r_item = jnp.zeros(m, jnp.int32).at[si].set(r_sorted, unique_indices=True)
    lane = lane_of_ctx[jnp.clip(ctx, 0, C - 1)]

    pack = (
        symbol.astype(jnp.int32)
        | (sr_unlikely.astype(jnp.int32) << 9)
        | (1 << 17)
    )
    r1c = jnp.minimum(r1, r1_cap)
    # valid items occupy unique (round, lane) slots; everything else gets a
    # unique out-of-bounds slot so the scatters can promise uniqueness.
    # Scatters/gathers use FLAT 1d indices: XLA TPU lowers 2d-index scatters
    # through a slow async-slice path (~80 ms each at 1M items on v5e).
    in_w = valid & (r_item < r1c)
    flat_w = jnp.where(in_w, r_item * C + lane, r1_cap * C + idx)
    sched_w = jnp.zeros(r1_cap * C, jnp.int32).at[flat_w].set(
        pack, mode="drop", unique_indices=True
    ).reshape(r1_cap, C)
    in_m = valid & (r_item >= r1c) & (r_item - r1c < rm_cap)
    flat_m = jnp.where(in_m, (r_item - r1c) * C_MID + lane, rm_cap * C_MID + idx)
    sched_m = jnp.zeros(rm_cap * C_MID, jnp.int32).at[flat_m].set(
        pack, mode="drop", unique_indices=True
    ).reshape(rm_cap, C_MID)

    va0 = jnp.concatenate(
        [
            jnp.broadcast_to(init_perm.astype(jnp.int32)[:, None], (S, C)),
            jnp.full((S_PAD - S, C), S_PAD, jnp.int32),  # never matched
        ],
        axis=0,
    )
    # tables are lane-indexed: lane l models context perm[l], and all
    # contexts share the same census-derived init, so no permute is needed
    cnt0 = jnp.zeros((1, C), jnp.int32)
    isum0 = jnp.full((1, C), 1000000, jnp.int32)  # reference src/symrank.rs:27

    out_w, va1, cnt1, isum1 = _phase_call(sched_w, r1c, va0, cnt0, isum0, C)
    rm = jnp.maximum(
        jnp.where(valid, r_item + 1, 0).max() - r1c, 0
    )
    out_m, _, _, _ = _phase_call(sched_m, rm, va1, cnt1, isum1, C_MID)

    w_rows = out_w.shape[0]
    m_rows = out_m.shape[0]
    codes_w = out_w.reshape(-1)[
        jnp.clip(r_item, 0, w_rows - 1) * C + lane
    ]
    codes_m = out_m.reshape(-1)[
        jnp.clip(r_item - r1c, 0, m_rows - 1) * C_MID
        + jnp.clip(lane, 0, C_MID - 1)
    ]
    return jnp.where(r_item < r1c, codes_w, codes_m)


def plan_stats(sr_ctx: jnp.ndarray, n_items: jnp.ndarray):
    """(r1, rounds) for host bucketing: r1 = rounds needing > C_MID lanes,
    rounds = the hottest context's item count."""
    m = sr_ctx.shape[0]
    idx = jnp.arange(m, dtype=jnp.int32)
    ctx = jnp.where(idx < n_items, sr_ctx.astype(jnp.int32), C)
    cnt_g = jnp.zeros(C + 1, jnp.int32).at[ctx].add(1)[:C]
    c_sorted = -lax.sort(-cnt_g)
    return c_sorted[C_MID], c_sorted[0]
