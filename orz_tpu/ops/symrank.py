"""Phase 3 — symbol-ranking transform as a 512-lane batched scan.

The symrank state (reference src/symrank.rs) is per-context and mutates on
every item — sequential *within* a context, independent *across* the 512
contexts.  Items are therefore grouped by context (one stable sort) and
processed in rounds: round r applies every context's r-th item in lockstep,
so each step is 512-lane vector work (gathers/scatters into the
(512, 389) rank tables) instead of one scalar update.

The update rule must match orz_tpu/golden/symrank.py (reference
src/symrank.rs:61-97) bit-for-bit; the d==1 and d>1 move cases are folded
into one 3-write pattern whose write ORDER makes the d==1 case degenerate
correctly (see inline notes).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
from jax import lax

from orz_tpu.device.spec import SYMRANK_NUM_SYMBOLS

NCTX = 512
TOP = SYMRANK_NUM_SYMBOLS - 1  # 388 escape code


class SymrankPlan(NamedTuple):
    """Context-grouped item schedule."""

    sorted_item: jnp.ndarray  # (M,) item ids, grouped by context, order kept
    start_g: jnp.ndarray  # (512,) first slot of each context group
    cnt_g: jnp.ndarray  # (512,) items per context
    rounds: jnp.ndarray  # scalar: max items in any context


def plan(sr_ctx: jnp.ndarray, n_items: jnp.ndarray) -> SymrankPlan:
    m = sr_ctx.shape[0]
    idx = jnp.arange(m, dtype=jnp.int32)
    key = jnp.where(idx < n_items, sr_ctx.astype(jnp.int32), NCTX)
    sk, si = lax.sort((key, idx), num_keys=2)
    cnt_g = jnp.zeros(NCTX + 1, jnp.int32).at[sk].add(1)[:NCTX]
    start_g = jnp.full(NCTX + 1, m, jnp.int32).at[sk].min(idx)[:NCTX]
    rounds = cnt_g.max()
    return SymrankPlan(si, start_g, cnt_g, rounds)


def init_tables(init_perm: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """All contexts share the census-derived initial order
    (reference src/lz.rs:258-264)."""
    va0 = jnp.broadcast_to(init_perm.astype(jnp.int32), (NCTX, SYMRANK_NUM_SYMBOLS))
    inv = jnp.zeros(SYMRANK_NUM_SYMBOLS, jnp.int32).at[init_perm].set(
        jnp.arange(SYMRANK_NUM_SYMBOLS, dtype=jnp.int32)
    )
    ia0 = jnp.broadcast_to(inv, (NCTX, SYMRANK_NUM_SYMBOLS))
    return va0, ia0


def transform(
    symbol: jnp.ndarray,
    sr_unlikely: jnp.ndarray,
    sr_ctx: jnp.ndarray,
    n_items: jnp.ndarray,
    init_perm: jnp.ndarray,
) -> jnp.ndarray:
    """coded[i] = symrank code of item i (garbage past n_items)."""
    m = symbol.shape[0]
    pl = plan(sr_ctx, n_items)
    va0, ia0 = init_tables(init_perm)
    g = jnp.arange(NCTX, dtype=jnp.int32)

    def body(r, state):
        va, ia, cnt, isum, out = state
        has = r < pl.cnt_g
        slot = jnp.clip(pl.start_g + r, 0, m - 1)
        item = pl.sorted_item[slot]
        sym = symbol[item]
        unlik = sr_unlikely[item]

        i = ia[g, sym]
        iu = ia[g, unlik]
        coded = jnp.where(i == iu, TOP, i - (i > iu))
        # inactive lanes write to unique out-of-bounds slots (m+g) so every
        # scatter in this loop can promise unique indices — without the
        # promise XLA must serialize the 512 updates
        out = out.at[jnp.where(has, item, m + g)].set(
            coded, mode="drop", unique_indices=True
        )

        # update (reference src/symrank.rs:61-97)
        decay = cnt > SYMRANK_NUM_SYMBOLS
        cnt2 = jnp.where(decay, cnt * 9 // 10, cnt)
        isum2 = jnp.where(decay, isum * 9 // 10, isum)
        cnt3 = cnt2 + 1
        isum3 = isum2 + i
        step = i // 16 + ((isum3 // 16 // cnt3) & 0xFFFF)
        next_i = jnp.maximum(jnp.maximum(i - step, 0), i // 2)
        d = i - next_i
        do = has & (d > 0)

        # unified 3-write move; for d==1 the writes degrade to the reference
        # swap because ni1 aliases i (write 2 repeats write 1) and
        # nv2 aliases nv1 (write 5 repeats write 4).
        ni2 = next_i
        ni1 = jnp.where(d == 1, i, next_i + d // 2)
        nv1 = jnp.where(d == 1, va[g, ni2], va[g, ni1])
        nv2 = jnp.where(d == 1, nv1, va[g, ni2])
        gw = jnp.where(do, g, NCTX + g)  # unique dropped rows when inactive
        va = va.at[gw, i].set(nv1, mode="drop", unique_indices=True)
        va = va.at[gw, ni1].set(nv2, mode="drop", unique_indices=True)
        va = va.at[gw, ni2].set(sym, mode="drop", unique_indices=True)
        ia = ia.at[gw, nv1].set(i, mode="drop", unique_indices=True)
        ia = ia.at[gw, nv2].set(ni1, mode="drop", unique_indices=True)
        ia = ia.at[gw, sym].set(ni2, mode="drop", unique_indices=True)

        cnt = jnp.where(has, cnt3, cnt)
        isum = jnp.where(has, isum3, isum)
        return va, ia, cnt, isum, out

    cnt0 = jnp.zeros(NCTX, jnp.int32)
    isum0 = jnp.full(NCTX, 1000000, jnp.int32)  # reference src/symrank.rs:27
    out0 = jnp.zeros(m, jnp.int32)
    _, _, _, _, out = lax.fori_loop(0, pl.rounds, body, (va0, ia0, cnt0, isum0, out0))
    return out
