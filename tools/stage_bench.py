"""Slope-timed breakdown of the encode pipeline's internal stages.

Each sub-stage runs as its own jit at a realistic input, timed as the slope
between k and 2k chained applications where repeatable, else as a single
dispatch minus the measured tunnel round-trip.  This attributes the phase
wall times (front/mid/back) to concrete code, where the xplane trace only
shows post-fusion HLO.

    python tools/stage_bench.py [MiB] [level]
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from bench import make_corpus
from orz_tpu.device import pipeline as pipe
from orz_tpu.device.spec import (
    CHUNK_INPUT_DEFAULT,
    PAD_FRONT,
    PAD_TAIL,
    candidate_depth,
)
from orz_tpu.ops import analyze as A
from orz_tpu.ops.parse import decisions, pack_fields, walk_items


def sync(x):
    np.asarray(jax.tree.leaves(x)[0].ravel()[0])


def timeit(f, *args, reps=3):
    out = f(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    sync(out)
    return (time.perf_counter() - t0) / reps, out


def main():
    mb = float(sys.argv[1]) if len(sys.argv) > 1 else 4
    level = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    nseg = int(mb * (1 << 20))
    depth = candidate_depth(level)
    data = make_corpus(nseg)
    cap = pipe._bucket_capacity(nseg)
    n = PAD_FRONT + cap + PAD_TAIL
    buf_np = np.zeros(n, np.uint8)
    buf_np[PAD_FRONT : PAD_FRONT + nseg] = np.frombuffer(data, np.uint8)
    buf = jnp.asarray(buf_np)
    seg_len = jnp.int32(nseg)
    end = PAD_FRONT + seg_len

    # tunnel latency baseline
    f0 = jax.jit(lambda x: x + 1)
    sync(f0(jnp.int32(1)))
    t0 = time.perf_counter()
    for _ in range(5):
        sync(f0(jnp.int32(1)))
    lat = (time.perf_counter() - t0) / 5
    print(f"tunnel round-trip ~{lat*1e3:.1f} ms (subtract from single-shot rows)")

    rows = []

    def stage(name, f, *args, reps=3):
        t, out = timeit(jax.jit(f), *args, reps=reps)
        rows.append((name, t))
        print(f"{name:34s} {t*1e3:8.2f} ms", flush=True)
        return out

    p = jnp.arange(n, dtype=jnp.int32)
    valid = (p >= PAD_FRONT) & (p < end)

    ba = stage("byte_arrays", A.byte_arrays, buf)
    stage("word_predictions", A.word_predictions, ba, buf, end)
    rank = stage("context_ranks", A.context_ranks, ba, valid)

    # main candidate sort (3 + N_DW operands, 2 keys)
    mk = jnp.where(valid, ba.mkey, jnp.int32(0x7FFFFFFF))
    dws = [A._shift_left(ba.dw, 4 * k).astype(jnp.int32) for k in range(A.N_DW)]

    def main_sort(mk, p, rank, *dws):
        return lax.sort((mk, p, rank) + tuple(dws), num_keys=2)

    sorted_all = stage(f"candidate sort ({3 + A.N_DW} ops)", main_sort,
                       mk, p, rank, *dws)
    msk, msp, rank_s = sorted_all[:3]
    dw_s = [a.astype(jnp.uint32) for a in sorted_all[3:]]

    from orz_tpu.ops.match_pallas import match_depth_pallas

    def kern(msk, msp, rank_s, *dw_s):
        return match_depth_pallas(msk, msp, rank_s, tuple(dw_s), end, depth)

    bq_s, bro_s, bl_s = stage(f"match kernel ({depth})", kern,
                              msk, msp, rank_s, *dw_s)

    def back_sort(msp, a, b, c):
        return lax.sort((msp, a, b, c), num_keys=1)

    stage("sort back (4 ops)", back_sort, msp, bq_s, bro_s, bl_s)

    # full analyze for comparison + downstream inputs
    an_f = jax.jit(A.analyze, static_argnames=("depth",))
    t, an = timeit(lambda b, s: an_f(b, s, depth), buf, seg_len)
    print(f"{'FULL analyze':34s} {t*1e3:8.2f} ms")

    dec = stage("decisions", lambda a, s: decisions(a, s, n), an, seg_len)
    stage("walk_items", lambda d, s: walk_items(d, s, n), dec, seg_len)
    stage("pack_fields", pack_fields, an, dec, buf)

    # mid/back via the dispatch path
    front = pipe.dispatch_segment_front(data, level, CHUNK_INPUT_DEFAULT)
    sync(front["front"][0])
    t0 = time.perf_counter()
    mid = pipe.dispatch_segment_mid(front)
    sync(mid["items"].symbol)
    print(f"{'MID (dispatch, incl sync)':34s} {(time.perf_counter()-t0)*1e3:8.2f} ms")
    t0 = time.perf_counter()
    back = pipe.dispatch_segment_back(mid)
    sync(back["out"].meta)
    print(f"{'BACK (dispatch, incl sync)':34s} {(time.perf_counter()-t0)*1e3:8.2f} ms")

    # back sub-stages
    from orz_tpu.ops.symrank_pallas import plan_stats, symrank_pallas, RB_BLK

    items = mid["items"]
    t, pl = timeit(jax.jit(plan_stats), items.sr_ctx, items.n_items)
    print(f"{'plan_stats':34s} {t*1e3:8.2f} ms")
    r1, rounds = int(pl[0]), int(pl[1])
    r1_cap = pipe._bucket(r1, RB_BLK)
    rm_cap = pipe._bucket(max(rounds - r1, 1), 4 * RB_BLK)

    m = items.start.shape[0]
    validm = jnp.arange(m, dtype=jnp.int32) < items.n_items
    c_max = front["c_max"]
    chunk_id = jnp.clip((items.start - PAD_FRONT) // CHUNK_INPUT_DEFAULT, 0, c_max - 1)
    N_SYM = pipe.N_SYM
    cens_idx = jnp.where(validm & (chunk_id == 0), items.symbol, N_SYM)
    counts = jnp.zeros(N_SYM, jnp.int32).at[cens_idx].add(1, mode="drop")
    primary = -jnp.maximum(counts, 1)
    _, census_order = lax.sort((primary, jnp.arange(N_SYM, dtype=jnp.int32)), num_keys=2)

    def run_symrank(sym, unl, ctx, ni, cen):
        return symrank_pallas(sym, unl, ctx, ni, cen, r1_cap, rm_cap)

    coded = stage("symrank_pallas", run_symrank, items.symbol,
                  items.sr_unlikely, items.sr_ctx, items.n_items, census_order)

    num_counted = (counts > 1).sum().astype(jnp.int32)

    def run_entropy(coded):
        return pipe._entropy_stage(items, coded, validm, chunk_id, num_counted,
                                   census_order, CHUNK_INPUT_DEFAULT, c_max)

    stage("entropy stage", run_entropy, coded)

    print("\nwall phases (hot, for reference):")
    for tag in range(2):
        t0 = time.perf_counter()
        front = pipe.dispatch_segment_front(data, level, CHUNK_INPUT_DEFAULT)
        sync(front["front"][0])
        t1 = time.perf_counter()
        mid = pipe.dispatch_segment_mid(front)
        sync(mid["items"].symbol)
        t2 = time.perf_counter()
        back = pipe.dispatch_segment_back(mid)
        sync(back["out"].meta)
        t3 = time.perf_counter()
        print(f"  front {t1-t0:.3f}  mid {t2-t1:.3f}  back {t3-t2:.3f}")


if __name__ == "__main__":
    main()
