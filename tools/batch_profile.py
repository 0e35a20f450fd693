"""Per-dispatch wall-clock breakdown of the BATCHED encode path (the
shipping path, orz_tpu/device/batch.py) on the current jax backend.

Times the FRONT / QUALITY-scan / QUALITY-tail / MID2 / BACK programs
individually at B x seg_mb, for OTZ2 (default) or OTZ1 (OTZ2=0 env or
--otz1), and prints a per-iteration cost estimate for the quality scan.

    python tools/batch_profile.py [seg_mb] [B] [--otz1]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np

from bench import bench_corpus
from orz_tpu.device import batch as B
from orz_tpu.device import pipeline as pipe
from orz_tpu.device.spec import (
    CHUNK_INPUT_DEFAULT,
    OTZ2_CONFORM_SHIFTS,
    candidate_depth,
    n_chunks_for,
    otz2_schedule,
)


def sync(x):
    np.asarray(jax.tree.leaves(x)[0].ravel()[0])


def timeit(label, fn, reps=2):
    out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
        sync(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"  {label:28s} {dt*1000:8.1f} ms", flush=True)
    return dt, out


def main():
    seg_mb = float(sys.argv[1]) if len(sys.argv) > 1 else 2
    nb = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    otz1 = "--otz1" in sys.argv or os.environ.get("OTZ2") == "0"
    level = 2
    nseg = int(seg_mb * (1 << 20))
    data, cname = bench_corpus(nb * nseg)
    segs = [data[i * nseg : (i + 1) * nseg] for i in range(nb)]
    cap = pipe._bucket_capacity(nseg)
    ci = CHUNK_INPUT_DEFAULT
    c_max = n_chunks_for(cap, ci)
    depth = candidate_depth(level)
    schedule = otz2_schedule()
    print(f"batch profile: B={nb} x {seg_mb} MiB ({cname}), "
          f"{'OTZ1' if otz1 else f'OTZ2 schedule={schedule}'}, "
          f"device={jax.devices()[0]}", flush=True)

    bufs_np = B._pad_batch(segs, cap)
    seg_lens = jnp.asarray(np.array([len(d) for d in segs], np.int32))
    staged = jax.device_put(jnp.asarray(bufs_np))

    t_all = {}

    def front():
        return B.b_front_jit(staged + jnp.uint8(0), seg_lens, depth)

    t_all["front"], fr = timeit("front", front)
    starts, n_items, pk1, bestq, bestro, bufs_d, mask0 = fr

    if otz1:
        ni_host = np.asarray(n_items)
        m_cap = B._bucket(max(int(ni_host.max()), 1), 1 << 14, 2)
        t_all["mid"], mid = timeit(
            "mid (OTZ1)",
            lambda: B.b_mid_jit(starts, n_items, pk1, bestq, bestro, bufs_d,
                                seg_lens, m_cap))
        items, r1, rounds = mid
    else:
        c_shifts = OTZ2_CONFORM_SHIFTS or schedule[-1]
        flat = [d for d in schedule]
        head, tail = tuple(flat[:-2]), tuple(flat[-2:])

        t_all["scan"], sc = timeit(
            f"quality scan (head={head})",
            lambda: B.b_scan_jit(bufs_d, seg_lens, mask0, n_items, head))
        plan, mask, ni = sc
        t_all["tail"], tl = timeit(
            f"quality tail (tail={tail})",
            lambda: B.b_tail_jit(bufs_d, seg_lens, plan, starts, n_items,
                                 pk1, mask, tail, c_shifts))
        it_a, it_b = tl
        ni_host = np.asarray(B._stack2(it_a[1], it_b[1]))
        ni_max = max(int(ni_host.max()), 1)
        m2_cap = B._bucket(ni_max + max(ni_max // 4, 4096), 1 << 14, 2)
        t_all["mid2"], m2 = timeit(
            "mid2 (conform/repair/emit)",
            lambda: B.b_mid2_jit(bufs_d, seg_lens, it_a, it_b, m2_cap))
        items, ok, r1, rounds, dem_a, dem_b = m2
        print(f"  ok={np.asarray(ok)}")

    from orz_tpu.ops.symrank_pallas import R_CAP_MAX, RB_BLK

    rr = np.asarray(B._stack2(r1, rounds))
    r1_h, r_h = rr[0], rr[1]
    r1_cap = B._bucket(max(int(r1_h.max()), 1), RB_BLK)
    rm_cap = B._bucket(max(int((r_h - r1_h).max()), 1), 4 * RB_BLK)

    import copy
    t_all["back"], out = timeit(
        "back (census/symrank/entropy)",
        lambda: B.b_back_jit(jax.tree.map(lambda x: x + 0, items), ci,
                             c_max, r1_cap, rm_cap))

    total = sum(t_all.values())
    rate = nb * nseg / total / 1e6
    print(f"  {'TOTAL':28s} {total*1000:8.1f} ms  -> {rate:.2f} MB/s "
          f"(B={nb} x {seg_mb} MiB)", flush=True)


if __name__ == "__main__":
    main()
