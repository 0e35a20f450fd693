"""Ratio-convergence sweep of the OTZ2 fixed point vs iteration count.

For one corpus, runs the OTZ2 masked-iteration chain once up to max(iters)
and snapshots the final payload size at each checkpoint (conform + mid2 +
back + assemble from that iteration's start set), then compares every
checkpoint against the native ORZ codec at the same level.

    python tools/otz2_sweep.py [MiB] [iters,iters,...] [shifts]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# the axon TPU plugin overrides the JAX_PLATFORMS env var via jax.config;
# honor it explicitly so CPU sweeps actually run on CPU (see bench.py)
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

from bench import bench_corpus
from orz_tpu.device import pipeline as pipe
from orz_tpu.device.spec import CHUNK_INPUT_DEFAULT


def sync(x):
    np.asarray(jax.tree.leaves(x)[0].ravel()[0])


def payload_at(front, st, ni, pk1, plan, shifts):
    from orz_tpu.device.spec import OTZ2_CONFORM_SHIFTS

    buf_d = front["front"][5]
    seg_len = front["seg_len"]
    bq2, bl2 = pipe.encode_conform_jit(buf_d, seg_len,
                                       OTZ2_CONFORM_SHIFTS or shifts,
                                       st, ni, plan)
    ni_host = max(int(ni), 1)
    m2_cap = pipe._bucket(ni_host + max(ni_host // 4, 4096), 1 << 14, 2)
    items, ok, r1, rounds = pipe.encode_mid2_jit(
        st, ni, pk1, bq2, bl2, buf_d, seg_len, m2_cap)
    mid = dict(front)
    mid.update(items=items, r1=r1, rounds=rounds, rings_mode=1)
    back = pipe.dispatch_segment_back(mid)
    payload = pipe.finish_segment(front["data"], back, front["chunk_input"])
    # demotion diagnostic: repair only ADDS items (demoted spans expand to
    # length-1 literals), so emitted-minus-walk items counts the damage
    demoted = int(items.n_items) - int(ni)
    return payload, bool(ok), demoted


def main():
    mb = float(sys.argv[1]) if len(sys.argv) > 1 else 1
    checkpoints = ([int(v) for v in sys.argv[2].split(",")]
                   if len(sys.argv) > 2 else [4, 6, 8, 10, 12])
    # shifts: either one int (uniform) or a schedule "96x4,384x8" giving the
    # shift depth per iteration (last entry repeats past the end)
    if len(sys.argv) > 3 and ("x" in sys.argv[3] or "," in sys.argv[3]):
        sched = []
        for part in sys.argv[3].split(","):
            v, _, r = part.partition("x")
            sched += [int(v)] * (int(r) if r else 1)
        shifts = sched
    elif len(sys.argv) > 3:
        shifts = int(sys.argv[3])
    else:
        from orz_tpu.device.spec import OTZ2_SHIFTS as shifts
    level = 2
    n = int(mb * (1 << 20))
    data, corpus_name = bench_corpus(n)  # BENCH_CORPUS picks real|synthetic

    from orz_tpu.cfg import cfg_from_level
    from orz_tpu.container import encode_bytes
    from orz_tpu.native import NativeBackend

    orz_size = len(encode_bytes(data, cfg_from_level(level), NativeBackend()))
    print(f"otz2 sweep: {mb} MiB ({corpus_name}), shifts={shifts}, "
          f"orz l2 = {orz_size} B, device {jax.devices()[0]}", flush=True)

    front = pipe.dispatch_segment_front(data, level, CHUNK_INPUT_DEFAULT)
    starts, n_items, pk1, _, _, buf_d = front["front"]
    seg_len = front["seg_len"]
    plan = pipe.masked_plan_jit(buf_d, seg_len)
    st, ni = starts, n_items
    it = 0

    def shift_at(i):
        if isinstance(shifts, list):
            return shifts[min(i, len(shifts) - 1)]
        return shifts

    prev_starts = None
    for ck in sorted(checkpoints):
        t0 = time.perf_counter()
        while it < ck:
            st, ni, pk1 = pipe.encode_iter2_jit(buf_d, seg_len, shift_at(it),
                                                st, ni, plan)
            it += 1
        sync(st)
        t_iter = time.perf_counter() - t0
        # mask churn vs the previous checkpoint (fixed-point stability)
        cur_starts = set(np.asarray(st)[: int(ni)].tolist())
        delta = (len(cur_starts ^ prev_starts)
                 if prev_starts is not None else -1)
        prev_starts = cur_starts
        payload, ok, demoted = payload_at(front, st, ni, pk1, plan,
                                          shift_at(it))
        print(f"  iters={it:3d}: n_items={int(ni):8d} size={len(payload):8d} "
              f"({len(payload)/orz_size*100:6.2f}% of orz) ok={ok} "
              f"dstarts={delta} demoted={demoted} [{t_iter:.2f}s iter]",
              flush=True)


if __name__ == "__main__":
    main()
