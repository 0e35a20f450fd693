"""Per-dispatch wall-clock breakdown of the OTZ2 (rings_mode=1) encode path.

Times front-0, each masked iteration, the conform analysis, the mid2
conform/repair/emit program, and the back program on a real segment.

    python tools/otz2_profile.py [MiB] [iters]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

from bench import bench_corpus
from orz_tpu.device import pipeline as pipe
from orz_tpu.device.spec import CHUNK_INPUT_DEFAULT, otz2_schedule


def sync(x):
    np.asarray(jax.tree.leaves(x)[0].ravel()[0])


def main():
    mb = float(sys.argv[1]) if len(sys.argv) > 1 else 4
    level = 2
    n = int(mb * (1 << 20))
    data, cname = bench_corpus(n)
    schedule = otz2_schedule()
    ci = CHUNK_INPUT_DEFAULT
    print(f"otz2 profile: {mb} MiB ({cname}), schedule={schedule}, "
          f"device {jax.devices()[0]}", flush=True)

    def run(tag):
        t0 = time.perf_counter()
        front = pipe.dispatch_segment_front(data, level, ci)
        sync(front["front"][0])
        t1 = time.perf_counter()

        starts, n_items, pk1, bestq0, bestro0, buf_d = front["front"]
        seg_len = front["seg_len"]
        tp0 = time.perf_counter()
        plan = pipe.masked_plan_jit(buf_d, seg_len)
        sync(plan.sp_h2)
        t_plan = time.perf_counter() - tp0
        st, ni = starts, n_items
        t_it = []
        for shifts in schedule:
            ta = time.perf_counter()
            st, ni, pk1_i = pipe.encode_iter2_jit(buf_d, seg_len,
                                                  shifts, st, ni, plan)
            sync(st)
            t_it.append(time.perf_counter() - ta)
            pk1 = pk1_i
        t2 = time.perf_counter()
        bq2, bl2 = pipe.encode_conform_jit(buf_d, seg_len, schedule[-1],
                                           st, ni, plan)
        sync(bq2)
        t3 = time.perf_counter()
        ni_host = max(int(ni), 1)
        m2_cap = pipe._bucket(ni_host + max(ni_host // 4, 4096), 1 << 14, 2)
        items, ok, r1, rounds = pipe.encode_mid2_jit(
            st, ni, pk1, bq2, bl2, buf_d, seg_len, m2_cap)
        sync(items.symbol)
        t4 = time.perf_counter()
        mid = dict(front)
        mid.update(items=items, r1=r1, rounds=rounds, rings_mode=1)
        back = pipe.dispatch_segment_back(mid)
        if back.get("out") is not None:
            sync(back["out"].meta)
        t5 = time.perf_counter()
        payload = pipe.finish_segment(data, back, ci)
        t6 = time.perf_counter()
        its = " ".join(f"{t:.3f}" for t in t_it)
        print(f"{tag}: front {t1-t0:7.3f}  plan {t_plan:7.3f}  iters [{its}] "
              f"sum {t2-t1:7.3f}  "
              f"conform {t3-t2:7.3f}  mid2 {t4-t3:7.3f}  back {t5-t4:7.3f}  "
              f"asm {t6-t5:7.3f}  total {t6-t0:7.3f}s -> "
              f"{n/(t6-t0)/1e6:6.2f} MB/s  ok={bool(ok)} "
              f"({len(payload)} B, {len(payload)/n*100:.2f}%)", flush=True)
        return payload

    t0 = time.perf_counter()
    run("cold")
    print(f"(cold incl. compile: {time.perf_counter()-t0:.1f}s)", flush=True)
    for i in range(2):
        payload = run(f"hot{i}")

    try:
        from orz_tpu.native.otz import decode_segment_native
        out = decode_segment_native(payload)
    except Exception:
        from orz_tpu.device.refcodec import decode_segment_ref
        out = decode_segment_ref(payload)
    print("round-trip:", "OK" if out == data else "FAIL", flush=True)


if __name__ == "__main__":
    main()
