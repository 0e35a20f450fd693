"""Per-phase wall-clock breakdown of the OTZ device encode pipeline.

Times each phase as its own jitted program (so compile is paid separately)
on a real segment, then reports hot-loop wall times.  Usage:
    python tools/phase_profile.py [MiB] [level]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import make_corpus
from orz_tpu.device.spec import PAD_FRONT, PAD_TAIL, candidate_depth
from orz_tpu.device import pipeline as pipe
from orz_tpu.ops.analyze import analyze
from orz_tpu.ops.parse import decisions, extract_items


def timed(label, fn, *args, n=3, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(f"{label:28s} {best*1000:9.1f} ms")
    return out, best


def main():
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    level = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    n = mb << 20
    data = make_corpus(n)
    depth = candidate_depth(level)
    buf = np.zeros(PAD_FRONT + n + PAD_TAIL, dtype=np.uint8)
    buf[PAD_FRONT : PAD_FRONT + n] = np.frombuffer(data, dtype=np.uint8)
    buf = jnp.asarray(buf)
    seg_len = jnp.int32(n)
    print(f"profile: {mb} MiB, level {level} (depth {depth}), "
          f"device {jax.devices()[0]}")

    an_jit = jax.jit(analyze, static_argnames=("depth",))
    an, t_an = timed("analyze", an_jit, buf, seg_len, depth=depth)

    dec_jit = jax.jit(decisions, static_argnames=("n",))
    dec, t_dec = timed("decisions", dec_jit, an, seg_len, n=buf.shape[0])

    ext_jit = jax.jit(extract_items)
    items, t_ext = timed("extract_items", ext_jit, dec, an, buf, seg_len)

    n_items = int(items.n_items)
    print(f"  items: {n_items} ({n/n_items:.2f} bytes/item)")

    # front as shipped (analyze+decisions+extract in one program)
    front, t_front = timed(
        "front (fused, as shipped)", pipe.encode_front_jit,
        jnp.asarray(np.array(buf)), seg_len, depth=depth)
    rounds = int(front[1])
    print(f"  symrank rounds: {rounds}")

    from orz_tpu.ops.symrank_pallas import RB_BLK
    r_cap = RB_BLK
    while r_cap < rounds:
        r_cap *= 2
    c_max = pipe.n_chunks_for(buf.shape[0] - PAD_FRONT - PAD_TAIL, 1 << 21)
    back, t_back = timed(
        "back (symrank+entropy)", pipe.encode_back_jit,
        jax.tree.map(lambda x: x.copy() if hasattr(x, 'copy') else x, front[0]),
        chunk_input=1 << 21, c_max=c_max, r_cap=r_cap)

    # symrank kernel alone
    from orz_tpu.ops.symrank_pallas import symrank_pallas
    items2 = front[0]
    perm = jnp.arange(431, dtype=jnp.int32)
    _, t_sr = timed(
        "symrank_pallas alone", symrank_pallas,
        items2.symbol, items2.sr_unlikely, items2.sr_ctx, items2.n_items,
        perm, r_cap)

    t0 = time.perf_counter()
    payload = pipe.finish_segment(data, {"empty": False, "fallback": None,
                                         "out": back}, 1 << 21)
    t_asm = time.perf_counter() - t0
    print(f"{'host assembly':28s} {t_asm*1000:9.1f} ms")

    total = t_front + t_back + t_asm
    print(f"{'TOTAL (front+back+asm)':28s} {total*1000:9.1f} ms "
          f"-> {n/total/1e6:.1f} MB/s")
    print(f"  [sub] analyze {t_an*1e3:.0f} decisions {t_dec*1e3:.0f} "
          f"extract {t_ext*1e3:.0f} symrank {t_sr*1e3:.0f} "
          f"entropy≈ {(t_back-t_sr)*1e3:.0f}")


if __name__ == "__main__":
    main()
