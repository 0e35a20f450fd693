"""Capture a device trace of selected batched programs and print top ops.

    python tools/trace_front.py [seg_mb] [B] [front|scan|mid|back|all]

Writes the xplane capture under /tmp/orz_trace and prints the top device
ops via tools/xplane_top.py's parser.
"""

from __future__ import annotations

import glob
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


def main():
    seg_mb = float(sys.argv[1]) if len(sys.argv) > 1 else 2
    nb = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    what = sys.argv[3] if len(sys.argv) > 3 else "front"
    level = 2
    nseg = int(seg_mb * (1 << 20))
    data, cname = bench_corpus(nb * nseg)
    segs = [data[i * nseg : (i + 1) * nseg] for i in range(nb)]
    cap = pipe._bucket_capacity(nseg)
    depth = candidate_depth(level)

    bufs_np = B._pad_batch(segs, cap)
    seg_lens = jnp.asarray(np.array([len(d) for d in segs], np.int32))
    staged = jax.device_put(jnp.asarray(bufs_np))

    fr = B.b_front_jit(staged + jnp.uint8(0), seg_lens, depth)
    sync(fr)
    starts, n_items, pk1, bestq, bestro, bufs_d, mask0 = fr

    tdir = "/tmp/orz_trace"
    os.system(f"rm -rf {tdir}")

    schedule = otz2_schedule()
    head1 = (schedule[-1],)  # one deep iteration as the scan body sample

    if what in ("scan", "all"):
        sc = B.b_scan_jit(bufs_d, seg_lens, mask0, n_items, head1)
        sync(sc)

    with jax.profiler.trace(tdir):
        if what in ("front", "all"):
            out = B.b_front_jit(staged + jnp.uint8(0), seg_lens, depth)
            sync(out)
        if what in ("scan", "all"):
            out = B.b_scan_jit(bufs_d, seg_lens, mask0, n_items, head1)
            sync(out)

    pbs = glob.glob(f"{tdir}/**/*.xplane.pb", recursive=True)
    print("captures:", pbs)
    if pbs:
        os.system(
            f"python {os.path.dirname(os.path.abspath(__file__))}"
            f"/xplane_top.py {pbs[-1]} 40"
        )


if __name__ == "__main__":
    main()
