"""Block-data-parallel scaling measurement over a device mesh.

Encodes one >=1 MiB segment per device through mesh_encode_segments
(vmapped SPMD program over the "blocks" axis) at 1/2/4/8 devices and
reports MB/s per point.  On this host the mesh is 8 virtual CPU devices
over 4 physical cores, so ideal scaling tops out at ~4x; the table is the
shape of the curve, the chip number comes from the driver bench.

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/scaling_bench.py [mib_per_device] [level]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
if jax.default_backend() == "cpu" and jax.device_count() < 8:
    jax.config.update("jax_num_cpu_devices", 8)

import numpy as np


def main():
    mib = float(sys.argv[1]) if len(sys.argv) > 1 else 1
    level = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    seg_bytes = int(mib * (1 << 20))

    from bench import bench_corpus
    from orz_tpu.device.container import _decode_segment
    from orz_tpu.parallel import blocks_mesh, mesh_encode_segments

    n_dev = jax.device_count()
    data, cname = bench_corpus(seg_bytes * n_dev)
    print(f"scaling bench: {mib} MiB/device ({cname}), level={level}, "
          f"{n_dev} devices ({jax.devices()[0].platform})", flush=True)

    points = [d for d in (1, 2, 4, 8) if d <= n_dev]
    for d in points:
        segs = [data[i * seg_bytes:(i + 1) * seg_bytes] for i in range(d)]
        mesh = blocks_mesh(d)
        payloads = mesh_encode_segments(segs, level=level, mesh=mesh)  # warm
        t0 = time.perf_counter()
        reps = 2
        for _ in range(reps):
            payloads = mesh_encode_segments(segs, level=level, mesh=mesh)
        dt = (time.perf_counter() - t0) / reps
        total = d * seg_bytes
        for s, p in zip(segs, payloads):
            if _decode_segment(p) != s:
                print("  ROUND-TRIP FAILED", flush=True)
                return 1
        print(f"  {d} device(s): {total/dt/1e6:7.1f} MB/s "
              f"({total >> 20} MiB in {dt:.2f}s, round-trip ok)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
