"""Probe: XLA gather costs by index pattern + Pallas windowed gather.

Item-space gathers in the pipeline (pk1[start], buf[start], dist[prev])
have ASCENDING indices with bounded span per output block (item starts are
sorted, ~3 bytes apart on average).  If a Pallas kernel that DMAs the
source window per block and gathers in VMEM beats XLA's generic gather,
most of the mid/back gather cost collapses.

    python tools/gather_probe.py [m_log2]
"""

import sys
import time
from functools import partial

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(f, *args, reps=5):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


BLK = 2048  # output items per grid step
WIN = 4 * BLK  # source window per block (indices must fit; else fallback)


def _wgather_kernel(base_ref, idx_ref, src_ref, out_ref, win, sem):
    blk = pl.program_id(0)
    row0 = base_ref[blk] // 128
    dma = pltpu.make_async_copy(
        src_ref.at[pl.ds(row0, WIN // 128), :], win, sem
    )
    dma.start()
    dma.wait()
    rel = idx_ref[:] - row0 * 128
    flat = win[:].reshape(-1)
    out_ref[:] = jnp.take(flat, rel.reshape(-1), axis=0,
                          fill_value=0).reshape(idx_ref.shape)


@partial(jax.jit, static_argnames=())
def windowed_gather(src, idx, base):
    """out[i] = src[idx[i]] where idx ascending and idx[blk] - base_aligned
    spans < WIN per output block (caller guarantees span)."""
    m = idx.shape[0]
    n_blocks = m // BLK
    idx2 = idx.reshape(n_blocks * (BLK // 128), 128)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((BLK // 128, 128), lambda i, b: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((BLK // 128, 128), lambda i, b: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((WIN // 128, 128), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        _wgather_kernel,
        interpret=jax.default_backend() != "tpu",
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks * (BLK // 128), 128),
                                       jnp.int32),
    )(base, idx2, src.reshape(-1, 128)).reshape(m)


def main():
    mlog = int(sys.argv[1]) if len(sys.argv) > 1 else 21
    m = 1 << mlog
    n = 4 * m
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.integers(0, 1 << 30, n, dtype=np.int32))
    idx_sorted = jnp.asarray(np.sort(rng.integers(0, n, m)).astype(np.int32))
    idx_rand = jnp.asarray(rng.integers(0, n, m, dtype=np.int32))

    g = jax.jit(lambda s, i: s[i])
    print(f"m=2^{mlog} gathers from n=4m:")
    print(f"  XLA gather random : {timeit(g, src, idx_rand)*1e3:8.2f} ms")
    print(f"  XLA gather sorted : {timeit(g, src, idx_sorted)*1e3:8.2f} ms")

    sc = jax.jit(lambda s, i, v: jnp.zeros_like(s).at[i].set(v))
    vals = src[:m]
    print(f"  XLA scatter sorted: {timeit(sc, src, idx_sorted, vals)*1e3:8.2f} ms")

    take = jax.jit(lambda s, i: jnp.take(s, i, axis=0))
    print(f"  XLA take sorted   : {timeit(take, src, idx_sorted)*1e3:8.2f} ms")

    # windowed pallas gather needs per-block span <= WIN: synthesize indices
    # with realistic density (avg stride ~3 like item starts)
    stride3 = np.minimum(np.cumsum(rng.integers(1, 6, m)), n - 1).astype(np.int32)
    idx3 = jnp.asarray(stride3)
    base = jnp.asarray((stride3.reshape(-1, BLK)[:, 0]).astype(np.int32))
    span = (stride3.reshape(-1, BLK)[:, -1] - stride3.reshape(-1, BLK)[:, 0]).max()
    print(f"  windowed idx span max {span} (WIN={WIN})")
    if span < WIN:
        wg = lambda s, i, b: windowed_gather(s, i, b)
        out = wg(src, idx3, base)
        ref = src[idx3]
        ok = bool(jnp.array_equal(out, ref))
        print(f"  pallas windowed   : {timeit(wg, src, idx3, base)*1e3:8.2f} ms ok={ok}")


if __name__ == "__main__":
    main()
