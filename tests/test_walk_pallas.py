"""Walk kernel (interpret mode) vs the XLA scan walk, small shapes."""

import jax.numpy as jnp
import numpy as np

from orz_tpu.device.spec import PAD_FRONT


def test_walk_kernel_interpret_matches(rng):
    from orz_tpu.ops import walk_pallas as W
    from orz_tpu.ops.batched import mask_from_starts_b, walk_items_b

    B, cap = 2, 1 << 14
    n = PAD_FRONT + cap + 272
    lens = np.array([cap, cap - 777], np.int32)
    p = np.arange(n, dtype=np.int32)[None, :].repeat(B, 0)
    step = rng.integers(1, 20, (B, n)).astype(np.int32)
    step = np.minimum(step, 4096 - ((p - PAD_FRONT) & 4095))
    end = (PAD_FRONT + lens)[:, None]
    nxt = np.minimum(p + step, end).astype(np.int32)

    s1, n1 = walk_items_b(jnp.asarray(nxt), jnp.asarray(lens), n)
    n1 = np.asarray(n1)

    # force the kernel path (interpret mode off-TPU) by calling internals
    localT, blk_endT, base, endj, n_blocks, nb_total, cells = W._prep(
        jnp.asarray(nxt), jnp.asarray(lens), n
    )
    recT = W._call(W._rec_kernel, localT, blk_endT, cells)
    rec = recT.T[:nb_total]
    starts_all = jnp.where(
        rec >= W.SENT, jnp.int32(0x7FFFFFFE), rec + base[:, None]
    ).reshape(B, n_blocks * 4096)
    starts = jnp.sort(starts_all, axis=-1)
    for b in range(B):
        np.testing.assert_array_equal(
            np.asarray(starts[b][: n1[b]]), np.asarray(s1[b][: n1[b]])
        )

    maskT = W._call(W._mask_kernel, localT, blk_endT, cells)
    mk = maskT.T[:nb_total].reshape(B, n_blocks * 4096)
    width = min(n - PAD_FRONT, n_blocks * 4096)
    mask = np.zeros((B, n), np.int32)
    mask[:, PAD_FRONT : PAD_FRONT + width] = np.asarray(mk[:, :width])
    ref = np.asarray(mask_from_starts_b(s1, jnp.asarray(n1), n)).astype(
        np.int32
    )
    np.testing.assert_array_equal(mask, ref)
