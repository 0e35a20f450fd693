"""Explicit-batch bodies (ops/batched.py) vs the per-segment originals."""

import jax.numpy as jnp
import numpy as np
import pytest

from orz_tpu.device.spec import PAD_FRONT, PAD_TAIL
from tests.conftest import make_binary_like, make_text_like


def _pad_two(segs, cap):
    from orz_tpu.ops.batched import jnp as _  # noqa: F401

    n = PAD_FRONT + cap + PAD_TAIL
    arr = np.zeros((len(segs), n), np.uint8)
    for i, s in enumerate(segs):
        arr[i, PAD_FRONT : PAD_FRONT + len(s)] = np.frombuffer(s, np.uint8)
    return jnp.asarray(arr), jnp.asarray(
        np.array([len(s) for s in segs], np.int32)
    )


@pytest.fixture(scope="module")
def segs():
    rng = np.random.default_rng(0xBA7C4)
    return [make_text_like(rng, 24_000), make_binary_like(rng, 30_000)]


def test_front_body_matches(segs):
    from orz_tpu.device.pipeline import _front_body
    from orz_tpu.ops.batched import front_body_b

    cap = 1 << 15
    bufs, lens = _pad_two(segs, cap)
    b_starts, b_ni, b_pk, b_bq, b_bro, _, b_mask = front_body_b(bufs, lens, 32)
    for i, s in enumerate(segs):
        starts, ni, pk, bq, bro, _ = _front_body(bufs[i], lens[i], 32)
        assert int(b_ni[i]) == int(ni)
        m = int(ni)
        np.testing.assert_array_equal(np.asarray(b_starts[i][:m]),
                                      np.asarray(starts[:m]))
        np.testing.assert_array_equal(np.asarray(b_pk[i]), np.asarray(pk))
        np.testing.assert_array_equal(np.asarray(b_bq[i]), np.asarray(bq))
        np.testing.assert_array_equal(np.asarray(b_bro[i]), np.asarray(bro))


def test_iter_and_conform_match(segs):
    from orz_tpu.device.pipeline import (
        _conform_body,
        _front_body,
        _iter2_step,
        masked_plan_jit,
    )
    from orz_tpu.ops.analyze import masked_plan
    from orz_tpu.ops.batched import (
        conform_body_b,
        iter2_step_b,
        masked_plan_b,
    )

    cap = 1 << 15
    bufs, lens = _pad_two(segs, cap)
    b_starts, b_ni, b_pk, _, _, _, _ = (
        __import__("orz_tpu.ops.batched", fromlist=["x"]).front_body_b(
            bufs, lens, 32
        )
    )
    plan_b = masked_plan_b(bufs, lens)
    st2, ni2, pk2 = iter2_step_b(bufs, lens, 96, b_starts, b_ni, plan_b)
    bq2, bl2 = conform_body_b(bufs, lens, 96, st2, ni2, plan_b)

    for i, s in enumerate(segs):
        starts, ni, pk, bq, bro, _ = _front_body(bufs[i], lens[i], 32)
        plan = masked_plan(bufs[i], lens[i])
        st1, ni1, pk1 = _iter2_step(bufs[i], lens[i], 96, starts, ni, plan)
        assert int(ni2[i]) == int(ni1)
        m = int(ni1)
        np.testing.assert_array_equal(np.asarray(st2[i][:m]),
                                      np.asarray(st1[:m]))
        np.testing.assert_array_equal(np.asarray(pk2[i]), np.asarray(pk1))
        cq, cl = _conform_body(bufs[i], lens[i], 96, st1, ni1, plan)
        np.testing.assert_array_equal(np.asarray(bq2[i]), np.asarray(cq))
        np.testing.assert_array_equal(np.asarray(bl2[i]), np.asarray(cl))
