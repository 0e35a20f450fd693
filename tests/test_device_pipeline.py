"""Parallel JAX encoder vs the sequential OTZ oracle: phase equivalence and
byte-identical streams."""

import numpy as np
import jax.numpy as jnp
import pytest

from conftest import make_binary_like, make_text_like
from orz_tpu.device import refcodec as rc
from orz_tpu.device.pipeline import encode_segment_device
from orz_tpu.device.spec import PAD_FRONT, candidate_depth
from orz_tpu.ops import parse as jparse
from orz_tpu.ops.analyze import analyze


@pytest.mark.parametrize("maker", ["text", "binary"])
def test_analyze_and_parse_match_oracle(rng, maker):
    data = (make_text_like if maker == "text" else make_binary_like)(rng, 12000)
    buf = rc.pad_segment(data)
    depth = candidate_depth(1)
    ref = rc.analyze_ref(buf, len(data), depth)
    dev = analyze(jnp.asarray(buf), jnp.int32(len(data)), depth)
    sl = slice(PAD_FRONT, PAD_FRONT + len(data))
    for name in ("cctx", "rank", "pred", "bestlen", "bestro"):
        np.testing.assert_array_equal(
            np.asarray(getattr(dev, name))[sl], getattr(ref, name)[sl], err_msg=name
        )
    np.testing.assert_array_equal(
        np.asarray(dev.wordmatch)[sl], ref.wordmatch[sl], err_msg="wordmatch"
    )

    ref_items = rc.parse_ref(ref, buf, len(data))
    dec = jparse.decisions(dev, jnp.int32(len(data)), len(buf))
    items = jparse.extract_items(dec, dev, jnp.asarray(buf), jnp.int32(len(data)))
    ni = int(items.n_items)
    assert ni == len(ref_items.start)
    for name in ("start", "kind", "length", "symbol", "sr_ctx", "sr_unlikely",
                 "after_literal", "robitlen", "robits", "eml"):
        np.testing.assert_array_equal(
            np.asarray(getattr(items, name))[:ni], getattr(ref_items, name), err_msg=name
        )


@pytest.mark.parametrize("maker,size,level,ci", [
    ("text", 12000, 1, 1 << 13),
    ("binary", 9000, 0, 1 << 12),
    ("text", 3000, 2, 1 << 14),
    ("text", 0, 1, 1 << 13),
    ("text", 17, 1, 1 << 13),
    ("text", 4097, 2, 256),  # many chunks, some possibly empty
])
def test_device_stream_identical_and_roundtrip(rng, maker, size, level, ci):
    data = (make_text_like if maker == "text" else make_binary_like)(rng, size)
    # rings_mode pinned to the device pipeline's current mode (OTZ1) so the
    # streams stay comparable; device OTZ2 identity is tested separately
    ref = rc.encode_segment_ref(data, level=level, chunk_input=ci, rings_mode=0)
    dev = encode_segment_device(data, level=level, chunk_input=ci)
    assert dev == ref
    assert rc.decode_segment_ref(dev) == data


def test_device_pathological_inputs():
    for data in [b"\x00" * 4000, b"a" * 4000, bytes(range(256)) * 16,
                 (b"xy" * 9 + b".") * 300]:
        dev = encode_segment_device(data, level=1, chunk_input=1 << 12)
        assert rc.decode_segment_ref(dev) == data
        ref = rc.encode_segment_ref(data, level=1, chunk_input=1 << 12)
        assert dev == ref


def test_staged_pipeline_stream_identical(rng, monkeypatch):
    """Front/back staged path (Pallas symrank kernel, interpreted on CPU)
    must produce the same bytes as the single-program XLA path.  Pinned to
    the OTZ1 (rings_mode=0) mode: the monolithic program has no OTZ2 path;
    OTZ2 stream identity is covered by test_otz2_device."""
    from orz_tpu.device.pipeline import encode_segment_staged

    monkeypatch.setenv("OTZ2", "0")
    for maker, size, lvl in [("text", 10000, 2), ("binary", 6000, 1)]:
        data = (make_text_like if maker == "text" else make_binary_like)(rng, size)
        ref = rc.encode_segment_ref(data, level=lvl, chunk_input=1 << 13, rings_mode=0)
        dev = encode_segment_staged(data, level=lvl, chunk_input=1 << 13)
        assert dev == ref
        assert rc.decode_segment_ref(dev) == data
