"""OTZ sequential reference codec: round-trip, package-merge optimality."""

import numpy as np
import pytest

from conftest import make_binary_like, make_text_like
from orz_tpu.device.pm_huffman import pm_code_lens
from orz_tpu.device.refcodec import decode_segment_ref, encode_segment_ref
from orz_tpu.golden.huffman import build_code_lens


@pytest.mark.parametrize("level", [0, 1, 2])
@pytest.mark.parametrize("maker,size", [
    ("text", 0), ("text", 1), ("text", 100), ("text", 20000),
    ("binary", 5000), ("text", 70000),
])
def test_otz_roundtrip(rng, level, maker, size):
    data = (make_text_like if maker == "text" else make_binary_like)(rng, size)
    payload = encode_segment_ref(data, level=level, chunk_input=1 << 14)
    assert decode_segment_ref(payload) == data
    if size >= 20000:
        assert len(payload) < size  # text-like data must actually compress


def test_otz_roundtrip_pathological(rng):
    for data in [b"\x00" * 5000, b"a" * 5000, bytes(range(256)) * 40,
                 (b"ab" * 7 + b"\n") * 500, rng.integers(0, 256, 4096, dtype=np.uint8).tobytes()]:
        payload = encode_segment_ref(data, level=1, chunk_input=1 << 12)
        assert decode_segment_ref(payload) == data


def test_otz_tiny_chunks_cross_boundary(rng):
    # chunk_input smaller than max match length: chunks with zero items occur
    data = make_text_like(rng, 3000)
    payload = encode_segment_ref(data, level=2, chunk_input=128)
    assert decode_segment_ref(payload) == data


def test_pm_code_lens_optimal_and_kraft(rng):
    for trial in range(30):
        n = int(rng.integers(2, 400))
        w = rng.integers(0, 1000, size=n).astype(np.int64)
        if trial % 3 == 0:
            w[rng.integers(0, n, size=n // 2)] = 0
        lens = pm_code_lens(w, 15)
        active = w > 0
        if active.sum() == 0:
            assert (lens == 0).all()
            continue
        if active.sum() == 1:
            assert lens[active].tolist() == [1]
            continue
        assert (lens[~active] == 0).all()
        assert (lens[active] >= 1).all() and (lens[active] <= 15).all()
        kraft = np.sum(2.0 ** -lens[active].astype(np.float64))
        assert abs(kraft - 1.0) < 1e-9
        # optimal: total cost <= the reference's shrink-loop heuristic
        ref_lens, _ = build_code_lens(w.tolist(), 15)
        assert int(np.sum(w * lens)) <= int(np.sum(w * np.asarray(ref_lens)))


def test_pm_code_lens_degenerate():
    assert pm_code_lens(np.zeros(10, dtype=np.int64)).tolist() == [0] * 10
    lens = pm_code_lens(np.array([0, 7, 0], dtype=np.int64))
    assert lens.tolist() == [0, 1, 0]
    lens = pm_code_lens(np.array([1, 1], dtype=np.int64))
    assert lens.tolist() == [1, 1]
    # skewed weights force the 15-bit limit to bind
    w = np.array([1 << i for i in range(30)], dtype=np.int64)
    lens = pm_code_lens(w, 15)
    assert lens.max() == 15
    kraft = np.sum(2.0 ** -lens[lens > 0].astype(np.float64))
    assert abs(kraft - 1.0) < 1e-9


def test_otz2_item_start_rings_roundtrip(rng):
    """rings_mode=1 (item-start rings, spec.py OTZ2): round-trips through
    both decoders and does not enlarge the stream vs rings_mode=0 on
    match-heavy text (the whole point is cheaper offsets)."""
    from orz_tpu.native.otz import decode_segment_native

    data = make_text_like(rng, 60000)
    p1 = encode_segment_ref(data, level=2, chunk_input=1 << 14, rings_mode=1)
    assert decode_segment_ref(p1) == data
    assert decode_segment_native(p1) == data


def test_otz2_pathological_inputs(rng):
    from orz_tpu.native.otz import decode_segment_native

    for data in [b"a" * 5000, (b"ab" * 7 + b"\n") * 500, b"",
                 rng.integers(0, 256, 3000, dtype=np.uint8).tobytes(),
                 make_binary_like(rng, 8000)]:
        p = encode_segment_ref(data, level=2, chunk_input=1 << 12, rings_mode=1)
        assert decode_segment_ref(p) == data
        assert decode_segment_native(p) == data
