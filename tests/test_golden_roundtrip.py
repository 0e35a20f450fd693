"""End-to-end round-trips through the golden model (small corpora)."""

import io

import numpy as np
import pytest

from orz_tpu import LZCfg, cfg_from_level
from orz_tpu.container import GoldenBackend, decode_bytes, encode_bytes
from tests.conftest import make_binary_like, make_text_like

BACKEND = GoldenBackend()
CFG0 = cfg_from_level(0)


def roundtrip(data: bytes, cfg=CFG0) -> bytes:
    compressed = encode_bytes(data, cfg, BACKEND)
    out = decode_bytes(compressed, BACKEND)
    assert out == data, f"round-trip mismatch: {len(out)} vs {len(data)} bytes"
    return compressed


def test_empty():
    assert roundtrip(b"") == b"\x00"


def test_tiny():
    roundtrip(b"a")
    roundtrip(b"ab")
    roundtrip(b"aaaa")
    roundtrip(b"\x00\x00\x00\x00\x00")


def test_small_text():
    data = b"i can can a can into a can, can you can a can into a can?" * 10
    c = roundtrip(data)
    assert len(c) < len(data)


def test_text_like(rng):
    data = make_text_like(rng, 50_000)
    c = roundtrip(data)
    assert len(c) < len(data) // 2


def test_binary_like(rng):
    data = make_binary_like(rng, 30_000)
    roundtrip(data)


def test_incompressible(rng):
    data = rng.integers(0, 256, size=20_000, dtype=np.uint8).tobytes()
    roundtrip(data)


def test_highly_repetitive():
    roundtrip(b"abcd" * 5000)
    roundtrip(b"x" * 20_000)
    roundtrip(bytes(range(256)) * 40)


def test_all_levels(rng):
    data = make_text_like(rng, 20_000)
    sizes = []
    for level in (0, 1, 2):
        c = roundtrip(data, cfg_from_level(level))
        sizes.append(len(c))
    # deeper search should not significantly hurt compression
    assert sizes[2] <= sizes[0] * 1.02


def test_word_model_exercised():
    # alternating two-byte words make the WORD symbol path fire
    data = (b"ab cd ab cd ab cd " * 600) + (b"the the the the " * 300)
    roundtrip(data)


def test_truncated_stream_raises(rng):
    data = make_text_like(rng, 5_000)
    compressed = encode_bytes(data, CFG0, BACKEND)
    with pytest.raises(Exception):
        decode_bytes(compressed[: len(compressed) // 2], BACKEND)
