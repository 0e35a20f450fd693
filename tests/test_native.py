"""Native C++ codec: byte-equality vs the golden model + round-trips."""

import numpy as np
import pytest

from orz_tpu import cfg_from_level
from orz_tpu.container import GoldenBackend, decode_bytes, encode_bytes
from tests.conftest import make_binary_like, make_text_like

native = pytest.importorskip("orz_tpu.native")

NB = native.NativeBackend()
GB = GoldenBackend()
CFG0 = cfg_from_level(0)
CFG2 = cfg_from_level(2)


def test_native_roundtrip_basic(rng):
    data = make_text_like(rng, 60_000)
    c = encode_bytes(data, CFG2, NB)
    assert decode_bytes(c, NB) == data
    assert len(c) < len(data) // 2


def test_native_matches_golden_encode(rng):
    """The native encoder must produce byte-identical streams to golden."""
    for maker, size in [(make_text_like, 40_000), (make_binary_like, 25_000)]:
        data = maker(rng, size)
        for cfg in (CFG0, CFG2):
            cn = encode_bytes(data, cfg, NB)
            cg = encode_bytes(data, cfg, GB)
            assert cn == cg, f"{maker.__name__} cfg={cfg} differs: {len(cn)} vs {len(cg)}"


def test_cross_backend_decode(rng):
    """Streams are interchangeable between backends."""
    data = make_text_like(rng, 30_000)
    c_native = encode_bytes(data, CFG0, NB)
    assert decode_bytes(c_native, GB) == data
    c_golden = encode_bytes(data, CFG0, GB)
    assert decode_bytes(c_golden, NB) == data


def test_native_edge_cases():
    for data in [b"", b"a", b"ab", b"\x00" * 100, b"abcd" * 2500, bytes(range(256)) * 10]:
        c = encode_bytes(data, CFG0, NB)
        assert decode_bytes(c, NB) == data


def test_native_incompressible(rng):
    data = rng.integers(0, 256, size=100_000, dtype=np.uint8).tobytes()
    c = encode_bytes(data, CFG2, NB)
    assert decode_bytes(c, NB) == data


def test_native_corrupt_stream_rejected(rng):
    data = make_text_like(rng, 10_000)
    c = bytearray(encode_bytes(data, CFG0, NB))
    # truncate mid-chunk
    with pytest.raises(Exception):
        decode_bytes(bytes(c[: len(c) // 3]), NB)


def test_native_larger_multichunk(rng):
    # > 1 chunk of items (chunk cap is 2^20 items; use dense literals to get
    # many items per byte) — approximated here with a large-ish buffer
    data = make_text_like(rng, 400_000)
    c = encode_bytes(data, CFG2, NB)
    assert decode_bytes(c, NB) == data
