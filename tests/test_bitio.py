import numpy as np
import pytest

from orz_tpu.golden.bitio import BitDecoder, BitEncoder
from orz_tpu.ioutil import encode_len_bytes, read_len


def test_raw_bits_roundtrip(rng):
    values = [(int(rng.integers(0, 1 << n)), n) for n in rng.integers(1, 25, size=500)]
    enc = BitEncoder()
    for v, n in values:
        enc.encode_raw_bits(v, int(n))
    data = enc.finish()
    assert len(data) % 4 == 0
    dec = BitDecoder(data)
    for v, n in values:
        assert dec.decode_raw_bits(int(n)) == v


def test_varint_roundtrip():
    values = [0, 1, 2, 3, 7, 127, 128, 1000, 65535, (1 << 20), (1 << 25) - 1, 0xFFFFFFFF]
    enc = BitEncoder()
    for v in values:
        enc.encode_varint(v)
    dec = BitDecoder(enc.finish())
    for v in values:
        assert dec.decode_varint() == v


def test_varint_zero_and_one_compact():
    # v <= 1 takes exactly one 2-bit group
    enc = BitEncoder()
    for _ in range(16):
        enc.encode_varint(1)
    data = enc.finish()
    assert len(data) == 4  # 32 bits


def test_mixed_interleave(rng):
    ops = []
    enc = BitEncoder()
    for _ in range(2000):
        if rng.random() < 0.5:
            v = int(rng.integers(0, 1 << 30))
            ops.append(("varint", v))
            enc.encode_varint(v)
        else:
            n = int(rng.integers(1, 17))
            v = int(rng.integers(0, 1 << n))
            ops.append(("raw", v, n))
            enc.encode_raw_bits(v, n)
    dec = BitDecoder(enc.finish())
    for op in ops:
        if op[0] == "varint":
            assert dec.decode_varint() == op[1]
        else:
            assert dec.decode_raw_bits(op[2]) == op[1]


def test_bigendian_u32_words():
    # a single 8-bit value must land in the high byte of the first BE word
    enc = BitEncoder()
    enc.encode_raw_bits(0xAB, 8)
    assert enc.finish() == bytes([0xAB, 0, 0, 0])


def test_framing_varint():
    import io

    for v in [0, 1, 127, 128, 129, 255, 16384, 10**9]:
        data = encode_len_bytes(v)
        assert read_len(io.BytesIO(data)) == v
    # low base-128 digits first with a continuation bit
    assert encode_len_bytes(0) == b"\x00"
    assert encode_len_bytes(127) == b"\x7f"
    assert encode_len_bytes(128) == bytes([128 + 0, 1])


def test_empty_finish():
    assert BitEncoder().finish() == b""
