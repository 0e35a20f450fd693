import numpy as np
import pytest

from orz_tpu.golden.bitio import BitDecoder, BitEncoder
from orz_tpu.golden.huffman import HuffmanDecoding, build_code_lens, canonical_encodings


def kraft(code_lens):
    return sum(2.0 ** -l for l in code_lens if l > 0)


def test_build_simple():
    lens, mx = build_code_lens([100, 50, 10, 1], 15)
    assert mx == max(lens)
    assert kraft(lens) == 1.0
    # most frequent symbol gets the shortest code
    assert lens[0] == min(l for l in lens if l)


def test_build_empty_and_single():
    lens, mx = build_code_lens([0, 0, 0], 15)
    assert lens == [0, 0, 0] and mx == 0
    lens, mx = build_code_lens([0, 7, 0], 15)
    assert lens == [0, 1, 0] and mx == 1


def test_max_code_len_shrink():
    # fibonacci-ish weights force deep trees; limit must be enforced
    w = [1]
    for _ in range(40):
        w.append(w[-1] * 2 + 1)
    lens, mx = build_code_lens(w, 15)
    assert mx <= 15
    assert kraft(lens) <= 1.0 + 1e-12


def test_canonical_assignment_prefix_free():
    lens, _ = build_code_lens([5, 9, 12, 13, 1, 0, 77], 15)
    encs = canonical_encodings(lens)
    codes = [(format(c, f"0{l}b")) for c, l in encs if l > 0]
    for i, a in enumerate(codes):
        for j, b in enumerate(codes):
            if i != j:
                assert not b.startswith(a)


def test_roundtrip_symbols(rng):
    n = 389
    weights = [int(x) for x in rng.integers(0, 1000, size=n)]
    weights[5] = 0  # some zero-weight symbols
    lens, mx = build_code_lens(weights, 15)
    encs = canonical_encodings(lens)
    dec_table = HuffmanDecoding(lens, mx)

    syms = [int(s) for s in rng.integers(0, n, size=5000) if weights[int(s)] > 0]
    enc = BitEncoder()
    for s in syms:
        enc.encode_huffman_sym(encs, s)
    d = BitDecoder(enc.finish())
    for s in syms:
        assert d.decode_huffman_sym(dec_table) == s


def test_table_serialization_roundtrip(rng):
    for trial in range(20):
        n = int(rng.integers(2, 400))
        weights = [int(x) for x in rng.integers(0, 50, size=n)]
        lens, mx = build_code_lens(weights, 15)
        enc = BitEncoder()
        enc.encode_huffman_table(lens)
        dec = BitDecoder(enc.finish())
        got_lens, got_max = dec.decode_huffman_table()
        assert got_max == mx
        # decoded table may omit trailing zero-length symbols
        assert got_lens == list(lens[: len(got_lens)])
        assert all(l == 0 for l in lens[len(got_lens) :])


def test_weights_all_equal():
    lens, mx = build_code_lens([3] * 16, 15)
    assert all(l == 4 for l in lens)
    assert mx == 4
