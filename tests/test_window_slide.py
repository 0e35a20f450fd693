"""Window-slide coverage: push > LZ_BLOCK_SIZE through the ORZ container.

The 32MB sliding window (reference src/lib.rs:83-84) only exercises its
rebase path — `forward()` position rebasing and dead-chain pruning
(reference src/matcher.rs:82-87,123-133; csrc/orz_core.cpp Chains::forward)
— once more than LZ_BLOCK_FRESH_LEN fresh bytes have been consumed.  These
tests cross that boundary with long-range repeats spanning it, so a rebase
bug corrupts matches immediately after the slide.

Native encode (the golden model is ~60 KB/s, far too slow at 34 MB), then
BOTH native and golden decoders must reproduce the input: the golden
decoder maintains its own bucket rebase, pinning the native encoder's
forward() against an independent implementation.

Marked slow: ~1-2 minutes.
"""

import io

import numpy as np
import pytest

from orz_tpu import cfg_from_level
from orz_tpu.constants import LZ_BLOCK_FRESH_LEN
from orz_tpu.container import GoldenBackend, decode, encode_bytes

native = pytest.importorskip("orz_tpu.native")
NB = native.NativeBackend()


def make_sliding_corpus(total: int) -> bytes:
    """Compressible data with repeats that straddle the block boundary:
    phrases from early in the stream recur throughout, including right
    around LZ_BLOCK_FRESH_LEN."""
    rng = np.random.default_rng(0x51DE)
    words = [
        bytes(rng.integers(97, 123, int(rng.integers(3, 10))).astype(np.uint8))
        for _ in range(512)
    ]
    phrases = [
        b" ".join(words[int(rng.integers(0, 512))] for _ in range(8))
        for _ in range(64)
    ]
    out = bytearray()
    i = 0
    while len(out) < total:
        out += phrases[i % 64]
        out += b" "
        if rng.random() < 0.1:  # raw noise so it is not trivially periodic
            out += bytes(rng.integers(0, 256, 32).astype(np.uint8))
        i += 1
    return bytes(out[:total])


@pytest.mark.slow
def test_native_container_across_slide():
    # the first block consumes LZ_BLOCK_FRESH_LEN (16.78 MB) fresh bytes;
    # +1 MB pushes encoding into the second block, after one slide/rebase
    total = LZ_BLOCK_FRESH_LEN + (1 << 20)
    data = make_sliding_corpus(total)
    comp = encode_bytes(data, cfg_from_level(0), NB)

    # native decode round-trip
    out = io.BytesIO()
    decode(io.BytesIO(comp), out, NB)
    assert out.getvalue() == data

    # independent golden decode of the same stream (pins forward()/pruning
    # behavior against the reference-exact python model)
    out2 = io.BytesIO()
    decode(io.BytesIO(comp), out2, GoldenBackend())
    assert out2.getvalue() == data


@pytest.mark.slow
def test_native_container_two_slides_roundtrip():
    total = 2 * LZ_BLOCK_FRESH_LEN + (1 << 20)  # ~34.6 MB: two slides
    data = make_sliding_corpus(total)
    comp = encode_bytes(data, cfg_from_level(0), NB)
    out = io.BytesIO()
    decode(io.BytesIO(comp), out, NB)
    assert out.getvalue() == data
