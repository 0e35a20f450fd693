"""Decoder robustness: corrupt/truncated streams must raise clean errors
(never crash, hang, or emit unbounded output) in both the Python oracle and
the native C++ decoders, for both engines."""

import numpy as np
import pytest

from conftest import make_text_like
from orz_tpu.device.refcodec import OTZFormatError, decode_segment_ref, encode_segment_ref
from orz_tpu.native.otz import decode_segment_native


def _mutations(rng, payload: bytes, n: int):
    for _ in range(n):
        b = bytearray(payload)
        op = rng.integers(3)
        if op == 0 and len(b) > 8:  # flip bits
            for _ in range(int(rng.integers(1, 8))):
                i = int(rng.integers(len(b)))
                b[i] ^= 1 << int(rng.integers(8))
        elif op == 1:  # truncate
            b = b[: int(rng.integers(1, max(2, len(b))))]
        else:  # garbage tail / headers
            i = int(rng.integers(min(16, len(b))))
            b[i : i + 4] = rng.integers(0, 256, 4, dtype=np.uint8).tobytes()
        yield bytes(b)


def test_otz_decoders_survive_corruption():
    rng = np.random.default_rng(0xF022)  # own stream: deterministic mutants
    data = make_text_like(rng, 20000)
    payload = encode_segment_ref(data, level=1, chunk_input=1 << 13)
    for mutant in _mutations(rng, payload, 40):
        # native: ValueError or a (wrong) decode — never a crash
        try:
            out = decode_segment_native(mutant)
            assert len(out) < 1 << 24
        except ValueError:
            pass
        try:
            out = decode_segment_ref(mutant)
            assert len(out) < 1 << 24
        except (OTZFormatError, ValueError, EOFError, IndexError):
            pass


def test_orz_native_survives_corruption():
    from orz_tpu.cfg import cfg_from_level
    from orz_tpu.container import decode_bytes, encode_bytes
    from orz_tpu.native import NativeBackend

    be = NativeBackend()
    rng = np.random.default_rng(0xF033)
    data = make_text_like(rng, 20000)
    payload = encode_bytes(data, cfg_from_level(1), be)
    for mutant in _mutations(rng, payload, 30):
        try:
            out = decode_bytes(mutant, be)
            assert len(out) < 1 << 24
        except (ValueError, EOFError):
            pass
