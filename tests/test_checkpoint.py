"""Checkpoint/resume (orz_tpu/checkpoint.py): segment-granular resume of the
multi-stream container (SURVEY.md section 5 — the reference has none)."""

import io
import json
import os
import zlib

import pytest

from orz_tpu.checkpoint import CheckpointState, checkpointed_encode
from orz_tpu.pcontainer import pipe_encode

from tests.conftest import make_text_like

MAGIC = b"TEST\x01"
SEG = 1 << 14


def _enc(seg: bytes) -> bytes:
    return zlib.compress(seg, 1)


def _reference_stream(data: bytes) -> bytes:
    src, dst = io.BytesIO(data), io.BytesIO()
    pipe_encode(src, dst, _enc, MAGIC, SEG, num_streams=2)
    return dst.getvalue()


def test_fresh_encode_matches_pipe_encode(tmp_path, rng):
    data = make_text_like(rng, 5 * SEG + 123)
    src = tmp_path / "in.bin"
    dst = tmp_path / "out.bin"
    ck = tmp_path / "state.json"
    src.write_bytes(data)
    checkpointed_encode(str(src), str(dst), _enc, MAGIC, SEG, 2, str(ck))
    assert dst.read_bytes() == _reference_stream(data)
    assert not ck.exists()  # sidecar removed on success


def test_resume_after_crash(tmp_path, rng):
    data = make_text_like(rng, 7 * SEG + 55)
    src = tmp_path / "in.bin"
    dst = tmp_path / "out.bin"
    ck = tmp_path / "state.json"
    src.write_bytes(data)

    calls = {"n": 0}

    def crashing_enc(seg: bytes) -> bytes:
        calls["n"] += 1
        if calls["n"] == 4:
            raise RuntimeError("simulated worker crash")
        return _enc(seg)

    with pytest.raises(RuntimeError):
        checkpointed_encode(str(src), str(dst), crashing_enc, MAGIC, SEG, 2,
                            str(ck))
    # the sidecar survives the crash and records progress
    st = json.loads(ck.read_text())
    assert st["magic"] == MAGIC.hex() and st["n_segments"] >= 1
    # corrupt the tail past the checkpoint to prove resume truncates it
    with open(dst, "ab") as f:
        f.write(b"GARBAGE-PAST-CHECKPOINT")

    checkpointed_encode(str(src), str(dst), _enc, MAGIC, SEG, 2, str(ck))
    assert dst.read_bytes() == _reference_stream(data)
    assert not ck.exists()


def test_resume_ignores_mismatched_sidecar(tmp_path, rng):
    data = make_text_like(rng, 2 * SEG)
    src = tmp_path / "in.bin"
    dst = tmp_path / "out.bin"
    ck = tmp_path / "state.json"
    src.write_bytes(data)
    # sidecar from a different config (other segment size) must be ignored
    CheckpointState(str(ck)).save(MAGIC, SEG * 2, 10, 10, 1)
    checkpointed_encode(str(src), str(dst), _enc, MAGIC, SEG, 2, str(ck))
    assert dst.read_bytes() == _reference_stream(data)


def test_cli_checkpoint_roundtrip(tmp_path, rng):
    from orz_tpu.cli import main as cli_main

    data = make_text_like(rng, 3 << 16)
    src = tmp_path / "in.bin"
    dst = tmp_path / "out.orz"
    out = tmp_path / "out.bin"
    ck = tmp_path / "ck.json"
    src.write_bytes(data)
    rc = cli_main(["encode", "-s", "-l", "0", "-b", "native", "--checkpoint",
                   str(ck), str(src), str(dst)])
    assert rc == 0 and not ck.exists()
    rc = cli_main(["decode", "-s", "-b", "native", str(dst), str(out)])
    assert rc == 0
    assert out.read_bytes() == data
