"""CLI + parallel container tests."""

import io
import os
import subprocess
import sys

import pytest

from orz_tpu import cfg_from_level
from orz_tpu.container import decode_bytes, encode_bytes
from orz_tpu.pcontainer import pdecode, pencode
from tests.conftest import make_text_like

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

native = pytest.importorskip("orz_tpu.native")
NB = native.NativeBackend()
CFG = cfg_from_level(0)


def run_cli(args, stdin: bytes = b"") -> subprocess.CompletedProcess:
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    return subprocess.run(
        [sys.executable, "-m", "orz_tpu.cli"] + args,
        input=stdin,
        capture_output=True,
        env=env,
        cwd=REPO,
    )


def test_cli_file_roundtrip(tmp_path, rng):
    data = make_text_like(rng, 50_000)
    src = tmp_path / "in.bin"
    src.write_bytes(data)
    enc = tmp_path / "out.orz"
    dec = tmp_path / "out.bin"

    r = run_cli(["encode", "-s", "-l", "1", str(src), str(enc)])
    assert r.returncode == 0, r.stderr
    r = run_cli(["decode", "-s", str(enc), str(dec)])
    assert r.returncode == 0, r.stderr
    assert dec.read_bytes() == data
    assert enc.stat().st_size < len(data)


def test_cli_stdio_roundtrip(rng):
    data = make_text_like(rng, 20_000)
    r = run_cli(["encode", "-s", "-l", "0"], stdin=data)
    assert r.returncode == 0, r.stderr
    r2 = run_cli(["decode", "-s"], stdin=r.stdout)
    assert r2.returncode == 0, r2.stderr
    assert r2.stdout == data


def test_cli_progress_to_stderr(tmp_path, rng):
    data = make_text_like(rng, 10_000)
    r = run_cli(["encode", "-l", "0"], stdin=data)
    assert r.returncode == 0
    assert b"statistics:" in r.stderr
    assert b"ratio:" in r.stderr


def test_cli_invalid_level(rng):
    r = run_cli(["encode", "-s", "-l", "9"], stdin=b"hello")
    assert r.returncode != 0
    assert b"invalid level" in r.stderr


def test_cli_decode_garbage():
    r = run_cli(["decode", "-s"], stdin=b"\xff" * 100)
    assert r.returncode != 0


def test_parallel_container_roundtrip(rng):
    data = make_text_like(rng, 300_000)
    out = io.BytesIO()
    pencode(io.BytesIO(data), out, CFG, NB, num_streams=3, segment_size=64 * 1024)
    comp = out.getvalue()
    dst = io.BytesIO()
    pdecode(io.BytesIO(comp), dst, NB)
    assert dst.getvalue() == data


def test_parallel_segments_are_plain_orz_streams(rng):
    from orz_tpu.ioutil import read_len
    from orz_tpu.pcontainer import PARALLEL_MAGIC

    data = make_text_like(rng, 150_000)
    out = io.BytesIO()
    pencode(io.BytesIO(data), out, CFG, NB, segment_size=64 * 1024)
    buf = io.BytesIO(out.getvalue())
    assert buf.read(len(PARALLEL_MAGIC)) == PARALLEL_MAGIC
    seg_size = read_len(buf)
    assert seg_size == 64 * 1024
    recovered = b""
    while True:
        n = read_len(buf)
        if n == 0:
            break
        stream = buf.read(n)
        recovered += decode_bytes(stream, NB)  # each segment decodes standalone
    assert recovered == data


def test_cli_parallel_roundtrip(tmp_path, rng):
    data = make_text_like(rng, 120_000)
    src = tmp_path / "in.bin"
    src.write_bytes(data)
    enc = tmp_path / "out.orzp"
    dec = tmp_path / "out.bin"
    r = run_cli(["encode", "-s", "-l", "0", "-p", "2", str(src), str(enc)])
    assert r.returncode == 0, r.stderr
    r = run_cli(["decode", "-s", str(enc), str(dec)])
    assert r.returncode == 0, r.stderr
    assert dec.read_bytes() == data


def test_parallel_empty_input():
    out = io.BytesIO()
    pencode(io.BytesIO(b""), out, CFG, NB)
    dst = io.BytesIO()
    pdecode(io.BytesIO(out.getvalue()), dst, NB)
    assert dst.getvalue() == b""
