"""ORZT container, native OTZ decoder, CLI tpu engine, mesh block-DP."""

import io
import os

import numpy as np
import pytest

from conftest import make_binary_like, make_text_like
from orz_tpu.device.container import tpu_decode_bytes, tpu_encode_bytes
from orz_tpu.device.refcodec import decode_segment_ref, encode_segment_ref
from orz_tpu.native.otz import decode_segment_native


def test_native_otz_decoder_matches_ref(rng):
    for maker, size, lvl in [(make_text_like, 20000, 1), (make_binary_like, 9000, 2)]:
        data = maker(rng, size)
        payload = encode_segment_ref(data, level=lvl, chunk_input=1 << 13)
        assert decode_segment_native(payload) == data
        assert decode_segment_ref(payload) == data


def test_native_otz_decoder_rejects_garbage(rng):
    bad = rng.integers(0, 256, 512, dtype=np.uint8).tobytes()
    with pytest.raises(ValueError):
        decode_segment_native(b"\xff" * 64 + bad)


def test_tpu_container_roundtrip_multi_segment(rng):
    data = make_text_like(rng, 100_000)
    comp = tpu_encode_bytes(data, level=1, segment_size=1 << 15)  # many segments
    assert tpu_decode_bytes(comp) == data
    assert len(comp) < len(data)


def test_tpu_container_empty():
    comp = tpu_encode_bytes(b"", level=1)
    assert tpu_decode_bytes(comp) == b""


def test_cli_tpu_engine(tmp_path, rng):
    from orz_tpu.cli import main

    data = make_text_like(rng, 50_000)
    src = tmp_path / "in.bin"
    dst = tmp_path / "out.otz"
    back = tmp_path / "back.bin"
    src.write_bytes(data)
    assert main(["encode", "-s", "-b", "tpu", "-l", "1", str(src), str(dst)]) == 0
    assert main(["decode", "-s", str(dst), str(back)]) == 0  # auto-detects ORZT
    assert back.read_bytes() == data


def test_mesh_block_parallel_8dev(rng):
    import jax

    from orz_tpu.parallel import blocks_mesh, mesh_encode_segments

    assert len(jax.devices()) >= 8  # conftest forces 8 virtual CPU devices
    mesh = blocks_mesh(8)
    segments = [make_text_like(rng, 3000 + 731 * i) for i in range(8)]
    payloads = mesh_encode_segments(segments, level=1, chunk_input=1 << 12, mesh=mesh)
    for seg, payload in zip(segments, payloads):
        assert decode_segment_native(payload) == seg
        # sharded batch result must equal the single-segment device encoder
        from orz_tpu.device.pipeline import encode_segment_device

        assert payload == encode_segment_device(seg, level=1, chunk_input=1 << 12)


def test_distributed_single_process(tmp_path, rng):
    """Striped encode + allgather + file writer, single-process degenerate
    case (multi-process needs a pod; the stripe/gather logic is identical)."""
    from orz_tpu.parallel import distributed as dist

    data = make_text_like(rng, 60_000)
    src = tmp_path / "in.bin"
    dst = tmp_path / "out.orzt"
    src.write_bytes(data)
    dist.distributed_encode_file(str(src), str(dst), level=1, segment_size=1 << 14)
    assert tpu_decode_bytes(dst.read_bytes()) == data


def test_pipe_encode_batch_failure_recovers(rng):
    """A failed batch dispatch re-encodes its segments per-segment
    (failure recovery at the format's natural retry granularity)."""
    import io

    from orz_tpu.ioutil import read_len
    from orz_tpu.pcontainer import pipe_encode

    data = make_text_like(rng, 5000)
    calls = {"batch": 0}

    def bad_batch(segs):
        calls["batch"] += 1
        raise RuntimeError("simulated device OOM")

    def enc_seg(seg):
        return bytes(reversed(seg))

    src, dst = io.BytesIO(data), io.BytesIO()
    pipe_encode(src, dst, enc_seg, b"TEST\x01", 1024, 2,
                encode_batch=bad_batch, batch_size=2)
    assert calls["batch"] >= 1  # the batch path did run and fail
    out = io.BytesIO(dst.getvalue())
    assert out.read(5) == b"TEST\x01"
    assert read_len(out) == 1024
    got = bytearray()
    while True:
        n = read_len(out)
        if n == 0:
            break
        got += bytes(reversed(out.read(n)))
    assert bytes(got) == data
