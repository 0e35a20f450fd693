"""ORZT container: the TPU engine's end-to-end encode/decode entry points.

Encode: segments stream through the device pipeline (one jit program per
shape bucket); a small thread pipeline overlaps host stream assembly and IO
with device compute.  Decode: native C++ per segment, parallel across
segments (the device targets encode throughput; decode is host work —
SURVEY.md section 7, hard part 3).
"""

from __future__ import annotations

from orz_tpu.device.pipeline import encode_segment_device
from orz_tpu.device.spec import CHUNK_INPUT_DEFAULT
from orz_tpu.pcontainer import TPU_MAGIC, pipe_decode, pipe_encode
from orz_tpu.progress import ProgressLogger

DEFAULT_SEGMENT_SIZE = 1 << 23  # 8 MiB


def _decode_segment(payload: bytes) -> bytes:
    try:
        from orz_tpu.native.otz import decode_segment_native

        return decode_segment_native(payload)
    except (OSError, ImportError):  # no toolchain: slow reference fallback
        from orz_tpu.device.refcodec import decode_segment_ref

        return decode_segment_ref(payload)


def tpu_encode(
    source,
    target,
    level: int = 2,
    num_streams: int = 2,
    segment_size: int = DEFAULT_SEGMENT_SIZE,
    chunk_input: int = CHUNK_INPUT_DEFAULT,
    progress: ProgressLogger | None = None,
) -> None:
    pipe_encode(
        source, target,
        lambda seg: encode_segment_device(seg, level=level, chunk_input=chunk_input),
        TPU_MAGIC, segment_size, num_streams, progress,
    )


def tpu_decode(source, target, num_streams: int = 8, progress: ProgressLogger | None = None) -> None:
    pipe_decode(source, target, _decode_segment, TPU_MAGIC, num_streams, progress)


def tpu_encode_bytes(data: bytes, level: int = 2, **kw) -> bytes:
    import io

    src, dst = io.BytesIO(data), io.BytesIO()
    tpu_encode(src, dst, level=level, **kw)
    return dst.getvalue()


def tpu_decode_bytes(data: bytes, **kw) -> bytes:
    import io

    src, dst = io.BytesIO(data), io.BytesIO()
    tpu_decode(src, dst, **kw)
    return dst.getvalue()
