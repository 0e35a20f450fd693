"""ORZT container: the TPU engine's end-to-end encode/decode entry points.

Encode: segments stream through the device pipeline (one jit program per
shape bucket); a small thread pipeline overlaps host stream assembly and IO
with device compute.  Decode: native C++ per segment, parallel across
segments (the device targets encode throughput; decode is host work —
SURVEY.md section 7, hard part 3).
"""

from __future__ import annotations

from orz_tpu.device.spec import CHUNK_INPUT_DEFAULT
from orz_tpu.ioutil import CountRead, CountWrite, write_len
from orz_tpu.pcontainer import TPU_MAGIC, pipe_decode
from orz_tpu.progress import ProgressLogger, SilentProgressLogger

DEFAULT_SEGMENT_SIZE = 1 << 23  # 8 MiB
DEFAULT_BATCH = 4  # segments batched per device dispatch


def _decode_segment(payload: bytes, max_raw_len: int = 1 << 31) -> bytes:
    try:
        from orz_tpu.native.otz import decode_segment_native

        return decode_segment_native(payload, max_raw_len=max_raw_len)
    except (OSError, ImportError):  # no toolchain: slow reference fallback
        from orz_tpu.device.refcodec import decode_segment_ref

        return decode_segment_ref(payload)


def tpu_encode(
    source,
    target,
    level: int = 2,
    num_streams: int | None = None,  # alias for `batch` (CLI -p)
    segment_size: int = DEFAULT_SEGMENT_SIZE,
    chunk_input: int = CHUNK_INPUT_DEFAULT,
    batch: int = DEFAULT_BATCH,
    progress: ProgressLogger | None = None,
) -> None:
    """Stream-encode into the ORZT container with `batch` segments in
    flight: device dispatch of segment i+1..i+batch overlaps host assembly
    of segment i (all dispatches are async; only the symrank round count
    syncs early).  `num_streams` (the CLI's -p) is an alias for `batch`."""
    if num_streams is not None:
        batch = num_streams
    from orz_tpu.device.pipeline import (
        dispatch_segment_back,
        dispatch_segment_front,
        dispatch_segment_mid,
        finish_segment,
    )

    progress = progress or SilentProgressLogger()
    progress.set_is_encode(True)
    if not isinstance(source, CountRead):
        source = CountRead(source)
    if not isinstance(target, CountWrite):
        target = CountWrite(target)

    target.write(TPU_MAGIC)
    write_len(target, segment_size)

    def read_segment() -> bytes:
        chunks = []
        remaining = segment_size
        while remaining > 0:
            piece = source.read(min(remaining, 1 << 22))
            if not piece:
                break
            chunks.append(piece)
            remaining -= len(piece)
        return b"".join(chunks)

    # software pipeline over `batch` segments in flight: every dispatch is
    # asynchronous, so the device runs front/back programs back to back
    # while the host splices earlier payloads
    eof = False
    inflight = []  # (seg_bytes, front_state)
    while not eof or inflight:
        while not eof and len(inflight) < max(batch, 1):
            seg = read_segment()
            if not seg:
                eof = True
                break
            inflight.append((seg, dispatch_segment_front(seg, level, chunk_input)))
        if inflight:
            seg, front = inflight.pop(0)
            mid = dispatch_segment_mid(front)  # syncs n_items
            back = dispatch_segment_back(mid)  # syncs the symrank plan
            payload = finish_segment(seg, back, chunk_input)
            write_len(target, len(payload))
            target.write(payload)
            progress.log(source.count(), target.count())

    write_len(target, 0)
    progress.finish(source.count(), target.count())


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
