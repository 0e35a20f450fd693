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
    rings_mode: int | None = None,
) -> None:
    """Stream-encode into the ORZT container with `batch` segments in
    flight, each on its own thread (JAX dispatch is thread-safe and the
    device executes the queued programs in order): the blocking host syncs
    of one segment (n_items fetch, symrank plan fetch, payload fetch — each
    a full host<->device round trip) overlap device compute and syncs of
    the others.  `num_streams` (the CLI's -p) is an alias for `batch`.
    rings_mode: None = level default; 0/1 force OTZ1/OTZ2 explicitly."""
    if num_streams is not None:
        batch = num_streams
    from orz_tpu.device.batch import encode_segments_batch
    from orz_tpu.device.pipeline import _bucket_capacity, encode_segment_staged
    from orz_tpu.pcontainer import pipe_encode

    batch = max(batch, 1)
    # fixed shape bucket = the full segment size, so every batch (including
    # padded EOF leftovers) reuses one compiled program set.  batch == 1
    # still rides the batched chain at B=1 (same program set as any other
    # B, so e.g. an 8 MiB-segment bench compiles exactly one set); the
    # per-segment staged path remains reachable via ORZ_PER_SEGMENT=1.
    import os

    cap = _bucket_capacity(segment_size)
    per_segment = os.environ.get("ORZ_PER_SEGMENT") == "1"

    def encode_batch(segs):
        # steady-state full segments land in the fixed bucket; a leftover
        # batch of short segments (or a sub-segment-size input) takes its
        # own smaller bucket instead of padding to the full segment size
        c = min(cap, _bucket_capacity(max(len(s) for s in segs)))
        return encode_segments_batch(segs, level, chunk_input,
                                     rings_mode=rings_mode, cap=c)

    pipe_encode(
        source, target,
        lambda seg: encode_segment_staged(seg, level, chunk_input,
                                          rings_mode=rings_mode),
        TPU_MAGIC, segment_size, batch, progress,
        encode_batch=None if per_segment else encode_batch,
        batch_size=batch,
    )


def tpu_decode(source, target, num_streams: int | None = None,
               progress: ProgressLogger | None = None) -> None:
    if num_streams is None:
        # one decode thread per physical core: the native decoder is
        # compute-bound, and oversubscription measurably hurts (2 MiB
        # segments, 4 cores: 8 threads = 126 MB/s vs 4 threads = 147 MB/s)
        import os

        num_streams = os.cpu_count() or 4
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
