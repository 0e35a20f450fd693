"""Block-data-parallel multi-stream container.

The ORZ/OTZ stream formats are sequentially state-dependent end to end
(symrank / word-model state flows through the whole stream), so the parallel
axis that leaves the segment format untouched is across *independent
streams*: the input is split into fixed-size segments, each compressed
self-contained with fresh model state, then framed in file order.  This is
the axis the TPU build scales over chips and hosts (orz_tpu/parallel/).

Wire format (both engines):
    magic (5 bytes)
    varint(segment_size)
    repeat: varint(len(stream_i)) + stream_i      (segments, file order)
    varint(0)

ORZP magic frames ORZ streams (each decodable by the reference orz binary);
ORZT magic frames OTZ segments (TPU-encoded, orz_tpu/device/).
"""

from __future__ import annotations

import io
from concurrent.futures import ThreadPoolExecutor

from orz_tpu import container
from orz_tpu.cfg import LZCfg
from orz_tpu.ioutil import CountRead, CountWrite, read_len, write_len
from orz_tpu.progress import ProgressLogger, SilentProgressLogger

PARALLEL_MAGIC = b"ORZP\x01"
TPU_MAGIC = b"ORZT\x01"
MAGIC_LEN = 5
DEFAULT_SEGMENT_SIZE = 1 << 25  # 32 MiB


def pipe_encode(
    source,
    target,
    encode_segment,  # bytes -> bytes
    magic: bytes,
    segment_size: int,
    num_streams: int,
    progress: ProgressLogger | None = None,
    encode_batch=None,  # list[bytes] -> list[bytes]
    batch_size: int | None = None,
) -> None:
    """Generic bounded pipeline: read segments, compress with at most
    num_streams in flight, emit in file order.

    encode_batch: when given, full batches of `batch_size` segments go
    through it (one device dispatch chain covers the whole batch —
    orz_tpu/device/batch.py).  EOF leftovers (fewer than batch_size
    segments) are padded with copies of the first leftover segment and
    routed through encode_batch too — the padding's payloads are discarded;
    this trades up to (batch_size-1) redundant segment encodes for reusing
    the one compiled batch program set (the per-segment programs would cost
    a separate multi-minute compile).  A short input therefore pays for one
    full batch even when it holds a single segment."""
    progress = progress or SilentProgressLogger()
    progress.set_is_encode(True)
    if not isinstance(source, CountRead):
        source = CountRead(source)
    if not isinstance(target, CountWrite):
        target = CountWrite(target)

    target.write(magic)
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

    def emit(payload: bytes) -> None:
        write_len(target, len(payload))
        target.write(payload)
        progress.log(source.count(), target.count())

    if encode_batch is not None:
        bsz = max(batch_size or num_streams, 1)
        # Batches in flight: 2 lets batch k+1's dispatches overlap batch k's
        # host-side payload assembly (the device queue serializes execution
        # anyway), but each in-flight batch retains its full set of device
        # intermediates — with OTZ2 plans that deterministically exhausted
        # the 16 GB chip in round 4's driver bench.  Default to ONE batch in
        # flight (the overlap won is host assembly, ~100 ms, vs multi-second
        # device compute); ORZ_INFLIGHT=2 restores the overlap.
        import os

        inflight = max(1, int(os.environ.get("ORZ_INFLIGHT", "1")))
        with ThreadPoolExecutor(max_workers=inflight) as pool:
            pending = []  # futures resolving to list[bytes]
            eof = False
            while not eof or pending:
                while not eof and len(pending) < inflight:
                    segs = []
                    while len(segs) < bsz:
                        seg = read_segment()
                        if not seg:
                            eof = True
                            break
                        segs.append(seg)
                    if not segs:
                        break
                    if len(segs) == bsz:
                        pending.append((segs, pool.submit(encode_batch, segs)))
                    else:  # EOF leftovers: pad the batch with copies of the
                        # first segment (same compiled programs, same
                        # shapes) and discard the padding's payloads
                        k = len(segs)
                        padded = segs + [segs[0]] * (bsz - k)
                        pending.append((segs, pool.submit(
                            lambda ss, k=k: encode_batch(ss)[:k], padded
                        )))
                if pending:
                    segs_in, fut = pending.pop(0)
                    try:
                        payloads = fut.result()
                    except Exception:
                        # failure recovery at segment granularity (the axis
                        # the format gives us): a failed batch dispatch
                        # (device OOM, transient backend error) re-encodes
                        # its segments one at a time through the host
                        # per-segment path; a second failure propagates
                        payloads = [encode_segment(s) for s in segs_in]
                    for payload in payloads:
                        emit(payload)
        write_len(target, 0)
        progress.finish(source.count(), target.count())
        return

    with ThreadPoolExecutor(max_workers=max(num_streams, 1)) as pool:
        pending = []
        eof = False
        while not eof or pending:
            while not eof and len(pending) < max(num_streams, 1) * 2:
                seg = read_segment()
                if not seg:
                    eof = True
                    break
                pending.append(pool.submit(encode_segment, seg))
            if pending:
                payload = pending.pop(0).result()
                write_len(target, len(payload))
                target.write(payload)
                progress.log(source.count(), target.count())

    write_len(target, 0)
    progress.finish(source.count(), target.count())


def pipe_decode(
    source,
    target,
    decode_segment,  # bytes -> bytes
    magic: bytes,
    num_streams: int,
    progress: ProgressLogger | None = None,
) -> None:
    """Generic parallel decode of the multi-stream container."""
    progress = progress or SilentProgressLogger()
    progress.set_is_encode(False)
    if not isinstance(source, CountRead):
        source = CountRead(source)
    if not isinstance(target, CountWrite):
        target = CountWrite(target)

    got = source.read(MAGIC_LEN)
    if got != magic:
        raise ValueError("bad parallel container magic")
    _segment_size = read_len(source)

    with ThreadPoolExecutor(max_workers=max(num_streams, 1)) as pool:
        pending = []
        eof = False
        while not eof or pending:
            while not eof and len(pending) < max(num_streams, 1) * 2:
                n = read_len(source)
                if n == 0:
                    eof = True
                    break
                payload = source.read(n)
                if len(payload) != n:
                    raise EOFError("truncated segment")
                pending.append(pool.submit(decode_segment, payload))
            if pending:
                target.write(pending.pop(0).result())
                progress.log(source.count(), target.count())

    progress.finish(source.count(), target.count())


# --- ORZP: orz-format streams, host codec backends -------------------------


def pencode(
    source,
    target,
    cfg: LZCfg,
    backend,
    num_streams: int = 4,
    segment_size: int = DEFAULT_SEGMENT_SIZE,
    progress: ProgressLogger | None = None,
) -> None:
    """Compress into the ORZP container with num_streams concurrent workers
    (native codec calls release the GIL, so threads scale on multi-core)."""
    pipe_encode(
        source, target,
        lambda seg: container.encode_bytes(seg, cfg, backend),
        PARALLEL_MAGIC, segment_size, num_streams, progress,
    )


def pdecode(source, target, backend, num_streams: int = 4, progress: ProgressLogger | None = None) -> None:
    pipe_decode(
        source, target,
        lambda payload: container.decode_bytes(payload, backend),
        PARALLEL_MAGIC, num_streams, progress,
    )
