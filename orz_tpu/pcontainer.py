"""Block-data-parallel multi-stream container.

The ORZ stream format is sequentially state-dependent end to end (symrank /
word-model state flows through the whole stream), so the only parallel axis
that leaves the chunk format untouched is across *independent streams*: the
input is split into fixed-size segments, each compressed as a self-contained
ORZ stream with fresh model state, then framed in file order.  This is the
axis the TPU build scales over chips and hosts (see orz_tpu/parallel/).

Wire format:
    b"ORZP" 0x01
    varint(segment_size)
    repeat: varint(len(stream_i)) + stream_i      (orz streams, file order)
    varint(0)

Each stream_i is a complete single-stream ORZ payload (decodable by the
reference orz binary on its own).  Segments are `segment_size` input bytes
except the last.
"""

from __future__ import annotations

import io
from concurrent.futures import ThreadPoolExecutor

from orz_tpu import container
from orz_tpu.cfg import LZCfg
from orz_tpu.ioutil import CountRead, CountWrite, read_len, write_len
from orz_tpu.progress import ProgressLogger, SilentProgressLogger

PARALLEL_MAGIC = b"ORZP\x01"
DEFAULT_SEGMENT_SIZE = 1 << 25  # 32 MiB


def _encode_segment(data: bytes, cfg: LZCfg, backend) -> bytes:
    return container.encode_bytes(data, cfg, backend)


def _decode_segment(data: bytes, backend) -> bytes:
    return container.decode_bytes(data, backend)


def pencode(
    source,
    target,
    cfg: LZCfg,
    backend,
    num_streams: int = 4,
    segment_size: int = DEFAULT_SEGMENT_SIZE,
    progress: ProgressLogger | None = None,
) -> None:
    """Compress into the multi-stream container with num_streams concurrent
    workers (native codec calls release the GIL, so threads scale on
    multi-core hosts; the device backend batches segments on-chip)."""
    progress = progress or SilentProgressLogger()
    progress.set_is_encode(True)
    if not isinstance(source, CountRead):
        source = CountRead(source)
    if not isinstance(target, CountWrite):
        target = CountWrite(target)

    target.write(PARALLEL_MAGIC)
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

    # bounded pipeline: keep at most num_streams segments in flight, emit in order
    with ThreadPoolExecutor(max_workers=max(num_streams, 1)) as pool:
        pending = []
        eof = False
        while not eof or pending:
            while not eof and len(pending) < max(num_streams, 1) * 2:
                seg = read_segment()
                if not seg:
                    eof = True
                    break
                pending.append(pool.submit(_encode_segment, seg, cfg, backend))
            if pending:
                payload = pending.pop(0).result()
                write_len(target, len(payload))
                target.write(payload)
                progress.log(source.count(), target.count())

    write_len(target, 0)
    progress.finish(source.count(), target.count())


def pdecode(source, target, backend, num_streams: int = 4, progress: ProgressLogger | None = None) -> None:
    """Decode the multi-stream container (magic already consumed or not)."""
    progress = progress or SilentProgressLogger()
    progress.set_is_encode(False)
    if not isinstance(source, CountRead):
        source = CountRead(source)
    if not isinstance(target, CountWrite):
        target = CountWrite(target)

    magic = source.read(len(PARALLEL_MAGIC))
    if magic != PARALLEL_MAGIC:
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
                pending.append(pool.submit(_decode_segment, payload, backend))
            if pending:
                target.write(pending.pop(0).result())
                progress.log(source.count(), target.count())

    progress.finish(source.count(), target.count())
