"""Checkpoint/resume for container encodes (SURVEY.md section 5).

The reference has no checkpointing (its stream state is sequential end to
end); the multi-stream container (pcontainer.py) makes resume natural at
SEGMENT granularity: each segment is self-contained, so the resumable state
is just (source offset, target offset, segments written).  A sidecar JSON
file records that state after every flushed segment (atomic rename), and a
resumed encode seeks both files and continues with the same parameters.

Use via the CLI: `orz-tpu encode --checkpoint state.json in out` — if the
sidecar exists and matches, the encode resumes; on success the sidecar is
removed.
"""

from __future__ import annotations

import json
import os

from orz_tpu.ioutil import CountRead, CountWrite, write_len
from orz_tpu.progress import ProgressLogger, SilentProgressLogger

_FORMAT = 1


class CheckpointState:
    """Sidecar save/load; all offsets are absolute file positions."""

    def __init__(self, path: str):
        self.path = path

    def save(self, magic: bytes, segment_size: int, src_off: int,
             dst_off: int, n_segments: int) -> None:
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({
                "format": _FORMAT,
                "magic": magic.hex(),
                "segment_size": segment_size,
                "src_off": src_off,
                "dst_off": dst_off,
                "n_segments": n_segments,
            }, f)
        os.replace(tmp, self.path)

    def load(self) -> dict | None:
        try:
            with open(self.path) as f:
                st = json.load(f)
        except (OSError, ValueError):
            return None
        if st.get("format") != _FORMAT:
            return None
        return st

    def clear(self) -> None:
        try:
            os.remove(self.path)
        except OSError:
            pass


def checkpointed_encode(
    source_path: str,
    target_path: str,
    encode_segment,  # bytes -> bytes
    magic: bytes,
    segment_size: int,
    num_streams: int,
    checkpoint_path: str,
    progress: ProgressLogger | None = None,
) -> None:
    """pipe_encode over real files with segment-granular resume.

    A fresh run writes the container header and checkpoints after every
    segment; a resumed run validates the sidecar against (magic,
    segment_size), truncates the target back to the last checkpointed
    offset, seeks the source, and continues.  The sidecar is removed on
    successful completion."""
    from concurrent.futures import ThreadPoolExecutor

    progress = progress or SilentProgressLogger()
    progress.set_is_encode(True)
    ck = CheckpointState(checkpoint_path)
    st = ck.load()
    resume = (
        st is not None
        and st["magic"] == magic.hex()
        and st["segment_size"] == segment_size
        and os.path.exists(target_path)
        and os.path.getsize(target_path) >= st["dst_off"]
    )

    with open(source_path, "rb") as src_f:
        n_segments = 0
        if resume:
            src_f.seek(st["src_off"])
            n_segments = st["n_segments"]
            dst_f = open(target_path, "r+b")
            dst_f.truncate(st["dst_off"])
            dst_f.seek(st["dst_off"])
        else:
            dst_f = open(target_path, "wb")

        with dst_f:
            source = CountRead(src_f)
            target = CountWrite(dst_f)
            if not resume:
                target.write(magic)
                write_len(target, segment_size)
                ck.save(magic, segment_size, 0, target.count(), 0)

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

            base_src = st["src_off"] if resume else 0
            base_dst = st["dst_off"] if resume else None
            with ThreadPoolExecutor(max_workers=max(num_streams, 1)) as pool:
                pending = []
                eof = False
                while not eof or pending:
                    while not eof and len(pending) < max(num_streams, 1) * 2:
                        seg = read_segment()
                        if not seg:
                            eof = True
                            break
                        pending.append((len(seg),
                                        pool.submit(encode_segment, seg)))
                    if pending:
                        seg_len, fut = pending.pop(0)
                        payload = fut.result()
                        write_len(target, len(payload))
                        target.write(payload)
                        dst_f.flush()
                        n_segments += 1
                        # src offset of the NEXT unwritten segment = bytes
                        # consumed so far minus segments still in flight
                        in_flight = sum(s for s, _ in pending)
                        ck.save(
                            magic, segment_size,
                            base_src + source.count() - in_flight,
                            (base_dst or 0) + target.count()
                            if resume else target.count(),
                            n_segments,
                        )
                        progress.log(source.count(), target.count())

            write_len(target, 0)
            progress.finish(source.count(), target.count())
    ck.clear()
