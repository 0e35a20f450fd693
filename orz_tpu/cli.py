"""Command-line interface (reference src/main.rs).

    orz-tpu encode [-s] [-l 0..2] [ipath] [opath]
    orz-tpu decode [-s] [ipath] [opath]

Paths default to stdin/stdout.  Extensions over the reference CLI:
--backend selects the codec implementation, and `encode -p/--parallel N`
uses the block-data-parallel multi-stream container (not orz-compatible,
framed with its own magic; decode auto-detects it).
"""

from __future__ import annotations

import argparse
import sys

from orz_tpu import container
from orz_tpu.cfg import cfg_from_level
from orz_tpu.ioutil import CountRead, CountWrite
from orz_tpu.progress import SilentProgressLogger, SimpleProgressLogger


def get_backend(name: str):
    if name == "golden":
        from orz_tpu.container import GoldenBackend

        return GoldenBackend()
    if name == "native":
        from orz_tpu.native import NativeBackend

        return NativeBackend()
    if name == "tpu":
        return "tpu"  # device engine; handled by the ORZT container paths
    if name == "auto":
        from orz_tpu import default_backend

        return default_backend()
    raise ValueError(f"unknown backend: {name}")


def _open_io(ipath, opath):
    fin = open(ipath, "rb") if ipath else sys.stdin.buffer
    fout = open(opath, "wb") if opath else sys.stdout.buffer
    return fin, fout


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="orz-tpu", description="a TPU-native ROLZ data compressor")
    sub = parser.add_subparsers(dest="command", required=True)

    p_enc = sub.add_parser("encode", help="Encode")
    p_enc.add_argument("-s", "--silent", action="store_true", help="Run silently")
    p_enc.add_argument("-l", "--level", type=int, default=2, help="Set compression level (0..3; 3 = deeper OTZ quality schedule, TPU engine)")
    p_enc.add_argument("-b", "--backend", default="auto", help="codec backend: auto|native|golden|tpu")
    p_enc.add_argument("-p", "--parallel", type=int, default=0, metavar="N",
                       help="block-parallel multi-stream container over N workers/devices")
    p_enc.add_argument("--checkpoint", metavar="STATE.json", default=None,
                       help="segment-granular resume sidecar (requires file "
                            "paths; implies the multi-stream container)")
    p_enc.add_argument("ipath", nargs="?", default=None, help="Source file name, default to stdin")
    p_enc.add_argument("opath", nargs="?", default=None, help="Target file name, default to stdout")

    p_dec = sub.add_parser("decode", help="Decode")
    p_dec.add_argument("-s", "--silent", action="store_true", help="Run silently")
    p_dec.add_argument("-b", "--backend", default="auto", help="codec backend: auto|native|golden|tpu")
    p_dec.add_argument("ipath", nargs="?", default=None)
    p_dec.add_argument("opath", nargs="?", default=None)

    args = parser.parse_args(argv)
    logger = SilentProgressLogger() if args.silent else SimpleProgressLogger()

    try:
        backend = get_backend(args.backend)
    except Exception as e:
        print(f"backend init failed: {e}", file=sys.stderr)
        return 1

    fin = fout = None
    try:
        fin, fout = _open_io(args.ipath, args.opath)
        if args.command == "encode":
            if args.checkpoint:
                if not (args.ipath and args.opath):
                    print("encode --checkpoint requires file paths (resume "
                          "seeks both files)", file=sys.stderr)
                    return 1
                from orz_tpu.checkpoint import checkpointed_encode
                from orz_tpu.pcontainer import (
                    DEFAULT_SEGMENT_SIZE, PARALLEL_MAGIC, TPU_MAGIC)

                if backend == "tpu":
                    from orz_tpu.device.container import (
                        DEFAULT_SEGMENT_SIZE as TPU_SEG)
                    from orz_tpu.device.pipeline import encode_segment_staged
                    from orz_tpu.device.spec import CHUNK_INPUT_DEFAULT

                    enc_seg = (lambda seg: encode_segment_staged(
                        seg, args.level, CHUNK_INPUT_DEFAULT))
                    magic, seg_size = TPU_MAGIC, TPU_SEG
                else:
                    cfg = cfg_from_level(args.level)
                    enc_seg = (lambda seg:
                               container.encode_bytes(seg, cfg, backend))
                    magic, seg_size = PARALLEL_MAGIC, DEFAULT_SEGMENT_SIZE
                checkpointed_encode(
                    args.ipath, args.opath, enc_seg, magic, seg_size,
                    args.parallel or 2, args.checkpoint, logger)
            elif backend == "tpu":
                from orz_tpu.device.container import tpu_encode

                tpu_encode(fin, fout, level=args.level,
                           num_streams=args.parallel or 2, progress=logger)
            else:
                cfg = cfg_from_level(args.level)
                if args.parallel:
                    from orz_tpu.pcontainer import pencode

                    pencode(fin, fout, cfg, backend, num_streams=args.parallel, progress=logger)
                else:
                    container.encode(CountRead(fin), CountWrite(fout), cfg, backend, logger)
        else:
            from orz_tpu.pcontainer import PARALLEL_MAGIC, TPU_MAGIC, pdecode

            head = fin.read(len(PARALLEL_MAGIC))
            stream = _PrefixedReader(head, fin)
            if head == TPU_MAGIC:
                from orz_tpu.device.container import tpu_decode

                tpu_decode(stream, fout, progress=logger)
            elif head == PARALLEL_MAGIC:
                if backend == "tpu":
                    backend = get_backend("auto")
                pdecode(stream, fout, backend, progress=logger)
            else:
                if backend == "tpu":
                    backend = get_backend("auto")
                container.decode(CountRead(stream), CountWrite(fout), backend, logger)
        fout.flush()
    except (ValueError, EOFError) as e:
        print(f"{args.command} failed: {e}", file=sys.stderr)
        return 1
    finally:
        if fin is not None and args.ipath:
            fin.close()
        if fout is not None and args.opath:
            fout.close()
    return 0


class _PrefixedReader:
    """A reader that replays an already-consumed prefix."""

    def __init__(self, prefix: bytes, inner):
        self.prefix = prefix
        self.inner = inner

    def read(self, n: int = -1) -> bytes:
        if self.prefix:
            if n < 0 or n >= len(self.prefix):
                out, self.prefix = self.prefix, b""
                rest = self.inner.read(n - len(out)) if n > 0 else self.inner.read(n)
                return out + (rest or b"")
            out, self.prefix = self.prefix[:n], self.prefix[n:]
            return out
        return self.inner.read(n)

    def readinto(self, buf) -> int:
        data = self.read(len(buf))
        buf[: len(data)] = data
        return len(data)


if __name__ == "__main__":
    sys.exit(main())
