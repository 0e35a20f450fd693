"""Deterministic real-file benchmark corpus (non-self-authored data).

The reference benchmarks on enwik8 (reference README.md:40-54); with zero
network egress enwik8 is unobtainable here, so this builds the VERDICT-
prescribed substitute: a Silesia-style mix of REAL local files that were
not authored by the code being measured — Python sources from installed
packages (code/text), XML and JSON data files from /usr/share (markup),
and ELF executables from /usr/bin (binary).  Categories interleave in
1 MiB strides so every prefix of the stream carries the full mix
(prefix-stable, like bench.make_corpus).

Usage:  from tools.real_corpus import make_real_corpus
        data = make_real_corpus(32 << 20)
"""

from __future__ import annotations

import glob
import os

_STRIDE = 1 << 20
# (glob pattern, per-file byte cap) per category; globs sort for determinism.
# Caps keep one huge file from monopolizing a category.
_CATS = [
    # code/text: ~50% of the stride schedule (Silesia is text-heavy)
    ("/opt/venv/lib/python3.12/site-packages/torch/**/*.py", 1 << 20),
    ("/opt/venv/lib/python3.12/site-packages/jax/**/*.py", 1 << 20),
    # markup/data
    ("/usr/share/**/*.xml", 256 << 10),
    ("/usr/share/iso-codes/**/*.json", 4 << 20),
    # binary
    ("/usr/bin/*", 2 << 20),
    # more text keeps the mix ~50/25/25
    ("/opt/venv/lib/python3.12/site-packages/numpy/**/*.py", 1 << 20),
]
# stride schedule: which category feeds each successive 1 MiB stride
_SCHEDULE = [0, 1, 2, 4, 0, 5, 3, 4, 1, 0, 2, 4]


def _category_stream(pattern: str, cap: int):
    """Yield capped file contents in sorted-path order, looping forever."""
    paths = sorted(p for p in glob.glob(pattern, recursive=True)
                   if os.path.isfile(p) and not os.path.islink(p))
    if not paths:
        raise RuntimeError(f"real_corpus: no files match {pattern}")
    while True:
        for p in paths:
            try:
                with open(p, "rb") as f:
                    yield f.read(cap)
            except OSError:
                continue


def make_real_corpus(n: int) -> bytes:
    """Deterministic n-byte mix; prefix-stable across n."""
    streams = [_category_stream(pat, cap) for pat, cap in _CATS]
    bufs = [bytearray() for _ in _CATS]
    out = bytearray()
    si = 0
    while len(out) < n:
        cat = _SCHEDULE[si % len(_SCHEDULE)]
        si += 1
        b = bufs[cat]
        while len(b) < _STRIDE:
            b += next(streams[cat])
        out += b[:_STRIDE]
        del b[:_STRIDE]
    return bytes(out[:n])


if __name__ == "__main__":
    import hashlib
    import sys

    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    data = make_real_corpus(mb << 20)
    print(f"real corpus {mb} MiB md5={hashlib.md5(data).hexdigest()}")
    if len(sys.argv) > 2:
        with open(sys.argv[2], "wb") as f:
            f.write(data)
