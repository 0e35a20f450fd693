"""Measure ANCHOR RINGS: content-defined sparse ring insertion (dev tool).

OTZ1 inserts every position into its context ring, ~2.5x denser than orz's
item-start rings, costing ~1.6 extra raw offset bits per match (the whole
measured ratio gap, STATUS.md).  OTZ2 (item-start rings) needs conform /
repair because the parse defines the ring — and the repair losses ate the
win.  Anchor rings take a third path: insert only positions satisfying a
BYTES-ONLY predicate (word boundaries / content hash sampling).  Identical
content produces identical anchors, so repeats have candidates exactly where
matches want to start (orz's self-consistency), with NO parse circularity:
the existing masked analyze (analyze_ref start_mask) is already decodable
as-is, no repair pass.

Search semantics match the sorted-space implementation: scan the last W
same-match-key positions; the anchors among them are the candidates.

    python tools/anchor_sim.py [kb] [level] [W ...]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import make_corpus
from orz_tpu.device.refcodec import (
    analyze_ref,
    census_ref,
    encode_segment_ref,
    pad_segment,
    parse_ref,
    symrank_ref,
    _encode_chunk_items,
)
from orz_tpu.device.spec import (
    CHUNK_INPUT_DEFAULT,
    PAD_FRONT,
    candidate_depth,
    cctx_all,
    n_chunks_for,
)
from orz_tpu.golden.bitio import BitEncoder


def _alnum(b):
    return ((b >= 48) & (b <= 57)) | (((b | 32) >= 97) & ((b | 32) <= 122))


def anchor_mask(buf: np.ndarray, kind: str) -> np.ndarray:
    """Bytes-only anchor predicate at q (uses bytes <= q-1 only, so the
    decoder can evaluate it for every q < cursor)."""
    b = buf.astype(np.uint32)
    prev1 = np.roll(b, 1)
    prev1[0] = 0
    bnd = ~_alnum(prev1)
    # FNV-ish hash of the 4 bytes ending at q-1
    h = np.zeros_like(b)
    for k in range(1, 5):
        h = h * np.uint32(16777619) + np.roll(b, k)
    if kind == "bnd":
        return np.asarray(bnd)
    if kind.startswith("hash"):
        mod = int(kind[4:])
        return (h * np.uint32(2654435761) >> 28) % np.uint32(mod) == 0
    if kind.startswith("mix"):  # boundary OR hash-sampled
        mod = int(kind[3:])
        return np.asarray(bnd) | (
            (h * np.uint32(2654435761) >> 28) % np.uint32(mod) == 0
        )
    raise ValueError(kind)


def encode_anchor(data: bytes, level: int, mask: np.ndarray, window: int,
                  chunk_input: int = CHUNK_INPUT_DEFAULT) -> bytes:
    """Full-fidelity OTZ encode with anchor rings (masked analyze, plain
    parse — decodable by construction, no repair)."""
    enc = BitEncoder()
    enc.encode_varint(len(data))
    enc.encode_varint(chunk_input)
    buf = pad_segment(data)
    an = analyze_ref(buf, len(data), window, start_mask=mask)
    items = parse_ref(an, buf, len(data))
    enc.encode_raw_bits(int(items.pred_len), 1)
    enc.encode_raw_bits(0, 1)  # header bit layout kept; size effect ~0
    n_chunks = n_chunks_for(len(data), chunk_input)
    chunk_id = (items.start - PAD_FRONT) // chunk_input
    num_counted, counted, init_perm = census_ref(items.symbol[chunk_id == 0])
    enc.encode_varint(num_counted)
    for s in counted:
        enc.encode_raw_bits(int(s), 9)
    coded = symrank_ref(items, init_perm)
    for k in range(n_chunks):
        sel = chunk_id == k
        enc.encode_varint(int(sel.sum()))
        _encode_chunk_items(enc, items, coded, sel)
    return enc.finish()


def main():
    kb = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    level = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    windows = [int(w) for w in sys.argv[3:]] or [96]
    data = make_corpus(kb * 1024)
    buf = pad_segment(data)
    n = len(data)

    t0 = time.time()
    otz1 = len(encode_segment_ref(data, level=level, rings_mode=0))
    print(f"OTZ1 (every-position rings): {otz1} B "
          f"({otz1/n*100:.2f}%)  [{time.time()-t0:.0f}s]", flush=True)

    try:
        from orz_tpu.cfg import cfg_from_level
        from orz_tpu.container import encode_bytes
        from orz_tpu.native import NativeBackend
        orz = len(encode_bytes(data, cfg_from_level(level), NativeBackend()))
        print(f"orz -l{level} (native): {orz} B ({orz/n*100:.2f}%)", flush=True)
    except Exception as e:
        orz = None
        print(f"orz size unavailable: {e}")

    for pred in ["bnd", "hash3", "mix6"]:
        mask = anchor_mask(buf, pred)
        dens = mask[PAD_FRONT:PAD_FRONT + n].mean()
        for w in windows:
            t0 = time.time()
            size = len(encode_anchor(data, level, mask, w))
            rel = f" vs orz {size/orz*100:.2f}%" if orz else ""
            print(f"anchors[{pred}] density {dens:.2f} W={w}: {size} B "
                  f"({size/n*100:.2f}%){rel}  [{time.time()-t0:.0f}s]",
                  flush=True)


if __name__ == "__main__":
    main()
