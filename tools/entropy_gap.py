"""Measure the entropy left on the table by static Huffman coding.

Runs the device parse + symrank transform on a corpus, then compares, per
entropy chunk and table (A/B: symrank symbols, C: length extension):

  huff  = canonical-Huffman bits (package-merge, 15-bit cap) + table ser.
  rans  = sum(-log2(qfreq/2^SCALE)) with frequencies quantized to SCALE
          bits + a freq-table serialization estimate
  H     = exact Shannon entropy (lower bound, no table cost)

    python tools/entropy_gap.py [MiB] [level] [otz2 0|1] [scale_bits]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

from bench import bench_corpus
from orz_tpu.device import pipeline as pipe
from orz_tpu.device.spec import (CHUNK_INPUT_DEFAULT, LZ_LENID_SIZE, PAD_FRONT,
                                 SYMRANK_NUM_SYMBOLS, TABC_SIZE)
from orz_tpu.golden.bitio import BitEncoder
from orz_tpu.ops.huffman import pm_code_lens


def quantize_freqs(counts: np.ndarray, scale_bits: int) -> np.ndarray:
    """Classic rANS frequency normalization to sum 2^scale_bits, every
    nonzero count keeps freq >= 1."""
    total = counts.sum()
    target = 1 << scale_bits
    if total == 0:
        return np.zeros_like(counts)
    q = np.maximum((counts.astype(np.float64) * target / total).astype(np.int64),
                   (counts > 0).astype(np.int64))
    # fix the sum by walking the largest entries
    diff = int(q.sum()) - target
    order = np.argsort(-q)
    i = 0
    while diff != 0:
        s = order[i % len(order)]
        if diff > 0 and q[s] > 1:
            q[s] -= 1
            diff -= 1
        elif diff < 0 and counts[s] > 0:
            q[s] += 1
            diff += 1
        i += 1
    return q


def table_bits(counts, scale_bits):
    """Estimated freq-table cost: 4-bit bucket of bitlen + raw bits per
    symbol, like a gamma code (conservative upper estimate)."""
    bits = 0
    for f in counts:
        f = int(f)
        bits += 4 + (0 if f == 0 else max(f.bit_length() - 1, 0))
    return bits


def stream_stats(counts, scale_bits, name):
    counts = counts.astype(np.int64)
    n = counts.sum()
    if n == 0:
        return 0.0, 0.0, 0.0
    lens = np.asarray(pm_code_lens(counts))
    huff = float((counts * lens).sum())
    enc = BitEncoder()
    enc.encode_huffman_table([int(v) for v in lens])
    huff += len(enc.finish()) * 8
    q = quantize_freqs(counts, scale_bits)
    p = q / float(1 << scale_bits)
    rans = float(-(counts[q > 0] * np.log2(p[q > 0])).sum())
    rans += table_bits(q, scale_bits)
    pr = counts / n
    H = float(-(counts[counts > 0] * np.log2(pr[counts > 0])).sum())
    print(f"  {name}: n={n:8d} huff={huff/8:10.0f}B rans={rans/8:10.0f}B "
          f"H={H/8:10.0f}B  rans saves {(huff-rans)/8:8.0f}B "
          f"({(huff-rans)/huff*100:5.2f}%)")
    return huff, rans, H


def main():
    mb = float(sys.argv[1]) if len(sys.argv) > 1 else 1
    level = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    otz2 = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    scale_bits = int(sys.argv[4]) if len(sys.argv) > 4 else 14
    data, corpus_name = bench_corpus(int(mb * (1 << 20)))
    print(f"corpus: {corpus_name}")

    front = pipe.dispatch_segment_front(data, level, CHUNK_INPUT_DEFAULT)
    mid = (pipe.dispatch_segment_mid2(front) if otz2
           else pipe.dispatch_segment_mid(front))
    items = mid["items"]

    from orz_tpu.ops.symrank import transform as symrank_transform

    m = items.start.shape[0]
    valid = np.arange(m) < int(items.n_items)
    chunk_id = np.clip((np.asarray(items.start) - PAD_FRONT) //
                       CHUNK_INPUT_DEFAULT, 0, 1 << 20)

    import jax.numpy as jnp

    cens_idx = np.where(valid & (chunk_id == 0), np.asarray(items.symbol),
                        SYMRANK_NUM_SYMBOLS)
    counts = np.bincount(cens_idx, minlength=SYMRANK_NUM_SYMBOLS + 1)[
        :SYMRANK_NUM_SYMBOLS]
    order = np.lexsort((np.arange(SYMRANK_NUM_SYMBOLS),
                        -np.maximum(counts, 1)))
    coded = np.asarray(symrank_transform(
        items.symbol, items.sr_unlikely, items.sr_ctx, items.n_items,
        jnp.asarray(order, jnp.int32)))

    al = np.asarray(items.after_literal)
    kind = np.asarray(items.kind)
    eml = np.asarray(items.eml)
    robitlen = np.asarray(items.robitlen)

    tot = {"huff": 0.0, "rans": 0.0, "H": 0.0}
    raw_bits = float(robitlen[valid & (kind == 2)].sum())
    n_chunks = int(chunk_id[valid].max()) + 1
    print(f"entropy gap: {mb} MiB level={level} otz2={otz2} "
          f"scale={scale_bits} chunks={n_chunks} "
          f"items={int(items.n_items)} rawbits={raw_bits/8:.0f}B")
    for k in range(n_chunks):
        sel = valid & (chunk_id == k)
        print(f" chunk {k}:")
        wA = np.bincount(coded[sel & (al == 1)], minlength=SYMRANK_NUM_SYMBOLS)
        wB = np.bincount(coded[sel & (al == 0)], minlength=SYMRANK_NUM_SYMBOLS)
        wC = np.bincount(eml[sel & (kind == 2) & (eml >= LZ_LENID_SIZE - 1)],
                         minlength=TABC_SIZE)[:TABC_SIZE]
        for name, w in (("A", wA), ("B", wB), ("C", wC)):
            h, r, H = stream_stats(w, scale_bits, name)
            tot["huff"] += h
            tot["rans"] += r
            tot["H"] += H
    huff_total = tot["huff"] + raw_bits
    rans_total = tot["rans"] + raw_bits
    print(f"TOTAL (incl raw offset bits): huff={huff_total/8:.0f}B "
          f"rans={rans_total/8:.0f}B  saves {(huff_total-rans_total)/8:.0f}B "
          f"= {(huff_total-rans_total)/huff_total*100:.2f}% of payload")

    # conditional-entropy probe: how much would splitting table A/B by a
    # coarse byte-context class gain (ignoring table overhead)?
    sr_ctx = np.asarray(items.sr_ctx)
    for nclass in (4, 16, 64):
        cls = (sr_ctx & 0xFF) % nclass
        H_split = 0.0
        n_tot = 0
        for al_v in (0, 1):
            for c in range(nclass):
                sel = valid & (al == al_v) & (cls == c)
                w = np.bincount(coded[sel], minlength=SYMRANK_NUM_SYMBOLS)
                nn = w.sum()
                if nn == 0:
                    continue
                p = w[w > 0] / nn
                H_split += float(-(w[w > 0] * np.log2(p)).sum())
                n_tot += nn
        # baseline: unsplit A/B entropy
        H_base = 0.0
        for al_v in (0, 1):
            sel = valid & (al == al_v)
            w = np.bincount(coded[sel], minlength=SYMRANK_NUM_SYMBOLS)
            nn = w.sum()
            if nn:
                p = w[w > 0] / nn
                H_base += float(-(w[w > 0] * np.log2(p)).sum())
        tables = 2 * nclass * 450  # ~450 bits per serialized table, rough
        print(f"ctx-split x{nclass}: H {H_base/8:.0f} -> {H_split/8:.0f} B "
              f"(saves {(H_base-H_split)/8:.0f} B, tables ~{tables/8:.0f} B)")


if __name__ == "__main__":
    main()
