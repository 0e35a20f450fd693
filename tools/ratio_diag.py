"""Bit-budget diagnostics for the OTZ encoder (dev tool).

Runs the jnp pipeline on a corpus (CPU ok), breaks the output stream into
bit categories, and prints item/match statistics — the data for ratio
tuning decisions.

    python tools/ratio_diag.py [mb] [level] [depth_override]
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import make_corpus
from orz_tpu.device.pipeline import _bucket_capacity, encode_front_jit, encode_back_jit
from orz_tpu.device.spec import (
    CHUNK_INPUT_DEFAULT,
    PAD_FRONT,
    PAD_TAIL,
    ROID_ENC,
    candidate_depth,
    n_chunks_for,
)
from orz_tpu.ops.symrank_pallas import RB_BLK
from orz_tpu.ops.symrank import transform


def main():
    mb = float(sys.argv[1]) if len(sys.argv) > 1 else 2
    level = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    depth = int(sys.argv[3]) if len(sys.argv) > 3 else candidate_depth(level)

    data = make_corpus(int(mb * (1 << 20)))
    cap = _bucket_capacity(len(data))
    buf = np.zeros(PAD_FRONT + cap + PAD_TAIL, np.uint8)
    buf[PAD_FRONT : PAD_FRONT + len(data)] = np.frombuffer(data, np.uint8)
    items, rounds = encode_front_jit(jnp.asarray(buf), jnp.int32(len(data)), depth)
    ni = int(items.n_items)

    kind = np.asarray(items.kind)[:ni]
    length = np.asarray(items.length)[:ni]
    robitlen = np.asarray(items.robitlen)[:ni]
    eml = np.asarray(items.eml)[:ni]
    sym = np.asarray(items.symbol)[:ni]
    al = np.asarray(items.after_literal)[:ni]

    n_lit = int((kind == 0).sum())
    n_word = int((kind == 1).sum())
    n_match = int((kind == 2).sum())
    mlen = length[kind == 2]
    ro_sym = sym[kind == 2] - 256
    roid = ro_sym // 6

    coded = np.asarray(
        transform(items.symbol, items.sr_unlikely, items.sr_ctx, items.n_items,
                  jnp.asarray(np.argsort(-np.maximum(
                      np.bincount(sym, minlength=425), 1), kind="stable").astype(np.int32)))
    )[:ni]

    # entropy estimate per table (ideal bits, ignoring 15-bit cap)
    def H_bits(vals, space):
        c = np.bincount(vals, minlength=space).astype(np.float64)
        p = c[c > 0] / c.sum()
        return float(-(np.log2(p) * (c[c > 0]))).real if False else float(
            -(c[c > 0] * np.log2(p)).sum()
        )

    bitsA = H_bits(coded[al == 1], 425)
    bitsB = H_bits(coded[al == 0], 425)
    bits_ro = int(robitlen[kind == 2].sum())
    ext = eml[(kind == 2) & (eml >= 5)]
    bitsC = H_bits(ext, 240) if len(ext) else 0.0

    total_est = bitsA + bitsB + bits_ro + bitsC
    print(f"input {len(data)} bytes, depth={depth}  items={ni} "
          f"(lit {n_lit}, word {n_word}, match {n_match})")
    if n_match:
        print(f"match len: mean {mlen.mean():.1f} p50 {np.median(mlen):.0f} "
              f"max {mlen.max()}  coverage {mlen.sum()/len(data)*100:.1f}%")
        print(f"roid histogram (id: count):",
              {int(k): int(v) for k, v in zip(*np.unique(roid, return_counts=True))})
    print(f"bits: symA {bitsA/8:.0f}B symB {bitsB/8:.0f}B robits {bits_ro/8:.0f}B "
          f"extC {bitsC/8:.0f}B  -> est total {total_est/8:.0f}B "
          f"({total_est/8/len(data)*100:.2f}%)")
    print(f"word-hit rate among literal positions: "
          f"{n_word/(n_word+n_lit)*100:.1f}% (2-byte words)")


if __name__ == "__main__":
    main()
