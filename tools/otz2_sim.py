"""Sequential simulation of the OTZ2 format (item-start rings) to measure
its compression ratio against orz and OTZ1 on the same data.

This is the go/no-go measurement for docs/OTZ2_DESIGN.md: it constructs the
fixed-point parse directly (sequentially, like the eventual decoder) and
estimates the coded size with the real symrank transform + entropy
accounting.

    python tools/otz2_sim.py [kb] [depth]
"""

import sys

import numpy as np

sys.path.insert(0, ".")
from bench import make_corpus
from orz_tpu.device.refcodec import pad_segment
from orz_tpu.device.spec import (
    LAZY_LEN_CAP,
    LZ_LENID_SIZE,
    LZ_MATCH_MAX_LEN,
    LZ_MATCH_MIN_LEN,
    PAD_FRONT,
    REP0_BASE,
    RING,
    ROBITS_CHEAP,
    ROID_ENC,
    SYMRANK_NUM_SYMBOLS,
    WORD_SYMBOL,
    WORD_TABLE_SIZE,
    cctx_all,
    h2_all,
    match_key_all,
)
from orz_tpu.golden.symrank import SymRankState


def lcp(buf, q, p, cap):
    a = buf[q : q + cap]
    b = buf[p : p + cap]
    neq = a != b
    i = int(np.argmax(neq))
    return cap if not neq[i] else i


class Otz2Sim:
    """Item-start rings; candidates via (mkey) chains over item starts."""

    def __init__(self, buf, seg_len, depth):
        self.buf = buf
        self.end = PAD_FRONT + seg_len
        self.depth = depth
        self.cctx = cctx_all(buf)
        self.h2 = h2_all(buf)
        self.mkey = match_key_all(buf)
        self.chains = {}  # mkey -> list of item-start positions
        self.item_rank = np.zeros(256, dtype=np.int64)  # per-ctx item count
        self.rank_of = {}  # item start -> its in-context rank
        # bytes-only word model, precomputed for all positions
        self.pred = np.zeros(len(buf), dtype=np.int64)
        words = np.zeros(WORD_TABLE_SIZE, dtype=np.int64)
        for p in range(PAD_FRONT, self.end):
            u = p - 3
            if u >= PAD_FRONT:
                words[self.h2[u]] = int(buf[u + 1]) | int(buf[u + 2]) << 8

            self.pred[p] = words[self.h2[p - 1]]

    def find_best(self, p):
        """(len, ro, q) of the best item-start candidate, or (0, 0, -1)."""
        chain = self.chains.get(self.mkey[p])
        if not chain:
            return 0, 0, -1
        best16, bro, blen, bq = 0, -1, 0, -1
        my_rank = self.item_rank[self.cctx[p]]
        for q in chain[-1 : -self.depth - 1 : -1]:
            ro = my_rank - 1 - self.rank_of[q]
            if ro >= RING:
                continue
            l16 = lcp(self.buf, q, p, 16)
            if l16 < LZ_MATCH_MIN_LEN:
                continue
            if l16 > best16:
                best16, bro, bq = l16, ro, q
                blen = lcp(self.buf, q, p, LZ_MATCH_MAX_LEN) if l16 >= 16 else l16
        if bq < 0:
            return 0, 0, -1
        blen = min(blen, self.end - p)
        if blen < LZ_MATCH_MIN_LEN:
            return 0, 0, -1
        return blen, bro, bq

    def insert(self, p):
        c = self.cctx[p]
        self.rank_of[p] = self.item_rank[c]
        self.item_rank[c] += 1
        self.chains.setdefault(self.mkey[p], []).append(p)

    def parse(self):
        items = []  # (p, kind, length, symbol-ish fields)
        p = PAD_FRONT
        last_dist = 0
        after_literal = True
        while p < self.end:
            blen, ro, q = self.find_best(p)
            wordmatch = (
                int(self.buf[p]) | int(self.buf[p + 1]) << 8
            ) == self.pred[p]
            is_m = blen >= LZ_MATCH_MIN_LEN
            lazy1 = False
            if is_m and blen < LAZY_LEN_CAP:
                robitlen = int(ROID_ENC[ro, 1])
                lazy_len1 = blen + 1 + (1 if robitlen < ROBITS_CHEAP else 0)
                l1, _, _ = self.find_best(p + 1) if p + 1 < self.end else (0, 0, -1)
                l2, _, _ = self.find_best(p + 2) if p + 2 < self.end else (0, 0, -1)
                lazy1 = l1 >= lazy_len1
                lazy2 = l2 >= lazy_len1 - int(wordmatch)
                if lazy1 or lazy2:
                    is_m = False
            if is_m:
                dist = p - q
                rep0 = dist == last_dist and last_dist > 0
                eml = blen - LZ_MATCH_MIN_LEN
                lenid = min(eml, LZ_LENID_SIZE - 1)
                roid, robitlen = int(ROID_ENC[ro, 0]), int(ROID_ENC[ro, 1])
                sym = REP0_BASE + lenid if rep0 else 256 + roid * LZ_LENID_SIZE + lenid
                items.append((p, 2, blen, sym, 0 if rep0 else robitlen, eml,
                              int(after_literal)))
                last_dist = dist
                self.insert(p)
                p += blen
                after_literal = False
            elif wordmatch and not lazy1 and p + 2 <= self.end:
                items.append((p, 1, 2, WORD_SYMBOL, 0, 0, int(after_literal)))
                self.insert(p)
                p += 2
                after_literal = False
            else:
                items.append((p, 0, 1, int(self.buf[p]), 0, 0, int(after_literal)))
                self.insert(p)
                p += 1
                after_literal = True
        return items


def estimate_bits(items, buf, pred, cctx):
    """symrank + entropy estimate (same accounting as tools/ratio_diag)."""
    syms = np.array([it[3] for it in items])
    counts = np.bincount(syms, minlength=SYMRANK_NUM_SYMBOLS)
    order = sorted(range(SYMRANK_NUM_SYMBOLS), key=lambda s: -max(int(counts[s]), 1))
    sr = SymRankState(n_symbols=SYMRANK_NUM_SYMBOLS)
    sr.init_all(np.asarray(order, dtype=np.int64))
    coded = np.empty(len(items), dtype=np.int64)
    al = np.empty(len(items), dtype=np.int64)
    for i, (p, kind, length, sym, robitlen, eml, a) in enumerate(items):
        ctx = int(cctx[p]) | (a << 8)
        coded[i] = sr.encode(ctx, sym, int(pred[p]) & 0xFF)
        al[i] = a

    def H(vals, space):
        c = np.bincount(vals, minlength=space).astype(np.float64)
        nz = c[c > 0]
        pr = nz / nz.sum()
        return float(-(nz * np.log2(pr)).sum())

    bits = H(coded[al == 1], SYMRANK_NUM_SYMBOLS) + H(coded[al == 0], SYMRANK_NUM_SYMBOLS)
    robits = sum(it[4] for it in items)
    ext = [it[5] for it in items if it[1] == 2 and it[5] >= LZ_LENID_SIZE - 1]
    bits_ext = H(np.array(ext), LZ_MATCH_MAX_LEN) if ext else 0.0
    return bits + robits + bits_ext, robits


def main():
    kb = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    depth = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    data = make_corpus(kb * 1024)
    buf = pad_segment(data)
    sim = Otz2Sim(buf, len(data), depth)
    items = sim.parse()
    kinds = np.array([it[1] for it in items])
    total, robits = estimate_bits(items, buf, sim.pred, sim.cctx)
    n_match = int((kinds == 2).sum())
    print(f"otz2 sim: {len(items)} items, {n_match} matches; "
          f"est {total/8:.0f} B ({total/8/len(data)*100:.2f}%), "
          f"robits {robits/8:.0f} B ({robits/max(n_match,1):.2f} bits/match)")


if __name__ == "__main__":
    main()
