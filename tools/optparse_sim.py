"""Optimal (price-based) parse over fence blocks — ratio prototype.

The parse fence means no item crosses a fence line, so in the shortest-path
formulation every path from position p exits its block through the block
boundary: cost(p) = local_cost(p) + cost(boundary).  Blocks are therefore
INDEPENDENT and the optimal parse vectorizes exactly like walk_items — a
per-block backward DP in lockstep (the device version), here sequential.

Prices come from a first pass (heuristic lazy parse -> real coded stream ->
per-symbol average bit costs), the standard two-pass approximation for
adaptive coders.  Measured against orz -l2 and the lazy parse on the same
OTZ1 analysis.

    python tools/optparse_sim.py [kb] [level]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import make_corpus
import orz_tpu.device.refcodec as rc
from orz_tpu.device.spec import (
    LZ_LENID_SIZE,
    LZ_MATCH_MIN_LEN,
    PAD_FRONT,
    REP0_BASE,
    ROID_ENC,
    SYMRANK_NUM_SYMBOLS,
    WORD_SYMBOL,
    candidate_depth,
)
from orz_tpu.golden.bitio import BitEncoder


def stream_prices(items, coded):
    """Per-symbol average coded bits from a real pass-1 stream (split by the
    after_literal table), plus extC extension prices."""
    bitsA = np.full(SYMRANK_NUM_SYMBOLS, 13.0)
    bitsB = np.full(SYMRANK_NUM_SYMBOLS, 13.0)
    for al, tab in ((1, bitsA), (0, bitsB)):
        sel = items.after_literal == al
        cs = coded[sel]
        if not len(cs):
            continue
        cnt = np.bincount(cs, minlength=SYMRANK_NUM_SYMBOLS).astype(np.float64)
        tot = cnt.sum()
        nz = cnt > 0
        ideal = -np.log2(cnt[nz] / tot)
        # map coded-rank prices back to SYMBOL space by average: a symbol's
        # price is the average coded length it actually got in pass 1
        sym_bits = np.zeros(SYMRANK_NUM_SYMBOLS)
        sym_cnt = np.zeros(SYMRANK_NUM_SYMBOLS)
        rank_price = np.full(SYMRANK_NUM_SYMBOLS, 13.0)
        rank_price[nz] = np.minimum(ideal, 15.0)
        for i in np.nonzero(sel)[0]:
            s = int(items.symbol[i])
            sym_bits[s] += rank_price[int(coded[i])]
            sym_cnt[s] += 1
        have = sym_cnt > 0
        tab[have] = sym_bits[have] / sym_cnt[have]
    ext = items.eml[(items.kind == 2) & (items.eml >= LZ_LENID_SIZE - 1)]
    if len(ext):
        cnt = np.bincount(ext, minlength=256).astype(np.float64)
        nz = cnt > 0
        extp = np.full(256, 10.0)
        extp[nz] = np.minimum(-np.log2(cnt[nz] / cnt.sum()), 15.0)
    else:
        extp = np.full(256, 10.0)
    return bitsA, bitsB, extp


def census_prices(items):
    """Cheap price model: ideal -log2 frequencies of the pass-1 item symbols
    split by after_literal (NO symrank pass).  Device-friendly: one scatter
    over the lazy items; tests whether the DP needs real coded-rank prices."""
    bitsA = np.full(SYMRANK_NUM_SYMBOLS, 13.0)
    bitsB = np.full(SYMRANK_NUM_SYMBOLS, 13.0)
    for al, tab in ((1, bitsA), (0, bitsB)):
        cs = items.symbol[items.after_literal == al]
        if not len(cs):
            continue
        cnt = np.bincount(cs, minlength=SYMRANK_NUM_SYMBOLS).astype(np.float64)
        nz = cnt > 0
        tab[nz] = np.minimum(-np.log2(cnt[nz] / cnt.sum()), 15.0)
    ext = items.eml[(items.kind == 2) & (items.eml >= LZ_LENID_SIZE - 1)]
    extp = np.full(256, 10.0)
    if len(ext):
        cnt = np.bincount(ext, minlength=256).astype(np.float64)
        nz = cnt > 0
        extp[nz] = np.minimum(-np.log2(cnt[nz] / cnt.sum()), 15.0)
    return bitsA, bitsB, extp


# Match-edge lengths the device DP considers (cost-array rows are read at
# scalar, lane-uniform offsets only): every length up to 16, then a coarse
# ladder.  A longer best-match is offered TRUNCATED to each ladder length
# below it — truncation is always legal, so the DP stays exact over a
# restricted edge set (the remainder is re-matched from the cut point).
TAPS_LONG = [20, 24, 28, 32, 40, 48, 64, 96, 128, 192, 240]


def optimal_parse(an, buf, seg_len, prices, fence, taps=False):
    """Backward DP per fence block; edges: literal, word, match (full
    length, or tap-truncated when taps=True — the device kernel's edge
    set).  Returns (start, kind, length) in stream order."""
    bitsA, bitsB, extp = prices
    end = PAD_FRONT + seg_len
    n = len(buf)
    # price arrays per position (after_literal unknown during DP: use the
    # cheaper of the two tables as the estimate)
    lit_p = np.minimum(bitsA[buf.astype(np.int64)],
                       bitsB[buf.astype(np.int64)] + 0.5)
    word_p = min(bitsA[WORD_SYMBOL], bitsB[WORD_SYMBOL])
    roid = ROID_ENC[np.minimum(an.bestro, len(ROID_ENC) - 1), 0]
    robl = ROID_ENC[np.minimum(an.bestro, len(ROID_ENC) - 1), 1]
    symAB = np.minimum(bitsA, bitsB)

    def mprice(p, t):
        """Price of the match at p truncated to t bytes."""
        e = t - LZ_MATCH_MIN_LEN
        li = min(e, LZ_LENID_SIZE - 1)
        s = 256 + int(roid[p]) * LZ_LENID_SIZE + li
        return symAB[s] + robl[p] + (extp[e] if e >= LZ_LENID_SIZE - 1 else 0.0)

    cost = np.zeros(n + 2, dtype=np.float64)
    choice = np.zeros(n, dtype=np.int64)  # 0 lit, 1 word, 2 match
    mlen = np.zeros(n, dtype=np.int64)  # chosen (possibly truncated) length
    # backward over positions; block independence means this could run per
    # block in lockstep on device — here just one backward sweep
    for p in range(end - 1, PAD_FRONT - 1, -1):
        c = lit_p[p] + cost[p + 1]
        ch = 0
        room = fence - ((p - PAD_FRONT) % fence)
        if an.wordmatch[p] and p + 2 <= end and room >= 2:
            cw = word_p + cost[p + 2]
            if cw < c:
                c, ch = cw, 1
        L = int(an.bestlen[p])
        if L >= LZ_MATCH_MIN_LEN:
            if taps:
                lens = range(LZ_MATCH_MIN_LEN, min(L, 16) + 1)
                lens = list(lens) + [t for t in TAPS_LONG if t <= L]
            else:
                lens = [L]
            for t in lens:
                cm = mprice(p, t) + cost[p + t]
                if cm < c:
                    c, ch = cm, 2
                    mlen[p] = t
        cost[p] = c
        choice[p] = ch

    starts, kinds, lengths = [], [], []
    p = PAD_FRONT
    while p < end:
        ch = choice[p]
        if ch == 2:
            L = int(mlen[p]) if taps else int(an.bestlen[p])
            starts.append(p); kinds.append(2); lengths.append(L)
            p += L
        elif ch == 1:
            starts.append(p); kinds.append(1); lengths.append(2)
            p += 2
        else:
            starts.append(p); kinds.append(0); lengths.append(1)
            p += 1
    return (np.asarray(starts, dtype=np.int64), np.asarray(kinds, dtype=np.int64),
            np.asarray(lengths, dtype=np.int64))


def encode_with_walk(an, buf, seg_len, walk, chunk_input=rc.CHUNK_INPUT_DEFAULT):
    items = rc.parse_ref(an, buf, seg_len, walk=walk)
    enc = BitEncoder()
    enc.encode_varint(seg_len)
    enc.encode_varint(chunk_input)
    return rc._finish_segment_stream(enc, items, seg_len, chunk_input, 0)


def main():
    kb = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    level = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    data = make_corpus(kb * 1024)
    n = len(data)
    rc.FENCE = 4096
    buf = rc.pad_segment(data)
    t0 = time.time()
    an = rc.analyze_ref(buf, n, candidate_depth(level))
    print(f"analysis [{time.time()-t0:.0f}s]", flush=True)

    # pass 1: heuristic lazy parse (today's device behavior at F4096)
    walk1 = rc.parse_walk(an, buf, n)
    s1 = encode_with_walk(an, buf, n, walk1)
    print(f"lazy parse:    {len(s1)} B ({len(s1)/n*100:.2f}%) "
          f"vs orz {len(s1)/73376*100:.2f}%", flush=True)

    items1 = rc.parse_ref(an, buf, n, walk=walk1)
    from orz_tpu.device.refcodec import census_ref, symrank_ref
    _, _, perm = census_ref(items1.symbol[
        (items1.start - PAD_FRONT) // rc.CHUNK_INPUT_DEFAULT == 0])
    coded1 = symrank_ref(items1, perm)
    prices = stream_prices(items1, coded1)

    t0 = time.time()
    walk2 = optimal_parse(an, buf, n, prices, rc.FENCE)
    s2 = encode_with_walk(an, buf, n, walk2)
    ok = rc.decode_segment_ref(s2) == data
    print(f"optimal parse: {len(s2)} B ({len(s2)/n*100:.2f}%) "
          f"vs orz {len(s2)/73376*100:.2f}% rt={ok} [{time.time()-t0:.0f}s]",
          flush=True)

    # second pricing iteration (prices from the optimal parse itself)
    items2 = rc.parse_ref(an, buf, n, walk=walk2)
    _, _, perm2 = census_ref(items2.symbol[
        (items2.start - PAD_FRONT) // rc.CHUNK_INPUT_DEFAULT == 0])
    coded2 = symrank_ref(items2, perm2)
    prices2 = stream_prices(items2, coded2)
    walk3 = optimal_parse(an, buf, n, prices2, rc.FENCE)
    s3 = encode_with_walk(an, buf, n, walk3)
    print(f"optimal x2:    {len(s3)} B ({len(s3)/n*100:.2f}%) "
          f"vs orz {len(s3)/73376*100:.2f}%", flush=True)

    # device edge set: taps-truncated matches (restricted but exact edges)
    walk4 = optimal_parse(an, buf, n, prices, rc.FENCE, taps=True)
    s4 = encode_with_walk(an, buf, n, walk4)
    ok4 = rc.decode_segment_ref(s4) == data
    print(f"optimal taps:  {len(s4)} B ({len(s4)/n*100:.2f}%) "
          f"vs orz {len(s4)/73376*100:.2f}% rt={ok4}", flush=True)
    walk5 = optimal_parse(an, buf, n, prices2, rc.FENCE, taps=True)
    s5 = encode_with_walk(an, buf, n, walk5)
    print(f"opt taps x2:   {len(s5)} B ({len(s5)/n*100:.2f}%) "
          f"vs orz {len(s5)/73376*100:.2f}%", flush=True)

    # census-only prices (no symrank pass needed): the device-cheap model
    walk6 = optimal_parse(an, buf, n, census_prices(items1), rc.FENCE,
                          taps=True)
    s6 = encode_with_walk(an, buf, n, walk6)
    print(f"census taps:   {len(s6)} B ({len(s6)/n*100:.2f}%) "
          f"vs orz {len(s6)/73376*100:.2f}%", flush=True)


if __name__ == "__main__":
    main()
