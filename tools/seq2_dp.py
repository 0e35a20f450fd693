"""Price-based (optimal-parse) OTZ2 oracle — measures the DP-parse ratio
lever before any device work.

Replaces the greedy-lazy parse walk inside the OTZ2 fixed point
(refcodec.encode_segment_ref) with a per-fence-block backward Viterbi over
empirical item prices:

  cost[p] = min( lit_price[buf[p]]        + cost[p+1],
                 word_price               + cost[p+2]        (if wordmatch),
                 match_price[roid] + robits + ext + cost[p+blen] )

Prices come from the previous iteration's walk (censused, entropy bits);
iteration 1 uses flat priors.  Candidates/masks/emission reuse the
refcodec machinery unchanged, so the output stream is format-identical
(rings_mode=1, words_mode=1) and decode-verified.

    python tools/seq2_dp.py [MiB] [iters] [depth] [trunc 0|1]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import bench_corpus
from orz_tpu.cfg import cfg_from_level
from orz_tpu.container import encode_bytes
from orz_tpu.device import refcodec as rc
from orz_tpu.device.spec import (CHUNK_INPUT_DEFAULT, FENCE, PAD_FRONT,
                                 ROID_ENC)
from orz_tpu.golden.bitio import BitEncoder
from orz_tpu.native import NativeBackend

MML = 4  # LZ_MATCH_MIN_LEN


def prices_from_items(buf, items):
    """EXACT mean bits per item category, measured on a full emission of
    the previous walk (symrank + package-merge, as the real stream): the
    symrank transform makes hot symbols far cheaper than census entropy,
    so prices must come from coded bits, not counts."""
    from orz_tpu.device.spec import (LZ_LENID_SIZE, SYMRANK_NUM_SYMBOLS,
                                     TABC_SIZE)
    from orz_tpu.ops.huffman import pm_code_lens

    ni = len(items.start)
    chunk0 = items.symbol  # single-chunk price model is fine for pricing
    num_counted, counted, init_perm = rc.census_ref(chunk0)
    coded = rc.symrank_ref(items, init_perm)
    al = items.after_literal
    kind = items.kind
    eml = items.eml
    wA = np.bincount(coded[al == 1], minlength=SYMRANK_NUM_SYMBOLS)
    wB = np.bincount(coded[al == 0], minlength=SYMRANK_NUM_SYMBOLS)
    has_ext = (kind == 2) & (eml >= LZ_LENID_SIZE - 1)
    wC = np.bincount(eml[has_ext], minlength=TABC_SIZE)[:TABC_SIZE]
    lensA = np.asarray(pm_code_lens(wA))
    lensB = np.asarray(pm_code_lens(wB))
    lensC = np.asarray(pm_code_lens(wC))
    sym_bits = np.where(al == 1, lensA[coded], lensB[coded]).astype(np.float64)
    bits = sym_bits + items.robitlen
    bits[has_ext] += lensC[eml[has_ext]]

    def mean_by(keys, sel, size, default):
        s = np.bincount(keys[sel], weights=bits[sel], minlength=size)
        c = np.bincount(keys[sel], minlength=size)
        return np.where(c > 0, s / np.maximum(c, 1), default)

    b_at = buf[items.start].astype(np.int64)
    lit_price = mean_by(b_at, kind == 0, 256, 6.0)
    wsel = kind == 1
    word_price = float(bits[wsel].mean()) if wsel.any() else 5.5
    msel = kind == 2
    roid = ROID_ENC[np.clip(items.ro_for_price, 0, len(ROID_ENC) - 1), 0] \
        if hasattr(items, "ro_for_price") else None
    # reconstruct roid from the emitted symbol: match symbols are
    # 256 + roid*LENID + lenid (non-rep0); rep0 handled as near-free
    roid_of = np.where((items.symbol >= 256) & (items.symbol < 424),
                       (items.symbol - 256) // LZ_LENID_SIZE, 0)
    # price matches by roid: mean TOTAL bits (symbol+robits+ext) per roid
    msym = mean_by(roid_of, msel, 28, 9.0)
    return lit_price, word_price, msym, 0.0


def flat_prices():
    return (np.full(256, 6.0), 5.5, np.full(28, 7.0), 2.0)


def dp_walk(an, buf, seg_len, prices, trunc=False):
    """Backward Viterbi per fence block, vectorized across blocks."""
    lit_price, word_price, match_sym, ext_price = prices
    end = PAD_FRONT + seg_len
    n_blocks = -(-seg_len // FENCE)
    W = FENCE
    INF = 1e18

    # per-position edge data, padded to blocks x W
    npos = n_blocks * W
    pad = npos - seg_len
    b = np.pad(buf[PAD_FRONT:end].astype(np.int64), (0, pad))
    blen = np.pad(an.bestlen[PAD_FRONT:end], (0, pad)).astype(np.int64)
    bro = np.pad(an.bestro[PAD_FRONT:end], (0, pad)).astype(np.int64)
    wm = np.pad(an.wordmatch[PAD_FRONT:end], (0, pad))
    # no item crosses a fence (analyze caps lengths); word items need room 2
    roid = ROID_ENC[np.clip(bro, 0, len(ROID_ENC) - 1), 0]
    # match_sym is the mean TOTAL match cost per roid (symbol + raw offset
    # bits + extension), measured on real coded streams; ext_price unused
    m_price = match_sym[roid] + ext_price
    l_price = lit_price[b]

    bgrid = lambda a: a.reshape(n_blocks, W)
    Bb, Bl, Bro = bgrid(b), bgrid(blen), bgrid(bro)
    Bwm, Bmp, Blp = bgrid(wm), bgrid(m_price), bgrid(l_price)

    # cost[k, j] for j in 0..W (cost at block offset j; cost[W] = 0 boundary)
    cost = np.full((n_blocks, W + 1 + 256), 0.0)
    choice = np.zeros((n_blocks, W), dtype=np.int64)  # advance length
    is_word = np.zeros((n_blocks, W), dtype=bool)
    lane = np.arange(n_blocks)
    for j in range(W - 1, -1, -1):
        c_lit = Blp[:, j] + cost[:, j + 1]
        best = c_lit
        adv = np.ones(n_blocks, dtype=np.int64)
        word_ok = Bwm[:, j] & (j + 2 <= W)
        c_word = np.where(word_ok, word_price + cost[:, j + 2], INF)
        wsel = c_word < best
        best = np.where(wsel, c_word, best)
        adv = np.where(wsel, 2, adv)
        L = Bl[:, j]
        m_ok = L >= MML
        c_m = np.where(m_ok, Bmp[:, j] + cost[lane, j + L], INF)
        msel = c_m < best
        best = np.where(msel, c_m, best)
        adv = np.where(msel, L, adv)
        if trunc:
            # one truncation candidate: half length (>= MML)
            Lh = np.maximum(L // 2, MML)
            t_ok = m_ok & (Lh < L)
            c_t = np.where(t_ok, Bmp[:, j] + 1.0 + cost[lane, j + Lh], INF)
            tsel = c_t < best
            best = np.where(tsel, c_t, best)
            adv = np.where(tsel, Lh, adv)
        cost[:, j] = best
        choice[:, j] = adv
        is_word[:, j] = adv == 2  # only the word edge advances by 2 (MML=4)

    # forward replay of choices -> global item arrays
    starts, kinds, lengths = [], [], []
    for k in range(n_blocks):
        base = PAD_FRONT + k * W
        limit = min(W, seg_len - k * W)
        j = 0
        while j < limit:
            adv = int(choice[k, j])
            if adv > limit - j:
                adv = 1  # tail guard (padded region)
            if adv == 2 and is_word[k, j]:
                kind = 1
            elif adv >= MML:
                kind = 2
            else:
                kind = 0
                adv = 1
            starts.append(base + j)
            kinds.append(kind)
            lengths.append(adv)
            j += adv
    return (np.asarray(starts, np.int64), np.asarray(kinds, np.int64),
            np.asarray(lengths, np.int64))


def main():
    mb = float(sys.argv[1]) if len(sys.argv) > 1 else 2
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    depth = int(sys.argv[3]) if len(sys.argv) > 3 else 90
    trunc = bool(int(sys.argv[4])) if len(sys.argv) > 4 else False
    n = int(mb * (1 << 20))
    data, cname = bench_corpus(n)
    orz = len(encode_bytes(data, cfg_from_level(2), NativeBackend()))
    print(f"seq2-dp: {mb} MiB ({cname}), iters={iters} depth={depth} "
          f"trunc={trunc}, orz l2 = {orz}", flush=True)

    buf = rc.pad_segment(data)
    t0 = time.perf_counter()
    an = rc.analyze_ref(buf, n, rc.candidate_depth(2))
    walk = rc.parse_walk(an, buf, n)
    an2 = None
    for k in range(iters):
        mask = np.zeros(len(buf), dtype=bool)
        mask[walk[0]] = True
        an2 = rc.analyze_ref(buf, n, depth, start_mask=mask, words_mode=1)
        if k < iters - 1:
            pitems = rc.parse_ref(an2, buf, n, rings_mode=1, walk=walk,
                                  words_mode=1)
            prices = (prices_from_items(buf, pitems) if pitems is not None
                      else flat_prices())
            walk = dp_walk(an2, buf, n, prices, trunc=trunc)
            print(f"  iter {k}: {len(walk[0])} items "
                  f"[{time.perf_counter()-t0:.0f}s]", flush=True)
    items = rc.parse_ref(an2, buf, n, rings_mode=1, walk=walk, words_mode=1)
    if items is None:
        print("repair did not converge")
        return
    enc = BitEncoder()
    enc.encode_varint(n)
    enc.encode_varint(CHUNK_INPUT_DEFAULT)
    payload = rc._finish_segment_stream(enc, items, n, CHUNK_INPUT_DEFAULT,
                                        1, words_mode=1)
    ok = rc.decode_segment_ref(payload) == data
    print(f"  dp: {len(payload)} vs orz {orz} = "
          f"{len(payload)/orz*100:.2f}% roundtrip={'OK' if ok else 'FAIL'} "
          f"[{time.perf_counter()-t0:.0f}s]", flush=True)


if __name__ == "__main__":
    main()
