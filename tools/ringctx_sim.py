"""Measure RING-CONTEXT ORDER: what happens to the ratio when the context
rings are keyed by a richer bytes-only context than orz's order-1 hash.

OTZ1 inserts every position, so its reduced offsets are ~2.5x orz's (~1.6
raw bits/match).  Instead of making insertion sparser (item-start rings
need a sequential fixed point; content anchors measured badly), make the
ring KEY finer: rank density per ring divides by the context branching
factor.  The decoder keys rings by the same bytes-only context — fully
parallel, no parse circularity.  The cost: a match must share the ring
context exactly (candidates with a different preceding context are lost).

Context family: cctx2 = (prev1 & 0x7F) | alnum(prev2) << 7 | extra bits of
prev2 above that (0 extra = today's order-1; 7 extra = full order-2).

    python tools/ringctx_sim.py [kb] [depth] [extra_bits ...]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import make_corpus
import orz_tpu.device.refcodec as rc
from orz_tpu.device.spec import (
    LAZY_LEN_CAP,
    LZ_MATCH_MIN_LEN,
    LZ_MATCH_MAX_LEN,
    PAD_FRONT,
    RING,
    ROBITS_CHEAP,
    ROID_ENC,
    WORD_TABLE_SIZE,
    cctx_all,
    h2_all,
    min_match_len_for_ro,
)
from orz_tpu.golden.bitio import BitEncoder

_ALNUM = np.zeros(256, dtype=np.int64)
for _b in range(256):
    _ALNUM[_b] = int(chr(_b).isascii() and chr(_b).isalnum())


def ring_ctx_all(buf: np.ndarray, extra_bits: int) -> np.ndarray:
    b = buf.astype(np.int64)
    prev1 = np.roll(b, 1); prev1[0] = 0
    prev2 = np.roll(b, 2); prev2[:2] = 0
    base = (prev1 & 0x7F) | (_ALNUM[prev2] << 7)
    if extra_bits:
        base = base | ((prev2 & ((1 << extra_bits) - 1)) << 8)
    return base


def encode_ringctx(data: bytes, depth: int, extra_bits: int,
                   fence: int = 4096) -> bytes:
    """Sequential OTZ encode with every-position rings keyed by the
    extra_bits-extended context (sizes only; decoder variant not built)."""
    rc.FENCE = fence
    buf = rc.pad_segment(data)
    n_ctx = 1 << (8 + extra_bits)
    end = PAD_FRONT + len(data)
    rctx = ring_ctx_all(buf, extra_bits)
    cctx = cctx_all(buf)
    h2 = h2_all(buf)
    # candidate grouping: ring context + dword hash (content filtered by lcp)
    dw = (buf.astype(np.uint64)
          | np.roll(buf, -1).astype(np.uint64) << 8
          | np.roll(buf, -2).astype(np.uint64) << 16
          | np.roll(buf, -3).astype(np.uint64) << 24)
    h = ((dw * np.uint64(2654435761)) >> np.uint64(8)).astype(np.int64) & 0x7FFFFF
    mkey2 = (rctx << 23) | h

    words = np.zeros(WORD_TABLE_SIZE, dtype=np.int64)
    pred = np.zeros(len(buf), dtype=np.int64)
    chains: dict = {}
    rank_of = np.zeros(len(buf), dtype=np.int64)
    ctx_count = np.zeros(n_ctx, dtype=np.int64)

    def find_best(p, cap):
        chain = chains.get(mkey2[p])
        if not chain:
            return 0, 0, -1
        my_rank = ctx_count[rctx[p]]
        best16, bro, blen, bq = 0, -1, 0, -1
        for q in chain[-1 : -depth - 1 : -1]:
            ro = my_rank - 1 - rank_of[q]
            if ro >= RING:
                break
            l16 = min(rc._lcp(buf, q, p, 16), cap)
            if l16 < min_match_len_for_ro(ro):
                continue
            if l16 > best16:
                best16, bro, bq = l16, ro, q
                blen = min(rc._lcp(buf, q, p, LZ_MATCH_MAX_LEN), cap) \
                    if l16 >= 16 else l16
        if bq < 0 or blen < LZ_MATCH_MIN_LEN:
            return 0, 0, -1
        return blen, bro, bq

    starts, kinds, lengths, qs, ros = [], [], [], [], []
    p = PAD_FRONT
    done_word = PAD_FRONT
    while p < end:
        while done_word <= p - 3:
            u = done_word
            words[h2[u]] = int(buf[u + 1]) | int(buf[u + 2]) << 8
            done_word += 1
        pred[p] = words[h2[p - 1]]
        wordmatch = (int(buf[p]) | int(buf[p + 1]) << 8) == pred[p]
        cap = min(fence - ((p - PAD_FRONT) % fence), end - p)
        blen, ro, q = find_best(p, cap)
        is_m = blen >= LZ_MATCH_MIN_LEN
        lazy1 = False
        if is_m and blen < LAZY_LEN_CAP:
            robitlen = int(ROID_ENC[ro, 1])
            lazy_len1 = blen + 1 + (1 if robitlen < ROBITS_CHEAP else 0)
            l1, _, _ = find_best(p + 1, min(fence - ((p + 1 - PAD_FRONT) % fence), end - p - 1)) if p + 1 < end else (0, 0, -1)
            l2, _, _ = find_best(p + 2, min(fence - ((p + 2 - PAD_FRONT) % fence), end - p - 2)) if p + 2 < end else (0, 0, -1)
            lazy1 = l1 >= lazy_len1
            lazy2 = l2 >= lazy_len1 - int(wordmatch)
            if lazy1 or lazy2:
                is_m = False
        if is_m:
            starts.append(p); kinds.append(2); lengths.append(blen)
            qs.append(q); ros.append(ro)
            adv = blen
        elif wordmatch and not lazy1 and p + 2 <= end \
                and fence - ((p - PAD_FRONT) % fence) >= 2:
            starts.append(p); kinds.append(1); lengths.append(2)
            qs.append(0); ros.append(0)
            adv = 2
        else:
            starts.append(p); kinds.append(0); lengths.append(1)
            qs.append(0); ros.append(0)
            adv = 1
        # every position in [p, p+adv) enters its ring (bytes-only OTZ1 rule)
        for u in range(p, p + adv):
            c = rctx[u]
            rank_of[u] = ctx_count[c]
            ctx_count[c] += 1
            chains.setdefault(mkey2[u], []).append(u)
        p += adv

    start = np.asarray(starts, dtype=np.int64)
    kind = np.asarray(kinds, dtype=np.int64)
    length = np.asarray(lengths, dtype=np.int64)
    q_arr = np.asarray(qs, dtype=np.int64)
    ro_arr = np.asarray(ros, dtype=np.int64)
    _, _, rep0 = rc._rep0_flags(start, kind, q_arr)
    items = rc._emit_items(cctx, pred, buf, len(data), start, kind, length,
                           q_arr, ro_arr, rep0)
    enc = BitEncoder()
    enc.encode_varint(len(data))
    enc.encode_varint(rc.CHUNK_INPUT_DEFAULT)
    return rc._finish_segment_stream(enc, items, len(data),
                                     rc.CHUNK_INPUT_DEFAULT, 0)


def main():
    kb = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    depth = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    extras = [int(v) for v in sys.argv[3:]] or [0, 2, 4, 7]
    data = make_corpus(kb * 1024)
    n = len(data)
    print("refs: orz=73376 (27.99%); seq2 item-start F4096 = 73536 (100.22%)")
    for eb in extras:
        t0 = time.time()
        s = encode_ringctx(data, depth, eb)
        print(f"ringctx extra_bits={eb}: {len(s)} B ({len(s)/n*100:.2f}%) "
              f"vs orz {len(s)/73376*100:.2f}% [{time.time()-t0:.0f}s]",
              flush=True)


if __name__ == "__main__":
    main()
