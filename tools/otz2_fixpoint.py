"""OTZ2 via iterated masked parse + host re-target repair (prototype).

Measured convergence of S_{k+1} = parse(analyze(start_mask=S_k)) from the
OTZ1 parse (256 KiB corpus): match-target violations fall ~2.3x per
iteration (2825 -> 296 at k=4 -> 7 at k=8).  Full demotion of the residue
(the old conform/repair) was measured catastrophic (109% of orz); instead
the host RE-TARGETS each violated match against the final start set's
mkey chains — a few hundred lcp probes — and only demotes matches with no
start candidate at all.  Emission recomputes exact start ranks, so the
stream is rings_mode=1-decodable regardless of what the search estimated.

    python tools/otz2_fixpoint.py [kb] [iters...]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import make_corpus
import orz_tpu.device.refcodec as rc
from orz_tpu.device.spec import (
    LZ_MATCH_MIN_LEN,
    LZ_MATCH_MAX_LEN,
    NEG_EML_DEPTH,
    PAD_FRONT,
    RING,
    match_key_all,
    min_match_len_for_ro,
)
from orz_tpu.golden.bitio import BitEncoder


def host_conform(buf, seg_len, cctx, start, kind, length, q_arr, window=96):
    """Make every non-rep0 match target a final item start with ro < RING:
    re-target violations against the final start set's mkey chains (adding
    literal-tail starts as needed), demote only when nothing matches.
    Returns (start, kind, length, q, ro_exact, rep0)."""
    mkey = match_key_all(buf)
    end = PAD_FRONT + seg_len
    fence = rc.FENCE

    for _ in range(64):
        _, _, rep0 = rc._rep0_flags(start, kind, q_arr)
        srank = rc._start_ranks(start, cctx)
        idx = np.searchsorted(start, q_arr)
        idxc = np.minimum(idx, max(len(start) - 1, 0))
        q_is_start = (kind == 2) & (len(start) > 0) & (start[idxc] == q_arr)
        ro = np.where(q_is_start, srank - srank[idxc] - 1, 0)
        viol = (kind == 2) & ~rep0 & (~q_is_start | (ro >= RING))
        viol_pred = np.zeros(len(start), dtype=bool)
        # length-prediction floor (parse_ref emission): matches below their
        # target's len_min are codeable via the NEGATIVE eml band down to
        # NEG_EML_DEPTH under it (spec.py); only deeper misses would force
        # prediction off for the whole segment — demote those (rare).
        len_min_arr = np.zeros(len(buf), dtype=np.int64)
        for i in range(len(start)):
            if kind[i] != 2 or viol[i]:
                continue
            q = int(q_arr[i])
            room = min(fence - ((int(start[i]) - PAD_FRONT) % fence),
                       int(end - start[i]))
            lm = min(max(len_min_arr[q], LZ_MATCH_MIN_LEN), room)
            L = int(length[i])
            if lm - L > NEG_EML_DEPTH:
                viol_pred[i] = True  # demote outright: a re-target could
                continue  # return the same match and never converge
            if len_min_arr[q] <= L:
                len_min_arr[q] = min(L + 1, 127)
        if not (viol.any() or viol_pred.any()):
            return start, kind, length, q_arr, np.where(
                (kind == 2) & ~rep0, ro, 0), rep0

        # start-chains by mkey, position order (cheap: one pass over starts)
        chains: dict = {}
        srank_at = {}
        for i, s in enumerate(start):
            chains.setdefault(int(mkey[s]), []).append(int(s))
            srank_at[int(s)] = int(srank[i])
        new_start, new_kind, new_length, new_q = [], [], [], []
        for i in range(len(start)):
            if not (viol[i] or viol_pred[i]):
                new_start.append(start[i]); new_kind.append(kind[i])
                new_length.append(length[i]); new_q.append(q_arr[i])
                continue
            p = int(start[i])
            want = int(length[i])
            best_l, best_q = 0, -1
            if viol[i]:  # re-target; invariant violators demote outright
                my_rank = srank_at[p]
                chain = chains.get(int(mkey[p]), [])
                lo = np.searchsorted(chain, p)
                for qq in chain[max(0, lo - window) : lo][::-1]:
                    ro_q = my_rank - srank_at[qq] - 1
                    if ro_q >= RING:
                        break
                    l = rc._lcp(buf, qq, p, want)
                    if l < max(LZ_MATCH_MIN_LEN, min_match_len_for_ro(ro_q)):
                        continue
                    if l > best_l:
                        best_l, best_q = l, qq
                        if l >= want:
                            break
            if best_q >= 0:
                new_start.append(p); new_kind.append(2)
                new_length.append(best_l); new_q.append(best_q)
                tail = want - best_l
            else:
                tail = want
                best_l = 0
            for t in range(tail):  # literal tail (adds starts, never removes)
                new_start.append(p + best_l + t); new_kind.append(0)
                new_length.append(1); new_q.append(0)
        start = np.asarray(new_start, dtype=np.int64)
        kind = np.asarray(new_kind, dtype=np.int64)
        length = np.asarray(new_length, dtype=np.int64)
        q_arr = np.asarray(new_q, dtype=np.int64)
    raise RuntimeError("host_conform did not converge")


def encode_fixpoint(data: bytes, iters: int, depth0=32, window=96,
                    chunk_input=rc.CHUNK_INPUT_DEFAULT, verbose=True,
                    opt_parse=False, final_dp=False, taps=False,
                    cap_at_mask=False):
    """opt_parse: use the price-based fence-block DP (tools/optparse_sim)
    instead of the lazy heuristic for every parse, with prices refreshed
    from the previous iteration's items.  final_dp: lazy parses drive the
    mask iterations (DP churn slows mask convergence, measured), then ONE
    DP parse over the final masked analysis picks the emitted items."""
    buf = rc.pad_segment(data)
    n = len(data)

    def parse(an, prices):
        if prices is None:
            return rc.parse_walk(an, buf, n)
        from tools.optparse_sim import optimal_parse
        return optimal_parse(an, buf, n, prices, rc.FENCE)

    def prices_of(an, walk):
        if not opt_parse:
            return None
        from tools.optparse_sim import stream_prices
        items = rc.parse_ref(an, buf, n, walk=walk)
        _, _, perm = rc.census_ref(items.symbol[
            (items.start - PAD_FRONT) // chunk_input == 0])
        coded = rc.symrank_ref(items, perm)
        return stream_prices(items, coded)

    an = rc.analyze_ref(buf, n, depth0)
    walk = rc.parse_walk(an, buf, n)
    prices = prices_of(an, walk)
    for k in range(iters):
        mask = np.zeros(len(buf), dtype=bool)
        mask[walk[0]] = True
        an = rc.analyze_ref(buf, n, window, start_mask=mask)
        if cap_at_mask:
            # no item may CROSS a masked position: the final start set is
            # then a superset of the mask, so every match target (masked by
            # construction) is a final item start — membership repair
            # vanishes (monotone splits only; merges need the repair path)
            nxt = np.full(len(buf) + 1, len(buf), dtype=np.int64)
            idxm = np.nonzero(mask)[0]
            nxt[idxm] = idxm
            np.minimum.accumulate(nxt[::-1], out=nxt[::-1])
            pos = np.arange(len(buf), dtype=np.int64)
            room = np.maximum(nxt[1:][pos.clip(0, len(buf) - 1)] - pos, 1)
            an = rc.Analysis(
                an.cctx, an.rank, an.pred, an.wordmatch & (room >= 2),
                np.where(np.minimum(an.bestlen, room) >= LZ_MATCH_MIN_LEN,
                         np.minimum(an.bestlen, room), 0),
                an.bestro, an.bestq)
        walk = parse(an, prices)
        if opt_parse and k == iters - 2:
            prices = prices_of(an, walk)
    if final_dp:
        from tools.optparse_sim import optimal_parse, stream_prices
        items_l = rc.parse_ref(an, buf, n, walk=walk)
        _, _, perm = rc.census_ref(items_l.symbol[
            (items_l.start - PAD_FRONT) // chunk_input == 0])
        coded_l = rc.symrank_ref(items_l, perm)
        walk = optimal_parse(an, buf, n, stream_prices(items_l, coded_l),
                             rc.FENCE, taps=taps)
    start, kind, length = walk
    q_arr = np.where(kind == 2, an.bestq[start], 0)
    n_viol0 = None
    start, kind, length, q_arr, ro, rep0 = host_conform(
        buf, n, an.cctx, start, kind, length, q_arr, window)
    items = rc._emit_items(an.cctx, an.pred, buf, n, start, kind, length,
                           q_arr, ro, rep0)
    enc = BitEncoder()
    enc.encode_varint(n)
    enc.encode_varint(chunk_input)
    return rc._finish_segment_stream(enc, items, n, chunk_input, 1)


def main():
    kb = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    iter_list = [int(v) for v in sys.argv[2:]] or [2, 3, 4]
    data = make_corpus(kb * 1024)
    n = len(data)
    rc.FENCE = 4096
    print("refs: orz=73376 (27.99%); seq2 F4096 = 73536 (100.22%)")
    for it in iter_list:
        t0 = time.time()
        s = encode_fixpoint(data, it)
        ok = rc.decode_segment_ref(s) == data
        print(f"fixpoint iters={it}: {len(s)} B ({len(s)/n*100:.2f}%) "
              f"vs orz {len(s)/73376*100:.2f}% rt={ok} [{time.time()-t0:.0f}s]",
              flush=True)


if __name__ == "__main__":
    main()
