"""One seq2 (sequential OTZ2 oracle) measurement point vs orz -l2.

    python tools/seq2_point.py MB DEPTH [wm] [rep0_search] [lcp0]
"""

import sys

sys.path.insert(0, ".")

from bench import bench_corpus
from orz_tpu.cfg import cfg_from_level
from orz_tpu.container import encode_bytes
from orz_tpu.device.refcodec import encode_segment_seq2, decode_segment_ref
from orz_tpu.native import NativeBackend


def main():
    mb = float(sys.argv[1])
    depth = int(sys.argv[2])
    wm = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    rep0 = int(sys.argv[4]) if len(sys.argv) > 4 else 0
    lcp0 = int(sys.argv[5]) if len(sys.argv) > 5 else 16
    data, corpus_name = bench_corpus(int(mb * (1 << 20)))
    orz = len(encode_bytes(data, cfg_from_level(2), NativeBackend()))
    payload = encode_segment_seq2(data, level=2, depth=depth, words_mode=wm,
                                  rep0_search=bool(rep0), lcp0=lcp0)
    assert decode_segment_ref(payload) == data
    print(f"seq2 mb={mb} ({corpus_name}) depth={depth} wm={wm} rep0={rep0} "
          f"lcp0={lcp0}: {len(payload)} vs orz {orz} = "
          f"{len(payload)/orz*100:.2f}%", flush=True)


if __name__ == "__main__":
    main()
