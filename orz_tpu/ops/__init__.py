"""TPU compute kernels for the OTZ codec.

Every module here is jittable JAX operating on whole segments at once; the
sequential oracle for each phase lives in orz_tpu/device/refcodec.py.

    groups.py    sort-based key grouping: in-group ranks, j-th predecessors
    analyze.py   phase 1: contexts, word predictions, ROLZ matches
    parse.py     phase 2: greedy+lazy decisions, pointer-jump item extraction
    symrank.py   phase 3: 512-context batched symbol-ranking scan
    huffman.py   phase 4a: package-merge code lengths + canonical codes
    bitpack.py   phase 4b: prefix-sum bitstream packing
"""
