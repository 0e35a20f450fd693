"""OTZ — the TPU-native segment codec.

The reference codec (richox/orz, see orz_tpu/golden) interleaves model
updates with parse decisions, which makes every hot loop sequentially
data-dependent (reference src/lz.rs:131-235).  That shape cannot use a TPU:
the VPU/MXU need thousands of independent lanes of work per step.

OTZ is a from-scratch redesign of the same modeling stack (ROLZ reduced
offsets + 2-byte word model + symbol ranking + canonical Huffman, the
component inventory of SURVEY.md section 2) around one core invariant:

    ALL match-finder and word-model state is a pure function of the raw
    bytes, never of the parse.

Concretely, where orz inserts only item-start positions into its per-context
rings (reference src/matcher.rs:62-80, driven by parse decisions at
src/lz.rs:191-212), OTZ inserts EVERY position; where orz updates its word
table at item ends (reference src/lz.rs:203,233), OTZ updates it at every
position.  A decoder can reproduce that state from decoded bytes alone, and
an encoder can compute it for all positions at once with sorts, scans and
gathers — massively parallel, XLA/Pallas-friendly work:

    phase 1  analyze   per-position contexts, word predictions, ROLZ
                       candidates and match lengths        (parallel)
    phase 2  parse     greedy+lazy decisions per position, then item
                       extraction by pointer jumping       (log-parallel)
    phase 3  symrank   512 independent context scans in lockstep
                       across VPU lanes                    (context-parallel)
    phase 4  entropy   per-chunk weight census, length-limited Huffman via
                       vectorized package-merge, prefix-sum bit packing
                                                           (parallel)

This package contains the sequential numpy reference model of the OTZ
format (refcodec.py, the test oracle and documentation-by-construction) and
the JAX device pipeline (pipeline.py) built from orz_tpu/ops kernels.
"""

from orz_tpu.device.spec import OTZ_MAGIC  # noqa: F401
