"""Multi-chip / multi-host scaling for the OTZ codec.

The stream format is sequentially state-dependent end to end, so the
parallel axis that preserves the format is block data parallelism: the
ORZT container splits input into independent segments; a batch of B
segments shards over a 1-D device mesh along axis "blocks" and every
device runs the full encode pipeline on its shard (no collectives are
needed for compression itself — segments are independent by construction;
ordered gather of the variable-length payloads happens host-side through
the container framing, and across hosts via jax.experimental.multihost_utils
style process-local gathers).

There is deliberately no tensor/pipeline parallelism here: per-segment
state (rings, word table, symrank) is private to the segment, the analogue
of orz's strictly per-stream model (SURVEY.md section 2, "parallelism
components: NOT PRESENT in the reference").
"""

from orz_tpu.parallel.mesh import (  # noqa: F401
    batched_encode,
    blocks_mesh,
    mesh_encode_segments,
    mesh_encode_segments_staged,
)
