"""Block-data-parallel segment encoding over a jax device mesh.

batched_encode = vmap(encode_segment_jit) with batch sharded over the
"blocks" mesh axis: XLA compiles one SPMD program; each device encodes its
segments; outputs shard the same way and are fetched per segment for host
assembly (the only cross-device movement — payload bits — rides the ICI
all-gather XLA inserts for the output fetch).
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from orz_tpu.device.pipeline import (
    SegmentOut,
    _bucket_capacity,
    assemble_segment,
    encode_segment_jit,
)
from orz_tpu.device.spec import (
    CHUNK_INPUT_DEFAULT,
    PAD_FRONT,
    PAD_TAIL,
    candidate_depth,
    n_chunks_for,
)
from orz_tpu.golden.bitio import BitEncoder


def blocks_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), ("blocks",))


@partial(jax.jit, static_argnames=("depth", "chunk_input", "c_max"))
def _batched_encode_jit(bufs, seg_lens, depth: int, chunk_input: int, c_max: int):
    return jax.vmap(
        lambda b, l: encode_segment_jit(b, l, depth, chunk_input, c_max)
    )(bufs, seg_lens)


def batched_encode(
    bufs: jnp.ndarray,  # (B, N) padded segments
    seg_lens: jnp.ndarray,  # (B,)
    level: int,
    chunk_input: int,
    c_max: int,
    mesh: Optional[Mesh] = None,
):
    """Run the encode pipeline for a batch of segments, sharded over the
    mesh's "blocks" axis when one is given."""
    depth = candidate_depth(level)
    if mesh is None:
        return _batched_encode_jit(bufs, seg_lens, depth, chunk_input, c_max)
    buf_sh = NamedSharding(mesh, P("blocks", None))
    len_sh = NamedSharding(mesh, P("blocks"))
    bufs = jax.device_put(bufs, buf_sh)
    seg_lens = jax.device_put(seg_lens, len_sh)
    return _batched_encode_jit(bufs, seg_lens, depth, chunk_input, c_max)


def mesh_encode_segments(
    segments: List[bytes],
    level: int = 2,
    chunk_input: int = CHUNK_INPUT_DEFAULT,
    mesh: Optional[Mesh] = None,
) -> List[bytes]:
    """Encode a list of segments block-data-parallel; returns OTZ payloads
    in order.  The batch pads to a common shape bucket (one SPMD program)."""
    if not segments:
        return []
    cap = _bucket_capacity(max(len(s) for s in segments))
    n = PAD_FRONT + cap + PAD_TAIL
    b = len(segments)
    bufs = np.zeros((b, n), dtype=np.uint8)
    lens = np.zeros((b,), dtype=np.int32)
    for i, s in enumerate(segments):
        bufs[i, PAD_FRONT : PAD_FRONT + len(s)] = np.frombuffer(s, dtype=np.uint8)
        lens[i] = len(s)
    c_max = n_chunks_for(cap, chunk_input)
    out = batched_encode(jnp.asarray(bufs), jnp.asarray(lens), level, chunk_input, c_max, mesh)
    out_np = jax.tree_util.tree_map(np.asarray, out)

    payloads = []
    for i, s in enumerate(segments):
        enc = BitEncoder()
        enc.encode_varint(len(s))
        enc.encode_varint(chunk_input)
        if len(s) == 0:
            payloads.append(enc.finish())
            continue
        one = SegmentOut(*(leaf[i] for leaf in out_np))
        payloads.append(assemble_segment(enc, one, len(s), chunk_input))
    return payloads
