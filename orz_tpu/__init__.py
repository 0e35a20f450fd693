"""orz-tpu: a TPU-native lossless data-compression framework.

Reproduces the ORZ stream format of richox/orz (ROLZ parse + 2-byte word
model + adaptive symbol ranking + static canonical Huffman) as:

- a golden reference-exact Python model (orz_tpu.golden),
- a native C++ host codec (orz_tpu.native, csrc/),
- vectorized JAX/Pallas TPU kernels (orz_tpu.ops) driving a hybrid encoder,
- a block-data-parallel multi-chip container (orz_tpu.parallel).

Public API mirrors the reference crate (reference src/lib.rs:22-24):
encode, decode, LZCfg, CountRead, CountWrite, ProgressLogger and friends.
"""

from orz_tpu.cfg import LEVEL_PRESETS, LZCfg, cfg_from_level  # noqa: F401
from orz_tpu.container import decode, decode_bytes, encode, encode_bytes  # noqa: F401
from orz_tpu.ioutil import CountRead, CountWrite  # noqa: F401
from orz_tpu.progress import (  # noqa: F401
    ProgressLogger,
    SilentProgressLogger,
    SimpleProgressLogger,
)

__version__ = "0.1.0"


def default_backend():
    """The fastest available correct backend: native C++ if it builds,
    otherwise the golden Python model."""
    try:
        from orz_tpu.native import NativeBackend

        return NativeBackend()
    except Exception:
        from orz_tpu.container import GoldenBackend

        return GoldenBackend()
