"""Golden (reference-exact, bounds-checked, slow) model of the ORZ format.

This package pins the bit-level semantics of every stage of the codec.  It is
deliberately written for clarity and exactness, not speed; the native C++
backend (orz_tpu.native) and the TPU device kernels (orz_tpu.ops) are validated
against it byte-for-byte.
"""

from orz_tpu.golden.lz import GoldenLZDecoder, GoldenLZEncoder  # noqa: F401
