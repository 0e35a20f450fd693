"""jax.jit wrapper with TPU-only compiler options, resolved lazily.

The match-finder Pallas kernel carries ~20 operand tiles plus their shift
views through VMEM (ops/match_pallas.py, N_DW=16 since round 4); its
scoped allocation slightly exceeds the 16 MB default ceiling, which is a
soft compiler budget, not the physical VMEM size.  The fix is the
`xla_tpu_scoped_vmem_limit_kib` compile option — but only TPU backends
know it (XLA:CPU rejects unknown options), and the backend is not known
at decoration time, so the jit object is built on first call.
"""

from __future__ import annotations

from functools import wraps

import jax

_TPU_OPTS = {"xla_tpu_scoped_vmem_limit_kib": "32768"}


def tpu_jit(fn, **jit_kwargs):
    """jax.jit(fn, **jit_kwargs) with the raised scoped-VMEM ceiling when
    the default backend is TPU."""
    box: dict = {}

    @wraps(fn)
    def call(*args, **kwargs):
        jf = box.get("jf")
        if jf is None:
            opts = _TPU_OPTS if jax.default_backend() == "tpu" else None
            jf = jax.jit(fn, compiler_options=opts, **jit_kwargs)
            box["jf"] = jf
        return jf(*args, **kwargs)

    return call
