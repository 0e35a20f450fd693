"""Shared runtime utilities (observability lives in orz_tpu/progress.py)."""

from orz_tpu.utils.compcache import enable_compilation_cache  # noqa: F401
from orz_tpu.utils.tpujit import tpu_jit  # noqa: F401
