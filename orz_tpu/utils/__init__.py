"""Shared runtime utilities (observability lives in orz_tpu/progress.py)."""

from orz_tpu.utils.compcache import enable_compilation_cache  # noqa: F401
