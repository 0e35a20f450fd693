"""Persistent XLA compilation cache.

Device-pipeline programs are large (sort networks, the symrank scan, the
package-merge stack) and TPU compilation can take minutes — especially over
a remote-compile tunnel.  Caching compiled executables on disk makes every
run after the first start in seconds.  Safe to call multiple times; no-op
if the cache cannot be enabled (old jax, read-only disk).
"""

from __future__ import annotations

import os

_enabled = False


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    global _enabled
    if _enabled:
        return
    import jax

    if cache_dir is None:
        root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        cache_dir = os.path.join(root, "build", "jax_cache")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _enabled = True
    except Exception:
        pass
