"""Guard against LLVM-JIT mmap exhaustion (diagnosed round 5).

Every large XLA:CPU executable holds thousands of LLVM JIT section mmaps;
a long-lived process that compiles many pipeline programs (one set per
shape bucket) can exhaust the kernel's vm.max_map_count (default 65530).
Past the limit mmap fails ENOMEM, XLA logs "LLVM compilation error:
Cannot allocate memory", and execution segfaults — the round-3/4 "suite
segfault under load".  The durable fix is raising the sysctl
(vm.max_map_count); this guard keeps default-kernel hosts safe by
dropping jax's jit caches when the process map count nears the floor
(the persistent compilation cache makes subsequent re-loads cheap).
"""

from __future__ import annotations

_THRESHOLD = 55_000


def vm_map_count() -> int:
    try:
        with open("/proc/self/maps", "rb") as f:
            return sum(1 for _ in f)
    except OSError:
        return 0


def maybe_relieve_jit_pressure(threshold: int = _THRESHOLD) -> bool:
    """Drop jax jit caches if this process is close to vm.max_map_count.
    Returns True when caches were dropped."""
    if vm_map_count() <= threshold:
        return False
    import jax

    jax.clear_caches()
    return True
