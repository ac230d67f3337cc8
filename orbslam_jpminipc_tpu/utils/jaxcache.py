"""Persistent XLA compilation cache.

The full system compiles a few dozen distinct jitted programs; through a
remote-compile TPU path each costs tens of seconds. Persisting compiled
executables to disk makes every run after the first start in seconds —
the difference between "cannot finish a frame inside the bench budget"
and real-time. Call early, before the first jit trace.
"""
from __future__ import annotations

import os

_DEFAULT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)


def enable_persistent_cache(path: str | None = None) -> str:
    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR") or _DEFAULT
    os.makedirs(path, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return path
