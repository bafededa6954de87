"""Persistent XLA compilation cache.

First compile of the full synthesis pipeline (incremental decode loop +
SSRN + 50-iteration Griffin-Lim) costs minutes on a cold process; JAX's
persistent compilation cache amortizes that across processes. Call
``enable()`` before the first jit in long-lived entry points (bench,
profiling scripts, CLIs). Safe no-op on backends/versions that don't
support it.
"""
from __future__ import annotations

import os

DEFAULT_DIR = os.path.expanduser("~/.cache/dc_tts_tpu_xla")


def enable(cache_dir: str | None = None) -> bool:
    """Turn on the persistent compilation cache. Returns True on success."""
    try:
        import jax

        path = cache_dir or os.environ.get("DCTTS_COMPILE_CACHE", DEFAULT_DIR)
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything, however small/fast-compiling
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        return True
    except Exception:
        return False
