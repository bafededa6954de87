"""Persistent XLA compilation cache.

First compile of the full synthesis pipeline (incremental decode loop +
SSRN + 50-iteration Griffin-Lim) costs minutes on a cold process; JAX's
persistent compilation cache amortizes that across processes. Call
``enable()`` before the first jit in long-lived entry points (bench,
profiling scripts, CLIs). Safe no-op on backends/versions that don't
support it.
"""
from __future__ import annotations

import hashlib
import os
import platform

DEFAULT_DIR = os.path.expanduser("~/.cache/dc_tts_tpu_xla")


def _host_fingerprint() -> str:
    """Short hash of the host CPU identity. XLA:CPU stores AOT-compiled
    code in the persistent cache and will LOAD an entry compiled on a
    different machine type (it only warns about the feature mismatch) —
    observed to change numerics run-to-run when a cache directory moves
    between hosts, which breaks bit-equality tests. Keying the directory
    by CPU identity keeps each host's entries separate."""
    ident = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("model name", "flags")):
                    ident += line
                    if line.startswith("flags"):
                        break
    except OSError:
        pass
    return hashlib.sha1(ident.encode()).hexdigest()[:10]


def enable(cache_dir: str | None = None) -> bool:
    """Turn on the persistent compilation cache. Returns True on success."""
    try:
        import jax

        path = cache_dir or os.environ.get("DCTTS_COMPILE_CACHE", DEFAULT_DIR)
        path = os.path.join(path, _host_fingerprint())
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything, however small/fast-compiling
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        return True
    except Exception:
        return False
