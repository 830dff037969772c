"""Persistent XLA compilation cache.

First-compile of the full-size UNet step programs costs minutes (more over
remote-compile tunnels); the cache makes every later process start warm.
Enabled by default by bench.py and the CLIs; override location with
JAX_COMPILATION_CACHE_DIR, disable with DSCALER_NO_COMPILE_CACHE=1.
"""

from __future__ import annotations

import os


def enable_compilation_cache(default_dir: str = None) -> str | None:
    if os.environ.get("DSCALER_NO_COMPILE_CACHE"):
        return None
    import jax

    path = (
        os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or default_dir
        or os.path.join(os.path.expanduser("~"), ".cache", "dscaler_xla")
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        return path
    except Exception as e:
        print(f"[cache] compilation cache unavailable ({e})")
        return None
