"""Persistent XLA compile cache for the CLIs.

First compile of the flagship grad step takes minutes over a remote-TPU
tunnel (and ~30-40 s locally); the persistent cache makes repeat runs
start in seconds. Override the location with SSLC_COMPILE_CACHE; set it
empty to disable.
"""

from __future__ import annotations

import os


def enable_persistent_cache(default_dir: str = "/tmp/jax_sslc_cache"):
    cache_dir = os.environ.get("SSLC_COMPILE_CACHE", default_dir)
    if not cache_dir:
        return
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
