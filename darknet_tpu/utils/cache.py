"""Persistent XLA compilation cache.

TPU compiles of the full yolov4 graph take 10s-5min (the axon remote-compile
service has high variance), and each fresh Python process recompiles.  The
JAX persistent cache eliminates that for every entry point (CLI, bench,
trainer) after the first run.
"""

from __future__ import annotations

import os

_enabled = False


def enable_persistent_cache(path: str | None = None) -> str:
    global _enabled
    cache_dir = path or os.environ.get(
        "DARKNET_TPU_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "darknet_tpu",
                     "xla"))
    if _enabled:
        return cache_dir
    os.makedirs(cache_dir, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _enabled = True
    return cache_dir
