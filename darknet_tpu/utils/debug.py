"""Debug aids standing in for the reference's (SURVEY.md §5):

* `debug_sync_mode()` — the `-cuda_dbg_sync` analogue: makes every jax op
  dispatch synchronously so failures surface at the faulting op;
* `debug_nans()` — `jax.config.debug_nans` wrapper, the analogue of the
  reference's fix_nan_and_inf scrubbing hooks (blas.h:63,145-147) in
  fail-fast form;
* `compare_arrays()` — `cuda_compare`/`compare_2_arrays_gpu` equivalent
  (dark_cuda.c:479): max-abs diff report between two tensors.
"""

from __future__ import annotations

import contextlib

import numpy as np


@contextlib.contextmanager
def debug_sync_mode():
    import jax

    prev = jax.config.jax_disable_jit
    jax.config.update("jax_disable_jit", True)
    try:
        yield
    finally:
        jax.config.update("jax_disable_jit", prev)


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    import jax

    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def compare_arrays(a, b, name: str = "", log=print) -> float:
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    if a.shape != b.shape:
        log(f"compare {name}: SHAPE MISMATCH {a.shape} vs {b.shape}")
        return float("inf")
    diff = np.abs(a - b)
    rel = diff / np.maximum(np.abs(b), 1e-9)
    log(f"compare {name}: max_abs={diff.max():.3e} mean_abs={diff.mean():.3e}"
        f" max_rel={rel.max():.3e}")
    return float(diff.max())
