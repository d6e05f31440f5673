"""Global configuration for pyvbmp_tpu.

Two numerical modes:
  * speed mode (default): float32 everywhere; Cholesky-based PSD solves.
  * parity mode: enable float64 (``jax.config.update("jax_enable_x64", True)``)
    before importing data; used to match the torch reference's ELBO
    trajectories to ~1e-5 (see BASELINE.md).
"""
from __future__ import annotations

import os

import jax


def enable_x64(enable: bool = True) -> None:
    """Toggle float64 mode (parity runs vs. the torch reference)."""
    jax.config.update("jax_enable_x64", enable)


# Jitter added to PSD matrices before Cholesky when solves go bad.
PSD_JITTER = float(os.environ.get("PYVBMP_PSD_JITTER", "0.0"))

# Default dtype helpers ------------------------------------------------------

def default_dtype():
    import jax.numpy as jnp

    return jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32


def clear_jit_memos() -> None:
    """Drop every memoized jitted smoother/shard_map program.

    The hot-path jit memos (ops.parallel_kalman, ops.parallel_hmm,
    parallel.seq_parallel) are unbounded lru_caches keyed on the
    PYVBMP_* dispatch knobs; a tuning harness that sweeps knobs
    accumulates one compiled program per combination for the process
    lifetime.  Call this between sweep points to release them."""
    from .ops import chunked_scan, pallas_scan, parallel_hmm, parallel_kalman
    from .parallel import seq_parallel

    for mod in (chunked_scan, pallas_scan, parallel_hmm, parallel_kalman,
                seq_parallel):
        for obj in vars(mod).values():
            if callable(obj) and hasattr(obj, "cache_clear"):
                obj.cache_clear()
