"""Observability / numerical-health utilities (SURVEY.md §5.1-5.2, §5.5).

The reference's only instrumentation is stdout "Percent Change in ELBO"
prints and ad-hoc NaN-guard prints (HMM.py:68-69 etc.).  Here:

* every model keeps an ``ELBO_save`` trace (list of per-iteration ELBOs);
* ``assert_finite(model)`` walks the model's pytree state and reports any
  non-finite leaf by name (the jit-safe in-graph analogue is
  ``jax.debug.callback``/``jax.config.update("jax_debug_nans", True)``);
* ``elbo_report(model)`` summarizes a fit.
"""
from __future__ import annotations

import numpy as np
import jax

from .checkpoint import model_state


def assert_finite(model, where=""):
    bad = []
    for name, node in model_state(model).items():
        for path, leaf in jax.tree_util.tree_leaves_with_path(node):
            arr = np.asarray(leaf)
            if arr.dtype.kind == "f" and not np.isfinite(arr).all():
                bad.append(f"{name}{jax.tree_util.keystr(path)}")
    if bad:
        raise FloatingPointError(
            f"non-finite parameters{' in ' + where if where else ''}: {bad}"
        )
    return True


def elbo_report(model):
    e = np.asarray(model.ELBO_save, np.float64)
    if e.size == 0:
        return {"iters": 0}
    diffs = np.diff(e)
    return {
        "iters": int(e.size),
        "first": float(e[0]),
        "last": float(e[-1]),
        "monotone_after_2": bool((diffs[2:] >= -np.abs(e[-1]) * 1e-6).all())
        if diffs.size > 2
        else True,
        "max_decrease": float(diffs.min()) if diffs.size else 0.0,
    }


def enable_nan_debugging():
    """Turn on jax's NaN checker (traces re-run eagerly on NaN)."""
    jax.config.update("jax_debug_nans", True)
