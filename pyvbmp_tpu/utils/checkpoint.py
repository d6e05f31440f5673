"""Checkpoint / resume for model state (SURVEY.md §5.4).

The reference has no persistence at all (model state lives on python
objects).  Here every distribution/transform is a pytree of natural
parameters, so checkpointing is generic: we walk the model's node attributes,
flatten to arrays, and save via orbax (or a plain .npz fallback).  Combined
with the ``beta`` stale-statistic decay on every ``ss_update`` this gives
resumable streaming/minibatch VB.
"""
from __future__ import annotations

import os
import pickle

import numpy as np
import jax


def _is_pytree_node(x):
    """True for array-valued pytrees (dist nodes, arrays, lists of nodes);
    False for plain python config (ints, shape tuples, strings)."""
    leaves = jax.tree_util.tree_leaves(x)
    if not leaves:
        return False
    if not any(hasattr(l, "shape") and getattr(l, "ndim", 0) >= 0 and hasattr(l, "dtype") for l in leaves):
        return False
    return all(hasattr(l, "dtype") or np.isscalar(l) for l in leaves)


def model_state(model, _prefix="", _depth=0):
    """Collect the pytree-valued attributes of a stateful model shell.

    Recurses (two levels) into nested stateful shells — e.g. NLDS holds an
    MNLR transition shell whose ``beta`` node is the actual state, MixLDS
    holds an inner LDS shell — using dotted keys so ``load`` can restore
    nested attributes in place."""
    state = {}
    for name, val in vars(model).items():
        if name.startswith("_") or name in ("ELBO_save",):
            continue
        key = _prefix + name
        try:
            if _is_pytree_node(val):
                state[key] = val
            elif (
                _depth < 2
                and hasattr(val, "__dict__")
                and not isinstance(val, type)
                and not callable(val)
            ):
                state.update(model_state(val, key + ".", _depth + 1))
        except Exception:
            continue
    return state


def save(model, path, use_orbax=False):
    """Save all node attributes of ``model`` to ``path``.

    Default format: a self-contained pickle of (treedef, numpy leaves).
    ``use_orbax=True`` writes an orbax PyTree checkpoint directory instead
    (interoperable with the broader JAX checkpointing ecosystem).
    """
    state = model_state(model)
    parent = os.path.dirname(os.path.abspath(path))
    if parent:
        os.makedirs(parent, exist_ok=True)
    if use_orbax:
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(os.path.abspath(path), state, force=True)
        return path
    leaves, treedef = jax.tree_util.tree_flatten(state)
    with open(path, "wb") as f:
        pickle.dump(
            {"treedef": treedef, "leaves": [np.asarray(l) for l in leaves]}, f
        )
    return path


def load(model, path, use_orbax=False):
    """Restore node attributes saved by ``save`` into ``model`` (in place)."""
    if use_orbax or os.path.isdir(path):
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        template = model_state(model)
        state = ckptr.restore(os.path.abspath(path), item=template)
    else:
        with open(path, "rb") as f:
            blob = pickle.load(f)
        state = jax.tree_util.tree_unflatten(
            blob["treedef"], [jax.numpy.asarray(l) for l in blob["leaves"]]
        )
    for name, val in state.items():
        target = model
        parts = name.split(".")
        for part in parts[:-1]:
            target = getattr(target, part)
        setattr(target, parts[-1], val)
    return model
