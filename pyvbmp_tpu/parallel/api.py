"""Mesh sharding for VB-EM (the TPU-native answer to SURVEY.md §2.8/§5.8).

The reference has no distributed infrastructure; its semantics that *become*
communication on TPU are (a) sufficient-statistic reductions over sample dims
before every ``ss_update`` and (b) logZ/ELBO scalar reductions.  Here we shard
the trajectory/sample batch axis over a ``data`` mesh axis and jit the whole
VB step with sharded inputs: XLA inserts the psum-style collectives over ICI
automatically.  Natural parameters are tiny and stay replicated.
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, axis_name="data"):
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), axis_names=(axis_name,))


def shard_batch(mesh, x, batch_axis=1, axis_name="data"):
    """Place an array with the trajectory batch on ``batch_axis`` so that axis
    is split over the mesh (time stays resident per device; see SURVEY.md §5.7
    for the associative-scan long-T escape hatch)."""
    spec = [None] * x.ndim
    spec[batch_axis] = axis_name
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))


def shard_pytree_batch(mesh, tree, batch_axis=1, axis_name="data"):
    return jax.tree_util.tree_map(
        lambda x: shard_batch(mesh, x, batch_axis, axis_name), tree
    )


def replicate(mesh, tree):
    sh = NamedSharding(mesh, P())
    return jax.device_put(tree, sh)


def data_parallel_update(model, y, u=None, r=None, mesh=None, iters=1, lr=1.0,
                         batch_axis=None):
    """Run ``model.update`` with the trajectory batch sharded over the mesh.

    Works for any model whose update jits over (nodes..., data): LDS, MixLDS,
    DMBD, HMM, GMM.  Parameters stay replicated; XLA reduces the sharded
    sufficient statistics with collectives.

    ``batch_axis`` names the sample/batch axis of ``y`` to split; default is
    1 (time-major trajectory data ``(T, batch, ...)`` — LDS/DMBD/HMM).  For
    sample-major data like GMM's ``(n, d)`` pass ``batch_axis=0``.
    """
    if mesh is None:
        mesh = make_mesh()
    if batch_axis is None:
        batch_axis = 1
    if hasattr(model, "_update_reshaped") and hasattr(model, "reshape_inputs"):
        y, u, r = model.reshape_inputs(y, u, r)
        y = shard_batch(mesh, y, batch_axis)
        u = shard_batch(mesh, u, batch_axis)
        r = shard_batch(mesh, r, batch_axis)
        # the model's own step dispatcher — the exact code path update() uses,
        # just fed sharded inputs so XLA inserts the collectives
        model._update_reshaped(y, u, r, iters=iters, lr=lr)
        return model
    y = shard_batch(mesh, y, batch_axis)
    model.update(y, iters=iters, lr=lr)
    return model
