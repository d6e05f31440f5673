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


def data_parallel_update(model, y, u=None, r=None, mesh=None, iters=1, lr=1.0):
    """Run ``model.update`` with the trajectory batch sharded over the mesh.

    Works for any model whose update jits over (nodes..., data): LDS, MixLDS,
    DMBD, HMM, GMM.  Parameters stay replicated; XLA reduces the sharded
    sufficient statistics with collectives.
    """
    if mesh is None:
        mesh = make_mesh()
    if hasattr(model, "reshape_inputs"):
        y, u, r = model.reshape_inputs(y, u, r)
        y = shard_batch(mesh, y, 1)
        u = shard_batch(mesh, u, 1)
        r = shard_batch(mesh, r, 1)
        # bypass reshape in update by calling the jitted internals
        return _update_reshaped(model, y, u, r, iters, lr)
    y = shard_batch(mesh, y, 1)
    model.update(y, iters=iters, lr=lr)
    return model


def _update_reshaped(model, y, u, r, iters, lr):
    """Call the model's jitted step loop on already-reshaped (sharded) inputs."""
    import jax.numpy as jnp

    if hasattr(model, "_dmbd_step"):
        key = ("step", 1, model.obs_model.ptemp)
        if key not in model._jit_cache:
            model._jit_cache[key] = jax.jit(
                model._dmbd_step, static_argnames=("latent_iters",)
            )
        fn = model._jit_cache[key]
        for _ in range(iters):
            if model.px is None:
                px0 = model._init_px(r)
                px_tuple = (px0.mu, px0.Sigma, px0.invSigmamu, px0.invSigma)
            else:
                px_tuple = (
                    model.px.mu,
                    model.px.Sigma,
                    model.px.invSigmamu,
                    model.px.invSigma,
                )
            (
                model.x0,
                model.A,
                model.obs_model.transition,
                model.obs_model.initial,
                model.obs_model.obs_dist,
                px_tuple,
                model.obs_model.p,
                model.logZ,
                ELBO,
            ) = fn(
                model.x0,
                model.A,
                model.obs_model.transition,
                model.obs_model.initial,
                model.obs_model.obs_dist,
                px_tuple,
                y,
                u,
                r,
                lr,
                1,
            )
            from ..dists.mvn_vector_format import MultivariateNormal_vector_format

            model.px = MultivariateNormal_vector_format(*px_tuple)
            model.ELBO_save.append(float(ELBO))
        return model
    step = model._jitted("vb_step", model._vb_step)
    for _ in range(iters):
        model.x0, model.A, model.obs_model, model.px, model.logZ, L = step(
            model.x0, model.A, model.obs_model, y, u, r, lr
        )
        model.ELBO_save.append(float(L))
    return model
