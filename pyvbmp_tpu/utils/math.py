"""Numerics helpers (counterpart of reference utils/torch_functions.py:1-22).

All functions are pure jnp and safe under jit/vmap/scan.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

LOG2PI = 1.8378770664093453  # log(2*pi)
LOG2 = 0.6931471805599453


def stable_logsumexp(x, dims, keepdims=False):
    """logsumexp over (possibly multiple) axes with max-shift stabilization.

    Mirrors reference utils/torch_functions.py:2-4 (used everywhere in HMM
    message passing).  ``dims`` may be an int or tuple of ints.
    """
    if isinstance(dims, int):
        dims = (dims,)
    dims = tuple(dims)
    xmax = jax.lax.stop_gradient(jnp.max(x, axis=dims, keepdims=True))
    xmax = jnp.where(jnp.isfinite(xmax), xmax, 0.0)
    out = xmax + jnp.log(jnp.sum(jnp.exp(x - xmax), axis=dims, keepdims=True))
    if not keepdims:
        out = out.reshape(_squeezed_shape(out.shape, dims))
    return out


def _squeezed_shape(shape, dims):
    nd = len(shape)
    drop = {d % nd for d in dims}
    return tuple(s for i, s in enumerate(shape) if i not in drop)


def stable_softmax(x, dims):
    """log-softmax (the reference's name notwithstanding; see
    utils/torch_functions.py:6-7)."""
    return x - stable_logsumexp(x, dims, keepdims=True)


def logmatmulexp(x, y):
    """Semiring (log,+) matmul: logsumexp_k x[...,i,k]+y[...,k,j].

    Reference utils/torch_functions.py:9-13.  This is the HMM forward step as
    one MXU matmul after max-shifting.
    """
    x_shift = jax.lax.stop_gradient(jnp.max(x, axis=-1, keepdims=True))
    y_shift = jax.lax.stop_gradient(jnp.max(y, axis=-2, keepdims=True))
    x_shift = jnp.where(jnp.isfinite(x_shift), x_shift, 0.0)
    y_shift = jnp.where(jnp.isfinite(y_shift), y_shift, 0.0)
    xy = jnp.log(jnp.matmul(jnp.exp(x - x_shift), jnp.exp(y - y_shift)))
    return xy + x_shift + y_shift


def mvgammaln(nu, dim):
    """Multivariate log-gamma (reference utils/torch_functions.py:15-19)."""
    i = jnp.arange(dim, dtype=nu.dtype) / 2.0
    return jax.scipy.special.gammaln(nu[..., None] - i).sum(-1) + (
        dim * (dim - 1) / 4.0
    ) * jnp.log(jnp.pi)


def mvdigamma(nu, dim):
    """Multivariate digamma (reference utils/torch_functions.py:21-22)."""
    i = jnp.arange(dim, dtype=nu.dtype) / 2.0
    return jax.scipy.special.digamma(nu[..., None] - i).sum(-1)


def mvpolygamma1(nu, dim):
    """Sum of trigammas: d/dnu mvdigamma (used by Wishart_UnitDet Newton
    iteration, reference dists/Wishart_UnitDet.py:6-7)."""
    i = jnp.arange(dim, dtype=nu.dtype) / 2.0
    return jax.scipy.special.polygamma(1, nu[..., None] - i).sum(-1)


# Reference-style "masked" lgamma/digamma used in Dirichlet KL where alpha may
# contain zeros from transition masks (reference dists/Dirichlet.py:63-71).

def lgamma_masked(x):
    out = jax.scipy.special.gammaln(x)
    return jnp.where(jnp.isinf(out), 0.0, out)


def digamma_masked(x):
    # NOTE: jax digamma(0) is NaN (torch: -inf); mask non-positive inputs
    # directly so both the -inf and the NaN conventions map to 0.
    out = jax.scipy.special.digamma(x)
    return jnp.where(x > 0, out, 0.0)
