"""Bayesian transformer stacks (reference tests/test_transformers.py:1-40:
random + mixture-of-linear-maps data through GBT/FBT raw_update)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pyvbmp_tpu.transforms.bayesian_transformers import (
    FocusedBayesianTransformer,
    GenerativeBayesianTransformer,
)
from pyvbmp_tpu.utils import rng


def _mixture_data(num_samples=200, num_obs=10, mixture_dim=8, hidden_dim=2, obs_dim=2):
    rs = np.random.RandomState(0)
    X = rs.randn(num_samples, mixture_dim, hidden_dim)
    z = rs.rand(num_samples, mixture_dim).argmax(-1)
    A = rs.randn(mixture_dim, obs_dim, hidden_dim) / hidden_dim**0.5
    Y = (A[z][:, None] @ X[..., None]).squeeze(-1)  # (S, mixture_dim, obs_dim)
    return jnp.asarray(Y[:, :num_obs], jnp.float32)


def test_generative_bayesian_transformer_updates():
    rng.seed(0)
    Y = _mixture_data()
    m = GenerativeBayesianTransformer(
        mixture_dim=8, role_dim=4, obs_dim=2, hidden_dim=2, pad_X=True
    )
    m.raw_update(Y, iters=4)
    elbos = np.asarray(m.ELBO_save)
    assert np.isfinite(elbos).all()
    assert elbos[-1] > elbos[0]


def test_focused_bayesian_transformer_updates():
    rng.seed(0)
    Y = _mixture_data()
    m = FocusedBayesianTransformer(
        mixture_dim=8, role_dim=4, obs_dim=2, hidden_dim=2, pad_X=True
    )
    m.raw_update(Y, iters=4)
    elbos = np.asarray(m.ELBO_save)
    assert np.isfinite(elbos).all()
