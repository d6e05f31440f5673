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


def _mixture_data(num_samples=64, num_obs=6, mixture_dim=4, hidden_dim=2, obs_dim=2):
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
        mixture_dim=4, role_dim=3, obs_dim=2, hidden_dim=2, pad_X=True
    )
    m.raw_update(Y, iters=3)
    elbos = np.asarray(m.ELBO_save)
    assert np.isfinite(elbos).all()
    assert elbos[-1] > elbos[0]


def test_focused_bayesian_transformer_updates():
    rng.seed(0)
    Y = _mixture_data()
    m = FocusedBayesianTransformer(
        mixture_dim=4, role_dim=3, obs_dim=2, hidden_dim=2, pad_X=True
    )
    # 2 sweeps suffice: this test asserts finiteness, not convergence, and
    # the stack updates eagerly (each extra sweep is ~6 s of 1-core dispatch)
    m.raw_update(Y, iters=2)
    elbos = np.asarray(m.ELBO_save)
    assert np.isfinite(elbos).all()


def test_chained_bayesian_transformer_discovers_chain():
    """y0 independent, y1 = W y0, y2 = W y1: the model should mark y0
    independent and recover the parent structure
    (reference wip_ChainedBayesianTransformer is unconstructible upstream —
    stale constructor signatures — so this tests the working counterpart)."""
    from pyvbmp_tpu.transforms import ChainedBayesianTransformer

    rng.seed(3)
    rs = np.random.RandomState(1)
    n, S = 2, 500
    W = np.array([[0.9, -0.4], [0.4, 0.9]])
    y0 = rs.randn(S, n) * 2.0
    y1 = y0 @ W.T + 0.01 * rs.randn(S, n)
    y2 = y1 @ W.T + 0.01 * rs.randn(S, n)
    Y = jnp.asarray(np.stack([y0, y1, y2], 1), jnp.float32)

    m = ChainedBayesianTransformer(1, 1, n, n)
    elbos = []
    for _ in range(10):
        m.raw_update(Y, iters=1)
        elbos.append(float(m.ELBO()))
    assert np.isfinite(elbos).all()
    assert elbos[-1] > elbos[0]
    p = np.asarray(m.p).mean(0)
    p_indep = 1 - p.sum(-1)
    assert p_indep[0] > 0.9          # y0 flagged independent
    assert p[1, 0] > 0.9             # y1 driven by y0
    assert p[2, 1] > 0.9             # y2 driven by y1


def test_discrete_transformer_is_focused_alias():
    from pyvbmp_tpu.transforms import (
        DiscreteBayesianTransformer,
        FocusedBayesianTransformer,
    )

    assert DiscreteBayesianTransformer is FocusedBayesianTransformer
