"""Model-level tests: HMM variants, LDS, MixLDS, BFA — converted from the
reference's scripted scenarios (tests/test_models.py) into numeric assertions."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pyvbmp_tpu.dists import NormalInverseWishart
from pyvbmp_tpu.models import (
    ARHMM,
    BayesianFactorAnalysis,
    HMM,
    LinearDynamicalSystems,
    MixtureofLinearDynamicalSystems,
    Tensor_HMM,
    HHMM,
    dHMM,
)


def _chain_data(key=0, K=4, T=60, B=6, d=3, sticky=0.9, noise=0.3):
    rs = np.random.RandomState(key)
    trans = sticky * np.eye(K) + (1 - sticky) / K
    mus = rs.randn(K, d) * 4
    z = np.zeros((T, B), int)
    for t in range(1, T):
        for b in range(B):
            z[t, b] = rs.choice(K, p=trans[z[t - 1, b]])
    X = mus[z] + noise * rs.randn(T, B, d)
    return jnp.asarray(X, jnp.float32), z, mus


def test_hmm_monotone_and_recovery():
    X, z, mus = _chain_data()
    hmm = HMM(NormalInverseWishart.create((3,), batch_shape=(4,)))
    hmm.update(X, iters=10)
    e = np.asarray(hmm.ELBO_save)
    assert (np.diff(e)[1:] > -np.abs(e[-1]) * 1e-4).all()
    # state posteriors should be confident
    assert float(hmm.p.max(-1).mean()) > 0.8


def test_hmm_minibatch_beta():
    X, _, _ = _chain_data()
    hmm = HMM(NormalInverseWishart.create((3,), batch_shape=(4,)))
    hmm.update(X[:30], iters=2, beta=1.0)
    hmm.update(X[30:], iters=2, beta=1.0)
    assert np.isfinite(hmm.ELBO_save).all()


def test_arhmm_runs():
    rs = np.random.RandomState(0)
    T, B = 50, 4
    # two regimes with different AR matrices
    A1 = np.eye(2) * 0.9
    A2 = np.asarray([[0.0, -0.9], [0.9, 0.0]])
    x = rs.randn(B, 2)
    X, Y = [], []
    for t in range(T):
        A = A1 if (t // 10) % 2 == 0 else A2
        y = x @ A.T + 0.05 * rs.randn(B, 2)
        X.append(x)
        Y.append(y)
        x = y
    Xj = jnp.asarray(np.stack(X), jnp.float32)[..., None, :, None]
    Yj = jnp.asarray(np.stack(Y), jnp.float32)[..., None, :, None]
    model = ARHMM(2, 2, 2)
    model.update((Xj, Yj), iters=6)
    e = np.asarray(model.ELBO_save)
    assert (np.diff(e)[1:] > -np.abs(e[-1]) * 1e-3).all()


def test_tensor_hmm_and_hhmm():
    X, z, mus = _chain_data(K=4, d=2)
    obs = NormalInverseWishart.create((2,), batch_shape=(2, 2))
    thmm = Tensor_HMM(obs, event_shape=(2, 2))
    thmm.update(X, iters=4)
    assert np.isfinite(thmm.ELBO_save).all()
    e = np.asarray(thmm.ELBO_save)
    assert (np.diff(e)[1:] > -np.abs(e[-1]) * 1e-3).all()

    obs2 = NormalInverseWishart.create((2,), batch_shape=(2, 2))
    hh = HHMM(obs2, event_dim=2)
    hh.update(X, iters=4)
    assert np.isfinite(hh.ELBO_save).all()


def test_dhmm_runs():
    rs = np.random.RandomState(1)
    T, B, K, p, d = 40, 5, 3, 2, 2
    U = rs.randn(T, B, p).astype(np.float32)
    mus = rs.randn(K, d) * 3
    z = rs.randint(0, K, (T, B))
    Y = (mus[z] + 0.2 * rs.randn(T, B, d)).astype(np.float32)
    model = dHMM(NormalInverseWishart.create((d,), batch_shape=(K,)), p)
    model.raw_update(jnp.asarray(U), jnp.asarray(Y), iters=3)
    assert np.isfinite(model.ELBO_save).all()


def _lds_data(key=1, T=60, B=4, h=2, o=4, well_behaved=True):
    rs = np.random.RandomState(key)
    A = np.asarray(
        [[np.cos(0.2), -np.sin(0.2)], [np.sin(0.2), np.cos(0.2)]]
    ) * 0.98
    C = rs.randn(o, h)
    x = rs.randn(B, h)
    ys = []
    for t in range(T):
        x = x @ A.T + 0.05 * rs.randn(B, h)
        ys.append(x @ C.T + 0.1 * rs.randn(B, o))
    return jnp.asarray(np.stack(ys), jnp.float32)


def test_lds_elbo_increases():
    y = _lds_data()
    lds = LinearDynamicalSystems(obs_shape=(4,), hidden_dim=2)
    lds.update(y, iters=10)
    e = np.asarray(lds.ELBO_save)
    assert e[-1] > e[0]
    assert (np.diff(e)[:5] > 0).all()  # strong initial ascent


def test_lds_with_controls_and_regressors():
    rs = np.random.RandomState(2)
    T, B = 40, 3
    y = _lds_data(T=T, B=B)
    u = jnp.asarray(rs.randn(T, B, 2), jnp.float32)
    r = jnp.asarray(rs.randn(T, B, 1), jnp.float32)
    lds = LinearDynamicalSystems(
        obs_shape=(4,), hidden_dim=2, control_dim=2, regression_dim=1
    )
    lds.update(y, u, r, iters=4)
    assert np.isfinite(lds.ELBO_save).all()


def test_lds_latent_noise_shared():
    y = _lds_data()
    lds = LinearDynamicalSystems(obs_shape=(4,), hidden_dim=2, latent_noise="shared")
    lds.update(y, iters=4)
    assert np.isfinite(lds.ELBO_save).all()


def test_mix_lds_separates_systems():
    rs = np.random.RandomState(3)
    T, B, o = 50, 6, 3
    # two different dynamical systems
    def rollout(A, C, n):
        x = rs.randn(n, 2)
        ys = []
        for t in range(T):
            x = x @ A.T + 0.05 * rs.randn(n, 2)
            ys.append(x @ C.T + 0.1 * rs.randn(n, o))
        return np.stack(ys)

    A1 = np.asarray([[np.cos(0.3), -np.sin(0.3)], [np.sin(0.3), np.cos(0.3)]]) * 0.99
    A2 = np.eye(2) * 0.95
    C1, C2 = rs.randn(o, 2), rs.randn(o, 2)
    y = np.concatenate([rollout(A1, C1, 3), rollout(A2, C2, 3)], 1)
    model = MixtureofLinearDynamicalSystems(2, (o,), 2, 0, 0)
    model.update(jnp.asarray(y, jnp.float32), None, None, iters=8)
    p = np.asarray(model.assignment())
    # trajectories from the same system should co-assign
    assert (p[:3] == p[0]).all() and (p[3:] == p[3]).all()


def test_bfa_recovery():
    rs = np.random.RandomState(4)
    ns, o, h = 400, 8, 2
    A = rs.randn(o, h)
    z = rs.randn(ns, h)
    Y = (z @ A.T + 0.1 * rs.randn(ns, o)).astype(np.float32)
    bfa = BayesianFactorAnalysis(o, h)
    bfa.raw_update(jnp.asarray(Y), iters=10)
    e = np.asarray(bfa.ELBO_save)
    assert (np.diff(e)[1:] > -np.abs(e[-1]) * 1e-4).all()
    # reconstruction: column space of learned A should match truth
    Ahat = np.asarray(bfa.A.mean())
    proj = Ahat @ np.linalg.pinv(Ahat)
    err = np.linalg.norm(A - proj @ A) / np.linalg.norm(A)
    assert err < 0.1
