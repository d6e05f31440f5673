"""MatrixNormalWishart / MatrixNormalGamma tests, modeled on the scenarios in
reference tests/test_dists.py:46-191 (weight recovery, masks, pad_X,
predict/forward/backward round trips) with numeric assertions."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pyvbmp_tpu.dists import Delta, MultivariateNormal_vector_format as MVN_vf
from pyvbmp_tpu.transforms import MatrixNormalGamma, MatrixNormalWishart


def _linear_data(key, n=4, p=6, ns=800, noise=0.1, bias=False, well_conditioned=False):
    k1, k2, k3 = jax.random.split(key, 3)
    W = jax.random.normal(k1, (n, p)) / np.sqrt(p)
    if well_conditioned:
        assert n == p
        W = W * 0.3 + jnp.eye(n)
    X = jax.random.normal(k2, (ns, p))
    Y = X @ W.T + noise * jax.random.normal(k3, (ns, n))
    if bias:
        b = jnp.arange(1.0, n + 1.0) / 2.0
        Y = Y + b
    return W, X, Y


@pytest.mark.parametrize("cls", [MatrixNormalWishart, MatrixNormalGamma])
def test_weight_recovery(cls):
    W, X, Y = _linear_data(jax.random.key(0))
    m = cls.create((4, 6))
    m = m.raw_update(X[..., None], Y[..., None])
    np.testing.assert_allclose(np.asarray(m.mean()), np.asarray(W), atol=0.05)
    # noise precision should be ~1/0.1^2 = 100
    prec = np.diagonal(np.asarray(m.EinvSigma()))
    assert np.all(prec > 50) and np.all(prec < 200)


@pytest.mark.parametrize("cls", [MatrixNormalWishart, MatrixNormalGamma])
def test_weight_recovery_pad_X(cls):
    W, X, Y = _linear_data(jax.random.key(1), bias=True)
    m = cls.create((4, 6), pad_X=True)
    m = m.raw_update(X[..., None], Y[..., None])
    np.testing.assert_allclose(np.asarray(m.weights()), np.asarray(W), atol=0.05)
    np.testing.assert_allclose(
        np.asarray(m.bias()[..., 0]), np.arange(1.0, 5.0) / 2.0, atol=0.05
    )


def test_mask_zeros_respected():
    key = jax.random.key(2)
    mask = np.ones((3, 5), bool)
    mask[0, 0] = False
    mask[2, 4] = False
    W = jax.random.normal(key, (3, 5)) * np.asarray(mask)
    X = jax.random.normal(jax.random.fold_in(key, 1), (500, 5))
    Y = X @ W.T + 0.05 * jax.random.normal(jax.random.fold_in(key, 2), (500, 3))
    m = MatrixNormalWishart.create((3, 5), mask=mask)
    m = m.raw_update(X[..., None], Y[..., None])
    mu = np.asarray(m.mean())
    assert abs(mu[0, 0]) < 1e-5 and abs(mu[2, 4]) < 1e-5
    np.testing.assert_allclose(mu, np.asarray(W), atol=0.06)


def test_X_mask_input_selection():
    key = jax.random.key(3)
    X_mask = np.ones((1, 5), bool)
    X_mask[0, 3] = False  # feature 3 is irrelevant
    W = jax.random.normal(key, (3, 5)) * np.asarray(X_mask)
    X = jax.random.normal(jax.random.fold_in(key, 1), (500, 5))
    Y = X @ W.T + 0.05 * jax.random.normal(jax.random.fold_in(key, 2), (500, 3))
    m = MatrixNormalWishart.create((3, 5), X_mask=jnp.asarray(X_mask))
    m = m.raw_update(X[..., None], Y[..., None])
    mu = np.asarray(m.mean())
    assert np.abs(mu[:, 3]).max() < 1e-6
    np.testing.assert_allclose(mu, np.asarray(W), atol=0.06)


def test_predict_postdict_roundtrip():
    W, X, Y = _linear_data(jax.random.key(4), n=4, p=4, noise=0.02, well_conditioned=True)
    m = MatrixNormalWishart.create((4, 4))
    m = m.raw_update(X[..., None], Y[..., None])
    pY, res = m.predict(X[..., None])
    np.testing.assert_allclose(
        np.asarray(pY.mean()[..., 0]), np.asarray(Y), atol=0.15
    )
    pX, res_b = m.postdict(Y[..., None])
    np.testing.assert_allclose(
        np.asarray(pX.mean()[..., 0]), np.asarray(X), atol=0.3
    )


def test_forward_backward_consistency():
    """forward(pX) mean must agree with predict(X) mean for sharp pX."""
    W, X, Y = _linear_data(
        jax.random.key(5), n=3, p=3, ns=400, noise=0.05, well_conditioned=True
    )
    m = MatrixNormalWishart.create((3, 3), pad_X=True)
    m = m.raw_update(X[..., None], Y[..., None])
    pX = MVN_vf(
        mu=X[..., None], Sigma=1e-6 * jnp.broadcast_to(jnp.eye(3), (400, 3, 3))
    )
    pY_fwd, _ = m.forward(pX)
    pY_pred, _ = m.predict(X[..., None])
    np.testing.assert_allclose(
        np.asarray(pY_fwd.mean()), np.asarray(pY_pred.mean()), atol=2e-3
    )
    # backward of a sharp pY recovers X
    pYm = MVN_vf(
        mu=Y[..., None], Sigma=1e-6 * jnp.broadcast_to(jnp.eye(3), (400, 3, 3))
    )
    pX_bwd, _ = m.backward(pYm)
    np.testing.assert_allclose(
        np.asarray(pX_bwd.mean()[..., 0]), np.asarray(X), atol=0.35
    )


def test_elog_like_X_matches_backward_natparams():
    W, X, Y = _linear_data(jax.random.key(6), n=3, p=3, ns=100)
    m = MatrixNormalWishart.create((3, 3))
    m = m.raw_update(X[..., None], Y[..., None])
    invSigma, invSigmamu, res = m.Elog_like_X(Y[..., None])
    assert invSigma.shape[-2:] == (3, 3)
    assert invSigmamu.shape == (100, 3, 1)
    assert jnp.all(jnp.isfinite(res))
    # posterior from unit prior: combine and compare with update via message
    px = MVN_vf(invSigma=invSigma + jnp.eye(3), invSigmamu=invSigmamu)
    assert jnp.all(jnp.isfinite(px.mean()))


def test_update_with_messages_matches_raw_update_for_sharp_messages():
    W, X, Y = _linear_data(jax.random.key(7), n=2, p=3, ns=300, noise=0.05)
    m0 = MatrixNormalWishart.create((2, 3), key=jax.random.key(42))
    m1 = m0.raw_update(X[..., None], Y[..., None])
    pX = MVN_vf(
        mu=X[..., None], Sigma=1e-9 * jnp.broadcast_to(jnp.eye(3), (300, 3, 3))
    )
    m2 = m0.update(pX, Delta(Y[..., None]))
    np.testing.assert_allclose(np.asarray(m1.mu), np.asarray(m2.mu), atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(m1.invV), np.asarray(m2.invV), rtol=1e-3, atol=1e-2
    )


def test_batched_mnw():
    key = jax.random.key(8)
    m = MatrixNormalWishart.create((2, 3), batch_shape=(4,))
    X = jax.random.normal(key, (100, 1, 3, 1))
    Y = jax.random.normal(jax.random.fold_in(key, 1), (100, 1, 2, 1))
    p = jax.nn.softmax(jax.random.normal(jax.random.fold_in(key, 2), (100, 4)), -1)
    m2 = m.raw_update(X, Y, p=p)
    assert m2.mu.shape == (4, 2, 3)
    assert m2.KLqprior().shape == (4,)
    assert jnp.all(jnp.isfinite(m2.Elog_like(X, Y)))


def test_mng_unit_trace():
    from pyvbmp_tpu.transforms import MatrixNormalGamma_UnitTrace

    W, X, Y = _linear_data(jax.random.key(9), n=3, p=4, ns=300)
    m = MatrixNormalGamma_UnitTrace.create((3, 4))
    m = m.ss_update(
        (X[..., None] * X[..., None, :]).sum(0),
        (Y[..., None] * X[..., None, :]).sum(0),
        (Y[..., None] * Y[..., None, :]).sum(0),
        jnp.asarray(300.0),
    )
    trace = np.trace(np.asarray(m.EinvSigma()))
    np.testing.assert_allclose(trace, 3.0, rtol=1e-2)
