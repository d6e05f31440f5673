"""Unit tests for the L2 exponential-family nodes: shapes, conjugate-update
correctness, KL positivity, and cross-checks vs. the torch reference where it
is importable (parity oracle per SURVEY.md §4)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pyvbmp_tpu.dists import (
    Delta,
    DiagonalWishart,
    Dirichlet,
    Gamma,
    Mixture,
    MultivariateNormal_vector_format,
    NormalGamma,
    NormalInverseWishart,
    Wishart,
    WishartUnitDet,
    WishartUnitTrace,
)


def test_dirichlet_update_and_moments():
    d = Dirichlet.create((4,), batch_shape=(3,))
    X = jnp.abs(jax.random.normal(jax.random.key(1), (100, 3, 4)))
    d2 = d.raw_update(X)
    assert d2.alpha.shape == (3, 4)
    np.testing.assert_allclose(d2.alpha, d.alpha_0 + X.sum(0), rtol=1e-5)
    assert jnp.all(d2.KLqprior() >= -1e-5)
    np.testing.assert_allclose(d2.mean().sum(-1), 1.0, rtol=1e-5)
    # damping: lr=0.5 gives midpoint
    d3 = d.ss_update(X.sum(0), lr=0.5)
    np.testing.assert_allclose(
        d3.alpha, 0.5 * (d.alpha_0 + X.sum(0)) + 0.5 * d.alpha, rtol=1e-5
    )


def test_dirichlet_beta_accumulation():
    d = Dirichlet.create((4,))
    NA1 = jnp.ones(4)
    NA2 = 2 * jnp.ones(4)
    d1 = d.ss_update(NA1, beta=1.0)
    d2 = d1.ss_update(NA2, beta=1.0)
    np.testing.assert_allclose(d2.alpha, d.alpha_0 + 3.0, rtol=1e-6)


def test_gamma_poisson_conjugacy():
    g = Gamma.create((2,), batch_shape=(5,))
    X = jnp.abs(jax.random.normal(jax.random.key(2), (50, 5, 2))) * 3
    g2 = g.raw_update(X)
    np.testing.assert_allclose(g2.alpha, g.alpha_0 + X.sum(0), rtol=1e-5)
    np.testing.assert_allclose(g2.beta, g.beta_0 + 50.0, rtol=1e-5)
    assert jnp.all(g2.KLqprior() >= -1e-5)
    assert g2.Elog_like(X).shape == (50, 5)


def test_wishart_update_and_expectations():
    w = Wishart.create((3, 3), batch_shape=(2,))
    S = jnp.eye(3) * 10 + jnp.ones((3, 3))
    S = jnp.broadcast_to(S, (2, 3, 3))
    N = jnp.full((2,), 20.0)
    w2 = w.ss_update(S, N)
    np.testing.assert_allclose(w2.invU, w.invU_0 + S, rtol=1e-5)
    np.testing.assert_allclose(w2.nu, w.nu_0 + N, rtol=1e-5)
    np.testing.assert_allclose(
        w2.EinvSigma() @ w2.invU / w2.nu[..., None, None],
        jnp.broadcast_to(jnp.eye(3), (2, 3, 3)),
        atol=2e-3,
    )
    assert jnp.all(w2.KLqprior() >= -1e-4)
    assert float(w.KLqprior().sum()) < 1e-4  # prior == posterior at init


def test_wishart_unitdet_constraint():
    w = WishartUnitDet.create((4, 4), batch_shape=(3,))
    S = jnp.broadcast_to(jnp.eye(4) * 5.0, (3, 4, 4))
    w2 = w.ss_update(S, jnp.full((3,), 30.0))
    np.testing.assert_allclose(w2.ElogdetinvSigma(), 0.0, atol=1e-5)


def test_wishart_unittrace_constraint():
    w = WishartUnitTrace.create((4, 4), batch_shape=(3,))
    S = jnp.broadcast_to(jnp.eye(4) * 5.0, (3, 4, 4))
    w2 = w.ss_update(S, jnp.full((3,), 30.0))
    trace = (w2.EinvSigma() * jnp.eye(4)).sum((-1, -2))
    np.testing.assert_allclose(trace, 4.0, rtol=1e-2)


def test_diagonal_wishart():
    w = DiagonalWishart.create((3,), batch_shape=(2,))
    S = jnp.ones((2, 3)) * 4
    N = jnp.ones((2, 3)) * 10
    w2 = w.ss_update(S, N)
    np.testing.assert_allclose(w2.gamma.alpha, w.gamma.alpha_0 + 5.0, rtol=1e-5)
    assert w2.EinvSigma().shape == (2, 3, 3)


def test_niw_posterior_mean_recovery():
    true_mu = jnp.asarray([3.0, -2.0])
    X = true_mu + 0.1 * jax.random.normal(jax.random.key(3), (2000, 2))
    niw = NormalInverseWishart.create((2,))
    niw2 = niw.raw_update(X)
    np.testing.assert_allclose(niw2.mu, true_mu, atol=0.02)
    # exact NIW closed form in float64
    Xn = np.asarray(X, np.float64)
    N = Xn.shape[0]
    SExx = Xn.T @ Xn
    mu_post = Xn.sum(0) / (1.0 + N)
    invU = np.eye(2) + SExx - (1.0 + N) * np.outer(mu_post, mu_post)
    ESigma_expected = invU / (2.0 + 2.0 + N - 2 - 1)
    np.testing.assert_allclose(niw2.ESigma(), ESigma_expected, rtol=2e-2)
    ell = niw2.Elog_like(X)
    assert ell.shape == (2000,)
    assert jnp.all(jnp.isfinite(ell))
    assert float(niw2.KLqprior()) > 0


def test_niw_weighted_update_matches_subset():
    X = jax.random.normal(jax.random.key(4), (100, 1, 3))
    p = jnp.ones((100, 2)) * jnp.asarray([1.0, 0.0])
    niw = NormalInverseWishart.create((3,), batch_shape=(2,))
    niw2 = niw.raw_update(X, p)
    # component 0 got all the weight: lambda_mu = lambda_0 + 100; comp 1 stays prior
    np.testing.assert_allclose(niw2.lambda_mu[0], 101.0, rtol=1e-5)
    np.testing.assert_allclose(niw2.lambda_mu[1], 1.0, rtol=1e-5)
    np.testing.assert_allclose(
        niw2.mu[0], np.asarray(X[:, 0]).sum(0) / 101.0, rtol=1e-4, atol=1e-5
    )


def test_mvn_vector_format_roundtrip():
    key = jax.random.key(5)
    A = jax.random.normal(key, (4, 4))
    Sigma = A @ A.T + 4 * jnp.eye(4)
    mu = jnp.arange(4.0).reshape(4, 1)
    px = MultivariateNormal_vector_format(mu=mu, Sigma=Sigma)
    np.testing.assert_allclose(px.EinvSigma() @ Sigma, jnp.eye(4), atol=1e-4)
    np.testing.assert_allclose(px.EinvSigmamu(), px.EinvSigma() @ mu, atol=1e-5)
    p2 = MultivariateNormal_vector_format(
        invSigma=px.EinvSigma(), invSigmamu=px.EinvSigmamu()
    )
    np.testing.assert_allclose(p2.mean(), mu, atol=1e-4)
    np.testing.assert_allclose(p2.EXXT(), Sigma + mu @ mu.T, atol=1e-4)
    # Res = log-normalizer correction
    expected_res = (
        -0.5 * (mu * (px.EinvSigma() @ mu)).sum()
        + 0.5 * jnp.linalg.slogdet(px.EinvSigma())[1]
        - 2 * jnp.log(2 * jnp.pi)
    )
    np.testing.assert_allclose(px.Res(), expected_res, rtol=1e-5)


def test_mvn_vf_combiner():
    a = MultivariateNormal_vector_format(
        invSigma=2 * jnp.eye(3), invSigmamu=jnp.ones((3, 1))
    )
    b = MultivariateNormal_vector_format(
        invSigma=3 * jnp.eye(3), invSigmamu=2 * jnp.ones((3, 1))
    )
    c = a.combiner(b)
    np.testing.assert_allclose(c.invSigma, 5 * jnp.eye(3))
    np.testing.assert_allclose(c.mean(), 3 / 5 * jnp.ones((3, 1)), rtol=1e-6)


def test_delta():
    X = jnp.arange(6.0).reshape(3, 2, 1)
    d = Delta(X)
    np.testing.assert_allclose(d.EXXT(), X @ jnp.swapaxes(X, -1, -2))
    assert d.unsqueeze(0).shape == (1, 3, 2, 1)


def test_mixture_gmm_elbo_monotone():
    from pyvbmp_tpu.models.gmm import GaussianMixtureModel

    key = jax.random.key(7)
    mus = jnp.asarray([[-4.0, 0.0], [4.0, 0.0], [0.0, 4.0]])
    ks = jax.random.split(key, 3)
    X = jnp.concatenate(
        [mus[i] + jax.random.normal(ks[i], (100, 2)) for i in range(3)], 0
    )
    gmm = GaussianMixtureModel(6, 2)
    gmm.update(X, iters=15, lr=1.0)
    elbos = gmm.ELBO_save
    # ELBO must be (near-)monotone after the first few iterations
    diffs = np.diff(elbos[2:])
    assert (diffs > -1e-3 * np.abs(elbos[-1])).all(), diffs
    # recovered means should cover the true clusters
    m = np.asarray(gmm.means())
    for true in np.asarray(mus):
        assert np.min(np.linalg.norm(m - true, axis=-1)) < 0.5


def test_mixture_isotropic_gmm_runs():
    from pyvbmp_tpu.models.gmm import GaussianMixtureModel

    X = jax.random.normal(jax.random.key(8), (200, 2)) + jnp.asarray([3.0, 0.0])
    gmm = GaussianMixtureModel(3, 2, isotropic=True)
    gmm.update(X, iters=5)
    assert np.isfinite(gmm.ELBO_save).all()


def test_poisson_mixture():
    from pyvbmp_tpu.models.gmm import PoissonMixtureModel

    key = jax.random.key(9)
    X1 = jax.random.poisson(key, 2.0, (100, 3)).astype(jnp.float32)
    X2 = jax.random.poisson(jax.random.fold_in(key, 1), 9.0, (100, 3)).astype(
        jnp.float32
    )
    X = jnp.concatenate([X1, X2], 0)
    pmm = PoissonMixtureModel(2, 3)
    pmm.update(X, iters=10)
    means = np.sort(np.asarray(pmm.means()).mean(-1))
    assert abs(means[0] - 2.0) < 1.0 and abs(means[-1] - 9.0) < 1.5


def test_hierarchical_dirichlet_chain_recovery():
    from pyvbmp_tpu.dists import Hierarchical_Dirichlet

    # true chain p(x0)p(x1|x0): counts drawn from a known factorized joint
    rs = np.random.RandomState(0)
    p0 = np.array([0.7, 0.3])
    p10 = np.array([[0.9, 0.1], [0.2, 0.8]])  # p(x1|x0)
    joint = p0[:, None] * p10  # (2, 2)
    counts = rs.multinomial(20000, joint.reshape(-1)).reshape(2, 2)

    hd = Hierarchical_Dirichlet.create(event_shape=(2, 2))
    assert hd.dists[0].alpha.shape == (2, 1)
    assert hd.dists[1].alpha.shape == (2, 2)
    hd2 = hd.raw_update(jnp.asarray(counts, jnp.float32)[None])
    # joint mean matches the empirical joint; event sums to 1
    np.testing.assert_allclose(np.asarray(hd2.mean()).sum(), 1.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(hd2.mean()), joint, atol=0.02)
    # ElogX finite, KL scalar and non-negative
    assert np.isfinite(np.asarray(hd2.ElogX())).all()
    kl = np.asarray(hd2.KLqprior())
    assert kl.shape == () and kl >= -1e-5


def test_hierarchical_dirichlet_three_deep_shapes():
    from pyvbmp_tpu.dists import Hierarchical_Dirichlet

    hd = Hierarchical_Dirichlet.create(event_shape=(3, 4, 2), batch_shape=(5,))
    assert hd.dists[0].alpha.shape == (5, 3, 1, 1)
    assert hd.dists[1].alpha.shape == (5, 3, 4, 1)
    assert hd.dists[2].alpha.shape == (5, 1, 4, 2)
    X = jnp.abs(jax.random.normal(jax.random.key(3), (10, 5, 3, 4, 2)))
    hd2 = hd.raw_update(X)
    assert hd2.mean().shape == (5, 3, 4, 2)
    np.testing.assert_allclose(hd2.mean().sum((-1, -2, -3)), 1.0, rtol=1e-5)
    assert hd2.KLqprior().shape == (5,)


def test_gmm_vector_clusters():
    """GMM over vector-format NIW components (reference NIW_vf.py:224-236 is
    unconstructible upstream; this is the working counterpart)."""
    from itertools import permutations

    from pyvbmp_tpu.dists import GMM_vector
    from pyvbmp_tpu.utils import rng

    rng.seed(0)
    rs = np.random.RandomState(0)
    mus = np.array([[-3.0, 0.0], [3.0, 0.0], [0.0, 4.0]])
    z = rs.randint(0, 3, 400)
    X = jnp.asarray((mus[z] + 0.4 * rs.randn(400, 2))[..., None], jnp.float32)
    g = GMM_vector(5, 2)
    g.initialize(X)
    g.update(X, iters=12)
    e = np.asarray(g.ELBO_save)
    assert np.isfinite(e).all() and e[-1] > e[0]
    hard = np.asarray(g.p).argmax(-1)
    acc = max(
        (hard == np.vectorize({0: a, 1: b, 2: c}.get)(z)).mean()
        for a, b, c in permutations(range(5), 3)
    )
    assert acc > 0.9
