"""Checkpoint/resume and diagnostics (SURVEY.md §5 aux subsystems)."""
import os
import numpy as np
import jax
import jax.numpy as jnp

from pyvbmp_tpu.models import GaussianMixtureModel, LinearDynamicalSystems
from pyvbmp_tpu.utils import checkpoint, diagnostics


def _data():
    k = jax.random.key(0)
    mus = jnp.asarray([[-4.0, 0.0], [4.0, 0.0]])
    ks = jax.random.split(k, 2)
    return jnp.concatenate(
        [mus[i] + jax.random.normal(ks[i], (80, 2)) for i in range(2)], 0
    )


def test_checkpoint_roundtrip(tmp_path):
    X = _data()
    m = GaussianMixtureModel(3, 2)
    m.update(X, iters=5)
    path = str(tmp_path / "gmm.ckpt")
    checkpoint.save(m, path)
    m2 = GaussianMixtureModel(3, 2)  # different random init
    checkpoint.load(m2, path)
    np.testing.assert_allclose(np.asarray(m.dist.mu), np.asarray(m2.dist.mu))
    np.testing.assert_allclose(np.asarray(m.pi.alpha), np.asarray(m2.pi.alpha))
    # resumed model continues from the same ELBO
    m.update(X, iters=1)
    m2.update(X, iters=1)
    np.testing.assert_allclose(
        float(m.ELBO().sum()), float(m2.ELBO().sum()), rtol=1e-6
    )


def test_minibatch_resume_beta(tmp_path):
    """beta-accumulated minibatch VB survives a checkpoint boundary."""
    from pyvbmp_tpu.dists import Dirichlet

    d = Dirichlet.create((3,))
    d = d.ss_update(jnp.asarray([1.0, 2.0, 3.0]), beta=1.0)

    class Holder:
        pass

    h = Holder()
    h.node = d
    path = str(tmp_path / "dir.ckpt")
    checkpoint.save(h, path)
    h2 = Holder()
    h2.node = Dirichlet.create((3,))
    checkpoint.load(h2, path)
    d2 = h2.node.ss_update(jnp.asarray([1.0, 1.0, 1.0]), beta=1.0)
    np.testing.assert_allclose(
        np.asarray(d2.alpha), np.asarray(h.node.alpha_0 + jnp.asarray([2.0, 3.0, 4.0])),
        rtol=1e-6,
    )


def test_assert_finite_and_report():
    X = _data()
    m = GaussianMixtureModel(3, 2)
    m.update(X, iters=4)
    assert diagnostics.assert_finite(m)
    rep = diagnostics.elbo_report(m)
    assert rep["iters"] == 4 and rep["monotone_after_2"]

    # corrupt a parameter -> detection by name
    import dataclasses

    m.pi = dataclasses.replace(m.pi, alpha=m.pi.alpha.at[0].set(jnp.nan))
    try:
        diagnostics.assert_finite(m)
        assert False, "should have raised"
    except FloatingPointError as e:
        assert "pi" in str(e)


def test_checkpoint_nested_shells(tmp_path):
    """Models holding stateful sub-shells (NLDS -> MNLR transition,
    MixLDS -> inner LDS) roundtrip their nested nodes."""
    import jax.numpy as jnp

    from pyvbmp_tpu.models import MixtureofLinearDynamicalSystems
    from pyvbmp_tpu.utils import checkpoint, rng

    rs = np.random.RandomState(1)
    y = jnp.asarray(rs.randn(25, 6, 3), jnp.float32)
    rng.seed(0)
    a = MixtureofLinearDynamicalSystems(2, (3,), 2, 0, 0)
    a.update(y, iters=2)
    pth = str(tmp_path / "mix.pkl")
    checkpoint.save(a, pth)
    rng.seed(9)
    b = MixtureofLinearDynamicalSystems(2, (3,), 2, 0, 0)
    checkpoint.load(b, pth)
    a.update(y, iters=1)
    b.update(y, iters=1)
    assert abs(a.ELBO_save[-1] - b.ELBO_save[-1]) < 1e-2
