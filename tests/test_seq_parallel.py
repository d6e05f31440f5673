"""Sequence (time-axis) parallelism (SURVEY §2.8 SP/CP row): the
time-sharded forward-backward must reproduce the single-device smoother on
the 8-virtual-device CPU mesh."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from pyvbmp_tpu.ops.parallel_hmm import forward_backward_parallel
from pyvbmp_tpu.parallel.seq_parallel import time_sharded_forward_backward


def _problem(T=32, B=3, K=4, seed=0, masked=False):
    rs = np.random.RandomState(seed)
    tr = rs.dirichlet(np.ones(K), K)
    if masked:
        tr[0, 2] = 0.0
        tr = tr / tr.sum(-1, keepdims=True)
    trans = jnp.asarray(np.log(tr), jnp.float32)
    init = jnp.asarray(np.log(rs.dirichlet(np.ones(K))), jnp.float32)
    obs = jnp.asarray(rs.randn(T, B, K), jnp.float32)
    return trans, init, obs


def _mesh(n=8):
    return Mesh(np.asarray(jax.devices()[:n]), axis_names=("seq",))


def test_time_sharded_hmm_matches_single_device():
    trans, init, obs = _problem()
    ref = forward_backward_parallel(trans, init, obs, lane_form=False)
    out = time_sharded_forward_backward(trans, init, obs, _mesh())
    names = ["p", "SEzz", "SEz0", "logZ"]
    for n, x, z in zip(names, ref, out):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(z), atol=5e-5, err_msg=n
        )


def test_time_sharded_hmm_masked_transitions():
    trans, init, obs = _problem(masked=True)
    ref = forward_backward_parallel(trans, init, obs, lane_form=False)
    out = time_sharded_forward_backward(trans, init, obs, _mesh())
    for x, z in zip(ref, out):
        assert np.isfinite(np.asarray(z)).all()
        np.testing.assert_allclose(np.asarray(x), np.asarray(z), atol=5e-5)


def test_time_sharded_hmm_ptemp():
    trans, init, obs = _problem(T=16)
    ref = forward_backward_parallel(trans, init, obs, ptemp=3.0, lane_form=False)
    out = time_sharded_forward_backward(trans, init, obs, _mesh(), ptemp=3.0)
    np.testing.assert_allclose(np.asarray(ref[0]), np.asarray(out[0]), atol=5e-5)


def test_time_sharded_two_devices():
    """D=2 exercises the single-predecessor external-prefix edge case."""
    trans, init, obs = _problem(T=10)
    ref = forward_backward_parallel(trans, init, obs, lane_form=False)
    out = time_sharded_forward_backward(trans, init, obs, _mesh(2))
    for x, z in zip(ref, out):
        np.testing.assert_allclose(np.asarray(x), np.asarray(z), atol=5e-5)


def test_time_sharded_kalman_matches_single_device():
    """Continuous-chain SP: time-sharded Kalman smoother == single-device."""
    from pyvbmp_tpu.models import LinearDynamicalSystems
    from pyvbmp_tpu.ops.parallel_kalman import parallel_kalman_smoother
    from pyvbmp_tpu.parallel.seq_parallel import time_sharded_kalman_smoother
    from pyvbmp_tpu.utils import rng

    rng.seed(0)
    lds = LinearDynamicalSystems((3,), 2, 0, 0, parallel_scan=True,
                                 cross_cov_compat=False)
    y = jax.random.normal(jax.random.key(5), (24, 4, 3))
    yv, uv, rv = lds.reshape_inputs(y)
    parms = lds._latent_parms(lds.A)
    like = lds.log_likelihood_function(lds.obs_model, yv, rv)
    ref = parallel_kalman_smoother(parms, lds.x0, like, uv, lane_form=False)
    out = time_sharded_kalman_smoother(parms, lds.x0, like, uv, _mesh())
    for x, z in zip(jax.tree_util.tree_leaves(ref), jax.tree_util.tree_leaves(out)):
        denom = float(jnp.abs(np.asarray(x)).max()) + 1e-30
        assert float(jnp.abs(np.asarray(x) - np.asarray(z)).max()) / denom < 2e-5


def test_hmm_fit_with_time_mesh_matches_single_device():
    """Model-level SP: HMM(time_mesh=...) fits identically to the plain
    lax.scan smoother (the smoothers are exact, so any path must agree)."""
    from pyvbmp_tpu.dists import NormalInverseWishart
    from pyvbmp_tpu.models import HMM
    from pyvbmp_tpu.utils import rng

    rs = np.random.RandomState(8)
    X = jnp.asarray(rs.randn(32, 6, 3), jnp.float32)

    rng.seed(21)
    a = HMM(NormalInverseWishart.create((3,), batch_shape=(4,)))
    a.update(X, iters=3)

    rng.seed(21)
    b = HMM(NormalInverseWishart.create((3,), batch_shape=(4,)),
            time_mesh=_mesh())
    b.update(X, iters=3)

    np.testing.assert_allclose(
        np.asarray(a.ELBO_save), np.asarray(b.ELBO_save), rtol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(a.transition.alpha), np.asarray(b.transition.alpha),
        rtol=2e-4,
    )


def test_mixlds_fit_with_time_mesh_matches_parallel_scan():
    """Model-level SP for the MixLDS north star: time_mesh == parallel_scan
    (both use the corrected cross-covariance math)."""
    from pyvbmp_tpu.models import MixtureofLinearDynamicalSystems
    from pyvbmp_tpu.utils import rng

    rs = np.random.RandomState(9)
    y = jnp.asarray(rs.randn(24, 8, 3), jnp.float32)

    rng.seed(23)
    a = MixtureofLinearDynamicalSystems(2, (3,), 2, 0, 0, parallel_scan=True)
    a.update(y, iters=2)

    rng.seed(23)
    b = MixtureofLinearDynamicalSystems(2, (3,), 2, 0, 0, time_mesh=_mesh())
    b.update(y, iters=2)

    np.testing.assert_allclose(
        np.asarray(a.ELBO_save), np.asarray(b.ELBO_save), rtol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(a.lds.A.mu), np.asarray(b.lds.A.mu), atol=2e-4
    )


def test_dmbd_fit_with_time_mesh_matches_parallel_scan():
    """Model-level SP for the flagship: DMBD(time_mesh=...) shards BOTH the
    role HMM scan and the Kalman smoother over time and must fit identically
    to the resident-time parallel_scan path."""
    from pyvbmp_tpu.models import DynamicMarkovBlanketDiscovery
    from pyvbmp_tpu.utils import rng

    rs = np.random.RandomState(10)
    y = jnp.asarray(rs.randn(16, 4, 4, 2), jnp.float32)

    rng.seed(29)
    a = DynamicMarkovBlanketDiscovery(
        obs_shape=(4, 2), role_dims=(1, 1, 1), hidden_dims=(2, 1, 1),
        parallel_scan=True,
    )
    a.update(y, iters=2)

    rng.seed(29)
    b = DynamicMarkovBlanketDiscovery(
        obs_shape=(4, 2), role_dims=(1, 1, 1), hidden_dims=(2, 1, 1),
        time_mesh=_mesh(),
    )
    b.update(y, iters=2)

    np.testing.assert_allclose(
        np.asarray(a.ELBO_save), np.asarray(b.ELBO_save), rtol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(a.A.mu), np.asarray(b.A.mu), atol=2e-4
    )


def test_dhmm_fit_with_time_mesh_matches_parallel_scan():
    """Model-level SP for the input-driven HMM: dHMM(time_mesh=...) shards
    the per-time-transition forward-backward over time and must fit
    identically to the resident-time parallel_scan path."""
    from pyvbmp_tpu.dists import NormalInverseWishart
    from pyvbmp_tpu.models import dHMM
    from pyvbmp_tpu.utils import rng

    rs = np.random.RandomState(4)
    T, B, K, pdim, d = 16, 5, 3, 2, 2
    U = jnp.asarray(rs.randn(T, B, pdim), jnp.float32)
    mus = rs.randn(K, d) * 3
    z = rs.randint(0, K, (T, B))
    Y = jnp.asarray(mus[z] + 0.2 * rs.randn(T, B, d), jnp.float32)

    rng.seed(31)
    a = dHMM(NormalInverseWishart.create((d,), batch_shape=(K,)), pdim,
             parallel_scan=True)
    a.raw_update(U, Y, iters=2)

    rng.seed(31)
    b = dHMM(NormalInverseWishart.create((d,), batch_shape=(K,)), pdim,
             time_mesh=_mesh())
    b.raw_update(U, Y, iters=2)

    np.testing.assert_allclose(
        np.asarray(a.ELBO_save), np.asarray(b.ELBO_save), rtol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(a.p), np.asarray(b.p), atol=2e-5
    )


def test_time_sharded_hmm_indivisible_T():
    """Any T works on the mesh (VERDICT r3 item 3): indivisible T is padded
    with masked-identity rows. T=30 pads 2 rows on 8 devices; T=5 < D leaves
    three devices fully padded (the monoid-completion edge case)."""
    import pytest

    for T in (30, 13, 5):
        trans, init, obs = _problem(T=T)
        ref = forward_backward_parallel(trans, init, obs, lane_form=False)
        out = time_sharded_forward_backward(trans, init, obs, _mesh())
        names = ["p", "SEzz", "SEz0", "logZ"]
        for n, x, z in zip(names, ref, out):
            np.testing.assert_allclose(
                np.asarray(x), np.asarray(z), atol=5e-5,
                err_msg=f"{n} at T={T}",
            )


def test_time_sharded_kalman_indivisible_T():
    """Continuous-chain SP at indivisible T: the Gaussian-potential combine
    has no identity, so the pad rows ride the monoid completion."""
    from pyvbmp_tpu.models import LinearDynamicalSystems
    from pyvbmp_tpu.ops.parallel_kalman import parallel_kalman_smoother
    from pyvbmp_tpu.parallel.seq_parallel import time_sharded_kalman_smoother
    from pyvbmp_tpu.utils import rng

    for T in (21, 6):
        rng.seed(0)
        lds = LinearDynamicalSystems((3,), 2, 0, 0, parallel_scan=True,
                                     cross_cov_compat=False)
        y = jax.random.normal(jax.random.key(5), (T, 4, 3))
        yv, uv, rv = lds.reshape_inputs(y)
        parms = lds._latent_parms(lds.A)
        like = lds.log_likelihood_function(lds.obs_model, yv, rv)
        ref = parallel_kalman_smoother(parms, lds.x0, like, uv, lane_form=False)
        out = time_sharded_kalman_smoother(parms, lds.x0, like, uv, _mesh())
        for x, z in zip(jax.tree_util.tree_leaves(ref),
                        jax.tree_util.tree_leaves(out)):
            denom = float(jnp.abs(np.asarray(x)).max()) + 1e-30
            assert (
                float(jnp.abs(np.asarray(x) - np.asarray(z)).max()) / denom
                < 2e-5
            ), f"T={T}"


def test_dmbd_time_mesh_indivisible_T():
    """The flagship multi-chip feature must accept the north-star shapes
    (Flocking T=150, Lorenz T=399 — neither divides 8): model-level DMBD
    time_mesh at an indivisible T matches the resident-time path."""
    from pyvbmp_tpu.models import DynamicMarkovBlanketDiscovery
    from pyvbmp_tpu.utils import rng

    rs = np.random.RandomState(10)
    y = jnp.asarray(rs.randn(13, 4, 4, 2), jnp.float32)

    rng.seed(29)
    a = DynamicMarkovBlanketDiscovery(
        obs_shape=(4, 2), role_dims=(1, 1, 1), hidden_dims=(2, 1, 1),
        parallel_scan=True,
    )
    a.update(y, iters=2)

    rng.seed(29)
    b = DynamicMarkovBlanketDiscovery(
        obs_shape=(4, 2), role_dims=(1, 1, 1), hidden_dims=(2, 1, 1),
        time_mesh=_mesh(),
    )
    b.update(y, iters=2)

    np.testing.assert_allclose(
        np.asarray(a.ELBO_save), np.asarray(b.ELBO_save), rtol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(a.A.mu), np.asarray(b.A.mu), atol=2e-4
    )


@pytest.mark.slow
def test_dmbd_time_mesh_north_star_T150():
    """The actual Flocking north-star T: DMBD time_mesh at T=150 (pad 6 on
    8 devices) matches single-device. Slow-marked: full-length CPU fit."""
    from pyvbmp_tpu.models import DynamicMarkovBlanketDiscovery
    from pyvbmp_tpu.utils import rng

    rs = np.random.RandomState(10)
    y = jnp.asarray(rs.randn(150, 2, 4, 2), jnp.float32)

    rng.seed(29)
    a = DynamicMarkovBlanketDiscovery(
        obs_shape=(4, 2), role_dims=(1, 1, 1), hidden_dims=(2, 1, 1),
        parallel_scan=True,
    )
    a.update(y, iters=2)

    rng.seed(29)
    b = DynamicMarkovBlanketDiscovery(
        obs_shape=(4, 2), role_dims=(1, 1, 1), hidden_dims=(2, 1, 1),
        time_mesh=_mesh(),
    )
    b.update(y, iters=2)

    np.testing.assert_allclose(
        np.asarray(a.ELBO_save), np.asarray(b.ELBO_save), rtol=2e-4
    )


def test_lds_fit_with_time_mesh_matches_parallel_scan():
    """End-to-end: LinearDynamicalSystems(time_mesh=...) fits identically to
    the resident-time associative-scan path."""
    from pyvbmp_tpu.models import LinearDynamicalSystems
    from pyvbmp_tpu.utils import rng

    y = np.asarray(jax.random.normal(jax.random.key(6), (24, 4, 3)))
    y = jnp.asarray(y, jnp.float32)

    rng.seed(11)
    a = LinearDynamicalSystems((3,), 2, 0, 0, parallel_scan=True,
                               cross_cov_compat=False)
    a.update(y, iters=3)

    rng.seed(11)
    b = LinearDynamicalSystems((3,), 2, 0, 0, cross_cov_compat=False,
                               time_mesh=_mesh())
    b.update(y, iters=3)

    np.testing.assert_allclose(
        np.asarray(a.ELBO_save), np.asarray(b.ELBO_save), rtol=2e-5
    )
    np.testing.assert_allclose(np.asarray(a.A.mu), np.asarray(b.A.mu), atol=2e-4)


def test_time_sharded_fb_accepts_traced_ptemp():
    """ptemp rides as a runtime operand of the shard_map program — a traced
    value must work (the sibling forward_backward_parallel already falls
    through to its inline impl for traced ptemp)."""
    from jax.sharding import Mesh
    from pyvbmp_tpu.parallel.seq_parallel import time_sharded_forward_backward

    rs = np.random.RandomState(11)
    K, D = 3, 4
    trans = jnp.asarray(np.log(rs.dirichlet(np.ones(K), K)), jnp.float32)
    init = jnp.asarray(np.log(rs.dirichlet(np.ones(K))), jnp.float32)
    obs = jnp.asarray(rs.randn(4 * D, 2, K), jnp.float32)
    mesh = Mesh(np.asarray(jax.devices()[:D]), axis_names=("seq",))

    @jax.jit
    def run(pt):
        return time_sharded_forward_backward(trans, init, obs, mesh, ptemp=pt)

    p1, *_ = run(1.0)
    p2, *_ = run(2.0)  # same compiled program, different runtime ptemp
    assert np.isfinite(np.asarray(p1)).all() and np.isfinite(np.asarray(p2)).all()
    assert not np.allclose(np.asarray(p1), np.asarray(p2))


def test_auto_batch_axis_falls_back_when_indivisible():
    """'auto' batch sharding on a 2D mesh must fall back to seq-only
    sharding when the batch doesn't divide the data axis, not crash
    (confirmed-crash review finding); an explicit batch_axis still raises."""
    import pytest
    from jax.sharding import Mesh
    from pyvbmp_tpu.dists import NormalInverseWishart
    from pyvbmp_tpu.models import HMM
    from pyvbmp_tpu.parallel.seq_parallel import time_sharded_forward_backward
    from pyvbmp_tpu.utils import rng

    rng.seed(0)
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2), ("seq", "data"))
    m = HMM(NormalInverseWishart.create((2,), batch_shape=(4,)), time_mesh=mesh)
    X = jnp.asarray(np.random.RandomState(0).randn(16, 3, 2), jnp.float32)  # batch=3
    m.update(X, iters=2)
    assert np.isfinite(np.asarray(m.ELBO_save)).all()

    rs = np.random.RandomState(1)
    K = 3
    trans = jnp.asarray(np.log(rs.dirichlet(np.ones(K), K)), jnp.float32)
    init = jnp.asarray(np.log(rs.dirichlet(np.ones(K))), jnp.float32)
    obs = jnp.asarray(rs.randn(16, 3, K), jnp.float32)
    with pytest.raises(ValueError, match="divisible"):
        time_sharded_forward_backward(trans, init, obs, mesh, batch_axis="data")


def test_time_sharded_driven_indivisible_T():
    """Driven (per-time transition) variant at indivisible T: the padded
    trans rows and the per-time SEzz slice must round-trip exactly."""
    from pyvbmp_tpu.ops.parallel_hmm import driven_forward_backward_parallel
    from pyvbmp_tpu.parallel.seq_parallel import (
        time_sharded_driven_forward_backward,
    )

    rs = np.random.RandomState(3)
    T, B, K = 13, 3, 4
    trans = jnp.asarray(
        np.log(rs.dirichlet(np.ones(K), (T, B, K))), jnp.float32
    )
    init = jnp.asarray(np.log(rs.dirichlet(np.ones(K))), jnp.float32)
    obs = jnp.asarray(rs.randn(T, B, K), jnp.float32)
    ref = driven_forward_backward_parallel(trans, init, obs, lane_form=False)
    out = time_sharded_driven_forward_backward(trans, init, obs, _mesh())
    for n, x, z in zip(["p", "SEzz", "SEz0", "logZ"], ref, out):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(z), atol=5e-5, err_msg=n
        )
