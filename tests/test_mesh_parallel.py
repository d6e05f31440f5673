"""Data-parallel mesh sharding (SURVEY §2.8/§5.8): shard the trajectory batch
over an 8-virtual-device CPU mesh (conftest) and check the sharded VB update
matches the single-device one — XLA's inserted collectives must be exact."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pyvbmp_tpu.parallel.api import data_parallel_update, make_mesh, shard_batch
from pyvbmp_tpu.utils import rng


def test_make_mesh_uses_virtual_devices():
    assert len(jax.devices()) == 8
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_sharded_lds_matches_single_device():
    from pyvbmp_tpu.models import LinearDynamicalSystems

    rs = np.random.RandomState(0)
    y = jnp.asarray(rs.randn(20, 16, 4), jnp.float32)

    rng.seed(7)
    a = LinearDynamicalSystems(obs_shape=(4,), hidden_dim=2)
    a.update(y, iters=1)

    rng.seed(7)
    b = LinearDynamicalSystems(obs_shape=(4,), hidden_dim=2)
    data_parallel_update(b, y, mesh=make_mesh(), iters=1)

    np.testing.assert_allclose(
        np.asarray(a.ELBO_save), np.asarray(b.ELBO_save), rtol=2e-5
    )
    np.testing.assert_allclose(np.asarray(a.A.mu), np.asarray(b.A.mu), atol=2e-5)


def test_sharded_dmbd_matches_single_device():
    from pyvbmp_tpu.models import DynamicMarkovBlanketDiscovery

    rs = np.random.RandomState(1)
    y = jnp.asarray(rs.randn(10, 8, 4, 2), jnp.float32)

    rng.seed(3)
    a = DynamicMarkovBlanketDiscovery(
        obs_shape=(4, 2), role_dims=(1, 1, 1), hidden_dims=(2, 1, 1)
    )
    a.update(y, iters=2)

    rng.seed(3)
    b = DynamicMarkovBlanketDiscovery(
        obs_shape=(4, 2), role_dims=(1, 1, 1), hidden_dims=(2, 1, 1)
    )
    data_parallel_update(b, y, mesh=make_mesh(), iters=2)

    np.testing.assert_allclose(
        np.asarray(a.ELBO_save), np.asarray(b.ELBO_save), rtol=2e-4
    )


def test_shard_batch_places_on_axis():
    mesh = make_mesh()
    x = jnp.zeros((4, 16, 3))
    xs = shard_batch(mesh, x, batch_axis=1)
    # the batch axis is split: each device holds 16/8 = 2 rows
    shard_shapes = {s.data.shape for s in xs.addressable_shards}
    assert shard_shapes == {(4, 2, 3)}


def test_sharded_hmm_matches_single_device():
    """The data_parallel_update fallback branch (no reshape_inputs): HMM with
    (T, batch, d) data sharded on the batch axis."""
    from pyvbmp_tpu.dists import NormalInverseWishart
    from pyvbmp_tpu.models import HMM

    rs = np.random.RandomState(4)
    X = jnp.asarray(rs.randn(30, 16, 3), jnp.float32)

    rng.seed(11)
    a = HMM(NormalInverseWishart.create((3,), batch_shape=(4,)))
    a.update(X, iters=3)

    rng.seed(11)
    b = HMM(NormalInverseWishart.create((3,), batch_shape=(4,)))
    data_parallel_update(b, X, mesh=make_mesh(), iters=3)

    np.testing.assert_allclose(
        np.asarray(a.ELBO_save), np.asarray(b.ELBO_save), rtol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(a.transition.alpha), np.asarray(b.transition.alpha), rtol=2e-4
    )


def test_sharded_gmm_matches_single_device():
    """Fallback branch with sample-major data: GMM (n, d) sharded on axis 0."""
    from pyvbmp_tpu.models import GaussianMixtureModel

    rs = np.random.RandomState(5)
    X = jnp.asarray(
        np.concatenate(
            [rs.randn(80, 2) + c for c in ([-3, 0], [3, 0], [0, 3])], 0
        ),
        jnp.float32,
    )

    rng.seed(13)
    a = GaussianMixtureModel(3, 2)
    a.update(X, iters=4)

    rng.seed(13)
    b = GaussianMixtureModel(3, 2)
    data_parallel_update(b, X, mesh=make_mesh(), iters=4, batch_axis=0)

    np.testing.assert_allclose(
        np.asarray(a.ELBO_save), np.asarray(b.ELBO_save), rtol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(a.dist.mu), np.asarray(b.dist.mu), atol=2e-4
    )


def test_sharded_mixlds_matches_single_device():
    from pyvbmp_tpu.models import MixtureofLinearDynamicalSystems

    rs = np.random.RandomState(2)
    y = jnp.asarray(rs.randn(20, 16, 3), jnp.float32)

    rng.seed(5)
    a = MixtureofLinearDynamicalSystems(2, (3,), 2, 0, 0)
    a.update(y, iters=2)

    rng.seed(5)
    b = MixtureofLinearDynamicalSystems(2, (3,), 2, 0, 0)
    yb = shard_batch(make_mesh(), y, 1)
    b.update(yb, iters=2)

    np.testing.assert_allclose(
        np.asarray(a.ELBO_save), np.asarray(b.ELBO_save), rtol=2e-5
    )


def test_dmbd_dp_collective_footprint_is_param_sized():
    """Inspect the compiled HLO of the data-parallel DMBD sweep on the
    8-virtual-device mesh: the ONLY collectives must be all-reduces whose
    total operand size is O(natural params) — independent of the batch
    size — making the 'suff-stat psum' claim (SURVEY §5.8) checkable
    instead of assumed (VERDICT r4 item 7).  Also guards the round-5 fix
    where brole_avg's row-flattening reshape forced an O(T*batch)
    all-gather into every sweep."""
    import re

    from pyvbmp_tpu.models import DynamicMarkovBlanketDiscovery
    from pyvbmp_tpu.models.dmbd import _shard_like_batch

    def collective_elems(B):
        rng.seed(3)
        rs = np.random.RandomState(1)
        y = jnp.asarray(rs.randn(10, B, 4, 2), jnp.float32)
        m = DynamicMarkovBlanketDiscovery(
            obs_shape=(4, 2), role_dims=(1, 1, 1), hidden_dims=(2, 1, 1)
        )
        mesh = make_mesh()
        yv, uv, rv = m.reshape_inputs(y)
        yv = shard_batch(mesh, yv, 1)
        px0 = m._init_px(rv)
        px_tuple = tuple(
            _shard_like_batch(a, yv)
            for a in (px0.mu, px0.Sigma, px0.invSigmamu, px0.invSigma)
        )
        p0 = _shard_like_batch(
            jnp.ones(yv.shape[:-2] + (m.role_dim,), yv.dtype) / m.role_dim, yv
        )
        fn = jax.jit(m._dmbd_multi, static_argnames=("latent_iters", "iters"))
        txt = fn.lower(
            m.x0, m.A, m.obs_model.transition, m.obs_model.initial,
            m.obs_model.obs_dist, px_tuple, p0, yv, uv, rv, 1.0, 1, 1,
        ).compile().as_text()
        out = {}
        for kind in ("all-reduce", "all-gather", "reduce-scatter",
                     "collective-permute", "all-to-all"):
            shapes = re.findall(r"= ((?:\([^)]*\)|\S+)) %s\(" % kind, txt)
            elems = 0
            for s in shapes:
                for st in re.findall(r"f32\[([0-9,]*)\]", s):
                    n = 1
                    for dd in st.split(","):
                        if dd:
                            n *= int(dd)
                    elems += n
            out[kind] = elems
        return out

    small = collective_elems(8)
    big = collective_elems(64)
    # suff-stat reductions exist and are identical at 8x the batch
    assert small["all-reduce"] > 0
    assert big["all-reduce"] == small["all-reduce"], (small, big)
    # nothing data-sized crosses the mesh: no gathers/scatters at all, and
    # the all-reduce total is well under one trajectory's element count
    for kind in ("all-gather", "reduce-scatter", "collective-permute",
                 "all-to-all"):
        assert big[kind] == 0, (kind, big)
    assert big["all-reduce"] < 10 * 64 * 8  # << T*B*obs elements
