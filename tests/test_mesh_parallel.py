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
