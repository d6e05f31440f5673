"""Chunked (block) scan equivalence: ops/chunked_scan.py vs
jax.lax.associative_scan, standalone and through the smoother entry points.

The chunked scan replaces the associative scan's ~2 log2 T launch levels
with {in-chunk lax.scan + tiny cross-chunk scan + one batched combine}; it
must be numerically a reassociation only.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyvbmp_tpu.models import LinearDynamicalSystems
from pyvbmp_tpu.ops import chunked_scan as cs
from pyvbmp_tpu.ops.chunked_scan import chunked_scan
from pyvbmp_tpu.utils import rng


@pytest.mark.parametrize("T", [5, 17, 64, 100])
@pytest.mark.parametrize("reverse", [False, True])
def test_matmul_semiring_equivalence(T, reverse):
    rs = np.random.RandomState(0)
    M = jnp.asarray(
        rs.randn(T, 3, 2, 2) * 0.2 + np.eye(2) * 0.7, jnp.float32
    )
    op = lambda a, b: a @ b  # non-commutative
    ref = jax.lax.associative_scan(op, M, axis=0, reverse=reverse)
    got = chunked_scan(op, M, reverse=reverse)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=2e-5)


def test_pytree_and_swapped_operand_reverse():
    """The smoothers' suffix pattern: pytree elements, combine(b, a)."""
    rs = np.random.RandomState(1)
    T = 70
    tree = (
        jnp.asarray(rs.randn(T, 2, 3, 3) * 0.2 + np.eye(3) * 0.6, jnp.float32),
        jnp.asarray(rs.randn(T, 2), jnp.float32),
    )
    op = lambda a, b: (b[0] @ a[0], a[1] + b[1])
    ref = jax.lax.associative_scan(op, tree, axis=0, reverse=True)
    got = chunked_scan(op, tree, reverse=True)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(r), np.asarray(g), atol=2e-5)


def _kalman_once(T=96, h=2, plane=False, lane=False):
    rng.seed(0)
    lds = LinearDynamicalSystems((3,), h, 0, 0, parallel_scan=True)
    y = jax.random.normal(jax.random.key(2), (T, 4, 3))
    yv, uv, rv = lds.reshape_inputs(y)
    parms = lds._latent_parms(lds.A)
    like = lds.log_likelihood_function(lds.obs_model, yv, rv)
    from pyvbmp_tpu.ops.parallel_kalman import parallel_kalman_smoother

    return jax.jit(
        lambda: parallel_kalman_smoother(
            parms, lds.x0, like, uv, lane_form=lane, plane_form=plane
        )
    )()


@pytest.mark.parametrize("plane", [False, True])
def test_kalman_smoother_chunked_equals_level_scan(plane, monkeypatch):
    """Force the chunked path at T=96 (production default only engages in
    the long-context regime) and compare against the pure associative scan."""
    monkeypatch.setattr(cs, "CHUNKED_SCAN_MIN_T", 1)
    a = _kalman_once(plane=plane)
    monkeypatch.setattr(cs, "CHUNKED_SCAN_MIN_T", 10_000)
    b = _kalman_once(plane=plane)
    for x, z in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        denom = float(jnp.abs(x).max()) + 1e-30
        assert float(jnp.abs(x - z).max()) / denom < 3e-5


def _hmm_once(T=96, K=3, plane=False):
    from pyvbmp_tpu.ops.parallel_hmm import forward_backward_parallel

    rs = np.random.RandomState(3)
    trans = jnp.asarray(np.log(rs.dirichlet(np.ones(K), K)), jnp.float32)
    init = jnp.asarray(np.log(rs.dirichlet(np.ones(K))), jnp.float32)
    obs = jnp.asarray(rs.randn(T, 4, K), jnp.float32)
    return jax.jit(
        lambda: forward_backward_parallel(
            trans, init, obs, lane_form=False, plane_form=plane
        )
    )()


@pytest.mark.parametrize("plane", [False, True])
def test_hmm_forward_backward_chunked_equals_level_scan(plane, monkeypatch):
    monkeypatch.setattr(cs, "CHUNKED_SCAN_MIN_T", 1)
    a = _hmm_once(plane=plane)
    monkeypatch.setattr(cs, "CHUNKED_SCAN_MIN_T", 10_000)
    b = _hmm_once(plane=plane)
    for x, z in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(z), atol=3e-5)


def test_bf16_scan_storage_close_to_f32(monkeypatch):
    """Opt-in mixed-precision scan storage (PYVBMP_SCAN_ELEM_DTYPE=bfloat16):
    combine computes f32, levels stored bf16, logw always f32. Bound the
    drift: logZ within 1e-3 relative, marginals within a few percent.
    (Measured on the chip: 1.44x on MixLDS b=4000, ELBO drift 6.5e-4.)"""
    import pyvbmp_tpu.ops.parallel_kalman as pk

    a = _kalman_once(h=4, plane=True)
    monkeypatch.setattr(pk, "SCAN_ELEM_DTYPE", "bfloat16")
    b = _kalman_once(h=4, plane=True)
    logZ_a, logZ_b = np.asarray(a[-1]), np.asarray(b[-1])
    assert np.abs(logZ_a - logZ_b).max() / np.abs(logZ_a).max() < 1e-3
    for x, z in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        denom = float(jnp.abs(x).max()) + 1e-30
        assert float(jnp.abs(x - z).max()) / denom < 5e-2
        assert np.isfinite(np.asarray(z)).all()


def test_kalman_lane_form_chunked_equals_level_scan(monkeypatch):
    """The lane form's dict/list element pytrees through the chunked scan's
    (L, C) leading-dim machinery (h<=3 is the lane production range)."""
    monkeypatch.setattr(cs, "CHUNKED_SCAN_MIN_T", 1)
    a = _kalman_once(h=2, plane=False, lane=True)
    monkeypatch.setattr(cs, "CHUNKED_SCAN_MIN_T", 10_000)
    b = _kalman_once(h=2, plane=False, lane=True)
    for x, z in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        denom = float(jnp.abs(x).max()) + 1e-30
        assert float(jnp.abs(x - z).max()) / denom < 3e-5


def test_bf16_storage_through_chunked_scan(monkeypatch):
    """bf16 level storage combined with the chunked path (the production
    long-context combination: T >= 4096 engages chunked, bf16 is the speed
    knob on top)."""
    import pyvbmp_tpu.ops.parallel_kalman as pk

    monkeypatch.setattr(cs, "CHUNKED_SCAN_MIN_T", 1)
    a = _kalman_once(h=4, plane=True)
    monkeypatch.setattr(pk, "SCAN_ELEM_DTYPE", "bfloat16")
    b = _kalman_once(h=4, plane=True)
    logZ_a, logZ_b = np.asarray(a[-1]), np.asarray(b[-1])
    assert np.abs(logZ_a - logZ_b).max() / np.abs(logZ_a).max() < 1e-3
    for x, z in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        assert np.isfinite(np.asarray(z)).all()
        denom = float(jnp.abs(x).max()) + 1e-30
        assert float(jnp.abs(x - z).max()) / denom < 5e-2


def test_seq_parallel_local_chunked_scan(monkeypatch):
    """sharded_associative_scan's per-device local scan routes through
    auto_scan: force the chunked path inside shard_map and check the
    time-sharded HMM still matches the single-device smoother."""
    from jax.sharding import Mesh
    from pyvbmp_tpu.ops.parallel_hmm import forward_backward_parallel
    from pyvbmp_tpu.parallel.seq_parallel import time_sharded_forward_backward

    monkeypatch.setattr(cs, "CHUNKED_SCAN_MIN_T", 1)
    rs = np.random.RandomState(5)
    K, D = 3, 4
    trans = jnp.asarray(np.log(rs.dirichlet(np.ones(K), K)), jnp.float32)
    init = jnp.asarray(np.log(rs.dirichlet(np.ones(K))), jnp.float32)
    obs = jnp.asarray(rs.randn(16 * D, 3, K), jnp.float32)
    mesh = Mesh(np.asarray(jax.devices()[:D]), axis_names=("seq",))
    sp = time_sharded_forward_backward(trans, init, obs, mesh)
    ref = forward_backward_parallel(trans, init, obs)
    for a, b in zip(ref, sp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_fat_row_bytes_trigger_routes_to_chunked(monkeypatch):
    """The row-bytes dispatch (VERDICT r4 item 4: the h>32 dense cliff):
    fat element rows route through chunked_scan even at short T, and the
    result matches the level scan.  Checked by counting chunked_scan
    invocations under a tiny forced threshold."""
    calls = {"n": 0}
    real = cs.chunked_scan

    def counting(combine, elems, *args, **kwargs):
        calls["n"] += 1
        return real(combine, elems, *args, **kwargs)

    # level-scan baseline: both triggers off
    monkeypatch.setattr(cs, "CHUNKED_SCAN_MIN_T", 10_000)
    monkeypatch.setattr(cs, "CHUNKED_SCAN_MIN_ROW_BYTES", 0)
    a = _kalman_once(plane=False)

    # bytes trigger on (any nonempty row qualifies), T-trigger still off
    monkeypatch.setattr(cs, "chunked_scan", counting)
    monkeypatch.setattr(cs, "CHUNKED_SCAN_MIN_ROW_BYTES", 1)
    b = _kalman_once(plane=False)
    assert calls["n"] > 0
    for x, z in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        denom = float(jnp.abs(x).max()) + 1e-30
        assert float(jnp.abs(x - z).max()) / denom < 3e-5

    # thin rows at default threshold stay on the level scan
    calls["n"] = 0
    monkeypatch.setattr(cs, "CHUNKED_SCAN_MIN_ROW_BYTES", 512 * 1024)
    _kalman_once(plane=False)
    assert calls["n"] == 0
