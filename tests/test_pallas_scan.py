"""Correctness of the fused single-pass Pallas scan (ops/pallas_scan.py)
against jax.lax.associative_scan, in interpreter mode on CPU (the kernel
itself is exercised compiled on the TPU chip by the benchmarks).

Covers: ragged T (not a multiple of the chunk), ragged N (not a multiple
of 128), reverse scans, multi-leaf pytrees with distinct mid dims, and the
REAL smoother semigroups (lane Kalman combine, plane log-matmul-exp)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pyvbmp_tpu.ops import pallas_scan
from pyvbmp_tpu.ops.pallas_scan import eligible, pallas_chunked_scan


@pytest.fixture(autouse=True)
def _small_chunk(monkeypatch):
    """Shrink the time-chunk so multi-chunk + ragged-tail branches are
    covered at a fraction of the interpret-mode cost (cost ~ N_tiles * T;
    branch coverage only needs C > 1 and T % L != 0, not the prod sizes)."""
    monkeypatch.setattr(pallas_scan, "PALLAS_SCAN_CHUNK", 8)


def _add(a, b):
    return {k: a[k] + b[k] for k in a}


@pytest.mark.parametrize("T,N", [(7, 100), (16, 130), (20, 300)])
@pytest.mark.parametrize("reverse", [False, True])
def test_matches_associative_scan_add(T, N, reverse):
    rs = np.random.RandomState(0)
    elems = {
        "x": jnp.asarray(rs.randn(T, N), jnp.float32),
        "m": jnp.asarray(rs.randn(T, 3, 2, N), jnp.float32),
    }
    ref = jax.lax.associative_scan(_add, elems, axis=0, reverse=reverse)
    out = pallas_chunked_scan(_add, elems, reverse=reverse, interpret=True)
    for k in elems:
        np.testing.assert_allclose(
            np.asarray(ref[k]), np.asarray(out[k]), rtol=5e-5, atol=5e-5
        )


def test_matches_on_plane_logmatmulexp():
    """The role-HMM semigroup in plane layout (T, K, K, N)."""
    from pyvbmp_tpu.ops.parallel_hmm import _logmatmul_plane

    rs = np.random.RandomState(1)
    M = jnp.asarray(np.log(rs.dirichlet(np.ones(4), (20, 4, 140))), jnp.float32)
    M = M.transpose(0, 2, 1, 3).reshape(20, 4, 4, 140)
    for rev in (False, True):
        fn = (lambda a, b: _logmatmul_plane(b, a)) if rev else _logmatmul_plane
        ref = jax.lax.associative_scan(fn, M, axis=0, reverse=rev)
        out = pallas_chunked_scan(fn, M, reverse=rev, interpret=True)
        np.testing.assert_allclose(
            np.asarray(ref), np.asarray(out), rtol=1e-4, atol=1e-4
        )


def test_matches_on_lane_kalman_combine():
    """The Gaussian-potential semigroup in lane component form — the
    MixLDS/LDS h<=3 hot path."""
    from pyvbmp_tpu.models import LinearDynamicalSystems
    from pyvbmp_tpu.ops import parallel_kalman as pk
    from pyvbmp_tpu.ops import smallmat as sm
    from pyvbmp_tpu.utils import rng

    rng.seed(0)
    lds = LinearDynamicalSystems((3,), 2, 0, 0, parallel_scan=True,
                                 cross_cov_compat=False)
    y = jax.random.normal(jax.random.key(5), (20, 37, 3))
    yv, uv, rv = lds.reshape_inputs(y)
    parms = lds._latent_parms(lds.A)
    like = lds.log_likelihood_function(lds.obs_model, yv, rv)
    elems, bshape, T, h = pk._build_elements(parms, lds.x0, like, uv)
    (Jaa_d, Jab_d, Jbb_d, ha_d, hb_d, logw_d) = elems
    N = int(np.prod(bshape[:-2]))
    flat = lambda x: x.reshape((T, N))
    lane = (
        {k: flat(v) for k, v in sm.sym_pack(Jaa_d).items()},
        {k: flat(v) for k, v in sm.gen_pack(Jab_d).items()},
        {k: flat(v) for k, v in sm.sym_pack(Jbb_d).items()},
        [flat(v) for v in sm.vec_pack(ha_d)],
        [flat(v) for v in sm.vec_pack(hb_d)],
        flat(logw_d),
    )
    # lane trees are excluded from AUTO dispatch (all-rank-2) but direct
    # pallas_chunked_scan calls must still handle them correctly
    assert not eligible(lane)
    combine = lambda a, b: pk._combine_lane(h, a, b)
    ref = jax.lax.associative_scan(combine, lane, axis=0)
    out = pallas_chunked_scan(combine, lane, interpret=True)
    for a, b in zip(jax.tree_util.tree_leaves(ref),
                    jax.tree_util.tree_leaves(out)):
        scale = np.abs(np.asarray(a)).max() + 1e-9
        assert np.abs(np.asarray(a) - np.asarray(b)).max() / scale < 2e-5


@pytest.mark.parametrize("reverse", [False, True])
def test_lane_fold_matches_associative_scan(reverse):
    """All-rank-2 pytrees with large 8-divisible N take the sublane-folded
    path ((T, N) -> (T, 8, N/8)); results must be identical to the unfolded
    semantics."""
    rs = np.random.RandomState(2)
    T, N = 20, 1152  # N % 8 == 0, N >= LANE_FOLD_MIN_N; N/8 = 144 ragged vs 128
    elems = {
        "m": jnp.asarray(rs.uniform(0.5, 1.5, (T, N)), jnp.float32),
        "v": jnp.asarray(rs.randn(T, N), jnp.float32),
    }
    assert eligible(elems)
    # composition of affine maps x -> m*x + v (a genuine semigroup)
    combine = lambda a, b: {"m": b["m"] * a["m"],
                            "v": b["m"] * a["v"] + b["v"]}
    ref = jax.lax.associative_scan(combine, elems, axis=0, reverse=reverse)
    out = pallas_chunked_scan(combine, elems, reverse=reverse, interpret=True)
    for k in elems:
        np.testing.assert_allclose(
            np.asarray(ref[k]), np.asarray(out[k]), rtol=5e-5, atol=5e-5
        )


def test_lane_fold_on_lane_kalman_combine():
    """The folded path on the REAL lane Kalman semigroup (MixLDS/LDS h<=3
    at large batch — the HBM-bound tail this path exists for)."""
    from pyvbmp_tpu.models import LinearDynamicalSystems
    from pyvbmp_tpu.ops import parallel_kalman as pk
    from pyvbmp_tpu.ops import smallmat as sm
    from pyvbmp_tpu.utils import rng

    rng.seed(0)
    lds = LinearDynamicalSystems((3,), 2, 0, 0, parallel_scan=True,
                                 cross_cov_compat=False)
    y = jax.random.normal(jax.random.key(7), (9, 1040, 3))
    yv, uv, rv = lds.reshape_inputs(y)
    parms = lds._latent_parms(lds.A)
    like = lds.log_likelihood_function(lds.obs_model, yv, rv)
    elems, bshape, T, h = pk._build_elements(parms, lds.x0, like, uv)
    (Jaa_d, Jab_d, Jbb_d, ha_d, hb_d, logw_d) = elems
    N = int(np.prod(bshape[:-2]))
    assert N % 8 == 0 and N >= 1024
    flat = lambda x: x.reshape((T, N))
    lane = (
        {k: flat(v) for k, v in sm.sym_pack(Jaa_d).items()},
        {k: flat(v) for k, v in sm.gen_pack(Jab_d).items()},
        {k: flat(v) for k, v in sm.sym_pack(Jbb_d).items()},
        [flat(v) for v in sm.vec_pack(ha_d)],
        [flat(v) for v in sm.vec_pack(hb_d)],
        flat(logw_d),
    )
    assert eligible(lane)
    combine = lambda a, b: pk._combine_lane(h, a, b)
    ref = jax.lax.associative_scan(combine, lane, axis=0)
    out = pallas_chunked_scan(combine, lane, interpret=True)
    for a, b in zip(jax.tree_util.tree_leaves(ref),
                    jax.tree_util.tree_leaves(out)):
        scale = np.abs(np.asarray(a)).max() + 1e-9
        assert np.abs(np.asarray(a) - np.asarray(b)).max() / scale < 2e-5


@pytest.mark.parametrize("T,N", [(20, 24), (37, 24)])  # exact and ragged folds
@pytest.mark.parametrize("reverse", [False, True])
def test_time_fold_matches_associative_scan_add(T, N, reverse, monkeypatch):
    """Small-N long-T trees take the time-folded path (time reshaped onto a
    vectorized chunk axis, carries fixed up in three phases)."""
    monkeypatch.setattr(pallas_scan, "TIME_FOLD", "auto")
    monkeypatch.setattr(pallas_scan, "TIME_FOLD_MIN_T", 8)
    rs = np.random.RandomState(4)
    elems = {
        "x": jnp.asarray(rs.randn(T, N), jnp.float32),
        "m": jnp.asarray(rs.randn(T, 3, 2, N), jnp.float32),
    }
    leaves = jax.tree_util.tree_leaves(elems)
    assert pallas_scan._time_fold_ok(leaves, T, N)
    ref = jax.lax.associative_scan(_add, elems, axis=0, reverse=reverse)
    out = pallas_chunked_scan(_add, elems, reverse=reverse, interpret=True)
    for k in elems:
        np.testing.assert_allclose(
            np.asarray(ref[k]), np.asarray(out[k]), rtol=5e-5, atol=5e-5
        )


def test_time_fold_on_plane_logmatmulexp(monkeypatch):
    """Time-folded path on the real role-HMM plane semigroup."""
    from pyvbmp_tpu.ops.parallel_hmm import _logmatmul_plane

    monkeypatch.setattr(pallas_scan, "TIME_FOLD", "auto")
    monkeypatch.setattr(pallas_scan, "TIME_FOLD_MIN_T", 8)
    rs = np.random.RandomState(5)
    T, K, N = 21, 4, 24
    M = jnp.asarray(np.log(rs.dirichlet(np.ones(K), (T, K, N))), jnp.float32)
    M = M.transpose(0, 2, 1, 3).reshape(T, K, K, N)
    assert pallas_scan._time_fold_ok([M], T, N)
    ref = jax.lax.associative_scan(_logmatmul_plane, M, axis=0)
    out = pallas_chunked_scan(_logmatmul_plane, M, interpret=True)
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(out), rtol=1e-4, atol=1e-4
    )


def test_time_fold_on_plane_kalman_combine(monkeypatch):
    """Time-folded path on the real plane Kalman semigroup (the DMBD /
    Flocking latency-bound regime this path exists for)."""
    from pyvbmp_tpu.ops import parallel_kalman as pk

    monkeypatch.setattr(pallas_scan, "TIME_FOLD", "auto")
    monkeypatch.setattr(pallas_scan, "TIME_FOLD_MIN_T", 8)
    rs = np.random.RandomState(6)
    T, h, N = 19, 4, 16
    A = rs.randn(T, N, h, h) * 0.3
    spd = lambda: jnp.asarray(
        (np.einsum("tnij,tnkj->tnik", A, A) + 2.0 * np.eye(h)).transpose(
            0, 2, 3, 1
        ),
        jnp.float32,
    )
    elems = (
        spd(),
        jnp.asarray((rs.randn(T, N, h, h) * 0.2).transpose(0, 2, 3, 1),
                    jnp.float32),
        spd(),
        jnp.asarray(rs.randn(T, h, N), jnp.float32),
        jnp.asarray(rs.randn(T, h, N), jnp.float32),
        jnp.asarray(rs.randn(T, N), jnp.float32),
    )
    ref = jax.lax.associative_scan(pk._combine_plane, elems, axis=0)
    out = pallas_chunked_scan(pk._combine_plane, elems, interpret=True)
    for a, b in zip(jax.tree_util.tree_leaves(ref),
                    jax.tree_util.tree_leaves(out)):
        scale = np.abs(np.asarray(a)).max() + 1e-9
        assert np.abs(np.asarray(a) - np.asarray(b)).max() / scale < 5e-5


def test_plan_exact_budget_shrinks_not_bails(monkeypatch):
    """A row set whose 4*L*per_row lands exactly on the VMEM budget must
    shrink L once more (for the carry row), not return None (regression:
    plane rows at N=40 hit 4*16*64KiB == budget and fell back)."""
    monkeypatch.setattr(pallas_scan, "PALLAS_SCAN_CHUNK", 32)
    budget = pallas_scan.VMEM_BUDGET_BYTES
    # per_row == budget/64 makes 4*16*per_row == budget exactly
    per_row_target = budget // 64
    N = 128  # n_tile == N so per_row == elem_rows_bytes
    plan = pallas_scan._plan(19, N, per_row_target)
    assert plan is not None
    L, n_tile = plan
    assert 4 * L * per_row_target + per_row_target <= budget


def test_plan_n_tile_stays_128_multiple():
    """The VMEM-pressure shrink loop must keep the lane-dim tile a 128
    multiple — Mosaic rejects e.g. 192 at lowering time (review finding:
    384 -> 192 via plain halving; fat plane rows at N in [384, 511])."""
    budget = pallas_scan.VMEM_BUDGET_BYTES
    for N in (40, 128, 384, 400, 511, 512, 4096):
        for rb in (10_000, 300_000, 1_300_000, 6_000_000):
            plan = pallas_scan._plan(399, N, rb)
            if plan is None:
                continue
            L, n_tile = plan
            assert n_tile % 128 == 0, (N, rb, plan)
            per_row = rb * n_tile / N
            assert 4 * L * per_row + per_row <= budget, (N, rb, plan)


def test_plan_prefers_fewest_tiles_with_healthy_chunk():
    """TPU grids run sequentially, so every extra lane tile re-walks all T
    rows — but a wider tile must not starve the chunk length below
    PALLAS_SCAN_MIN_L (measured: MixLDS b=4000 NT=1 forces L=2 and loses
    16% vs NT=3 with L=8; DMBD b=400 NT=1 keeps L=8 and wins 10%)."""
    min_l = pallas_scan.PALLAS_SCAN_MIN_L

    # DMBD Lorenz plane h=6, b=400: one 512-lane tile fits at L=8
    L, n_tile = pallas_scan._plan(399, 400, 4 * 43 * 400)
    assert n_tile == 512 and L >= min_l  # NT = 1, the measured winner

    # MixLDS b=4000 lane-fold: NT=1 would collapse L to 2; the planner
    # must take the smallest split that restores L >= MIN_L
    L, n_tile = pallas_scan._plan(100, 2000, 4 * 8 * 2000 * 5)
    assert L >= min_l
    assert -(-2000 // n_tile) > 1  # split, not one starving mega-tile

    # when NO split achieves MIN_L, fall back to the longest-chunk plan
    # rather than None (fat rows: only the minimal tile at a short chunk
    # fits the VMEM budget)
    plan = pallas_scan._plan(64, 256, 600_000)
    assert plan is not None
    L, n_tile = plan
    assert L < min_l and n_tile == 128  # best feasible, not rejected
    per_row = 600_000 * n_tile / 256
    assert 4 * L * per_row + per_row <= pallas_scan.VMEM_BUDGET_BYTES

    # genuinely infeasible rows (even L=2 at the minimal tile overflows)
    # still return None
    assert pallas_scan._plan(64, 256, 6_000_000) is None


def test_fallback_short_chunk_plan_executes(monkeypatch):
    """When no lane-tile split keeps L >= PALLAS_SCAN_MIN_L, the planner
    falls back to the longest-chunk feasible plan instead of bailing to the
    level scan (round-4 planner); the kernel must still be exact on that
    plan.  Forced by shrinking the VMEM budget so these rows only fit at
    L=2 (< MIN_L) at the minimal 128-lane tile."""
    rs = np.random.RandomState(5)
    T, h, N = 13, 8, 128
    elems = {
        "m": jnp.asarray(rs.uniform(0.5, 1.5, (T, h, h, N)), jnp.float32),
        "v": jnp.asarray(rs.randn(T, h, h, N), jnp.float32),
    }
    rb = sum(
        4 * pallas_scan._leaf_mid_elems(l.shape) * N for l in elems.values()
    )
    monkeypatch.setattr(pallas_scan, "VMEM_BUDGET_BYTES", 4 * 2 * rb + rb + 64)
    plan = pallas_scan._plan(T, N, rb)
    assert plan is not None
    L, n_tile = plan
    assert L == 2 and L < pallas_scan.PALLAS_SCAN_MIN_L and n_tile == 128

    # composition of elementwise affine maps x -> m*x + v (a semigroup)
    combine = lambda a, b: {"m": b["m"] * a["m"],
                            "v": b["m"] * a["v"] + b["v"]}
    ref = jax.lax.associative_scan(combine, elems, axis=0)
    out = pallas_chunked_scan(combine, elems, interpret=True)
    for k in elems:
        np.testing.assert_allclose(
            np.asarray(ref[k]), np.asarray(out[k]), rtol=5e-5, atol=5e-5
        )


def test_swapped_combine_memoized():
    """swapped_combine must return the SAME callable for the same combine —
    the pallas build memo keys on combine identity, so a fresh wrapper per
    trace would never hit the cache (review finding)."""
    from pyvbmp_tpu.ops.chunked_scan import swapped_combine

    def f(a, b):
        return a + b

    g1, g2 = swapped_combine(f), swapped_combine(f)
    assert g1 is g2
    assert g1(jnp.ones(()), jnp.zeros(())) == f(jnp.zeros(()), jnp.ones(()))


def test_eligibility_gate():
    ok = {"a": jnp.zeros((10, 5, 256), jnp.float32)}
    assert eligible(ok)
    # mismatched trailing dim
    bad = {"a": jnp.zeros((10, 5, 256), jnp.float32),
           "b": jnp.zeros((10, 128), jnp.float32)}
    assert not eligible(bad)
    # wrong dtype
    assert not eligible({"a": jnp.zeros((10, 5, 256), jnp.bfloat16)})
    # rank-1 leaf
    assert not eligible({"a": jnp.zeros((10,), jnp.float32)})
    # small-N all-rank-2 (lane layout): excluded from auto dispatch (runs
    # at 1/8 VPU width; level/chunked scans measured faster on chip)
    assert not eligible({"a": jnp.zeros((10, 256), jnp.float32)})
    # large 8-divisible N: lane layouts fold onto the sublanes -> eligible
    assert eligible({"a": jnp.zeros((10, 1024), jnp.float32)})
    # large but not 8-divisible: can't reshape, stays excluded
    assert not eligible({"a": jnp.zeros((10, 1028), jnp.float32)})
