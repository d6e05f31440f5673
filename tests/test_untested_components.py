"""Coverage for the three components VERDICT r1 flagged as implemented-but-
untested: Factorial_HMM, MultivariateNormal (matrix layout), and the Pallas
weighted-outer scatter kernel."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyvbmp_tpu.dists.mvn_matrix_format import MultivariateNormal
from pyvbmp_tpu.models.tensor_hmm import Factorial_HMM
from pyvbmp_tpu.ops.weighted_scatter import (
    weighted_outer,
    weighted_outer_einsum,
)
from pyvbmp_tpu.utils import rng


# ------------------------------------------------------------- Factorial_HMM
def test_factorial_hmm_fit_and_transition_factorization():
    """Two independent binary chains with distinct Gaussian emissions.

    Checks (a) the VB-EM loop runs with a non-decreasing ELBO and (b) the
    M-step projection (reference models/Factorial_HMM.py:24-36) leaves the
    transition posterior in exactly factorized form: re-applying the
    projection is the identity on the updated alpha.
    """
    rng.seed(0)
    key = jax.random.key(0)
    T, B = 60, 8
    k1, k2, k3 = jax.random.split(key, 3)
    # two sticky independent binary chains
    def chain(k):
        def step(z, kt):
            flip = jax.random.bernoulli(kt, 0.1, z.shape)
            return jnp.where(flip, 1 - z, z), z
        _, zs = jax.lax.scan(step, jnp.zeros((B,), jnp.int32),
                             jax.random.split(k, T))
        return zs
    z1, z2 = chain(k1), chain(k2)
    means = jnp.asarray([[-2.0, -2.0], [2.0, 2.0]])
    y = (
        means[z1]
        + jnp.asarray([[0.0, -3.0], [0.0, 3.0]])[z2]
        + 0.3 * jax.random.normal(k3, (T, B, 2))
    )

    m = Factorial_HMM(2, (2,), (2,))
    m.update(y, iters=8)
    e = np.asarray(m.ELBO_save, dtype=np.float64)
    rel = np.diff(e) / np.abs(e[:-1])
    assert (rel[1:] > -1e-5).all(), e

    # the projection itself must implement the reference formula
    # alpha <- sum_i alpha.mean(marg_dims_i, keepdim) / num_factors
    from pyvbmp_tpu.utils.jaxutils import replace

    rs = np.random.RandomState(2)
    araw = rs.rand(2, 2, 2, 2).astype(np.float32) + 0.5
    proj = m._post_markov_update(replace(m.transition, alpha=jnp.asarray(araw)))
    expect = araw.mean(axis=(1, 3), keepdims=True) / 2 + araw.mean(
        axis=(0, 2), keepdims=True
    ) / 2
    np.testing.assert_allclose(
        np.asarray(proj.alpha), np.broadcast_to(expect, araw.shape), rtol=1e-6
    )

    # and the fitted transition posterior must carry the factorized structure:
    # alpha[i,j,k,l] = f(i,k) + g(j,l)  (additively separable across factors)
    a = np.asarray(m.transition.alpha)
    sep = a - a[:, :1, :, :1] - a[:1, :, :1, :] + a[:1, :1, :1, :1]
    np.testing.assert_allclose(sep, np.zeros_like(sep), atol=1e-4 * np.abs(a).max())


# ----------------------------------------------- MVN matrix layout (dists/)
def test_mvn_matrix_format_updates_and_elog_like():
    """ss_update / raw_update / Elog_like vs the reference formulas
    (reference dists/MultivariateNormal.py:70-112), hand-computed in numpy."""
    rng.seed(0)
    d, S, K = 3, 200, 2
    rs = np.random.RandomState(0)
    X = rs.randn(S, K, d).astype(np.float32)
    p = rs.rand(S, K).astype(np.float32)

    mvn = MultivariateNormal(
        mu=jnp.zeros((K, d)), Sigma=jnp.broadcast_to(jnp.eye(d), (K, d, d))
    )

    # raw_update without weights: moment matching over the sample axis
    up = mvn.raw_update(jnp.asarray(X))
    mu_np = X.mean(0)
    Sig_np = np.einsum("ski,skj->kij", X, X) / S - np.einsum(
        "ki,kj->kij", mu_np, mu_np
    )
    np.testing.assert_allclose(np.asarray(up.mean()), mu_np, rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(up.ESigma()), Sig_np, rtol=2e-4, atol=1e-5)

    # weighted raw_update
    upw = mvn.raw_update(jnp.asarray(X), p=jnp.asarray(p))
    n = p.sum(0)
    muw = np.einsum("sk,ski->ki", p, X) / n[:, None]
    Sigw = np.einsum("sk,ski,skj->kij", p, X, X) / n[:, None, None] - np.einsum(
        "ki,kj->kij", muw, muw
    )
    np.testing.assert_allclose(np.asarray(upw.mean()), muw, rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(upw.ESigma()), Sigw, rtol=2e-4, atol=1e-5)

    # Elog_like on the fitted node
    ll = np.asarray(upw.Elog_like(jnp.asarray(X)))
    iS = np.linalg.inv(Sigw)
    dd = X - muw
    ll_np = (
        -0.5 * np.einsum("ski,kij,skj->sk", dd, iS, dd)
        - 0.5 * d * np.log(2 * np.pi)
        + 0.5 * np.linalg.slogdet(iS)[1]
    )
    np.testing.assert_allclose(ll, ll_np, rtol=1e-4, atol=1e-4)

    # EXXT consistency
    np.testing.assert_allclose(
        np.asarray(upw.EXXT()),
        Sigw + np.einsum("ki,kj->kij", muw, muw),
        rtol=2e-4,
        atol=1e-5,
    )


# --------------------------------------------------- Pallas weighted scatter
@pytest.mark.parametrize("S,p,K", [(512, 8, 3), (1024, 33, 5)])
def test_weighted_outer_pallas_interpret_matches_einsum(S, p, K):
    """The Pallas kernel (interpret mode on CPU) must agree with the einsum
    formulation it replaces on TPU (SURVEY §7 kernel priority #1)."""
    rs = np.random.RandomState(1)
    X = jnp.asarray(rs.randn(S, p).astype(np.float32))
    W = jnp.asarray(rs.rand(S, K).astype(np.float32))
    ref = weighted_outer_einsum(X, W)
    out = weighted_outer(X, W, force="pallas", interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


# --------------------------------------------------- DMBD introspection plots
def test_dmbd_plot_observation_and_transition(tmp_path):
    """plot_observation / plot_transition render labeled heatmaps headlessly
    (reference DynamicMarkovBlanketDiscovery.py:344-415)."""
    from pyvbmp_tpu.models import DynamicMarkovBlanketDiscovery

    rng.seed(0)
    m = DynamicMarkovBlanketDiscovery(
        obs_shape=(3, 2), role_dims=(1, 2, 1), hidden_dims=(2, 2, 2),
        number_of_objects=2,
    )
    paths = {
        "obs": tmp_path / "obs.png",
        "trans": tmp_path / "trans.png",
        "transmask": tmp_path / "tmask.png",
        "A": tmp_path / "A.png",
        "Amask": tmp_path / "Amask.png",
    }
    m.plot_observation(path=str(paths["obs"]))
    m.plot_transition(type="obs", path=str(paths["trans"]))
    m.plot_transition(type="obs", use_mask=True, path=str(paths["transmask"]))
    m.plot_transition(type="latent", path=str(paths["A"]))
    m.plot_transition(type="latent", use_mask=True, path=str(paths["Amask"]))
    for p in paths.values():
        assert p.exists() and p.stat().st_size > 1000, p


# ------------------------------------------------------------------ dMixture
def test_dmixture_directed_mixture_recovery():
    """dMixture (reference transforms/dMixture.py, self-flagged 'Untested'):
    MNLR gate p(z|x) + arbitrary batched dist over y.  A 3-component task
    where the component is determined by x-region must be recovered: ELBO
    non-decreasing, assignments match the generator up to permutation."""
    from pyvbmp_tpu.dists import NormalInverseWishart
    from pyvbmp_tpu.transforms.dmixture import dMixture
    from pyvbmp_tpu.utils.jaxutils import replace

    rng.seed(0)
    rs = np.random.RandomState(0)
    n, K, d = 600, 3, 2
    z = rs.randint(0, K, n)
    centers_x = np.asarray([[-4.0, 0.0], [4.0, 0.0], [0.0, 4.0]])
    mus_y = np.asarray([[-3.0, -3.0], [3.0, 3.0], [3.0, -3.0]])
    X = jnp.asarray((centers_x[z] + 0.5 * rs.randn(n, 2)).astype(np.float32))
    Y = jnp.asarray((mus_y[z] + 0.3 * rs.randn(n, d)).astype(np.float32))

    dist = NormalInverseWishart.create(event_shape=(d,), batch_shape=(K,))
    # seed means with data points (the GMM initialize() trick)
    dist = replace(dist, mu=Y[jnp.asarray([0, 1, 2])])
    m = dMixture(dist, p=2)
    m.raw_update(X, Y, iters=15, lr=1.0)

    e = np.asarray(m.ELBO_save, dtype=np.float64)
    rel = np.diff(e) / np.abs(e[:-1])
    assert (rel[2:] > -1e-5).all(), e

    # assignment accuracy up to label permutation
    pred = np.asarray(m.assignment())
    acc = 0.0
    for k in range(K):
        lab = np.bincount(pred[z == k], minlength=K).argmax()
        acc += (pred[z == k] == lab).sum()
    assert acc / n > 0.9, acc / n

    # the gate must actually be input-dependent: predictions at the three
    # x-centers pick three distinct components
    gate = np.asarray(m.pi.predict(jnp.asarray(centers_x, jnp.float32)))
    assert len(set(gate.argmax(-1))) == K, gate

    # Elog_like / event_average surfaces run and are finite
    assert np.isfinite(np.asarray(m.Elog_like(X, Y))).all()
    assert np.isfinite(np.asarray(m.means())).all()


# ------------------------------------------- LDS p-weighted update threading
def test_lds_update_p_threading():
    """update(y, p=...) must thread p into the M-step exactly like the
    reference's p-weighted ss_update (LinearDynamicalSystems.py:86-104).
    Oracle: the reference-API path (update_latents + ss_update(p) +
    obs_model.ss_update) that MixLDS already exercises and that hit 1.8e-15
    parity."""
    from pyvbmp_tpu.models import LinearDynamicalSystems

    rng.seed(0)
    rs = np.random.RandomState(3)
    T, b, obs, h = 16, 5, 3, 2
    y = jnp.asarray(rs.randn(T, b, obs).astype(np.float32))
    p = jnp.asarray(rs.rand(b).astype(np.float32))

    key = jax.random.key(7)
    m1 = LinearDynamicalSystems((obs,), h, key=key)
    m2 = LinearDynamicalSystems((obs,), h, key=key)

    # threaded path
    m1.update(y, p=p, iters=1)

    # manual reference-API path
    y2, u2, r2 = m2.reshape_inputs(y)
    m2.update_latents(y2, u2, r2)
    m2.ss_update(p=p)
    m2.obs_model = m2.obs_model.ss_update(
        m2._ss["SE_xr_xr"], m2._ss["SE_y_xr"], m2._ss["SE_y_y"], m2._ss["T"], 1.0
    )

    for a, c in [(m1.x0, m2.x0), (m1.A, m2.A), (m1.obs_model, m2.obs_model)]:
        for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(c)):
            np.testing.assert_allclose(
                np.asarray(la), np.asarray(lb), rtol=2e-5, atol=1e-6
            )

    # and a p of ones must match the unweighted update
    m3 = LinearDynamicalSystems((obs,), h, key=key)
    m4 = LinearDynamicalSystems((obs,), h, key=key)
    m3.update(y, p=jnp.ones((b,), jnp.float32), iters=2)
    m4.update(y, iters=2)
    for la, lb in zip(jax.tree.leaves(m3.A), jax.tree.leaves(m4.A)):
        np.testing.assert_allclose(
            np.asarray(la), np.asarray(lb), rtol=2e-5, atol=1e-6
        )


# -------------------------------------------- smallmat Schur recursion (h>=4)
@pytest.mark.parametrize("h", [4, 5, 6, 8])
def test_smallmat_sym_inv_logdet_schur_branch(h):
    """The lane smoothers' straight-line symmetric inverse above the
    closed-form h<=3 adjugates (the Schur split) vs numpy, eagerly — this is
    the branch production DMBD (h=6) runs on TPU."""
    from pyvbmp_tpu.ops import smallmat as sm

    rs = np.random.RandomState(h)
    B = 5
    A = rs.randn(B, h, h).astype(np.float64)
    A = A @ A.transpose(0, 2, 1) + h * np.eye(h)
    comp = {k: jnp.asarray(v) for k, v in sm.sym_pack(jnp.asarray(A)).items()}
    inv_c, ld = sm.sym_inv_and_logdet(h, comp)
    inv = np.asarray(sm.sym_unpack(inv_c, h))
    # jnp arrays are f32 here (x64 off in the default gate)
    np.testing.assert_allclose(inv, np.linalg.inv(A), rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(
        np.asarray(ld), np.linalg.slogdet(A)[1], rtol=2e-6
    )


# ------------------------------------------------- MXU precision dispatch
def test_mxu_precision_knob(monkeypatch):
    """PYVBMP_MXU_PRECISION maps to the three lax.Precision levels and the
    MXU contraction helpers still match the broadcast-reduce form under each
    (on CPU every level is exact f32, so this checks dispatch + wiring)."""
    import jax
    from pyvbmp_tpu.utils import jaxutils as ju

    rs = np.random.RandomState(0)
    X = jnp.asarray(rs.randn(50, 1, 4).astype(np.float32))
    pv = jnp.asarray(rs.rand(50, 3, 1).astype(np.float32))
    want = {
        "highest": jax.lax.Precision.HIGHEST,
        "high": jax.lax.Precision.HIGH,
        "default": jax.lax.Precision.DEFAULT,
    }
    for name, level in want.items():
        monkeypatch.setenv("PYVBMP_MXU_PRECISION", name)
        assert ju.mxu_precision() == level
        SExx, SEx, N = ju.centered_scatter(X, pv, (0,))
        ref = (pv[..., None] * X[..., :, None] * X[..., None, :]).sum(0)
        np.testing.assert_allclose(np.asarray(SExx), np.asarray(ref), rtol=1e-5, atol=1e-5)
    monkeypatch.delenv("PYVBMP_MXU_PRECISION")
    assert ju.mxu_precision() == jax.lax.Precision.HIGHEST


# ----------------------------------------- PSD solve/logdet Schur dispatch
@pytest.mark.parametrize("d", [4, 5, 16, 33])
def test_psd_solve_logdet_schur_dispatch(d, monkeypatch):
    """psd_solve / psd_logdet / psd_solve_and_logdet under the forced Schur
    dispatch (PYVBMP_PSD_INV=<int> engages it even on CPU) must match their
    Cholesky forms — this is the branch every per-iteration message/M-step
    solve runs on accelerator backends.  Odd dims exercise uneven splits."""
    from pyvbmp_tpu.utils import linalg as la

    rs = np.random.RandomState(d)
    A = rs.randn(3, d, d)
    A = (A @ A.transpose(0, 2, 1) + d * np.eye(d)).astype(np.float32)
    B = rs.randn(3, d, 2).astype(np.float32)
    Aj, Bj = jnp.asarray(A), jnp.asarray(B)

    # Pin the baseline leg to the Cholesky path explicitly: 'auto' (unset)
    # is backend-dependent (0 on CPU, 128 on accelerators), so relying on
    # delenv would break this test — and silently change X0's meaning — if
    # the suite ever ran on an accelerator host (ADVICE r4).
    monkeypatch.setenv("PYVBMP_PSD_INV", "0")
    assert la._schur_inv_n_max() == 0  # forced: Cholesky everywhere
    X0 = np.asarray(la.psd_solve(Aj, Bj))
    ld0 = np.asarray(la.psd_logdet(Aj))

    monkeypatch.setenv("PYVBMP_PSD_INV", "128")
    assert la._schur_inv_n_max() == 128
    X1 = np.asarray(la.psd_solve(Aj, Bj))
    ld1 = np.asarray(la.psd_logdet(Aj))
    X2, ld2 = la.psd_solve_and_logdet(Aj, Bj)

    np.testing.assert_allclose(X1, X0, rtol=3e-4, atol=3e-5)
    np.testing.assert_allclose(np.asarray(X2), X0, rtol=3e-4, atol=3e-5)
    np.testing.assert_allclose(ld1, np.linalg.slogdet(A.astype(np.float64))[1],
                               rtol=3e-6)
    np.testing.assert_allclose(np.asarray(ld2), ld1, rtol=1e-6)


# ----------------------------------------------------- jit memo lifecycle
def test_clear_jit_memos_releases_smoother_programs():
    """config.clear_jit_memos drops every memoized jitted smoother program
    (ADVICE r4: unbounded lru_caches keyed on env-knob state leak one
    executable per knob combo in tuning sweeps)."""
    import jax.numpy as jnp

    from pyvbmp_tpu.config import clear_jit_memos
    from pyvbmp_tpu.ops import chunked_scan, pallas_scan, parallel_hmm, parallel_kalman
    from pyvbmp_tpu.ops.parallel_hmm import forward_backward_parallel
    from pyvbmp_tpu.parallel import seq_parallel

    mods = (chunked_scan, pallas_scan, parallel_hmm, parallel_kalman, seq_parallel)

    def total_cached():
        n = 0
        for mod in mods:
            for obj in vars(mod).values():
                if callable(obj) and hasattr(obj, "cache_info"):
                    n += obj.cache_info().currsize
        return n

    clear_jit_memos()
    assert total_cached() == 0
    # populate at least one memoized program
    T, K = 6, 3
    logits = jnp.zeros((T, 2, K))
    trans = jnp.log(jnp.full((K, K), 1.0 / K))
    init = jnp.log(jnp.full((K,), 1.0 / K))
    forward_backward_parallel(trans, init, logits)
    assert total_cached() > 0
    clear_jit_memos()
    assert total_cached() == 0


# -------------------------------------------- DMBD multi-object default gate
def test_dmbd_three_objects_monotone_elbo():
    """The flagship's n_object_mask path (reference
    DynamicMarkovBlanketDiscovery.py:223-275) fitted at number_of_objects=3:
    ELBO non-decreasing across coordinate-ascent sweeps (VERDICT r4 item 2 —
    this path previously had only a plotting smoke test)."""
    import jax.numpy as jnp

    from pyvbmp_tpu.models import DynamicMarkovBlanketDiscovery

    rng.seed(0)
    rs = np.random.RandomState(0)
    T, B, n_obs, obs_dim = 25, 3, 6, 2
    y = jnp.asarray(np.cumsum(rs.randn(T, B, n_obs, obs_dim), 0) * 0.1)
    m = DynamicMarkovBlanketDiscovery(
        obs_shape=(n_obs, obs_dim), role_dims=(1, 1, 1), hidden_dims=(1, 1, 1),
        number_of_objects=3,
    )
    m.update(y, iters=6)
    e = np.asarray(m.ELBO_save, np.float64)
    rel = np.diff(e) / np.abs(e[:-1])
    # DMBD's ELBO is approximate (reference announces it); allow tiny wobble
    assert (rel[1:] > -1e-3).all(), e
    assert e[-1] > e[0]
