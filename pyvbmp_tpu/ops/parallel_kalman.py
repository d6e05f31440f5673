"""Parallel (associative-scan) Kalman filter + RTS smoother.

TPU-native replacement for the O(T)-depth sequential information filter: the
Markov chain of quadratic potentials is composed with
``jax.lax.associative_scan`` (prefix and suffix), giving O(log T) depth — the
continuous-chain analogue of context parallelism (SURVEY.md §5.7; cf. the
parallel square-root filtering literature, PAPERS.md).

Elements are unnormalized Gaussian pairwise potentials over (x_left, x_right):

    phi(a, b) = exp(-1/2 a'Jaa a - a'Jab b - 1/2 b'Jbb b + ha'a + hb'b + logw)

The binary operation marginalizes the shared middle variable — associative by
Fubini — so prefix products give filtered potentials, suffix products give
backward messages, and marginals/cross-covariances/logZ come out in closed
form.  Potentials are built to match the reference LDS bookkeeping exactly
(models/LinearDynamicalSystems.py:244-330), so the *total* logZ agrees with
the sequential path; only float association order differs.

Two data layouts:

- **lane form** (default for h <= PYVBMP_LANE_KALMAN_MAX_H, see ops.smallmat):
  every h x h matrix is split into per-component (T, N) arrays with the
  flattened batch N on the TPU lanes; the combine is straight-line
  elementwise code. Dense (..., h, h) layout puts the tiny matrix dims on
  the (8, 128) memory tile — measured ~60x off the bandwidth bound.
- **dense form** (large h fallback): batched (..., h, h) ops.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from ..utils import math as um
from ..utils.linalg import (
    mT,
    sym_inv,
    sym_inv_and_logdet,
    sym_solve_and_logdet,
)
from . import smallmat as sm
from .chunked_scan import auto_scan, swapped_combine as _swapped_combine

# Layout dispatch, measured on the v5e chip (round 3, PARITY.md):
#   h <= 3: lane form (closed-form adjugates; tied or ahead of plane at h=2
#           on the MixLDS north star: 303-350 lane vs 303 plane it/s)
#   3 < h <= 32: plane form (ops/planemat.py) — beats lane 157 vs 125 it/s
#           at h=6 (DMBD-Lorenz Kalman leg) and 236-260 vs 166 at h=8, and
#           is the only fast path at h=14 (Flocking: 85 vs 15.6 dense)
#   h > 32: dense fallback
LANE_KALMAN_MAX_H = int(os.environ.get("PYVBMP_LANE_KALMAN_MAX_H", "3"))
PLANE_KALMAN_MAX_H = int(os.environ.get("PYVBMP_PLANE_KALMAN_MAX_H", "32"))

# Opt-in mixed-precision scan storage ("bfloat16"): the combine computes in
# f32 but stores each scan level's J-matrices and h-vectors in bf16, halving
# the smoother's HBM level traffic — for the large-batch HBM-bound regime.
# The logw channel always stays f32: its magnitude grows like O(T) and a
# 0.4% bf16 relative error there would corrupt logZ/ELBO absolutely.
SCAN_ELEM_DTYPE = os.environ.get("PYVBMP_SCAN_ELEM_DTYPE", "float32")

# Dual-direction scan: at small flattened batch N the scans are
# latency-bound (the Pallas kernel walks T combines sequentially on lane
# tiles that are mostly empty — flocking: N=20 of 128 lanes), so the prefix
# and suffix chains are stacked along the lanes and run as ONE scan using
# the semigroup transpose identity tau(e1 o e2) = tau(e2) o tau(e1)
# (tau swaps the a/b slots and transposes Jab): the flipped-transposed
# chain's forward prefixes ARE the suffixes, transposed.  Above
# DUAL_SCAN_MAX_N the stack spills into extra lane tiles and the win
# disappears (2N > 128), so the gate defaults to 64.
DUAL_SCAN = os.environ.get("PYVBMP_DUAL_SCAN", "auto")
DUAL_SCAN_MAX_N = int(os.environ.get("PYVBMP_DUAL_SCAN_MAX_N", "64"))


def _dual_scan_enabled(n):
    if DUAL_SCAN == "0":
        return False
    if DUAL_SCAN == "1":
        return True
    return n <= DUAL_SCAN_MAX_N


def _quantize_elems(elems, dtype):
    """Cast the J/h element leaves (positions 0-4) to ``dtype``; keep logw."""
    cast = lambda t: jax.tree_util.tree_map(lambda x: x.astype(dtype), t)
    return tuple(cast(e) for e in elems[:5]) + (elems[5],)


def _dequantize_elems(elems):
    up = lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float32), t
    )
    return tuple(up(e) for e in elems[:5]) + (elems[5],)


@functools.lru_cache(maxsize=None)
def _mixed_precision_combine(combine, dtype):
    """Upcast operands to f32, combine, store the result back in ``dtype``
    (logw stays f32 throughout). Memoized for the same identity reason as
    ``_swapped_combine``."""

    def f(a, b):
        out = combine(_dequantize_elems(a), _dequantize_elems(b))
        return _quantize_elems(out, dtype)

    return f


def _scan_pair(combine, elems, transpose=None, batch_n=None):
    """Prefix + suffix scans of the pairwise-potential chain, optionally with
    bf16 level storage (SCAN_ELEM_DTYPE). Returns f32 potentials.

    When the layout provides a semigroup ``transpose`` (tau with
    tau(e1 o e2) = tau(e2) o tau(e1)) and the flattened batch ``batch_n``
    is small (see DUAL_SCAN), both directions ride ONE scan: stack
    [elems, flip_T(tau(elems))] along the lanes, scan forward once, and
    un-transpose the second half — suffix_t = tau(fwd_{T-1-t}).  Per-lane
    arithmetic is identical to the two separate scans."""
    dtype = SCAN_ELEM_DTYPE
    if (
        transpose is not None
        and batch_n is not None
        and _dual_scan_enabled(batch_n)
    ):
        tmap = jax.tree_util.tree_map
        flip = lambda t: tmap(lambda x: jnp.flip(x, 0), t)
        stacked = tmap(
            lambda a, b: jnp.concatenate([a, b], -1),
            elems,
            flip(transpose(elems)),
        )
        if dtype == "float32":
            both = auto_scan(combine, stacked)
        else:
            dt = jnp.dtype(dtype)
            both = _dequantize_elems(
                auto_scan(
                    _mixed_precision_combine(combine, dt),
                    _quantize_elems(stacked, dt),
                )
            )
        take = lambda sl: tmap(lambda x: x[..., sl], both)
        prefix = take(slice(None, batch_n))
        suffix = transpose(flip(take(slice(batch_n, None))))
        return prefix, suffix
    if dtype == "float32":
        prefix = auto_scan(combine, elems)
        suffix = auto_scan(_swapped_combine(combine), elems, reverse=True)
        return prefix, suffix
    dt = jnp.dtype(dtype)
    q = _quantize_elems(elems, dt)
    cmb = _mixed_precision_combine(combine, dt)
    prefix = auto_scan(cmb, q)
    suffix = auto_scan(_swapped_combine(cmb), q, reverse=True)
    return _dequantize_elems(prefix), _dequantize_elems(suffix)


def element_batch_shape(parms, like):
    """Shape-only companion to ``_build_elements``: the broadcast batch
    shape of the (T,)+bshape pairwise-potential elements and the hidden
    dim.  Kept here so sharding-decision code (parallel/seq_parallel.py)
    and the element builder can never desynchronize on the broadcast
    rule.  parms may be time-varying (leading T axis): only trailing
    batch+(h,h) dims participate."""
    invQ = parms["invQ"]
    nb = like[0].ndim - 1
    bshape = jnp.broadcast_shapes(
        invQ.shape[max(0, invQ.ndim - nb):], like[0].shape[1:]
    )
    return bshape, invQ.shape[-1]


def _build_elements(parms, x0, like, u):
    """Dense pairwise potentials (Jaa, Jab, Jbb, ha, hb, logw), broadcast to
    (T,) + bshape, with the x_{-1} prior folded into element 0 (the
    reference's x0 carry, LinearDynamicalSystems.py:350-356)."""
    iS_like, iSm_like, Res_like = like
    T = iS_like.shape[0]
    invQ = parms["invQ"]
    bshape, hdim = element_batch_shape(parms, like)

    def bcast(x, shape):
        return jnp.broadcast_to(x, (T,) + shape)

    Jaa = bcast(parms["ATQA_x_x"], bshape)
    Jab = bcast(-mT(parms["QA_xp_x"]), bshape)
    Jbb = bcast(invQ, bshape) + iS_like
    ha = jnp.broadcast_to(
        -parms["ATQA_x_u"] @ u, (T,) + bshape[:-1] + (1,)
    )
    hb = jnp.broadcast_to(
        iSm_like + parms["QA_xp_u"] @ u, (T,) + bshape[:-1] + (1,)
    )
    logw = (
        Res_like
        - 0.5 * (mT(u) @ parms["ATQA_u_u"] @ u)[..., 0, 0]
        + 0.5 * parms["ElogdetinvQ"]
        - 0.5 * hdim * um.LOG2PI
    )
    logw = jnp.broadcast_to(logw, (T,) + bshape[:-2])

    J0 = x0.EinvSigma()
    h0 = x0.EinvSigmamu()[..., None]
    R0 = (
        -0.5 * x0.EXTinvUX()
        + 0.5 * x0.ElogdetinvSigma()
        - 0.5 * hdim * um.LOG2PI
    )
    Jaa = Jaa.at[0].add(J0)
    ha = ha.at[0].add(jnp.broadcast_to(h0, ha.shape[1:]))
    logw = logw.at[0].add(jnp.broadcast_to(R0, logw.shape[1:]))
    return (Jaa, Jab, Jbb, ha, hb, logw), bshape, T, hdim


# =========================================================== dense layout path
def _combine(e1, e2):
    """Marginalize the middle variable of two adjacent pairwise potentials."""
    J1aa, J1ab, J1bb, h1a, h1b, w1 = e1
    J2aa, J2ab, J2bb, h2a, h2b, w2 = e2
    h = J1bb.shape[-1]
    M = J1bb + J2aa
    hmid = h1b + h2a
    # one symmetric straight-line solve against the stacked right-hand sides
    rhs = jnp.concatenate([mT(J1ab), J2ab, hmid], -1)
    sol, logdetM = sym_solve_and_logdet(M, rhs)
    Minv_J1abT = sol[..., :h]
    Minv_J2ab = sol[..., h : 2 * h]
    Minv_h = sol[..., 2 * h :]
    Jaa = J1aa - J1ab @ Minv_J1abT
    Jbb = J2bb - mT(J2ab) @ Minv_J2ab
    Jab = -J1ab @ Minv_J2ab
    ha = h1a - J1ab @ Minv_h
    hb = h2b - mT(J2ab) @ Minv_h
    w = (
        w1
        + w2
        + 0.5 * (hmid * Minv_h).sum((-1, -2))
        - 0.5 * logdetM
        + 0.5 * h * um.LOG2PI
    )
    return (Jaa, Jab, Jbb, ha, hb, w)


def _marginalize_left(Jaa, Jab, Jbb, ha, hb, w):
    """Integrate out the a-side -> potential over b."""
    h = Jaa.shape[-1]
    rhs = jnp.concatenate([Jab, ha], -1)
    sol, logdetA = sym_solve_and_logdet(Jaa, rhs)
    Ainv_Jab = sol[..., :h]
    Ainv_ha = sol[..., h:]
    J = Jbb - mT(Jab) @ Ainv_Jab
    hv = hb - mT(Jab) @ Ainv_ha
    logc = w + 0.5 * (ha * Ainv_ha).sum((-1, -2)) - 0.5 * logdetA + 0.5 * h * um.LOG2PI
    return J, hv, logc


def _marginalize_right(Jaa, Jab, Jbb, ha, hb, w):
    h = Jbb.shape[-1]
    rhs = jnp.concatenate([mT(Jab), hb], -1)
    sol, logdetD = sym_solve_and_logdet(Jbb, rhs)
    Dinv_JabT = sol[..., :h]
    Dinv_hb = sol[..., h:]
    J = Jaa - Jab @ Dinv_JabT
    hv = ha - Jab @ Dinv_hb
    logc = w + 0.5 * (hb * Dinv_hb).sum((-1, -2)) - 0.5 * logdetD + 0.5 * h * um.LOG2PI
    return J, hv, logc


def _dense_smoother(elems, bshape, T, hdim):
    (Jaa, Jab, Jbb, ha, hb, logw) = elems
    # reverse=True passes operands as (later, earlier); _scan_pair flips to
    # keep chain order so the marginalized middle variable is the shared one
    prefix, suffix = _scan_pair(_combine, elems)

    # filtered potentials alpha_t over x_t (marginalize the x_{-1} side)
    Ja, hva, logca = jax.vmap(lambda e: _marginalize_left(*e))(prefix)
    # backward messages: S_{t} marginal over its right side gives a potential
    # on x_{t-1}; beta for time t comes from suffix element t+1
    Jb_all, hvb_all, _ = jax.vmap(lambda e: _marginalize_right(*e))(suffix)
    zeroJ = jnp.zeros_like(Jb_all[:1])
    zeroh = jnp.zeros_like(hvb_all[:1])
    Jbeta = jnp.concatenate([Jb_all[1:], zeroJ], 0)  # beta_t from S_{t+1}
    hbeta = jnp.concatenate([hvb_all[1:], zeroh], 0)

    # smoothed marginals
    Js = Ja + Jbeta
    hs = hva + hbeta
    Sigma, _ld = sym_inv_and_logdet(Js)
    mu = Sigma @ hs

    # prior-side marginal q(x_{-1}) (prior folded into element 0)
    Sigma_x0_x0 = sym_inv(Jb_all[0])
    mu_x0 = Sigma_x0_x0 @ hvb_all[0]

    # pairwise cross-covariances Sigma_{t-1,t} (including x_{-1}..x_0 at t=0)
    Jalpha_prev = jnp.concatenate([jnp.zeros_like(Ja[:1]), Ja[:-1]], 0)
    A = Jalpha_prev + Jaa
    B = Jab
    D = Jbb + Jbeta
    Ainv_B = sym_inv(A) @ B
    Sbb = sym_inv(D - mT(B) @ Ainv_B)
    Sigma_cross_all = -Ainv_B @ Sbb  # (T,) Sigma_{t-1,t}
    Sigma_x0_cross = Sigma_cross_all[0]
    Sigma_cross = Sigma_cross_all[1:]

    # total logZ from the last filtered potential
    sol, logdetJ = sym_solve_and_logdet(Ja[-1], hva[-1])
    logZ_total = (
        logca[-1]
        + 0.5 * (hva[-1] * sol).sum((-1, -2))
        - 0.5 * logdetJ
        + 0.5 * hdim * um.LOG2PI
    )
    return (Sigma, mu, Js, hs), Sigma_cross, Sigma_x0_cross, Sigma_x0_x0, mu_x0, logZ_total


# ============================================================ lane layout path
def _combine_lane(h, e1, e2):
    """_combine in component form: straight-line elementwise ops only."""
    J1aa, J1ab, J1bb, h1a, h1b, w1 = e1
    J2aa, J2ab, J2bb, h2a, h2b, w2 = e2
    M = sm.sym_add(J1bb, J2aa)
    hmid = [a + b for a, b in zip(h1b, h2a)]
    Minv, logdetM = sm.sym_inv_and_logdet(h, M)
    Minv_J1abT = sm.mm(h, Minv, J1ab, sym_a=True, t_b=True)
    Minv_J2ab = sm.mm(h, Minv, J2ab, sym_a=True)
    Minv_h = sm.mv(h, Minv, hmid, sym_a=True)
    J1ab_Minv_J1abT = sm.mm(h, J1ab, Minv_J1abT, sym_out=True)
    Jaa = sm.sym_sub(J1aa, J1ab_Minv_J1abT)
    J2abT_Minv_J2ab = sm.mm(h, J2ab, Minv_J2ab, t_a=True, sym_out=True)
    Jbb = sm.sym_sub(J2bb, J2abT_Minv_J2ab)
    J1ab_Minv_J2ab = sm.mm(h, J1ab, Minv_J2ab)
    Jab = {k: -v for k, v in J1ab_Minv_J2ab.items()}
    ha = [a - b for a, b in zip(h1a, sm.mv(h, J1ab, Minv_h))]
    hb = [a - b for a, b in zip(h2b, sm.mv(h, J2ab, Minv_h, t_a=True))]
    w = (
        w1
        + w2
        + 0.5 * sm.vdot(hmid, Minv_h)
        - 0.5 * logdetM
        + 0.5 * h * um.LOG2PI
    )
    return (Jaa, Jab, Jbb, ha, hb, w)


def _marginalize_left_lane(h, e):
    Jaa, Jab, Jbb, ha, hb, w = e
    Ainv, logdetA = sm.sym_inv_and_logdet(h, Jaa)
    Ainv_Jab = sm.mm(h, Ainv, Jab, sym_a=True)
    Ainv_ha = sm.mv(h, Ainv, ha, sym_a=True)
    J = sm.sym_sub(Jbb, sm.mm(h, Jab, Ainv_Jab, t_a=True, sym_out=True))
    hv = [a - b for a, b in zip(hb, sm.mv(h, Jab, Ainv_ha, t_a=True))]
    logc = w + 0.5 * sm.vdot(ha, Ainv_ha) - 0.5 * logdetA + 0.5 * h * um.LOG2PI
    return J, hv, logc


def _marginalize_right_lane(h, e):
    Jaa, Jab, Jbb, ha, hb, w = e
    Dinv, logdetD = sm.sym_inv_and_logdet(h, Jbb)
    Dinv_JabT = sm.mm(h, Dinv, Jab, sym_a=True, t_b=True)
    Dinv_hb = sm.mv(h, Dinv, hb, sym_a=True)
    J = sm.sym_sub(Jaa, sm.mm(h, Jab, Dinv_JabT, sym_out=True))
    hv = [a - b for a, b in zip(ha, sm.mv(h, Jab, Dinv_hb))]
    logc = w + 0.5 * sm.vdot(hb, Dinv_hb) - 0.5 * logdetD + 0.5 * h * um.LOG2PI
    return J, hv, logc


def _shift_up(x, T):
    """x[t] <- x[t+1], zero-filled at t=T-1 (per component leaf)."""
    return jax.tree.map(
        lambda a: jnp.concatenate([a[1:], jnp.zeros_like(a[:1])], 0), x
    )


def _lane_smoother(elems, bshape, T, h):
    (Jaa_d, Jab_d, Jbb_d, ha_d, hb_d, logw_d) = elems
    N = 1
    for s in bshape[:-2]:
        N *= s

    def flat(x):
        return x.reshape((T, N))

    # pack into component form, flattened batch on the lanes
    Jaa = {k: flat(v) for k, v in sm.sym_pack(Jaa_d).items()}
    Jbb = {k: flat(v) for k, v in sm.sym_pack(Jbb_d).items()}
    Jab = {k: flat(v) for k, v in sm.gen_pack(Jab_d).items()}
    ha = [flat(v) for v in sm.vec_pack(ha_d)]
    hb = [flat(v) for v in sm.vec_pack(hb_d)]
    logw = flat(logw_d)
    elems_l = (Jaa, Jab, Jbb, ha, hb, logw)

    prefix, suffix = _scan_pair(
        lambda a, b: _combine_lane(h, a, b), elems_l
    )

    Ja, hva, logca = _marginalize_left_lane(h, prefix)
    Jb_all, hvb_all, _ = _marginalize_right_lane(h, suffix)
    Jbeta = _shift_up(Jb_all, T)
    hbeta = _shift_up(hvb_all, T)

    # smoothed marginals
    Js = sm.sym_add(Ja, Jbeta)
    hs = [a + b for a, b in zip(hva, hbeta)]
    Sigma, _ld = sm.sym_inv_and_logdet(h, Js)
    mu = sm.mv(h, Sigma, hs, sym_a=True)

    # prior-side marginal q(x_{-1})
    Jb0 = {k: v[0] for k, v in Jb_all.items()}
    hvb0 = [v[0] for v in hvb_all]
    Sigma_x0_x0, _ = sm.sym_inv_and_logdet(h, Jb0)
    mu_x0 = sm.mv(h, Sigma_x0_x0, hvb0, sym_a=True)

    # pairwise cross-covariances Sigma_{t-1,t}
    Jalpha_prev = jax.tree.map(
        lambda a: jnp.concatenate([jnp.zeros_like(a[:1]), a[:-1]], 0), Ja
    )
    A = sm.sym_add(Jalpha_prev, Jaa)
    D = sm.sym_add(Jbb, Jbeta)
    Ainv, _ = sm.sym_inv_and_logdet(h, A)
    Ainv_B = sm.mm(h, Ainv, Jab, sym_a=True)
    BT_Ainv_B = sm.mm(h, Jab, Ainv_B, t_a=True, sym_out=True)
    Sbb, _ = sm.sym_inv_and_logdet(h, sm.sym_sub(D, BT_Ainv_B))
    Sigma_cross_all = sm.mm(h, Ainv_B, Sbb, sym_b=True)
    Sigma_cross_all = {k: -v for k, v in Sigma_cross_all.items()}

    # total logZ from the last filtered potential
    Ja_last = {k: v[-1] for k, v in Ja.items()}
    hva_last = [v[-1] for v in hva]
    JaInv, logdetJ = sm.sym_inv_and_logdet(h, Ja_last)
    sol = sm.mv(h, JaInv, hva_last, sym_a=True)
    logZ_total = (
        logca[-1]
        + 0.5 * sm.vdot(hva_last, sol)
        - 0.5 * logdetJ
        + 0.5 * h * um.LOG2PI
    )

    # unpack back to dense (T,)+bshape layout
    def unflat_t(x, trail):
        return x.reshape((T,) + bshape[:-2] + trail)

    def unflat(x, trail):
        return x.reshape(bshape[:-2] + trail)

    Sigma_d = unflat_t(sm.sym_unpack(Sigma, h), (h, h))
    mu_d = unflat_t(sm.vec_unpack(mu), (h, 1))
    Js_d = unflat_t(sm.sym_unpack(Js, h), (h, h))
    hs_d = unflat_t(sm.vec_unpack(hs), (h, 1))
    Sigma_cross_d = unflat_t(sm.gen_unpack(Sigma_cross_all, h), (h, h))
    Sigma_x0_cross = Sigma_cross_d[0]
    Sigma_cross = Sigma_cross_d[1:]
    Sigma_x0_x0_d = unflat(sm.sym_unpack(Sigma_x0_x0, h), (h, h))
    mu_x0_d = unflat(sm.vec_unpack(mu_x0), (h, 1))
    logZ_d = logZ_total.reshape(bshape[:-2])
    return (
        (Sigma_d, mu_d, Js_d, hs_d),
        Sigma_cross,
        Sigma_x0_cross,
        Sigma_x0_x0_d,
        mu_x0_d,
        logZ_d,
    )


# ============================================================ plane layout path
def _combine_plane(e1, e2):
    """_combine in plane layout (ops/planemat.py): O(1) HLO ops per matmul,
    batch on the lanes — the h > LANE_KALMAN_MAX_H fast path."""
    from . import planemat as pm

    J1aa, J1ab, J1bb, h1a, h1b, w1 = e1
    J2aa, J2ab, J2bb, h2a, h2b, w2 = e2
    h = J1bb.shape[-2]
    M = J1bb + J2aa
    hmid = h1b + h2a
    Minv, logdetM = pm.bsym_inv_and_logdet(M)
    Minv_J1abT = pm.bmm(Minv, J1ab, t_b=True)
    Minv_J2ab = pm.bmm(Minv, J2ab)
    Minv_h = pm.bmv(Minv, hmid)
    Jaa = J1aa - pm.bmm(J1ab, Minv_J1abT)
    Jbb = J2bb - pm.bmm(J2ab, Minv_J2ab, t_a=True)
    Jab = -pm.bmm(J1ab, Minv_J2ab)
    ha = h1a - pm.bmv(J1ab, Minv_h)
    hb = h2b - pm.bmv(J2ab, Minv_h, t_a=True)
    w = (
        w1
        + w2
        + 0.5 * pm.bvdot(hmid, Minv_h)
        - 0.5 * logdetM
        + 0.5 * h * um.LOG2PI
    )
    return (Jaa, Jab, Jbb, ha, hb, w)


def _marginalize_left_plane(e):
    from . import planemat as pm

    Jaa, Jab, Jbb, ha, hb, w = e
    h = Jaa.shape[-2]
    Ainv, logdetA = pm.bsym_inv_and_logdet(Jaa)
    Ainv_Jab = pm.bmm(Ainv, Jab)
    Ainv_ha = pm.bmv(Ainv, ha)
    J = Jbb - pm.bmm(Jab, Ainv_Jab, t_a=True)
    hv = hb - pm.bmv(Jab, Ainv_ha, t_a=True)
    logc = w + 0.5 * pm.bvdot(ha, Ainv_ha) - 0.5 * logdetA + 0.5 * h * um.LOG2PI
    return J, hv, logc


def _marginalize_right_plane(e):
    from . import planemat as pm

    Jaa, Jab, Jbb, ha, hb, w = e
    h = Jbb.shape[-2]
    Dinv, logdetD = pm.bsym_inv_and_logdet(Jbb)
    Dinv_JabT = pm.bmm(Dinv, Jab, t_b=True)
    Dinv_hb = pm.bmv(Dinv, hb)
    J = Jaa - pm.bmm(Jab, Dinv_JabT)
    hv = ha - pm.bmv(Jab, Dinv_hb)
    logc = w + 0.5 * pm.bvdot(hb, Dinv_hb) - 0.5 * logdetD + 0.5 * h * um.LOG2PI
    return J, hv, logc


def _transpose_plane(e):
    """Semigroup transpose tau for plane elements: swap the a/b slots and
    transpose the coupling — tau(e1 o e2) = tau(e2) o tau(e1) (check it
    against _combine_plane: M, hmid and w are symmetric under the swap)."""
    from . import planemat as pm

    Jaa, Jab, Jbb, ha, hb, w = e
    return (Jbb, pm.bT(Jab), Jaa, hb, ha, w)


def _plane_smoother(elems, bshape, T, h):
    from . import planemat as pm

    (Jaa_d, Jab_d, Jbb_d, ha_d, hb_d, logw_d) = elems
    N = 1
    for s in bshape[:-2]:
        N *= s

    Jaa = pm.pack(Jaa_d)
    Jab = pm.pack(Jab_d)
    Jbb = pm.pack(Jbb_d)
    ha = pm.pack_vec(ha_d)
    hb = pm.pack_vec(hb_d)
    logw = logw_d.reshape(T, N)
    elems_p = (Jaa, Jab, Jbb, ha, hb, logw)

    prefix, suffix = _scan_pair(
        _combine_plane, elems_p, transpose=_transpose_plane, batch_n=N
    )

    # ---- post-scan algebra in T-folded layout.  Everything below is
    # elementwise over (t, n), so T folds onto the lanes: the scan layout's
    # (w, N) minor tiles fill ~(h/8 x N/128) of the vreg — 14% at the
    # flocking shape (w=14, N=20) — while (h, w, N*T) planes run at full
    # width.  Measured: flocking post-scan 0.92 -> ~0.2 ms.
    def fold_m(a):  # (T, h, w, N) -> (h, w, N*T), T minor
        return a.transpose(1, 2, 3, 0).reshape(a.shape[1], a.shape[2], -1)

    def fold_v(a):  # (T, h, N) -> (h, N*T)
        return a.transpose(1, 2, 0).reshape(a.shape[1], -1)

    def fold_s(a):  # (T, N) -> (N*T,)
        return a.transpose(1, 0).reshape(-1)

    def fold_e(e):
        return tuple(
            f(x)
            for f, x in zip((fold_m, fold_m, fold_m, fold_v, fold_v, fold_s), e)
        )

    def tshift(a, up):
        """Shift the folded T axis: up=True drops t=0 and zero-fills the
        tail (a_t <- a_{t+1}); up=False prepends zeros (a_t <- a_{t-1})."""
        x = a.reshape(a.shape[:-1] + (N, T))
        z = jnp.zeros_like(x[..., :1])
        x = (
            jnp.concatenate([x[..., 1:], z], -1)
            if up
            else jnp.concatenate([z, x[..., :-1]], -1)
        )
        return x.reshape(a.shape)

    def tslice(a, t):
        return a.reshape(a.shape[:-1] + (N, T))[..., t]

    pf = fold_e(prefix)
    sf = fold_e(suffix)
    Jaa_f, Jab_f, Jbb_f = fold_m(Jaa), fold_m(Jab), fold_m(Jbb)

    Ja, hva, logca = _marginalize_left_plane(pf)
    Jb_all, hvb_all, _ = _marginalize_right_plane(sf)

    Jbeta = tshift(Jb_all, up=True)
    hbeta = tshift(hvb_all, up=True)

    # smoothed marginals
    Js = Ja + Jbeta
    hs = hva + hbeta
    Sigma, _ld = pm.bsym_inv_and_logdet(Js)
    mu = pm.bmv(Sigma, hs)

    # prior-side marginal q(x_{-1})
    Sigma_x0_x0, _ = pm.bsym_inv_and_logdet(tslice(Jb_all, 0))
    mu_x0 = pm.bmv(Sigma_x0_x0, tslice(hvb_all, 0))

    # pairwise cross-covariances Sigma_{t-1,t}
    Jalpha_prev = tshift(Ja, up=False)
    A = Jalpha_prev + Jaa_f
    D = Jbb_f + Jbeta
    Ainv, _ = pm.bsym_inv_and_logdet(A)
    Ainv_B = pm.bmm(Ainv, Jab_f)
    Sbb, _ = pm.bsym_inv_and_logdet(pm.bsym(D - pm.bmm(Jab_f, Ainv_B, t_a=True)))
    Sigma_cross_all = -pm.bmm(Ainv_B, Sbb)

    # total logZ from the last filtered potential
    JaInv, logdetJ = pm.bsym_inv_and_logdet(tslice(Ja, T - 1))
    hvaT = tslice(hva, T - 1)
    sol = pm.bmv(JaInv, hvaT)
    logZ_total = (
        tslice(logca, T - 1)
        + 0.5 * pm.bvdot(hvaT, sol)
        - 0.5 * logdetJ
        + 0.5 * h * um.LOG2PI
    )

    def unfold_m(a):  # (h, w, N*T) -> (T, h, w, N)
        return a.reshape(a.shape[0], a.shape[1], N, T).transpose(3, 0, 1, 2)

    def unfold_v(a):  # (h, N*T) -> (T, h, N)
        return a.reshape(a.shape[0], N, T).transpose(2, 0, 1)

    bout = bshape[:-2]
    Sigma_d = pm.unpack(unfold_m(Sigma), bout)
    mu_d = pm.unpack_vec(unfold_v(mu), bout)
    Js_d = pm.unpack(unfold_m(Js), bout)
    hs_d = pm.unpack_vec(unfold_v(hs), bout)
    Sigma_cross_d = pm.unpack(unfold_m(Sigma_cross_all), bout)
    Sigma_x0_cross = Sigma_cross_d[0]
    Sigma_cross = Sigma_cross_d[1:]
    Sigma_x0_x0_d = Sigma_x0_x0.transpose(2, 0, 1).reshape(
        tuple(bout) + (h, h)
    )
    mu_x0_d = mu_x0.transpose(1, 0).reshape(tuple(bout) + (h, 1))
    logZ_d = logZ_total.reshape(bout)
    return (
        (Sigma_d, mu_d, Js_d, hs_d),
        Sigma_cross,
        Sigma_x0_cross,
        Sigma_x0_x0_d,
        mu_x0_d,
        logZ_d,
    )


def parallel_kalman_smoother(parms, x0, like, u, lane_form=None, plane_form=None):
    """Drop-in replacement for the sequential forward_backward_loop
    (models/lds.py): returns (px_parts, Sigma_cross, Sigma_x0_cross,
    Sigma_x0_x0, mu_x0, logZ_total).

    parms: dict from LinearDynamicalSystems._latent_parms
    like:  (invSigma_like, invSigmamu_like, Residual_like), each (T,)+...
    u:     (T,)+...+(control,1)
    lane_form: force the component-layout path on/off (default: h-based).
    plane_form: force the stacked-plane layout on/off (default: h-based —
        picked for LANE_KALMAN_MAX_H < h <= PLANE_KALMAN_MAX_H).

    Called eagerly (outside any jit trace) this dispatches through a
    memoized jitted program — op-by-op eager dispatch of the scan levels is
    orders of magnitude slower; inside a trace it inlines as before.
    """
    hdim = parms["invQ"].shape[-1]
    if lane_form is None:
        lane_form = hdim <= LANE_KALMAN_MAX_H and plane_form is not True
    if not lane_form and plane_form is None:
        plane_form = hdim <= PLANE_KALMAN_MAX_H
    lane_form, plane_form = bool(lane_form), bool(plane_form)
    if not any(
        isinstance(l, jax.core.Tracer)
        for t in (parms, x0, like, u)
        for l in jax.tree_util.tree_leaves(t)
    ):
        return _jit_smoother(lane_form, plane_form, _dispatch_state())(
            parms, x0, like, u
        )
    return _smoother_impl(parms, x0, like, u, lane_form, plane_form)


def _smoother_impl(parms, x0, like, u, lane_form, plane_form):
    elems, bshape, T, hdim = _build_elements(parms, x0, like, u)
    if lane_form:
        return _lane_smoother(elems, bshape, T, hdim)
    if plane_form:
        return _plane_smoother(elems, bshape, T, hdim)
    return _dense_smoother(elems, bshape, T, hdim)


def _dispatch_state():
    """Module/env knobs baked into a Kalman-smoother trace: part of every
    memo key, so flipping a knob (tests, tuning) retraces instead of
    silently reusing a program traced under the old setting. Covers the
    chunked-scan knobs (ops.chunked_scan), the scan-element dtype, and the
    layout gates of BOTH smoother families (lane/plane thresholds are
    resolved inside model-level traces too). All module globals are read at
    call time — monkeypatches visible."""
    from . import parallel_hmm as ph
    from .chunked_scan import scan_dispatch_state

    return (
        SCAN_ELEM_DTYPE,
        LANE_KALMAN_MAX_H,
        PLANE_KALMAN_MAX_H,
        DUAL_SCAN,
        DUAL_SCAN_MAX_N,
        ph.LANE_HMM_MAX_K,
        ph.PLANE_HMM_MAX_K,
    ) + scan_dispatch_state()


@functools.lru_cache(maxsize=None)
def _jit_smoother(lane_form, plane_form, _state):
    return jax.jit(
        functools.partial(
            _smoother_impl, lane_form=lane_form, plane_form=plane_form
        )
    )
