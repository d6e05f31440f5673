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
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils import math as um
from ..utils.linalg import (
    mT,
    sym_inv,
    sym_inv_and_logdet,
    sym_solve_and_logdet,
)


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


def parallel_kalman_smoother(parms, x0, like, u):
    """Drop-in replacement for the sequential forward_backward_loop
    (models/lds.py): returns (px_parts, Sigma_cross, Sigma_x0_cross,
    Sigma_x0_x0, mu_x0, logZ_total).

    parms: dict from LinearDynamicalSystems._latent_parms
    like:  (invSigma_like, invSigmamu_like, Residual_like), each (T,)+...
    u:     (T,)+...+(control,1)
    """
    iS_like, iSm_like, Res_like = like
    T = iS_like.shape[0]
    hdim = parms["invQ"].shape[-1]
    invQ = parms["invQ"]
    ATQA_x_x = parms["ATQA_x_x"]
    ATQA_x_u = parms["ATQA_x_u"]
    ATQA_u_u = parms["ATQA_u_u"]
    QA_xp_x = parms["QA_xp_x"]
    QA_xp_u = parms["QA_xp_u"]

    # parms may be time-varying (leading T axis, e.g. switching-LDS mixtures):
    # only their trailing batch+(h,h) dims participate in the element shape
    nb = iS_like.ndim - 1
    bshape = jnp.broadcast_shapes(
        invQ.shape[max(0, invQ.ndim - nb):], iS_like.shape[1:]
    )
    dtype = iS_like.dtype

    def bcast(x, shape):
        return jnp.broadcast_to(x, (T,) + shape)

    Jaa = bcast(ATQA_x_x, bshape)
    Jab = bcast(-mT(QA_xp_x), bshape)
    Jbb = bcast(invQ, bshape) + iS_like
    ha = jnp.broadcast_to(-ATQA_x_u @ u, (T,) + bshape[:-1] + (1,))
    hb = iSm_like + QA_xp_u @ u
    logw = (
        Res_like
        - 0.5 * (mT(u) @ ATQA_u_u @ u)[..., 0, 0]
        + 0.5 * parms["ElogdetinvQ"]
        - 0.5 * hdim * um.LOG2PI
    )
    logw = jnp.broadcast_to(logw, (T,) + bshape[:-2])

    # fold the x_{-1} prior into element 0 (the reference's x0 carry,
    # LinearDynamicalSystems.py:350-356)
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

    elems = (Jaa, Jab, Jbb, ha, hb, logw)
    prefix = jax.lax.associative_scan(_combine, elems, axis=0)
    # reverse=True passes operands as (later, earlier); flip to keep
    # chain order so the marginalized middle variable is the shared one
    suffix = jax.lax.associative_scan(
        lambda a, b: _combine(b, a), elems, axis=0, reverse=True
    )

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
    hfin = Ja[-1].shape[-1]
    sol, logdetJ = sym_solve_and_logdet(Ja[-1], hva[-1])
    logZ_total = (
        logca[-1]
        + 0.5 * (hva[-1] * sol).sum((-1, -2))
        - 0.5 * logdetJ
        + 0.5 * hfin * um.LOG2PI
    )
    return (Sigma, mu, Js, hs), Sigma_cross, Sigma_x0_cross, Sigma_x0_x0, mu_x0, logZ_total
