"""Parallel (associative-scan) HMM smoother.

TPU-native replacement for the O(T)-depth sequential forward-backward: both
passes become ``jax.lax.associative_scan`` over the (log,+) matrix semiring,
giving O(log T) depth (the "context parallel" answer for discrete chains,
SURVEY.md §5.7).  Produces the same smoothed marginals, pairwise statistics
and logZ as models.hmm.forward_backward up to float association error.

For K <= PYVBMP_LANE_HMM_MAX_K (default 8) the scan runs in **lane form**:
the K x K log-matrices are split into per-entry (T, batch) planes so the
batch rides the TPU's 128-wide lanes and the semiring combine is
straight-line elementwise code — dense (..., K, K) layout puts the tiny
matrix dims on the (8, 128) memory tile and runs at a few percent
utilization (measured: the K=4 role scan was ~11 of ~13.6 ms per DMBD sweep;
see ops/smallmat.py for the same story on the Kalman side).
"""
from __future__ import annotations

import os

import functools

import jax
import jax.numpy as jnp

from ..utils import math as um
from .chunked_scan import auto_scan, swapped_combine

# Layout dispatch, measured on the v5e chip (round 3, PARITY.md): the plane
# form (stacked (T, K, K, N) layout, O(1) HLO ops per semiring matmul) beats
# the per-entry lane dict even at K=4 (DMBD-Lorenz role scan: 192 vs 157
# it/s end-to-end) and is the only fast path at K=14 (Flocking roles), so
# lane defaults OFF; dense above 32.
LANE_HMM_MAX_K = int(os.environ.get("PYVBMP_LANE_HMM_MAX_K", "0"))
PLANE_HMM_MAX_K = int(os.environ.get("PYVBMP_PLANE_HMM_MAX_K", "32"))


def _logmatmul(a, b):
    """(log,+) matmul over the last two axes; associative."""
    return um.logmatmulexp(a, b)


# ----------------------------------------------------------- lane-form pieces
def _lse_terms(terms):
    """Stable logsumexp over a python list of same-shaped arrays (same -inf
    guard as utils.math.stable_logsumexp)."""
    m = terms[0]
    for t in terms[1:]:
        m = jnp.maximum(m, t)
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    s = sum(jnp.exp(t - m) for t in terms)
    return m + jnp.log(s)


def _logmatmul_lane(K, a, b):
    """(log,+) matmul of K x K component dicts of lane planes."""
    return {
        (i, j): _lse_terms([a[(i, m)] + b[(m, j)] for m in range(K)])
        for i in range(K)
        for j in range(K)
    }


@functools.lru_cache(maxsize=None)
def _lane_combine(K):
    """Stable-identity K-specialized lane combine (see swapped_combine)."""
    return functools.partial(_logmatmul_lane, K)


def _hmm_lane_core(M, init_logits, ptemp):
    """Shared lane-form machinery: returns (p, xi (T,)+b+(K,K), SEz0, logZ)
    given dense semiring elements M (T,)+bshape+(K,K)."""
    T, K = M.shape[0], M.shape[-1]
    bshape = M.shape[1:-2]
    N = 1
    for s in bshape:
        N *= s

    Md = {
        (i, j): M[..., i, j].reshape(T, N) for i in range(K) for j in range(K)
    }
    ivec = [
        jnp.broadcast_to(init_logits[..., i], bshape).reshape(N)
        for i in range(K)
    ]

    prefix = auto_scan(_lane_combine(K), Md)
    suffix = auto_scan(swapped_combine(_lane_combine(K)), Md, reverse=True)

    alpha = [
        _lse_terms([ivec[i] + prefix[(i, j)] for i in range(K)])
        for j in range(K)
    ]
    logZ = _lse_terms([alpha[j][-1] for j in range(K)])
    alpha = [a - logZ for a in alpha]

    beta = [
        _lse_terms([suffix[(i, j)] for j in range(K)]) for i in range(K)
    ]
    zero = jnp.zeros_like(beta[0][:1])
    beta_t = [jnp.concatenate([b[1:], zero], 0) for b in beta]

    smoothed = [alpha[j] + beta_t[j] for j in range(K)]
    norm = _lse_terms(smoothed)
    smoothed = [s - norm for s in smoothed]

    alpha_prev = [
        jnp.concatenate([jnp.broadcast_to(ivec[i], (1, N)), alpha[i][:-1]], 0)
        for i in range(K)
    ]
    xi = {
        (i, j): alpha_prev[i] + Md[(i, j)] + beta_t[j]
        for i in range(K)
        for j in range(K)
    }
    xin = _lse_terms(list(xi.values()))
    xi = {k: jnp.exp(v - xin) for k, v in xi.items()}

    mx = smoothed[0]
    for s in smoothed[1:]:
        mx = jnp.maximum(mx, s)
    p = [jnp.exp((s - mx) / ptemp) for s in smoothed]
    psum = sum(p)
    p = [x / psum for x in p]

    p_d = jnp.stack(p, -1).reshape((T,) + bshape + (K,))
    xi_d = jnp.stack(
        [jnp.stack([xi[(i, j)] for j in range(K)], -1) for i in range(K)], -2
    ).reshape((T,) + bshape + (K, K))
    SEz0 = xi_d[0].sum(-1)
    logZ_d = logZ.reshape(bshape)
    return p_d, xi_d, SEz0, logZ_d


# ---------------------------------------------------------- plane-form pieces
def _logmatmul_plane(a, b):
    """(log,+) matmul in plane layout (T, K, K, N): one broadcast add + one
    stable reduction, lanes on N."""
    terms = a[..., :, :, None, :] + b[..., None, :, :, :]  # (T, i, m, j, N)
    m = terms.max(-3)
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    s = jnp.exp(terms - m[..., :, None, :, :]).sum(-3)
    return m + jnp.log(s)


def _hmm_plane_core(M, init_logits, ptemp):
    """_hmm_lane_core in plane layout: same returns
    (p, xi (T,)+b+(K,K), SEz0, logZ), O(1) HLO ops per combine."""
    T, K = M.shape[0], M.shape[-1]
    bshape = M.shape[1:-2]
    N = 1
    for s in bshape:
        N *= s

    Mp = M.reshape(T, N, K, K).transpose(0, 2, 3, 1)  # (T, K, K, N)
    ivec = (
        jnp.broadcast_to(init_logits, bshape + (K,)).reshape(N, K).T
    )  # (K, N)

    prefix = auto_scan(_logmatmul_plane, Mp)
    suffix = auto_scan(swapped_combine(_logmatmul_plane), Mp, reverse=True)

    alpha = um.stable_logsumexp(ivec[None, :, None, :] + prefix, -3)  # (T, K, N)
    logZ = um.stable_logsumexp(alpha[-1], 0)  # (N,)
    alpha = alpha - logZ

    beta = um.stable_logsumexp(suffix, -2)  # (T, K, N)
    beta_t = jnp.concatenate([beta[1:], jnp.zeros_like(beta[:1])], 0)

    smoothed = alpha + beta_t
    smoothed = smoothed - um.stable_logsumexp(smoothed, -2, keepdims=True)

    alpha_prev = jnp.concatenate([ivec[None], alpha[:-1]], 0)
    xi = alpha_prev[..., :, None, :] + Mp + beta_t[..., None, :, :]
    xin = um.stable_logsumexp(xi.reshape(T, K * K, N), -2)  # (T, N)
    xi = jnp.exp(xi - xin[..., None, None, :])

    mx = smoothed.max(-2)
    p = jnp.exp((smoothed - jnp.expand_dims(mx, -2)) / ptemp)
    p = p / p.sum(-2, keepdims=True)

    p_d = p.transpose(0, 2, 1).reshape((T,) + bshape + (K,))
    xi_d = xi.transpose(0, 3, 1, 2).reshape((T,) + bshape + (K, K))
    SEz0 = xi_d[0].sum(-1)
    logZ_d = logZ.reshape(bshape)
    return p_d, xi_d, SEz0, logZ_d


def forward_backward_parallel(trans_logits, init_logits, obs_logits, ptemp=1.0,
                              lane_form=None, plane_form=None):
    """Same contract as models.hmm.forward_backward (reference
    HMM.forward_backward_logits:72-105) with log-depth scans.

    trans_logits: batch + (K, K)
    init_logits:  batch + (K,)
    obs_logits:   (T,) + sample + batch + (K,)

    Called eagerly (outside any jit trace) this dispatches through a
    memoized jitted program — op-by-op eager dispatch of the scan levels is
    orders of magnitude slower; inside a trace it inlines as before.
    """
    K = trans_logits.shape[-1]
    if lane_form is None:
        lane_form = K <= LANE_HMM_MAX_K and plane_form is not True
    if not lane_form and plane_form is None:
        plane_form = K <= PLANE_HMM_MAX_K
    lane_form, plane_form = bool(lane_form), bool(plane_form)
    args = (trans_logits, init_logits, obs_logits)
    if not (
        isinstance(ptemp, jax.core.Tracer)
        or any(
            isinstance(l, jax.core.Tracer)
            for t in args
            for l in jax.tree_util.tree_leaves(t)
        )
    ):
        from .chunked_scan import scan_dispatch_state

        # ptemp rides as a runtime operand: annealing reuses one compiled
        # program instead of retracing (and retaining) one per value
        return _jit_fb(lane_form, plane_form, scan_dispatch_state())(
            *args, jnp.asarray(ptemp, obs_logits.dtype)
        )
    return _fb_impl(*args, ptemp, lane_form, plane_form)


@functools.lru_cache(maxsize=None)
def _jit_fb(lane_form, plane_form, _state):
    return jax.jit(
        functools.partial(
            _fb_impl, lane_form=lane_form, plane_form=plane_form
        )
    )


def _fb_impl(trans_logits, init_logits, obs_logits, ptemp, lane_form,
             plane_form):
    T = obs_logits.shape[0]

    # per-step semiring elements M_t[i, j] = trans[i, j] + obs_t[j]
    M = trans_logits + obs_logits[:, ..., None, :]
    bshape = M.shape[1:-2]

    if lane_form:
        p, xi, SEz0, logZ = _hmm_lane_core(M, init_logits, ptemp)
        return p, xi.sum(0), SEz0, logZ
    if plane_form:
        p, xi, SEz0, logZ = _hmm_plane_core(M, init_logits, ptemp)
        return p, xi.sum(0), SEz0, logZ

    # alpha_t = init ⊗ M_0 ⊗ ... ⊗ M_t  (prefix scan, row-vector form)
    prefix = auto_scan(_logmatmul, M)
    alpha = um.stable_logsumexp(
        init_logits[..., :, None] + prefix, -2
    )  # (T,)+sample+batch+(K,)

    logZ = um.stable_logsumexp(alpha[-1], -1, keepdims=True)
    alpha = alpha - logZ
    logZ = logZ[..., 0]

    # beta_t = M_{t+1} ⊗ ... ⊗ M_{T-1} ⊗ 1  (suffix scan, column-vector form).
    # NOTE: with reverse=True the combine sees (later, earlier) operands, so
    # flip the operator to keep left-to-right multiplication order.
    suffix = auto_scan(swapped_combine(_logmatmul), M, reverse=True)
    # suffix[t] = M_t ⊗ ... ⊗ M_{T-1}; beta_t needs products starting at t+1
    beta = um.stable_logsumexp(suffix, -1)  # includes M_t; shift left by one
    beta_t = jnp.concatenate(
        [beta[1:], jnp.zeros((1,) + beta.shape[1:], beta.dtype)], 0
    )  # (T,)+...+(K,) where beta_t[t, j] = log sum over futures given z_t = j

    smoothed = alpha + beta_t
    smoothed = smoothed - um.stable_logsumexp(smoothed, -1, keepdims=True)

    # pairwise marginals xi_t(i, j) ∝ alpha_{t-1}(i) + M_t(i,j) + beta_t(j)
    alpha_prev = jnp.concatenate(
        [jnp.broadcast_to(init_logits, alpha.shape[1:])[None], alpha[:-1]], 0
    )
    xi = alpha_prev[..., :, None] + M + beta_t[..., None, :]
    xi = xi - um.stable_logsumexp(xi, (-1, -2), keepdims=True)
    xi = jnp.exp(xi)
    SEz0 = xi[0].sum(-1)
    SEzz = xi.sum(0)

    p = jnp.exp((smoothed - smoothed.max(-1, keepdims=True)) / ptemp)
    p = p / p.sum(-1, keepdims=True)
    return p, SEzz, SEz0, logZ


def driven_forward_backward_parallel(trans_logits, init_logits, obs_logits, ptemp=1.0,
                                     lane_form=None, plane_form=None):
    """Input-driven variant: per-time transition logits (T,)+...+(K,K) and
    per-time pairwise statistics (reference models/dHMM.py semantics), with
    the same log-depth scans.  Returns (p, SEzz per-time, SEz0, logZ).

    Like forward_backward_parallel, eager calls (the dHMM reference API,
    models/dhmm.py:124) dispatch through a memoized jitted program instead
    of op-by-op eager dispatch of the scan levels."""
    K = trans_logits.shape[-1]
    if lane_form is None:
        lane_form = K <= LANE_HMM_MAX_K and plane_form is not True
    if not lane_form and plane_form is None:
        plane_form = K <= PLANE_HMM_MAX_K
    lane_form, plane_form = bool(lane_form), bool(plane_form)
    args = (trans_logits, init_logits, obs_logits)
    if not (
        isinstance(ptemp, jax.core.Tracer)
        or any(
            isinstance(l, jax.core.Tracer)
            for t in args
            for l in jax.tree_util.tree_leaves(t)
        )
    ):
        from .chunked_scan import scan_dispatch_state

        return _jit_driven(lane_form, plane_form, scan_dispatch_state())(
            *args, jnp.asarray(ptemp, obs_logits.dtype)
        )
    return _driven_fb_impl(*args, ptemp, lane_form, plane_form)


@functools.lru_cache(maxsize=None)
def _jit_driven(lane_form, plane_form, _state):
    return jax.jit(
        functools.partial(
            _driven_fb_impl, lane_form=lane_form, plane_form=plane_form,
        )
    )


def _driven_fb_impl(trans_logits, init_logits, obs_logits, ptemp, lane_form,
                    plane_form):
    T = obs_logits.shape[0]
    M = trans_logits + obs_logits[:, ..., None, :]

    if lane_form:
        p, xi, SEz0, logZ = _hmm_lane_core(M, init_logits, ptemp)
        return p, xi, SEz0, logZ
    if plane_form:
        p, xi, SEz0, logZ = _hmm_plane_core(M, init_logits, ptemp)
        return p, xi, SEz0, logZ

    prefix = auto_scan(_logmatmul, M)
    alpha = um.stable_logsumexp(init_logits[..., :, None] + prefix, -2)
    logZ = um.stable_logsumexp(alpha[-1], -1, keepdims=True)
    alpha = alpha - logZ
    logZ = logZ[..., 0]

    suffix = auto_scan(swapped_combine(_logmatmul), M, reverse=True)
    beta = um.stable_logsumexp(suffix, -1)
    beta_t = jnp.concatenate(
        [beta[1:], jnp.zeros((1,) + beta.shape[1:], beta.dtype)], 0
    )

    smoothed = alpha + beta_t
    smoothed = smoothed - um.stable_logsumexp(smoothed, -1, keepdims=True)

    alpha_prev = jnp.concatenate(
        [jnp.broadcast_to(init_logits, alpha.shape[1:])[None], alpha[:-1]], 0
    )
    xi = alpha_prev[..., :, None] + M + beta_t[..., None, :]
    xi = jnp.exp(xi - um.stable_logsumexp(xi, (-1, -2), keepdims=True))
    SEz0 = xi[0].sum(-1)
    SEzz = xi  # kept per-time: the MNLR transition M-step needs SEzz[t]

    p = jnp.exp((smoothed - smoothed.max(-1, keepdims=True)) / ptemp)
    p = p / p.sum(-1, keepdims=True)
    return p, SEzz, SEz0, logZ
