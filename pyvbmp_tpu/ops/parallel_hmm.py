"""Parallel (associative-scan) HMM smoother.

TPU-native replacement for the O(T)-depth sequential forward-backward: both
passes become ``jax.lax.associative_scan`` over the (log,+) matrix semiring,
giving O(log T) depth (the "context parallel" answer for discrete chains,
SURVEY.md §5.7).  Produces the same smoothed marginals, pairwise statistics
and logZ as models.hmm.forward_backward up to float association error.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils import math as um


def _logmatmul(a, b):
    """(log,+) matmul over the last two axes; associative."""
    return um.logmatmulexp(a, b)


def forward_backward_parallel(trans_logits, init_logits, obs_logits, ptemp=1.0):
    """Same contract as models.hmm.forward_backward (reference
    HMM.forward_backward_logits:72-105) with log-depth scans.

    trans_logits: batch + (K, K)
    init_logits:  batch + (K,)
    obs_logits:   (T,) + sample + batch + (K,)
    """
    T = obs_logits.shape[0]
    K = trans_logits.shape[-1]

    # per-step semiring elements M_t[i, j] = trans[i, j] + obs_t[j]
    M = trans_logits + obs_logits[:, ..., None, :]
    bshape = M.shape[1:-2]

    # alpha_t = init ⊗ M_0 ⊗ ... ⊗ M_t  (prefix scan, row-vector form)
    prefix = jax.lax.associative_scan(_logmatmul, M, axis=0)
    alpha = um.stable_logsumexp(
        init_logits[..., :, None] + prefix, -2
    )  # (T,)+sample+batch+(K,)

    logZ = um.stable_logsumexp(alpha[-1], -1, keepdims=True)
    alpha = alpha - logZ
    logZ = logZ[..., 0]

    # beta_t = M_{t+1} ⊗ ... ⊗ M_{T-1} ⊗ 1  (suffix scan, column-vector form).
    # NOTE: with reverse=True the combine sees (later, earlier) operands, so
    # flip the operator to keep left-to-right multiplication order.
    suffix = jax.lax.associative_scan(
        lambda a, b: _logmatmul(b, a), M, axis=0, reverse=True
    )
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


def driven_forward_backward_parallel(trans_logits, init_logits, obs_logits, ptemp=1.0):
    """Input-driven variant: per-time transition logits (T,)+...+(K,K) and
    per-time pairwise statistics (reference models/dHMM.py semantics), with
    the same log-depth scans.  Returns (p, SEzz per-time, SEz0, logZ)."""
    T = obs_logits.shape[0]
    M = trans_logits + obs_logits[:, ..., None, :]

    prefix = jax.lax.associative_scan(_logmatmul, M, axis=0)
    alpha = um.stable_logsumexp(init_logits[..., :, None] + prefix, -2)
    logZ = um.stable_logsumexp(alpha[-1], -1, keepdims=True)
    alpha = alpha - logZ
    logZ = logZ[..., 0]

    suffix = jax.lax.associative_scan(
        lambda a, b: _logmatmul(b, a), M, axis=0, reverse=True
    )
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
