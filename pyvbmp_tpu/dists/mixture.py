"""Generic mixture wrapper over any conjugate dist whose trailing batch dims
index mixture components (reference dists/Mixture.py).

The VB-EM iteration (E-step assignments + ELBO + M-step) is one jitted pure
function over the (pi, dist) pytree; the class is a thin stateful shell
exposing the reference's imperative API.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .dirichlet import Dirichlet
from ..utils import math as um
from ..utils.jaxutils import sum_leading


class Mixture:
    def __init__(self, dist, event_shape, prior_parms=None, key=None):
        assert tuple(dist.batch_shape[-len(event_shape):]) == tuple(event_shape)
        self.event_shape = tuple(event_shape)
        self.event_dim = len(event_shape)
        self.batch_shape = tuple(dist.batch_shape[: -len(event_shape)])
        self.batch_dim = len(self.batch_shape)
        self.pi = Dirichlet.create(
            event_shape=event_shape,
            batch_shape=self.batch_shape,
            prior_parms=prior_parms,
            key=key,
        )
        self.dist = dist
        self.logZ = jnp.asarray(-jnp.inf)
        self.ELBO_last = jnp.asarray(-jnp.inf)
        self.p = None
        self.NA = None
        self.ELBO_save = []

    # -- pure pieces -----------------------------------------------------------
    def _reshape_data(self, X):
        return X.reshape(
            X.shape[: X.ndim - self.dist.event_dim]
            + self.event_dim * (1,)
            + tuple(self.dist.event_shape)
        )

    def Elog_like(self, X):
        return self.dist.Elog_like(self._reshape_data(X)) + self.pi.loggeomean()

    def update_assignments(self, X):
        log_p = self.Elog_like(X)
        edims = tuple(range(-self.event_dim, 0))
        logZ = um.stable_logsumexp(log_p, edims, keepdims=False)
        log_p = log_p - logZ.reshape(logZ.shape + (1,) * self.event_dim)
        self.p = jnp.exp(log_p)
        keep = self.batch_dim + self.event_dim
        self.NA = sum_leading(self.p, keep)
        self.logZ = sum_leading(logZ, self.batch_dim)

    def update_parms(self, X, lr=1.0):
        self.pi = self.pi.ss_update(self.NA, lr=lr)
        self.dist = self.dist.raw_update(self._reshape_data(X), self.p, lr)

    def update(self, X, iters=1, lr=1.0, verbose=False):
        if iters < 1:
            raise ValueError(f"iters must be >= 1, got {iters}")
        Xv = self._reshape_data(X)
        if iters == 1:
            step = _mixture_step_jit(type(self.dist), self.event_dim, self.batch_dim)
            self.pi, self.dist, self.p, self.NA, self.logZ, ELBO = step(
                self.pi, self.dist, Xv, lr
            )
            ELBOs = ELBO[None] if getattr(ELBO, "ndim", 0) else jnp.asarray([ELBO])
        else:
            step = _mixture_multi_jit(type(self.dist), self.event_dim, self.batch_dim)
            self.pi, self.dist, self.p, self.NA, self.logZ, ELBOs = step(
                self.pi, self.dist, Xv, lr, iters
            )
        # single host fetch; iterating the device array round-trips per
        # element on remote-attached TPUs
        import numpy as np

        ELBOs = np.asarray(ELBOs)
        for ELBO in ELBOs:
            if verbose:
                pct = (ELBO - self.ELBO_last) / np.abs(self.ELBO_last) * 100.0
                print("Percent Change in ELBO:   ", pct)
            self.ELBO_last = ELBO
            self.ELBO_save.append(float(ELBO.sum()))

    raw_update = update

    def KLqprior(self):
        return self.dist.KLqprior().sum(
            tuple(range(-self.event_dim, 0))
        ) + self.pi.KLqprior()

    def ELBO(self):
        return self.logZ - self.KLqprior()

    def assignment_pr(self):
        return self.p

    def assignment(self):
        return self.p.argmax(-1)

    def means(self):
        return self.dist.mean()

    # -- expectation averaging (reference Mixture.py:87-108) --------------------
    def average(self, A, keepdim=False):
        return (A * self.p).sum(-1, keepdims=keepdim)

    def event_average(self, A, keepdim=False):
        de = self.dist.event_dim
        out = (A * self.p.reshape(self.p.shape + (1,) * de)).sum(-1 - de, keepdims=keepdim)
        for _ in range(self.event_dim - 1):
            out = out.sum(-de - 1, keepdims=keepdim)
        return out

    def event_average_f(self, fname, A=None, keepdim=False):
        f = getattr(self.dist, fname)
        return self.event_average(f() if A is None else f(A), keepdim=keepdim)

    def average_f(self, fname, A=None, keepdim=False):
        f = getattr(self.dist, fname)
        return self.average(f() if A is None else f(A), keepdim=keepdim)


def _mixture_step(event_dim, batch_dim, pi, dist, Xv, lr):
    """One VB-EM iteration: E-step, ELBO, M-step (all batched; jit-compiled)."""
    log_p = dist.Elog_like(Xv) + pi.loggeomean()
    edims = tuple(range(-event_dim, 0))
    logZ = um.stable_logsumexp(log_p, edims, keepdims=False)
    p = jnp.exp(log_p - logZ.reshape(logZ.shape + (1,) * event_dim))
    NA = sum_leading(p, batch_dim + event_dim)
    logZ = sum_leading(logZ, batch_dim)
    KL = dist.KLqprior().sum(edims) + pi.KLqprior()
    ELBO = logZ - KL
    pi = pi.ss_update(NA, lr=lr)
    dist = dist.raw_update(Xv, p, lr)
    return pi, dist, p, NA, logZ, ELBO


def _mixture_multi(event_dim, batch_dim, pi, dist, Xv, lr, iters):
    """Fused multi-iteration VB-EM (single device call).

    Only the ELBO trajectory is stacked across iterations: stacking p into an
    (iters, n, K) scan output forces every intermediate iteration to write
    the full assignment matrix to HBM (and holds iters copies live) when only
    the last is consumed.  The final iteration runs outside the scan instead."""

    def body(carry, _):
        pi, dist = carry
        pi, dist, _p, _NA, _logZ, ELBO = _mixture_step(
            event_dim, batch_dim, pi, dist, Xv, lr
        )
        return (pi, dist), ELBO

    (pi, dist), ELBOs = jax.lax.scan(body, (pi, dist), None, length=iters - 1)
    pi, dist, p, NA, logZ, ELBO = _mixture_step(event_dim, batch_dim, pi, dist, Xv, lr)
    ELBOs = jnp.concatenate([ELBOs, ELBO[None]], 0)
    return pi, dist, p, NA, logZ, ELBOs


_step_cache = {}


def _mixture_step_jit(dist_cls, event_dim, batch_dim):
    key = (dist_cls, event_dim, batch_dim)
    if key not in _step_cache:
        _step_cache[key] = jax.jit(partial(_mixture_step, event_dim, batch_dim))
    return _step_cache[key]


def _mixture_multi_jit(dist_cls, event_dim, batch_dim):
    key = (dist_cls, event_dim, batch_dim, "multi")
    if key not in _step_cache:
        _step_cache[key] = jax.jit(
            partial(_mixture_multi, event_dim, batch_dim), static_argnames=("iters",)
        )
    return _step_cache[key]
