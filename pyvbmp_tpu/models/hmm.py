"""Discrete HMM with pluggable exponential-family observation model
(reference models/HMM.py).

TPU-native redesign: the reference's sequential python loops over time
(HMM.py:44-45, 78-98) become two ``lax.scan``s (forward filter, backward
smoother with fused SEzz accumulation); the K x K logsumexp contraction in the
body is batched over samples so each step is one fused VPU/MXU kernel.  A full
VB-EM iteration (E-step + M-step + ELBO) is one jitted pure function over the
(transition, initial, obs_dist) pytree.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..dists import Dirichlet
from ..utils import math as um
from ..utils.jaxutils import sum_leading


def forward_backward(trans_logits, init_logits, obs_logits, ptemp=1.0):
    """Batched HMM smoother (reference HMM.forward_backward_logits, :72-105).

    trans_logits: batch + (K, K)   <log p(z'|z)>
    init_logits:  batch + (K,)
    obs_logits:   (T,) + sample + batch + (K,)
    Returns (p, SEzz, SEz0, logZ):
      p    (T,)+sample+batch+(K,)  smoothed posteriors (ptemp-sharpened)
      SEzz sample+batch+(K,K)      summed two-slice stats
      SEz0 sample+batch+(K,)
      logZ sample+batch
    """
    fw0 = um.stable_logsumexp(
        init_logits[..., :, None] + trans_logits + obs_logits[0][..., None, :], -2
    )

    def fwd_step(fw_prev, obs_t):
        fw = um.stable_logsumexp(
            fw_prev[..., :, None] + trans_logits + obs_t[..., None, :], -2
        )
        return fw, fw

    _, fw_rest = jax.lax.scan(fwd_step, fw0, obs_logits[1:])
    fw_logits = jnp.concatenate([fw0[None], fw_rest], 0)

    logZ = um.stable_logsumexp(fw_logits[-1], -1, keepdims=True)
    fw_logits = fw_logits - logZ
    logZ = logZ[..., 0]

    def bwd_step(carry, fw_t):
        sm_next, SEzz = carry
        temp = fw_t[..., :, None] + trans_logits
        xi = (temp - um.stable_logsumexp(temp, -2, keepdims=True)) + sm_next[
            ..., None, :
        ]
        sm_t = um.stable_logsumexp(xi, -1)
        SEzz = SEzz + jnp.exp(xi - um.stable_logsumexp(xi, (-1, -2), keepdims=True))
        return (sm_t, SEzz), sm_t

    K = trans_logits.shape[-1]
    SEzz0 = jnp.zeros(fw_logits.shape[1:] + (K,), fw_logits.dtype)
    (_, SEzz), sm_rest = jax.lax.scan(
        bwd_step, (fw_logits[-1], SEzz0), fw_logits[:-1], reverse=True
    )
    smoothed = jnp.concatenate([sm_rest, fw_logits[-1:]], 0)

    # initial step (t = -1 -> 0), reference HMM.py:92-98
    temp = init_logits[..., :, None] + trans_logits
    xi = (temp - um.stable_logsumexp(temp, -2, keepdims=True)) + smoothed[0][
        ..., None, :
    ]
    SEz0 = um.stable_logsumexp(xi, -1)
    SEz0 = jnp.exp(SEz0 - um.stable_logsumexp(SEz0, -1, keepdims=True))
    SEzz = SEzz + jnp.exp(xi - um.stable_logsumexp(xi, (-1, -2), keepdims=True))

    p = jnp.exp((smoothed - smoothed.max(-1, keepdims=True)) / ptemp)
    p = p / p.sum(-1, keepdims=True)
    return p, SEzz, SEz0, logZ


def smoother_dispatch(model, driven=False):
    """Three-tier forward-backward dispatch shared by HMM, dHMM and DMBD's
    role chain: time-sharded (``model.time_mesh``) > parallel associative
    scan (``model.parallel_scan``) > sequential lax.scan. Returns a function
    ``fb(trans_logits, init_logits, obs_logits, ptemp)``."""
    if getattr(model, "time_mesh", None) is not None:
        from ..parallel.seq_parallel import (
            time_sharded_driven_forward_backward,
            time_sharded_forward_backward,
        )

        sharded = (
            time_sharded_driven_forward_backward
            if driven
            else time_sharded_forward_backward
        )

        def fb(trans, init, obs, ptemp):
            return sharded(trans, init, obs, model.time_mesh, ptemp=ptemp)

        return fb
    if getattr(model, "parallel_scan", False):
        from ..ops.parallel_hmm import (
            driven_forward_backward_parallel,
            forward_backward_parallel,
        )

        return driven_forward_backward_parallel if driven else forward_backward_parallel
    if driven:
        from .dhmm import driven_forward_backward

        return driven_forward_backward
    return forward_backward


class HMM:
    """Stateful shell; all heavy work happens in jitted pure functions."""

    def __init__(self, obs_dist, transition_mask=None, ptemp=1.0, parallel_scan=False,
                 time_mesh=None, key=None):
        from ..utils.rng import key_or_next
        import jax.random as jr

        self.obs_dist = obs_dist
        self.event_dim = 1
        self.dim = obs_dist.batch_shape[-1]
        self.event_shape = tuple(obs_dist.batch_shape[-1:])
        self.batch_shape = tuple(obs_dist.batch_shape[:-1])
        self.batch_dim = len(self.batch_shape)
        self.transition_mask = transition_mask

        alpha = jnp.eye(self.dim) + 0.5  # sticky prior (reference HMM.py:18-22)
        if transition_mask is not None:
            alpha = alpha * transition_mask
        key = key_or_next(key)
        self.transition = Dirichlet.create(
            self.event_shape,
            self.batch_shape + self.event_shape,
            prior_parms={"alpha": alpha},
            key=key,
        )
        self.initial = Dirichlet.create(
            self.event_shape, self.batch_shape, key=jr.fold_in(key, 1)
        )
        self.p = None
        self.ptemp = ptemp
        self.parallel_scan = parallel_scan
        # sequence parallelism: a Mesh with a "seq" axis shards the TIME axis
        # of the forward-backward scans (parallel/seq_parallel.py)
        self.time_mesh = time_mesh
        self.logZ = jnp.asarray(-jnp.inf)
        self.ELBO_last = jnp.asarray(-jnp.inf)
        self.ELBO_save = []
        self._jit_cache = {}

    # -- pure observation-model hooks (overridden by ARHMM variants) -------------
    def _obs_logits(self, obs_dist, X):
        return obs_dist.Elog_like(jnp.expand_dims(X, -1 - obs_dist.event_dim))

    def _obs_update(self, obs_dist, X, p, lr, beta):
        return obs_dist.raw_update(
            jnp.expand_dims(X, -1 - obs_dist.event_dim), p=p, lr=lr, beta=beta
        )

    def _obs_KL(self, obs_dist):
        return obs_dist.KLqprior().sum(-1)

    # -- pure E-step ----------------------------------------------------------------
    def _estep(self, transition, initial, obs_dist, X):
        logits = self._obs_logits(obs_dist, X)
        fb = smoother_dispatch(self)
        p, SEzz, SEz0, logZ = fb(
            transition.loggeomean(), initial.loggeomean(), logits, self.ptemp
        )
        NA = p.sum(0)
        keep = self.batch_dim + self.event_dim
        NA = sum_leading(NA, keep)
        SEzz = sum_leading(SEzz, keep + 1)
        SEz0 = sum_leading(SEz0, keep)
        logZ = sum_leading(logZ, self.batch_dim)
        return p, SEzz, SEz0, NA, logZ

    def _vb_step(self, transition, initial, obs_dist, X, lr, beta):
        p, SEzz, SEz0, NA, logZ = self._estep(transition, initial, obs_dist, X)
        transition = transition.ss_update(SEzz, lr=lr, beta=beta)
        initial = initial.ss_update(SEz0, lr=lr, beta=beta)
        obs_dist = self._obs_update(obs_dist, X, p, lr, beta)
        # reference HMM.update computes ELBO with post-M-step KL and the
        # E-step logZ (HMM.py:141-152)
        KL = (
            self._obs_KL(obs_dist)
            + transition.KLqprior().sum(-1)
            + initial.KLqprior()
        )
        ELBO = logZ - KL
        return transition, initial, obs_dist, p, NA, logZ, ELBO

    def _jitted(self, name, fn, _prejitted=False, **jitkw):
        # ptemp / parallel_scan are read through ``self`` at trace time, so
        # they're baked into the compiled function — key the cache on them or
        # a user mutating them between updates (e.g. ptemp annealing) would
        # silently keep the stale trace.
        from ..ops.parallel_kalman import _dispatch_state

        key = (
            name,
            getattr(self, "ptemp", None),
            getattr(self, "parallel_scan", None),
            getattr(self, "time_mesh", None),
            _dispatch_state(),
        )
        if key not in self._jit_cache:
            self._jit_cache[key] = fn if _prejitted else jax.jit(fn, **jitkw)
        return self._jit_cache[key]

    # -- reference-API methods ---------------------------------------------------
    def obs_logits(self, X):
        return self._obs_logits(self.obs_dist, X)

    def update_states(self, X, T=None):
        fn = self._jitted("estep", self._estep)
        self.p, SEzz, SEz0, NA, logZ = fn(
            self.transition, self.initial, self.obs_dist, X
        )
        self.NA = NA
        self.logZ = logZ
        return SEzz, SEz0, NA, logZ

    def update_markov_parms(self, SEzz, SEz0, lr=1.0, beta=None):
        self.transition = self.transition.ss_update(SEzz, lr=lr, beta=beta)
        self.initial = self.initial.ss_update(SEz0, lr=lr, beta=beta)

    def update_obs_parms(self, X, lr=1.0, beta=None):
        self.obs_dist = self._obs_update(self.obs_dist, X, self.p, lr, beta)

    def _vb_multi(self, transition, initial, obs_dist, X, lr, beta, iters):
        """Fused multi-iteration VB-EM: one device call per fit.

        Only the scalar ELBO trajectory is stacked across iterations; the big
        per-sample posteriors (p is (T, b, K)) would otherwise be written to
        an (iters, T, b, K) scan output that only its last slice of is ever
        read — the final iteration runs outside the scan so intermediate
        iterations never materialize p to HBM."""

        def body(carry, _):
            transition, initial, obs_dist = carry
            transition, initial, obs_dist, _p, _NA, _logZ, ELBO = self._vb_step(
                transition, initial, obs_dist, X, lr, beta
            )
            return (transition, initial, obs_dist), ELBO

        carry, ELBOs = jax.lax.scan(
            body, (transition, initial, obs_dist), None, length=iters - 1
        )
        transition, initial, obs_dist, p, NA, logZ, ELBO = self._vb_step(
            *carry, X, lr, beta
        )
        ELBOs = jnp.concatenate([ELBOs, ELBO[None]], 0)
        return transition, initial, obs_dist, (p, NA, logZ), ELBOs

    def update(self, X, iters=1, T=None, lr=1.0, beta=None, verbose=False):
        if iters < 1:
            raise ValueError(f"iters must be >= 1, got {iters}")
        if iters == 1:
            fn = self._jitted("vb_step", self._vb_step, static_argnames=("beta",))
            (
                self.transition,
                self.initial,
                self.obs_dist,
                self.p,
                self.NA,
                self.logZ,
                ELBO,
            ) = fn(self.transition, self.initial, self.obs_dist, X, lr, beta)
            ELBOs = [ELBO]
        else:
            fn = self._jitted(
                ("vb_multi",),
                jax.jit(self._vb_multi, static_argnames=("beta", "iters")),
                _prejitted=True,
            )
            (
                self.transition,
                self.initial,
                self.obs_dist,
                (self.p, self.NA, self.logZ),
                ELBOs,
            ) = fn(self.transition, self.initial, self.obs_dist, X, lr, beta, iters)
        # one host fetch for all iterations' ELBOs (per-element iteration of a
        # device array round-trips per element on remote-attached TPUs)
        ELBOs = np.asarray(ELBOs)
        for ELBO in ELBOs:
            if verbose:
                print(
                    "Percent Change in ELBO = ",
                    (ELBO - self.ELBO_last) / np.abs(self.ELBO_last) * 100,
                )
            self.ELBO_last = ELBO
            self.ELBO_save.append(float(np.sum(ELBO)))

    def KLqprior(self):
        return (
            self._obs_KL(self.obs_dist)
            + self.transition.KLqprior().sum(-1)
            + self.initial.KLqprior()
        )

    def ELBO(self):
        return self.logZ - self.KLqprior()

    def assignment_pr(self):
        return self.p

    def assignment(self):
        return self.p.argmax(-1)

    # -- expectation averaging (reference HMM.py:160-178) --------------------------
    def average(self, A, keepdim=False):
        return (A * self.p).sum(-1, keepdims=keepdim)

    def event_average(self, A, keepdim=False):
        de = self.obs_dist.event_dim
        out = (A * self.p.reshape(self.p.shape + (1,) * de)).sum(
            -de - 1, keepdims=keepdim
        )
        for _ in range(self.event_dim - 1):
            out = out.sum(-de - 1, keepdims=keepdim)
        return out

    def event_average_f(self, fname, keepdim=False):
        return self.event_average(getattr(self.obs_dist, fname)(), keepdim)

    def average_f(self, fname, keepdim=False):
        return self.average(getattr(self.obs_dist, fname)(), keepdim)
