"""Input-driven HMM: transition p(z'|z, x) is a per-row MNLR
(reference models/dHMM.py)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..dists import Dirichlet
from ..transforms.mnlr import MultiNomialLogisticRegression
from ..utils import math as um
from ..utils.jaxutils import replace, sum_leading


def driven_forward_backward(trans_logits, init_logits, obs_logits, ptemp=1.0):
    """HMM smoother with per-time transition logits; keeps per-time SEzz
    (reference dHMM.forward_backward_loop:42-78).

    trans_logits: (T,) + sample + batch + (K, K)
    obs_logits:   (T,) + sample + batch + (K,)
    """
    fw0 = um.stable_logsumexp(
        obs_logits[0][..., None, :] + init_logits[..., :, None] + trans_logits[0], -2
    )

    def fwd_step(fw_prev, inp):
        obs_t, trans_t = inp
        fw = um.stable_logsumexp(
            fw_prev[..., :, None] + obs_t[..., None, :] + trans_t, -2
        )
        return fw, fw

    _, fw_rest = jax.lax.scan(fwd_step, fw0, (obs_logits[1:], trans_logits[1:]))
    fw_logits = jnp.concatenate([fw0[None], fw_rest], 0)
    logZ = um.stable_logsumexp(fw_logits[-1], -1, keepdims=True)
    fw_logits = fw_logits - logZ
    logZ = logZ[..., 0]

    def bwd_step(sm_next, inp):
        fw_t, trans_tp1 = inp
        temp = fw_t[..., :, None] + trans_tp1
        xi = (temp - um.stable_logsumexp(temp, -2, keepdims=True)) + sm_next[
            ..., None, :
        ]
        sm_t = um.stable_logsumexp(xi, -1)
        SEzz_t = jnp.exp(xi - um.stable_logsumexp(xi, (-1, -2), keepdims=True))
        return sm_t, (sm_t, SEzz_t)

    sm_last, (sm_rest, SEzz_rest) = jax.lax.scan(
        bwd_step,
        fw_logits[-1],
        (fw_logits[:-1], trans_logits[1:]),
        reverse=True,
    )
    smoothed = jnp.concatenate([sm_rest, fw_logits[-1:]], 0)

    temp = init_logits[..., :, None] + trans_logits[0]
    xi = (temp - um.stable_logsumexp(temp, -2, keepdims=True)) + smoothed[0][
        ..., None, :
    ]
    SEz0 = um.stable_logsumexp(xi, -1)
    SEz0 = jnp.exp(SEz0 - um.stable_logsumexp(SEz0, -1, keepdims=True))
    SEzz_0 = jnp.exp(xi - um.stable_logsumexp(xi, (-1, -2), keepdims=True))
    SEzz = jnp.concatenate([SEzz_0[None], SEzz_rest], 0)

    p = jnp.exp((smoothed - smoothed.max(-1, keepdims=True)) / ptemp)
    p = p / p.sum(-1, keepdims=True)
    return p, SEzz, SEz0, logZ


class dHMM:
    def __init__(self, obs_dist, p, transition_mask=None, ptemp=1.0,
                 parallel_scan=False, time_mesh=None, key=None):
        from ..utils.rng import key_or_next
        import jax.random as jr

        self.obs_dist = obs_dist
        n = obs_dist.batch_shape[-1]
        self.hidden_dim = n
        self.event_dim = 1
        self.event_shape = (n,)
        self.batch_shape = tuple(obs_dist.batch_shape[:-1])
        self.batch_dim = len(self.batch_shape)
        self.ptemp = ptemp
        self.parallel_scan = parallel_scan
        # sequence parallelism: a Mesh with a "seq" axis shards the TIME axis
        # of the driven forward-backward (parallel/seq_parallel.py)
        self.time_mesh = time_mesh
        key = key_or_next(key)
        self.transition = MultiNomialLogisticRegression(
            n, p, batch_shape=self.batch_shape + (n,), pad_X=True, key=key
        )
        self.initial = Dirichlet.create((n,), self.batch_shape, key=jr.fold_in(key, 1))
        # reference pins the initial to its prior (dHMM.py:23)
        self.initial = replace(self.initial, alpha=self.initial.alpha_0)
        self.p = None
        self.sumlogZ = -jnp.inf
        self.ELBO_save = []

    def obs_logits(self, Y):
        return self.obs_dist.Elog_like(Y)

    def transition_logits(self, X):
        return self.transition.log_predict(X)

    def _fb(self):
        """Smoother dispatch: time-sharded > parallel-scan > sequential."""
        from .hmm import smoother_dispatch

        return smoother_dispatch(self, driven=True)

    def raw_update_states(self, X, Y):
        fb = self._fb()
        self.p, SEzz, SEz0, logZ = fb(
            self.transition_logits(X),
            self.initial.loggeomean(),
            self.obs_logits(Y),
            self.ptemp,
        )
        NA = self.p.sum(0)
        self.logZ = logZ
        keep = self.batch_dim + self.event_dim
        NA = sum_leading(NA, keep)
        SEz0 = sum_leading(SEz0, keep)
        logZ = sum_leading(logZ, self.batch_dim)
        self.SEzz = SEzz
        self.SEz0 = SEz0
        self.NA = NA
        self.sumlogZ = logZ

    def raw_update_markov_parms(self, X, lr=1.0):
        self.transition.raw_update(X, self.SEzz, iters=4, lr=lr)
        self.initial = self.initial.ss_update(self.SEz0, lr)

    def raw_update_obs_parms(self, Y, lr=1.0):
        self.obs_dist = self.obs_dist.raw_update(Y, self.p, lr)

    def _vb_step(self, beta, initial, obs_dist, X, Y, lr):
        """One pure VB sweep over (transition-beta, initial, obs) nodes.

        The MNLR transition is a stateful shell around its ``beta`` node; the
        node is swapped in for the trace and restored after, so this function
        is pure in its pytree arguments and jits/scans cleanly."""
        fb = self._fb()
        tr = self.transition
        saved = tr.beta
        try:
            tr.beta = beta
            p, SEzz, SEz0, logZ = fb(
                tr.log_predict(X),
                initial.loggeomean(),
                obs_dist.Elog_like(Y),
                self.ptemp,
            )
            keep = self.batch_dim + self.event_dim
            NA = sum_leading(p.sum(0), keep)
            SEz0r = sum_leading(SEz0, keep)
            sumlogZ = sum_leading(logZ, self.batch_dim)
            tr.raw_update(X, SEzz, iters=4, lr=lr)
            new_beta = tr.beta
            KL_tr = tr.KLqprior()
        finally:
            tr.beta = saved
        initial = initial.ss_update(SEz0r, lr)
        obs_dist = obs_dist.raw_update(Y, p, lr)
        KL = obs_dist.KLqprior().sum(-1) + KL_tr + initial.KLqprior()
        for _ in range(self.event_dim - 1):
            KL = KL.sum(-1)
        ELBO = jnp.sum(sumlogZ - KL)
        return new_beta, initial, obs_dist, p, NA, sumlogZ, ELBO

    def _vb_multi(self, beta, initial, obs_dist, X, Y, lr, iters):
        def body(carry, _):
            beta, initial, obs_dist = carry
            beta, initial, obs_dist, _p, _NA, _sumlogZ, ELBO = self._vb_step(
                beta, initial, obs_dist, X, Y, lr
            )
            return (beta, initial, obs_dist), ELBO

        # stack only the ELBO trajectory; the last sweep runs outside the
        # scan so intermediate p/NA never hit an iters-stacked HBM buffer
        carry, ELBOs = jax.lax.scan(
            body, (beta, initial, obs_dist), None, length=iters - 1
        )
        beta, initial, obs_dist, p, NA, sumlogZ, ELBO = self._vb_step(
            *carry, X, Y, lr
        )
        ELBOs = jnp.concatenate([ELBOs, ELBO[None]], 0)
        return beta, initial, obs_dist, p, NA, sumlogZ, ELBOs

    def raw_update(self, X, Y, iters=1, lr=1.0, verbose=False):
        if iters < 1:
            raise ValueError(f"iters must be >= 1, got {iters}")
        import numpy as np

        Y = Y[..., None, :]
        X = X[..., None, :]
        if not hasattr(self, "_jit_cache"):
            self._jit_cache = {}
        from ..ops.parallel_kalman import _dispatch_state

        key = ("vb_multi", iters, self.ptemp, self.parallel_scan,
               getattr(self, "time_mesh", None), _dispatch_state())
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(
                self._vb_multi, static_argnames=("iters",)
            )
        (
            beta,
            self.initial,
            self.obs_dist,
            self.p,
            self.NA,
            self.sumlogZ,
            ELBOs,
        ) = self._jit_cache[key](
            self.transition.beta, self.initial, self.obs_dist, X, Y, lr, iters
        )
        self.transition.beta = beta
        self.logZ = self.sumlogZ
        ELBOs = np.asarray(ELBOs)  # one host fetch for all iterations
        ELBO_last = -np.inf
        for ELBO in ELBOs:
            if verbose:
                print(
                    "Percent Change in ELBO = %f"
                    % float((ELBO - ELBO_last) / np.abs(ELBO_last) * 100)
                )
            ELBO_last = ELBO
            self.ELBO_save.append(float(ELBO))

    update = raw_update

    def KLqprior(self):
        KL = (
            self.obs_dist.KLqprior().sum(-1)
            + self.transition.KLqprior()
            + self.initial.KLqprior()
        )
        for _ in range(self.event_dim - 1):
            KL = KL.sum(-1)
        return KL

    def ELBO(self):
        return self.sumlogZ - self.KLqprior()

    def assignment_pr(self):
        return self.p

    def assignment(self):
        return self.p.argmax(-1)
