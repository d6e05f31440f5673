"""Tensor-state HMMs: multi-axis discrete states via full or factorized
transition tensors (reference models/Tensor_HMM.py, Factorial_HMM.py,
HHMM.py)."""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..dists import Dirichlet, NormalInverseWishart
from ..transforms.transition import HierarchicalTransition, Transition
from ..utils import math as um
from ..utils.jaxutils import replace, sum_leading


def _unsq_right(x, ed):
    return x.reshape(x.shape + (1,) * ed)


def _unsq_left(x, ed):
    return x.reshape(x.shape[: x.ndim - ed] + (1,) * ed + x.shape[x.ndim - ed:])


def tensor_forward_backward(trans_lgm, init_lgm, obs_logits, event_dim, ptemp=1.0):
    """Generic tensor-state smoother: both HMM scans with event_dim state axes
    (reference Tensor_HMM.forward_backward_steps / HHMM.forward_backward_steps).

    trans_lgm: batch + event + event (broadcastable)
    init_lgm:  batch + event
    obs_logits: (T,) + sample + batch + event
    """
    ed = event_dim
    left = tuple(range(-2 * ed, -ed))
    right = tuple(range(-ed, 0))

    def fwd(logits, obs_t):
        return um.stable_logsumexp(
            _unsq_right(logits, ed) + _unsq_left(obs_t, ed) + trans_lgm, left
        )

    fw0 = fwd(init_lgm, obs_logits[0])
    fw0 = jnp.broadcast_to(
        fw0, jnp.broadcast_shapes(fw0.shape, obs_logits.shape[1:])
    )

    def fwd_step(fw_prev, obs_t):
        fw = fwd(fw_prev, obs_t)
        return fw, fw

    _, fw_rest = jax.lax.scan(fwd_step, fw0, obs_logits[1:])
    fw_logits = jnp.concatenate([fw0[None], fw_rest], 0)

    logZ = um.stable_logsumexp(fw_logits[-1], right)

    def bwd_step(carry, fw_t):
        sm_next, SEzz = carry
        temp = _unsq_right(fw_t, ed) + trans_lgm
        xi = (temp - um.stable_logsumexp(temp, left, keepdims=True)) + _unsq_left(
            sm_next, ed
        )
        sm_t = um.stable_logsumexp(xi, right)
        SEzz = SEzz + jnp.exp(
            xi - um.stable_logsumexp(xi, left + right, keepdims=True)
        )
        return (sm_t, SEzz), sm_t

    eshape = fw_logits.shape[-ed:]
    SEzz0 = jnp.zeros(
        jnp.broadcast_shapes(
            fw_logits.shape[1:] + eshape,
            trans_lgm.shape,
        ),
        fw_logits.dtype,
    )
    (_, SEzz), sm_rest = jax.lax.scan(
        bwd_step, (fw_logits[-1], SEzz0), fw_logits[:-1], reverse=True
    )
    smoothed = jnp.concatenate([sm_rest, fw_logits[-1:]], 0)

    temp = _unsq_right(init_lgm, ed) + trans_lgm
    xi = (temp - um.stable_logsumexp(temp, left, keepdims=True)) + _unsq_left(
        smoothed[0], ed
    )
    SEz0 = um.stable_logsumexp(xi, right)
    SEz0 = jnp.exp(SEz0 - um.stable_logsumexp(SEz0, right, keepdims=True))
    SEzz = SEzz + jnp.exp(xi - um.stable_logsumexp(xi, left + right, keepdims=True))

    p = jnp.exp(um.stable_softmax(smoothed, right) / ptemp)
    p = p / p.sum(right, keepdims=True)
    return p, SEzz, SEz0, logZ


class Tensor_HMM:
    """HMM with tensor-valued state via a full ``Transition`` node
    (reference models/Tensor_HMM.py)."""

    transition_cls = Transition

    def __init__(self, obs_dist, event_shape, ptemp=1.0, prior_parms=None, key=None):
        from ..utils.rng import key_or_next
        import jax.random as jr

        assert len(obs_dist.batch_shape) >= len(event_shape)
        self.obs_dist = obs_dist
        self.dim = int(np.prod(event_shape))
        self.event_dim = len(event_shape)
        self.event_shape = tuple(event_shape)
        self.batch_shape = tuple(obs_dist.batch_shape[: -len(event_shape)])
        self.batch_dim = len(self.batch_shape)
        if prior_parms is None and self.transition_cls is Transition:
            alpha = jnp.eye(self.dim).reshape(self.event_shape + self.event_shape) + 0.5
            prior_parms = {"alpha": alpha}
        key = key_or_next(key)
        self.transition = self.transition_cls.create(
            self.event_shape, self.batch_shape, prior_parms=prior_parms, key=key
        )
        self.initial = Dirichlet.create(
            self.event_shape, self.batch_shape, key=jr.fold_in(key, 1)
        )
        self.p = None
        self.ptemp = ptemp
        self.logZ = jnp.asarray(-jnp.inf)
        self.ELBO_last = jnp.asarray(-jnp.inf)
        self.ELBO_save = []
        self._jit_cache = {}

    def _obs_logits(self, obs_dist, X):
        Xv = X.reshape(
            X.shape[: X.ndim - obs_dist.event_dim]
            + self.event_dim * (1,)
            + X.shape[X.ndim - obs_dist.event_dim:]
        )
        return obs_dist.Elog_like(Xv)

    def _obs_update(self, obs_dist, X, p, lr, beta):
        Xv = X.reshape(
            X.shape[: X.ndim - obs_dist.event_dim]
            + self.event_dim * (1,)
            + X.shape[X.ndim - obs_dist.event_dim:]
        )
        return obs_dist.raw_update(Xv, p=p, lr=lr, beta=beta)

    def _estep(self, transition, initial, obs_dist, X):
        logits = self._obs_logits(obs_dist, X)
        p, SEzz, SEz0, logZ = tensor_forward_backward(
            transition.loggeomean(),
            initial.loggeomean(),
            logits,
            self.event_dim,
            self.ptemp,
        )
        keep = self.batch_dim + self.event_dim
        NA = sum_leading(p.sum(0), keep)
        SEzz = sum_leading(SEzz, keep + self.event_dim)
        SEz0 = sum_leading(SEz0, keep)
        logZ = sum_leading(logZ, self.batch_dim)
        return p, SEzz, SEz0, NA, logZ

    def _post_markov_update(self, transition):
        return transition

    def _vb_step(self, transition, initial, obs_dist, X, lr, beta):
        p, SEzz, SEz0, NA, logZ = self._estep(transition, initial, obs_dist, X)
        transition = self._post_markov_update(
            transition.ss_update(SEzz, lr=lr, beta=beta)
        )
        initial = initial.ss_update(SEz0, lr=lr, beta=beta)
        obs_dist = self._obs_update(obs_dist, X, p, lr, beta)
        KL = (
            obs_dist.KLqprior().sum(tuple(range(-self.event_dim, 0)))
            + transition.KLqprior()
            + initial.KLqprior()
        )
        return transition, initial, obs_dist, p, NA, logZ, logZ - KL

    def _vb_multi(self, transition, initial, obs_dist, X, lr, beta, iters):
        """All iterations fused into one device call (lax.scan over sweeps)."""

        def body(carry, _):
            transition, initial, obs_dist = carry
            transition, initial, obs_dist, _p, _NA, _logZ, ELBO = self._vb_step(
                transition, initial, obs_dist, X, lr, beta
            )
            return (transition, initial, obs_dist), ELBO

        # stack only the ELBO trajectory; run the last sweep outside the scan
        # so intermediate iterations never write the (T, b, K...) posterior
        # into an iters-stacked HBM buffer only whose last slice is read
        carry, ELBOs = jax.lax.scan(
            body, (transition, initial, obs_dist), None, length=iters - 1
        )
        transition, initial, obs_dist, p, NA, logZ, ELBO = self._vb_step(
            *carry, X, lr, beta
        )
        ELBOs = jnp.concatenate([ELBOs, ELBO[None]], 0)
        return transition, initial, obs_dist, p, NA, logZ, ELBOs

    def update(self, X, iters=1, T=None, lr=1.0, beta=None, verbose=False):
        if iters < 1:
            raise ValueError(f"iters must be >= 1, got {iters}")
        import numpy as np

        # key on ptemp: it is baked into the trace (see hmm._jitted)
        if iters == 1:
            vbkey = ("vb", self.ptemp)
            if vbkey not in self._jit_cache:
                self._jit_cache[vbkey] = jax.jit(
                    self._vb_step, static_argnames=("beta",)
                )
            (
                self.transition,
                self.initial,
                self.obs_dist,
                self.p,
                self.NA,
                self.logZ,
                ELBO,
            ) = self._jit_cache[vbkey](
                self.transition, self.initial, self.obs_dist, X, lr, beta
            )
            ELBOs = np.asarray(ELBO)[None]
        else:
            vbkey = ("vb_multi", iters, self.ptemp)
            if vbkey not in self._jit_cache:
                self._jit_cache[vbkey] = jax.jit(
                    self._vb_multi, static_argnames=("beta", "iters")
                )
            (
                self.transition,
                self.initial,
                self.obs_dist,
                self.p,
                self.NA,
                self.logZ,
                ELBOs,
            ) = self._jit_cache[vbkey](
                self.transition, self.initial, self.obs_dist, X, lr, beta, iters
            )
            ELBOs = np.asarray(ELBOs)  # one host fetch for all iterations
        for ELBO in ELBOs:
            if verbose:
                print(
                    "Percent Change in ELBO = ",
                    (ELBO - self.ELBO_last) / np.abs(self.ELBO_last) * 100,
                )
            self.ELBO_last = ELBO
            self.ELBO_save.append(float(np.sum(ELBO)))

    def update_states(self, X, T=None):
        ekey = ("estep", self.ptemp)
        if ekey not in self._jit_cache:
            self._jit_cache[ekey] = jax.jit(self._estep)
        self.p, SEzz, SEz0, NA, logZ = self._jit_cache[ekey](
            self.transition, self.initial, self.obs_dist, X
        )
        self.logZ = logZ
        return SEzz, SEz0, NA, logZ

    def update_markov_parms(self, SEzz, SEz0, lr=1.0, beta=None):
        self.transition = self._post_markov_update(
            self.transition.ss_update(SEzz, lr=lr, beta=beta)
        )
        self.initial = self.initial.ss_update(SEz0, lr=lr, beta=beta)

    def update_obs_parms(self, X, lr=1.0, beta=None):
        self.obs_dist = self._obs_update(self.obs_dist, X, self.p, lr, beta)

    def KLqprior(self):
        return (
            self.obs_dist.KLqprior().sum(tuple(range(-self.event_dim, 0)))
            + self.transition.KLqprior()
            + self.initial.KLqprior()
        )

    def ELBO(self):
        return self.logZ - self.KLqprior()

    def assignment_pr(self):
        return self.p

    def assignment(self):
        return self.p.argmax(-1)


class HHMM(Tensor_HMM):
    """Hierarchical HMM: chain-factorized transition tensor
    (reference models/HHMM.py)."""

    transition_cls = HierarchicalTransition

    def __init__(self, obs_dist, event_dim=2, event_shape=(), ptemp=1.0, key=None):
        assert event_dim > 1, "HHMM: event_dim must be > 1; use HMM instead"
        if event_shape == ():
            event_shape = tuple(obs_dist.batch_shape[-event_dim:])
        super().__init__(obs_dist, event_shape, ptemp=ptemp, prior_parms=None, key=key)


class Factorial_HMM(Tensor_HMM):
    """Tensor HMM with a factorized transition prior; projects the transition
    posterior onto factorized form after every M-step
    (reference models/Factorial_HMM.py)."""

    def __init__(self, num_factors, factor_shape, event_shape, batch_shape=(), key=None):
        obs_dist = NormalInverseWishart.create(
            tuple(event_shape),
            batch_shape=tuple(batch_shape) + num_factors * tuple(factor_shape),
            key=key,
        )
        self.num_factors = num_factors
        self.factor_shape = tuple(factor_shape)
        fl = len(factor_shape)
        alpha = 0.0
        self.marg_sum_list = []
        for i in range(num_factors):
            eshape = i * fl * (1,) + tuple(factor_shape) + (num_factors - i - 1) * fl * (1,)
            d = int(np.prod(eshape))
            lil = jnp.eye(d).reshape(eshape + eshape) + 0.5
            alpha = alpha + lil
            self.marg_sum_list.append(
                tuple(
                    x
                    for x in range(-2 * len(eshape), 0)
                    if (2 * eshape)[x] == 1
                )
            )
        alpha = alpha / alpha.max() * 2
        super().__init__(
            obs_dist,
            event_shape=num_factors * tuple(factor_shape),
            prior_parms={"alpha": alpha},
            key=key,
        )

    def _post_markov_update(self, transition):
        """factorize_transition_probabilities (reference Factorial_HMM.py:24-36)."""
        alpha = transition.alpha
        alpha_new = 0.0
        for i in range(self.num_factors):
            alpha_new = alpha_new + alpha.mean(
                self.marg_sum_list[i], keepdims=True
            ) / self.num_factors
        return replace(transition, alpha=jnp.broadcast_to(alpha_new, alpha.shape))
