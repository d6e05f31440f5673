"""Bayesian "transformer" stacks: observations soft-assigned to
latents/roles via mixtures of linear maps (working counterparts of reference
transforms/wip_GenerativeBayesianTransformer.py and
wip_FocusedBayesianTransformer.py; both wip files carry stale constructor
signatures in the reference tree and are exercised only by
tests/test_transformers.py)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..dists import Dirichlet
from ..dists.delta import Delta
from ..dists.mvn_vector_format import MultivariateNormal_vector_format as MVN_vf
from ..utils import math as um
from ..utils.jaxutils import sum_leading
from .dmix_linear_transforms import dMixtureofLinearTransforms
from .matrix_normal_wishart import MatrixNormalWishart


class GenerativeBayesianTransformer:
    """p(y_i | x_z, role_i, z_i): observations cluster into mixture_dim
    latents, each observation playing one of role_dim roles
    (reference wip_GenerativeBayesianTransformer)."""

    def __init__(self, mixture_dim, role_dim, obs_dim, hidden_dim, batch_shape=(),
                 pad_X=False, key=None):
        from ..utils.rng import key_or_next
        import jax.random as jr

        key = key_or_next(key)
        self.obs_dim = obs_dim
        self.batch_shape = tuple(batch_shape)
        self.batch_dim = len(batch_shape)
        self.event_dim = 3
        self.role_dim = role_dim
        self.hidden_dim = hidden_dim
        self.mixture_dim = mixture_dim

        self.A = MatrixNormalWishart.create(
            (obs_dim, hidden_dim),
            batch_shape=(mixture_dim, role_dim),
            scale=1.0 / (role_dim * mixture_dim),
            pad_X=pad_X,
            key=key,
        )
        self.pi_role = Dirichlet.create((role_dim,), (mixture_dim,), key=jr.fold_in(key, 1))
        self.pi_mix = Dirichlet.create((mixture_dim,), key=jr.fold_in(key, 2))
        self.p = None
        self.pX = None
        self.ELBO_last = -jnp.inf
        self.ELBO_save = []

    def _init_pX(self):
        return MVN_vf(
            invSigma=jnp.eye(self.hidden_dim),
            invSigmamu=jnp.zeros((self.hidden_dim, 1)),
        )

    def update_assignments(self, Y):
        if self.pX is None:
            self.pX = self._init_pX()
        Yv = Y[..., None][..., None, None, :, :]  # obs x 1(mix) x 1(role) x d x 1
        log_p = (
            self.A.Elog_like_given_pX_pY(self.pX, Delta(Yv))
            + self.pi_role.ElogX()
            + self.pi_mix.ElogX()[..., None]
        )
        logZ = um.stable_logsumexp(log_p, (-1, -2), keepdims=True)
        self.p = jnp.exp(log_p - logZ)
        self.NA = sum_leading(self.p.sum(-3), 2)
        return logZ[..., 0, 0]

    def update_latents(self, Y):
        """Role/mixture-averaged latent messages, one latent per mixture
        component per sample (reference wip_GBT.update_latents:52-62)."""
        if self.p is None:
            self.update_assignments(Y)
        Yv = Y[..., None][..., None, None, :, :]
        invSigma, invSigmamu, Res = self.A.Elog_like_X(Yv)
        pv = self.p[..., None, None]
        # sum over roles (-3) and observations (-5), keep the mixture axis
        invSigma = (invSigma * pv).sum((-3, -5), keepdims=True) + jnp.eye(self.hidden_dim)
        invSigmamu = (invSigmamu * pv).sum((-3, -5), keepdims=True)
        Res = (Res * self.p).sum((-3, -1), keepdims=True)
        self.pX = MVN_vf(invSigma=invSigma, invSigmamu=invSigmamu)
        return Res - self.pX.Res()

    def update_parms(self, Y, lr=1.0):
        Yv = Y[..., None][..., None, None, :, :]
        self.A = self.A.update(self.pX, Delta(Yv), p=self.p, lr=lr)
        self.pi_role = self.pi_role.raw_update(self.NA, lr=lr)
        self.pi_mix = self.pi_mix.raw_update(self.NA.sum(-1), lr=lr)

    def _vb_step(self, nodes, Y, lr, latent_iters):
        """One VB sweep as a pure function of (A, pi_role, pi_mix, pX)
        (reference wip_GBT raw_update body; latent_iters unrolls in-trace)."""
        A, pi_role, pi_mix, pX = nodes
        Yv = Y[..., None][..., None, None, :, :]
        ELBO_res = jnp.asarray(0.0, Y.dtype)
        p = NA = None
        for _ in range(latent_iters):
            log_p = (
                A.Elog_like_given_pX_pY(pX, Delta(Yv))
                + pi_role.ElogX()
                + pi_mix.ElogX()[..., None]
            )
            logZ = um.stable_logsumexp(log_p, (-1, -2), keepdims=True)
            p = jnp.exp(log_p - logZ)
            NA = sum_leading(p.sum(-3), 2)
            invSigma, invSigmamu, Res = A.Elog_like_X(Yv)
            pv = p[..., None, None]
            invSigma = (invSigma * pv).sum((-3, -5), keepdims=True) + jnp.eye(
                self.hidden_dim
            )
            invSigmamu = (invSigmamu * pv).sum((-3, -5), keepdims=True)
            Res = (Res * p).sum((-3, -1), keepdims=True)
            pX = MVN_vf(invSigma=invSigma, invSigmamu=invSigmamu)
            ELBO_res = (Res - pX.Res()).sum()
        plogp = jnp.where(
            p > 0, p * jnp.log(jnp.where(p > 0, p, 1.0)), 0.0
        )
        KL = (
            A.KLqprior().sum((-1, -2))
            + pi_mix.KLqprior()
            + pi_role.KLqprior().sum(-1)
        )
        ELBO = (
            ELBO_res
            - plogp.sum()
            + (NA * (pi_mix.ElogX()[..., None] + pi_role.ElogX())).sum()
            - KL
        )
        A = A.update(pX, Delta(Yv), p=p, lr=lr)
        pi_role = pi_role.raw_update(NA, lr=lr)
        pi_mix = pi_mix.raw_update(NA.sum(-1), lr=lr)
        # canonical natural-param-only message: .Res() above materializes
        # lazy fields, which would change the carry pytree structure
        pX = MVN_vf(invSigma=pX.invSigma, invSigmamu=pX.invSigmamu)
        return (A, pi_role, pi_mix, pX), (ELBO, p, NA)

    def raw_update(self, Y, iters=1, latent_iters=1, lr=1.0, verbose=False):
        import functools

        from ._fused import fused_fit, record_elbos

        if self.pX is None:
            # broadcast the unbatched init to the carried per-sample
            # (sample..., 1, mix, 1, h, .) shape so the scan carry is
            # shape-stable (numerically identical under broadcasting)
            pX0 = self._init_pX()
            shape = Y.shape[:-2] + (1, self.mixture_dim, 1)
            self.pX = MVN_vf(
                invSigma=jnp.broadcast_to(
                    pX0.invSigma, shape + (self.hidden_dim, self.hidden_dim)
                ),
                invSigmamu=jnp.broadcast_to(
                    pX0.invSigmamu, shape + (self.hidden_dim, 1)
                ),
            )
        def named_step(nodes, Y, lr):
            return self._vb_step(nodes, Y, lr, int(latent_iters))

        named_step.__name__ = f"_vb_step_li{int(latent_iters)}"
        nodes = (self.A, self.pi_role, self.pi_mix, self.pX)
        (self.A, self.pi_role, self.pi_mix, self.pX), (self.p, self.NA), ELBOs = (
            fused_fit(self, named_step, nodes, int(iters), Y, lr=lr)
        )
        record_elbos(self, ELBOs, verbose)

    def KLqprior(self):
        return (
            self.A.KLqprior().sum((-1, -2))
            + self.pi_mix.KLqprior()
            + self.pi_role.KLqprior().sum(-1)
        )

    def Elog_like(self, Y):
        return self.update_latents(Y).sum(-1)

    def postdict(self, Y, iters=0):
        for _ in range(iters):
            self.update_assignments(Y)
            self.update_latents(Y)
        return self.pX


class FocusedBayesianTransformer:
    """Roles selected by the latent: a Dirichlet mixture over
    dMixtureofLinearTransforms heads (reference wip_FocusedBayesianTransformer)."""

    def __init__(self, mixture_dim, role_dim, obs_dim, hidden_dim, batch_shape=(),
                 pad_X=False, key=None):
        from ..utils.rng import key_or_next
        import jax.random as jr

        key = key_or_next(key)
        self.obs_dim = obs_dim
        self.batch_shape = tuple(batch_shape)
        self.batch_dim = len(batch_shape)
        self.event_dim = 3
        self.role_dim = role_dim
        self.hidden_dim = hidden_dim
        self.mixture_dim = mixture_dim
        self.W = dMixtureofLinearTransforms(
            obs_dim, hidden_dim, role_dim, batch_shape=(mixture_dim,), pad_X=pad_X,
            key=key,
        )
        self.pi = Dirichlet.create((mixture_dim,), key=jr.fold_in(key, 1))
        self.p = None
        self.pX = None
        self.ELBO_last = -jnp.inf
        self.ELBO_save = []

    def _init_pX(self):
        return MVN_vf(
            invSigma=jnp.broadcast_to(
                jnp.eye(self.hidden_dim), (1, self.mixture_dim, self.hidden_dim, self.hidden_dim)
            ),
            invSigmamu=jnp.zeros((1, self.mixture_dim, self.hidden_dim, 1)),
        )

    def update_assignments(self, Y):
        if self.pX is None:
            self.pX = self._init_pX()
        pY = MVN_vf(
            mu=Y[..., None][..., None, :, :],
            Sigma=1e-8 * jnp.eye(self.obs_dim),
            invSigma=1e8 * jnp.eye(self.obs_dim),
            invSigmamu=1e8 * Y[..., None][..., None, :, :],
        )
        log_p = self.W.Elog_like_given_pX_pY(self.pX, pY) + self.pi.ElogX()
        logZ = um.stable_logsumexp(log_p, -1, keepdims=True)
        self.p = jnp.exp(log_p - logZ)
        self.NA = sum_leading(self.p.sum(-2), 1)

    def update_latents(self, Y):
        if self.p is None:
            self.update_assignments(Y)
        pX, logZ, _ = self.W.postdict(Y[..., None, :])
        pv = self.p[..., None, None]
        invSigma = (pX.EinvSigma() * pv).sum(-4, keepdims=True) + jnp.eye(self.hidden_dim)
        invSigmamu = (pX.EinvSigmamu() * pv).sum(-4, keepdims=True)
        self.pX = MVN_vf(invSigma=invSigma, invSigmamu=invSigmamu)
        Res = (logZ[..., None] * self.p).sum(-2, keepdims=True) if logZ.ndim else logZ
        return Res - self.pX.Res()

    def update_parms(self, Y, lr=1.0):
        pY = MVN_vf(
            mu=Y[..., None][..., None, :, :],
            Sigma=1e-8 * jnp.eye(self.obs_dim),
            invSigma=1e8 * jnp.eye(self.obs_dim),
            invSigmamu=1e8 * Y[..., None][..., None, :, :],
        )
        self.W.update(self.pX, pY, p=self.p, lr=lr)
        self.pi = self.pi.raw_update(self.NA, lr=lr)

    def _pY(self, Y):
        return MVN_vf(
            mu=Y[..., None][..., None, :, :],
            Sigma=1e-8 * jnp.eye(self.obs_dim),
            invSigma=1e8 * jnp.eye(self.obs_dim),
            invSigmamu=1e8 * Y[..., None][..., None, :, :],
        )

    def _vb_step(self, nodes, Y, lr):
        """One VB sweep as a pure function of (W.A, W.pi.beta, pi, pX)
        (reference wip_FBT raw_update body; W is re-bound via
        dMixLT.with_nodes)."""
        WA, Wbeta, pi, pX = nodes
        W = self.W.with_nodes(WA, Wbeta)
        pY = self._pY(Y)
        # assignments
        log_p = W.Elog_like_given_pX_pY(pX, pY) + pi.ElogX()
        logZa = um.stable_logsumexp(log_p, -1, keepdims=True)
        p = jnp.exp(log_p - logZa)
        NA = sum_leading(p.sum(-2), 1)
        # latents
        pXpost, logZ, _ = W.postdict(Y[..., None, :])
        pv = p[..., None, None]
        invSigma = (pXpost.EinvSigma() * pv).sum(-4, keepdims=True) + jnp.eye(
            self.hidden_dim
        )
        invSigmamu = (pXpost.EinvSigmamu() * pv).sum(-4, keepdims=True)
        pX = MVN_vf(invSigma=invSigma, invSigmamu=invSigmamu)
        Res = (
            (logZ[..., None] * p).sum(-2, keepdims=True) if logZ.ndim else logZ
        )
        ELBO = jnp.sum(Res - pX.Res())
        plogp = jnp.where(
            p > 0, p * jnp.log(jnp.where(p > 0, p, 1.0)), 0.0
        )
        KL = W.KLqprior().sum(-1) + pi.KLqprior()
        ELBO = ELBO - plogp.sum() + (NA * pi.ElogX()).sum() - KL
        # M-steps (reference update_parms)
        (WA, Wbeta), _ = W._vb_step_msg((WA, Wbeta), pX, pY,
                                        pX.unsqueeze(-3), pY.unsqueeze(-3),
                                        p, lr)
        pi = pi.raw_update(NA, lr=lr)
        pX = MVN_vf(invSigma=pX.invSigma, invSigmamu=pX.invSigmamu)
        return (WA, Wbeta, pi, pX), (ELBO, p, NA)

    def raw_update(self, Y, iters=1, lr=1.0, verbose=False):
        """First sweep runs eagerly (it also gives the pX carry its stable
        shape); the remaining sweeps are ONE fused lax.scan device call."""
        from ._fused import fused_fit

        self.update_assignments(Y)
        ELBO = jnp.sum(self.update_latents(Y))
        plogp = jnp.where(self.p > 0, self.p * jnp.log(jnp.where(self.p > 0, self.p, 1.0)), 0.0)
        ELBO = ELBO - plogp.sum() + (self.NA * self.pi.ElogX()).sum() - self.KLqprior()
        if verbose:
            print(
                "Focused Transformer Percent Change in ELBO: ",
                (ELBO - self.ELBO_last) / jnp.abs(self.ELBO_last) * 100,
            )
        self.ELBO_last = ELBO
        self.ELBO_save.append(float(ELBO))
        self.update_parms(Y, lr=lr)

        if int(iters) <= 1:
            return
        # canonical natural-param-only pX for a shape-stable scan carry
        self.pX = MVN_vf(invSigma=self.pX.invSigma, invSigmamu=self.pX.invSigmamu)
        nodes = (self.W.A, self.W.pi.beta, self.pi, self.pX)
        (WA, Wbeta, self.pi, self.pX), (self.p, self.NA), ELBOs = fused_fit(
            self, self._vb_step, nodes, int(iters) - 1, Y, lr=lr
        )
        self.W.A = WA
        self.W.pi.beta = Wbeta
        import numpy as np_

        for e in np_.asarray(ELBOs, np_.float64):
            if verbose:
                print(
                    "Focused Transformer Percent Change in ELBO: ",
                    (e - self.ELBO_last) / abs(self.ELBO_last) * 100,
                )
            self.ELBO_last = float(e)
            self.ELBO_save.append(float(e))

    def Elog_like(self, Y):
        return self.update_latents(Y).sum(-1)

    def KLqprior(self):
        return self.W.KLqprior().sum(-1) + self.pi.KLqprior()


# The reference's wip_DiscreteBayesianTransformer.py is byte-identical to
# wip_FocusedBayesianTransformer.py modulo the class name (verified by
# whitespace-insensitive diff), so the working counterpart is shared.
DiscreteBayesianTransformer = FocusedBayesianTransformer


class ChainedBayesianTransformer:
    """Out-of-order chain discovery: each observation y_i is either
    independent (z_i = -1, modeled by a NIW base density) or driven by one of
    the other observations through a shared linear map W
    (reference transforms/wip_ChainedBayesianTransformer.py:11-65)."""

    def __init__(self, mixture_dim, role_dim, n, p, batch_shape=(), pad_X=False,
                 key=None):
        from ..dists.niw_vector_format import NormalInverseWishart_vector_format
        from ..utils.rng import key_or_next
        import jax.random as jr

        key = key_or_next(key)
        self.obs_dim = n
        self.regression_dim = p
        self.event_shape = (mixture_dim, n, p)
        self.event_dim = 3
        self.batch_shape = tuple(batch_shape)
        self.batch_dim = len(batch_shape)
        self.role_dim = role_dim
        self.mixture_dim = mixture_dim

        self.x0 = NormalInverseWishart_vector_format.create((n, 1), key=key)
        self.W = MatrixNormalWishart.create((n, n), key=jr.fold_in(key, 1))
        # pi.mean()[0] = probability an observation is independent of the rest
        self.pi = Dirichlet.create((2,), key=jr.fold_in(key, 2))

    def _vb_step(self, nodes, Y, lr):
        """One VB sweep as a pure function of (x0, W, pi) (reference
        wip_ChainedBayesianTransformer.raw_update body)."""
        x0, W, pi = nodes
        NR = Y.shape[-2]
        eye = jnp.eye(NR)
        log_p = (
            W.Elog_like(Y[..., :, None, :, None], Y[..., None, :, :, None])
            + pi.ElogX()[1]
            - jnp.log(NR - 1.0)
        )
        log_p = log_p * (1.0 - eye) + (
            x0.Elog_like(Y[..., None])[..., None] + pi.ElogX()[0]
        ) * eye

        shift = log_p.max(-1, keepdims=True)
        log_p = log_p - shift
        p = jnp.exp(log_p)
        logZ = p.sum(-1, keepdims=True)
        p = p / logZ
        logZ = (jnp.log(logZ) + shift)[..., 0]
        KL = x0.KLqprior() + W.KLqprior() + pi.KLqprior()
        ELBO = jnp.sum(logZ.sum() - KL)

        p0 = jnp.diagonal(p, axis1=-1, axis2=-2)
        x0 = x0.raw_update(Y[..., None], p=p0, lr=lr)
        p = p * (1.0 - eye)

        N = jnp.asarray(float(np.prod(Y.shape[:-1])))[None]
        N0 = p0.sum()[None]
        pi = pi.raw_update(jnp.concatenate([N0, N - N0], -1), lr=lr)
        W = W.raw_update(
            Y[..., :, None, :, None], Y[..., None, :, :, None], p=p, lr=lr
        )
        return (x0, W, pi), (ELBO, logZ, p)

    def raw_update(self, Y, iters=1, lr=1.0, beta=None, verbose=False):
        """Y: sample x num_obs x n."""
        from ._fused import fused_fit

        (self.x0, self.W, self.pi), (self.logZ, self.p), _ELBOs = fused_fit(
            self, self._vb_step, (self.x0, self.W, self.pi), int(iters), Y,
            lr=lr,
        )

    update = raw_update

    def KLqprior(self):
        return self.x0.KLqprior() + self.W.KLqprior() + self.pi.KLqprior()

    def ELBO(self):
        return self.logZ.sum() - self.KLqprior()
