"""Directed mixture of linear transforms (mixture-of-experts): gate p(z|x) is
an MNLR, experts are MNW/MNG (reference transforms/dMixtureofLinearTransforms.py)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..dists.mvn_vector_format import MultivariateNormal_vector_format as MVN_vf
from ..utils import math as um
from ..utils.linalg import mT, psd_logdet
from .matrix_normal_gamma import MatrixNormalGamma
from .matrix_normal_wishart import MatrixNormalWishart
from .mnlr import MultiNomialLogisticRegression


class dMixtureofLinearTransforms:
    def __init__(
        self,
        n,
        p,
        mixture_dim,
        batch_shape=(),
        pad_X=True,
        type="Wishart",
        fixed_precision=False,
        key=None,
    ):
        from ..utils.rng import key_or_next
        import jax.random as jr

        key = key_or_next(key)
        self.event_shape = (mixture_dim, n, p)
        self.batch_shape = tuple(batch_shape)
        self.batch_dim = len(batch_shape)
        self.event_dim = 3
        self.n, self.p, self.mix_dim = n, p, mixture_dim
        self.ELBO_last = -jnp.inf
        self.ELBO_save = []

        scale = 1.0 / mixture_dim ** (1.0 / n)
        cls = {"Wishart": MatrixNormalWishart, "Gamma": MatrixNormalGamma}[type]
        kw = dict(scale=scale, pad_X=pad_X, fixed_precision=fixed_precision, key=key)
        self.A = cls.create(
            event_shape=(n, p), batch_shape=tuple(batch_shape) + (mixture_dim,), **kw
        )
        self.pi = MultiNomialLogisticRegression(
            mixture_dim, p, batch_shape=tuple(batch_shape), pad_X=True,
            key=jr.fold_in(key, 1),
        )
        self.p = None
        self.logZ = None
        self.NA = None

    def _vb_step_raw(self, nodes, X, AX, AY, p, lr):
        """One VB sweep as a pure function of (A, pi.beta) (reference
        dMixtureofLinearTransforms.raw_update:37-56 body).  The ELBO is
        tracked unconditionally (the reference only computes it under
        verbose; the value bookkeeping is identical)."""
        A, pibeta = nodes
        pi = self.pi.with_beta(pibeta)
        log_p = A.Elog_like(AX, AY) + pi.log_predict(X)
        shift = jax.lax.stop_gradient(log_p.max(-1, keepdims=True))
        log_p = log_p - shift
        p_ass = jnp.exp(log_p)
        p_ass = p_ass / p_ass.sum(-1, keepdims=True)
        logZ = (shift[..., 0] + jax.scipy.special.logsumexp(log_p, -1)).sum(0)
        KL = A.KLqprior().sum(-1) + pi.KLqprior()
        ELBO = jnp.sum(logZ - KL)
        pibeta = pi.raw_update_beta(pibeta, X, p_ass, p=p, lr=lr)
        if p is None:
            A = A.raw_update(AX, AY, p=p_ass, lr=lr)
        else:
            A = A.raw_update(AX, AY, p=p_ass * p[..., None], lr=lr)
        return (A, pibeta), (ELBO, p_ass)

    def raw_update(self, X, Y, p=None, iters=1, lr=1.0, verbose=False):
        from ._fused import fused_fit

        AX = X[..., None][..., None, :, :]  # sample x batch x 1 x p x 1
        AY = Y[..., None][..., None, :, :]
        (self.A, pibeta), (self.p,), ELBOs = fused_fit(
            self, self._vb_step_raw, (self.A, self.pi.beta), int(iters),
            X, AX, AY, p, lr=lr,
        )
        self.pi.beta = pibeta
        import numpy as np

        for e in np.asarray(ELBOs, np.float64):
            if verbose:
                print(
                    "dMixture Percent Change in ELBO = ",
                    (e - self.ELBO_last) / abs(self.ELBO_last) * 100,
                )
                self.ELBO_last = float(e)
            self.ELBO_save.append(float(e))

    def with_nodes(self, A, pibeta):
        """Shallow copy carrying different (A, pi.beta) posteriors — lets
        fused fits of CONSUMERS (the Bayesian transformers) thread this
        mixture's state through a lax.scan."""
        import copy

        c = copy.copy(self)
        c.A = A
        c.pi = self.pi.with_beta(pibeta)
        return c

    def _vb_step_msg(self, nodes, pX, pY, pAX, pAY, p, lr):
        """One message-valued VB sweep as a pure function of (A, pi.beta).
        NOTE the reference computes this path's ELBO AFTER the M-step
        (post-update KL) — preserved."""
        A, pibeta = nodes
        pi = self.pi.with_beta(pibeta)
        log_p = A.Elog_like_given_pX_pY(pAX, pAY) + pi.log_forward(pX)
        shift = jax.lax.stop_gradient(log_p.max(-1, keepdims=True))
        log_p = log_p - shift
        logZ = shift[..., 0] + jax.scipy.special.logsumexp(log_p, -1)
        p_ass = jnp.exp(log_p)
        p_ass = p_ass / p_ass.sum(-1, keepdims=True)
        NA = p_ass.sum(0)
        pibeta = pi.update_beta(pibeta, pX, p_ass, p=p, lr=lr)
        if p is None:
            A = A.update(pAX, pAY, p=p_ass, lr=lr)
        else:
            A = A.update(pAX, pAY, p=p_ass * p[..., None], lr=lr)
        KL = A.KLqprior().sum(-1) + self.pi.with_beta(pibeta).KLqprior()
        ELBO = logZ.sum() - KL.sum()
        return (A, pibeta), (ELBO, logZ, p_ass, NA)

    def update(self, pX, pY, p=None, iters=1, lr=1.0, verbose=False):
        from ._fused import fused_fit

        pAX = pX.unsqueeze(-3)
        pAY = pY.unsqueeze(-3)
        (self.A, pibeta), (self.logZ, self.p, self.NA), ELBOs = fused_fit(
            self, self._vb_step_msg, (self.A, self.pi.beta), int(iters),
            pX, pY, pAX, pAY, p, lr=lr,
        )
        self.pi.beta = pibeta
        import numpy as np

        for e in np.asarray(ELBOs, np.float64):
            if verbose:
                print(
                    "dMixLT Percent Change in ELBO: ",
                    (e - self.ELBO_last) / abs(self.ELBO_last),
                )
            self.ELBO_last = float(e)
            self.ELBO_save.append(float(e))

    def predict(self, X):
        p = self.pi.predict(X)
        pv = p[..., None, None]
        Xv = X[..., None][..., None, :, :]
        pY = self.A.predict(Xv)[0]
        Sigma = (pY.EXXT() * pv).sum(-3)
        mu = (pY.mean() * pv).sum(-3)
        Sigma = Sigma - mu @ mT(mu)
        return MVN_vf(mu=mu, Sigma=Sigma), p

    def forward(self, pX):
        p = self.pi.forward(pX)
        pY = self.A.forward(pX.unsqueeze(-3))[0]
        pv = p[..., None, None]
        mu = (pY.mean() * pv).sum(-3)
        Sigma = (pY.EXXT() * pv).sum(-3) - mu @ mT(mu)
        return MVN_vf(Sigma=Sigma, mu=mu)

    def forward_mix(self, pX):
        return self.A.forward(pX.unsqueeze(-3)), self.pi.forward(pX)

    def backward(self, pY):
        pX, ResA = self.A.backward(pY.unsqueeze(-3))
        Z = jnp.eye(self.mix_dim)
        for _ in range(self.batch_dim):
            Z = Z[..., None, :]
        pXm, Res = self.pi.backward(Z, like_X=pX)
        log_p = Res + ResA
        p = jnp.exp(log_p - log_p.max(-1, keepdims=True))
        p = p / p.sum(-1, keepdims=True)
        pv = p[..., None, None]
        invSigma = (pXm.EinvSigma() * pv).sum(-3)
        invSigmamu = (pXm.EinvSigmamu() * pv).sum(-3)
        lse = jax.scipy.special.logsumexp(log_p, -1, keepdims=True)
        return MVN_vf(invSigma=invSigma, invSigmamu=invSigmamu), log_p - lse

    def backward_mix(self, pY):
        """Per-expert backward messages WITHOUT collapsing the mixture
        (reference dMixtureofLinearTransforms.py:151-161).  The reference
        body is broken — it reads ``p`` before assigning it (``p = p.exp()``
        → NameError) and swaps pi.backward's argument order vs backward();
        this implements the documented intent: the same gate-informed
        per-component messages as ``backward``, returned un-collapsed along
        with the responsibilities and the total residual.

        Returns (pX_mix, p, Res): pX_mix has the mixture on axis -3 of its
        parameters, p sums to 1 over the last axis, and
        Res = logsumexp(log_p) - pX_mix.Res() (per component, as in the
        reference's final line)."""
        pXm, ResA = self.A.backward(pY.unsqueeze(-3))
        Z = jnp.eye(self.mix_dim)
        for _ in range(self.batch_dim):
            Z = Z[..., None, :]
        pXm, Res = self.pi.backward(Z, like_X=pXm)
        log_p = Res + ResA
        shift = jax.lax.stop_gradient(log_p.max(-1, keepdims=True))
        log_p = log_p - shift
        Res_total = shift[..., 0] + jax.scipy.special.logsumexp(log_p, -1)
        p = jnp.exp(log_p)
        p = p / p.sum(-1, keepdims=True)
        Res_out = Res_total[..., None] - pXm.Res()
        return pXm, p, Res_out

    def postdict(self, Y):
        """Invert the gate via MNLR.Elog_like_X (reference dMixLT.postdict:58-84)."""
        invSigma, invSigmamu, Res = self.A.Elog_like_X(Y[..., None, :][..., None])
        like_X = MVN_vf(
            invSigma=jnp.moveaxis(invSigma[None], -3, -3 - self.batch_dim),
            invSigmamu=jnp.moveaxis(invSigmamu, -3, -3 - self.batch_dim),
        )
        Res = jnp.moveaxis(Res, -1, -1 - self.batch_dim)
        Z = jnp.eye(self.mix_dim)
        for _ in range(self.batch_dim):
            Z = Z[..., None, :]
        invSigma, invSigmamu, Sigma, mu, Res_z = self.pi.Elog_like_X(like_X, Z, iters=4)
        Res = (
            Res
            + Res_z
            + 0.5 * (mu * invSigmamu).sum(-2)[..., 0]
            - 0.5 * psd_logdet(invSigma)
            + like_X.dim / 2.0 * um.LOG2PI
        )
        logZ = jax.scipy.special.logsumexp(Res, -1 - self.batch_dim, keepdims=True)
        logp = Res - logZ
        p = jnp.exp(logp)
        pv = p[..., None, None]
        invSigma = (invSigma * pv).sum(-3 - self.batch_dim)
        invSigmamu = (invSigmamu * pv).sum(-3 - self.batch_dim)
        return (
            MVN_vf(invSigma=invSigma, invSigmamu=invSigmamu),
            logZ[..., 0].squeeze(-1) if logZ.ndim > 1 else logZ[..., 0],
            p,
        )

    def Elog_like_given_pX_pY(self, pX, pY):
        log_p = self.A.Elog_like_given_pX_pY(
            pX.unsqueeze(-3), pY.unsqueeze(-3)
        ) + self.pi.log_forward(pX)
        return jax.scipy.special.logsumexp(log_p, -1)

    def Elog_like(self, X, Y):
        log_p = self.A.Elog_like(
            X[..., None][..., None, :, :], Y[..., None][..., None, :, :]
        ) + self.pi.log_predict(X)
        return jax.scipy.special.logsumexp(log_p, -1)

    def KLqprior(self):
        return self.A.KLqprior().sum(-1) + self.pi.KLqprior()

    def assignment_pr(self):
        return self.p

    def assignment(self):
        return self.p.argmax(-1)
