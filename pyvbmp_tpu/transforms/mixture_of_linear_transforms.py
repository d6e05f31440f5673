"""Mixture over K linear experts with a Dirichlet gate independent of X
(reference transforms/MixtureofLinearTransforms.py)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..dists import Dirichlet
from ..dists.mvn_vector_format import MultivariateNormal_vector_format as MVN_vf
from ..utils.jaxutils import sum_leading
from ..utils.linalg import mT
from .matrix_normal_gamma import MatrixNormalGamma
from .matrix_normal_wishart import MatrixNormalWishart


class MixtureofLinearTransforms:
    def __init__(self, n, p, dim, batch_shape=(), pad_X=True, type="Wishart", key=None):
        from ..utils.rng import key_or_next
        import jax.random as jr

        key = key_or_next(key)
        self.n, self.p, self.dim = n, p, dim
        self.event_dim = 1
        self.event_shape = (dim,)
        self.batch_dim = len(batch_shape)
        self.batch_shape = tuple(batch_shape)
        cls = {"Wishart": MatrixNormalWishart, "Gamma": MatrixNormalGamma}[type]
        self.W = cls.create(
            event_shape=(n, p),
            batch_shape=tuple(batch_shape) + (dim,),
            scale=1.0 / dim ** (1.0 / n),
            pad_X=pad_X,
            key=key,
        )
        self.pi = Dirichlet.create((dim,), tuple(batch_shape), key=jr.fold_in(key, 1))
        self.ELBO_last = -jnp.inf
        self.ELBO_save = []
        self.p = None
        self.logZ = None

    def _assign(self, W, pi, X, Y, via_messages=False):
        if via_messages:
            log_p = W.Elog_like_given_pX_pY(X.unsqueeze(-3), Y.unsqueeze(-3))
        else:
            log_p = W.Elog_like(X[..., None, :, :], Y[..., None, :, :])
        log_p = log_p + pi.loggeomean()
        shift = jax.lax.stop_gradient(log_p.max(-1, keepdims=True))
        p = jnp.exp(log_p - shift)
        logZ = p.sum(-1, keepdims=True)
        p = p / logZ
        logZ = jnp.log(logZ[..., 0]) + shift[..., 0]
        return p, logZ

    def update_assignments(self, X, Y):
        self.p, self.logZ = self._assign(self.W, self.pi, X, Y)

    def update_assignments_given_pX_pY(self, pX, pY):
        self.p, self.logZ = self._assign(self.W, self.pi, pX, pY, via_messages=True)

    def _vb_step(self, nodes, X, Y, lr):
        """One VB sweep as a pure function of (W, pi) (reference
        MixtureofLinearTransforms.raw_update:50-61 body)."""
        W, pi = nodes
        p, logZ = self._assign(W, pi, X, Y)
        KL = pi.KLqprior() + W.KLqprior().sum(-1)
        ELBO = jnp.sum(sum_leading(logZ, self.batch_dim) - KL)
        pi = pi.ss_update(sum_leading(p, self.batch_dim + 1), lr=lr)
        W = W.raw_update(X[..., None, :, :], Y[..., None, :, :], p=p, lr=lr)
        return (W, pi), (ELBO, logZ, p)

    def raw_update(self, X, Y, iters=1, lr=1.0, verbose=False):
        from ._fused import fused_fit, record_elbos

        (self.W, self.pi), (self.logZ, self.p), ELBOs = fused_fit(
            self, self._vb_step, (self.W, self.pi), int(iters), X, Y, lr=lr
        )
        record_elbos(self, ELBOs, verbose)

    def update(self, pX, pY, iters=1, lr=1.0, verbose=False):
        for _ in range(iters):
            self.update_assignments_given_pX_pY(pX, pY)
            ELBO = self.ELBO()
            self.pi = self.pi.ss_update(sum_leading(self.p, self.batch_dim + 1), lr=lr)
            self.W = self.W.update(pX.unsqueeze(-3), pY.unsqueeze(-3), p=self.p, lr=lr)
            if verbose:
                print(
                    "MixLinearTransform: Percent Change in ELBO = ",
                    (ELBO - self.ELBO_last) / jnp.abs(self.ELBO_last) * 100,
                )
            self.ELBO_last = ELBO
            self.ELBO_save.append(float(jnp.sum(ELBO)))

    def Elog_like_given_pX_pY(self, pX, pY):
        ELL = (
            self.W.Elog_like_given_pX_pY(pX.unsqueeze(-3), pY.unsqueeze(-3)) * self.p
        ).sum(-1)
        return ELL

    def predict(self, X):
        """Moment-matched collapse of the expert mixture
        (reference MixtureofLinearTransforms.predict:91-108)."""
        pY, Res = self.W.predict(X[..., None, :, :])
        log_p = Res + self.pi.loggeomean()
        log_p = log_p - log_p.max(-1, keepdims=True)
        p = jnp.exp(log_p)
        p = p / p.sum(-1, keepdims=True)
        pv = p[..., None, None]
        Sigma = ((pY.ESigma() + pY.mean() @ mT(pY.mean())) * pv).sum(-3)
        mu = (pY.mean() * pv).sum(-3)
        Sigma = Sigma - mu @ mT(mu)
        return MVN_vf(mu=mu, Sigma=Sigma), pv[..., 0, 0]

    def KLqprior(self):
        return self.pi.KLqprior() + self.W.KLqprior().sum(-1)

    def ELBO(self):
        logZ = sum_leading(self.logZ, self.batch_dim)
        return logZ - self.KLqprior()

    def assignment_pr(self):
        return self.p

    def assignment(self):
        return self.p.argmax(-1)

    def mean(self):
        return self.p

    # -- expectation averaging over experts (reference :142-198) -------------------
    def event_average(self, A):
        p = self.p
        for _ in range(self.W.event_dim):
            p = p[..., None]
        out = A * p
        for _ in range(self.event_dim):
            out = out.sum(-self.W.event_dim - 1)
        return out

    def average(self, A):
        out = self.p * A
        for _ in range(self.event_dim):
            out = out.sum(-1)
        return out

    def EinvUX(self):
        return self.event_average(self.W.EinvUX())

    def EXTinvU(self):
        return self.event_average(self.W.EXTinvU())

    def EXTAX(self, A):
        return self.event_average(self.W.EXTAX(A))

    def EXAXT(self, A):
        return self.event_average(self.W.EXAXT(A))

    def EXTinvUX(self):
        return self.event_average(self.W.EXTinvUX())

    def EXinvVXT(self):
        return self.event_average(self.W.EXinvVXT())

    def EXmMUTinvUXmMU(self):
        return self.event_average(self.W.EXmMUTinvUXmMU())

    def EXmMUinvVXmMUT(self):
        return self.event_average(self.W.EXmMUinvVXmMUT())

    def EXTX(self):
        return self.event_average(self.W.EXTX())

    def EXXT(self):
        return self.event_average(self.W.EXXT())

    def EinvSigma(self):
        return self.event_average(self.W.EinvSigma())

    def ESigma(self):
        return self.event_average(self.W.ESigma())

    def ElogdetinvU(self):
        return self.average(self.W.invU.ElogdetinvSigma())

    def ElogdetinvSigma(self):
        return self.average(self.W.ElogdetinvSigma())

    def weights(self):
        return self.W.mu[..., :-1] if self.W.pad_X else self.W.mu

    def bias(self):
        return self.W.mu[..., -1] if self.W.pad_X else None
