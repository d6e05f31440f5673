"""Bayesian factor analysis: y = A z + eps, z ~ N(0,I)
(reference models/BayesianFactorAnalysis.py)."""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..dists.mvn_vector_format import MultivariateNormal_vector_format as MVN_vf
from ..transforms import MatrixNormalGamma
from ..utils.linalg import mT, psd_inv
from ..utils.rng import key_or_next


class BayesianFactorAnalysis:
    def __init__(self, obs_dim, latent_dim, batch_shape=(), pad_X=True, key=None):
        self.batch_shape = tuple(batch_shape)
        self.batch_dim = len(batch_shape)
        self.event_dim = 2
        self.obs_dim = obs_dim
        self.latent_dim = latent_dim
        self.A = MatrixNormalGamma.create(
            event_shape=(obs_dim, latent_dim), batch_shape=batch_shape, key=key_or_next(key)
        )
        self.ELBO_last = -jnp.inf
        self.ELBO_save = []
        self.pz = None
        self.logZ = None

    def update_latents(self, Y):
        invSigma, invSigmamu, Res = self.A.Elog_like_X(Y[..., None])
        self.pz = MVN_vf(
            invSigma=invSigma + jnp.eye(self.latent_dim), invSigmamu=invSigmamu
        )
        self.logZ = Res - self.pz.Res()

    def update_parms(self, Y, lr=1.0):
        Yv = Y[..., None]
        SEzz = self.pz.EXXT().sum(0)
        SEyy = (Yv @ mT(Yv)).sum(0)
        SEyz = (Yv @ mT(self.pz.mean())).sum(0)
        N = jnp.asarray(float(Y.shape[0]))
        self.A = self.A.ss_update(SEzz, SEyz, SEyy, N, lr=lr)

    def raw_update(self, Y, iters=1, lr=1.0, verbose=False):
        step = jax.jit(_bfa_step, static_argnums=(3,))
        for _ in range(iters):
            self.A, logZ, pz, KL_pre = step(self.A, Y, lr, self.latent_dim)
            self.pz = pz
            self.logZ = logZ
            ELBO = logZ - KL_pre
            if verbose:
                print(
                    "Percent change in ELBO: ",
                    (ELBO - self.ELBO_last) / jnp.abs(self.ELBO_last),
                )
            self.ELBO_last = ELBO
            self.ELBO_save.append(float(ELBO.sum()))

    update = raw_update

    def forward(self, pz):
        B = self.A.EinvUX()
        invD = psd_inv(pz.EinvSigma() + self.A.EXTinvUX())
        invSigma_yy = self.A.EinvSigma() - B @ invD @ mT(B)
        invSigmamu_y = B @ invD @ pz.EinvSigmamu()
        return MVN_vf(invSigmamu=invSigmamu_y, invSigma=invSigma_yy)

    def backward(self, pY):
        pz, Res = self.A.Elog_like_X_given_pY(pY)
        pz = MVN_vf(
            invSigma=pz.EinvSigma() + jnp.eye(self.latent_dim),
            invSigmamu=pz.EinvSigmamu(),
        )
        return pz, Res

    def postdict(self, Y):
        invSigma, invSigmamu, Res = self.A.Elog_like_X(Y[..., None])
        return MVN_vf(
            invSigma=invSigma + jnp.eye(self.latent_dim), invSigmamu=invSigmamu
        )

    def ELBO(self):
        return self.logZ.sum() - self.KLqprior()

    def KLqprior(self):
        return self.A.KLqprior()


def _bfa_step(A, Y, lr, latent_dim):
    Yv = Y[..., None]
    sample_dims = tuple(range(Yv.ndim - 2 - A.batch_dim))
    invSigma, invSigmamu, Res = A.Elog_like_X(Yv)
    pz = MVN_vf(invSigma=invSigma + jnp.eye(latent_dim), invSigmamu=invSigmamu)
    logZ = Res.sum(sample_dims) - pz.Res().sum(sample_dims)
    SEzz = pz.EXXT().sum(sample_dims)
    SEyy = (Yv @ mT(Yv)).sum(sample_dims)
    SEyz = (Yv @ mT(pz.mean())).sum(sample_dims)
    N = jnp.asarray(float(np.prod(Yv.shape[: len(sample_dims)], dtype=np.float64)))
    N = jnp.broadcast_to(N, A.batch_shape + A.event_shape[:-2])
    # reference order (BayesianFactorAnalysis.py:55-60): ELBO_last is
    # logZ - KL(q(A)) of the PRE-M-step posterior; ss_update happens after
    KL_pre = A.KLqprior()
    A = A.ss_update(SEzz, SEyz, SEyy, N, lr=lr)
    return A, logZ, pz, KL_pre
