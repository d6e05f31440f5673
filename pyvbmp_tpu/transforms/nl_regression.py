"""Nonlinear regression family (reference transforms/NLRegression_full_rank.py,
NLRegression_low_rank.py, NLRegression_Multinomial.py)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..dists import Dirichlet, NormalGamma, NormalInverseWishart
from ..dists.mvn_vector_format import MultivariateNormal_vector_format as MVN_vf
from ..utils.linalg import mT, psd_inv, psd_logdet
from .matrix_normal_gamma import MatrixNormalGamma
from .matrix_normal_wishart import MatrixNormalWishart
from .mnlr import MultiNomialLogisticRegression


class NLRegression_full_rank:
    """z ~ Cat(pi); x|z ~ NIW; y|x,z ~ MNW (reference NLRegression_full_rank)."""

    def __init__(self, n, p, mixture_dim, batch_shape=(), independent=False, key=None):
        from ..utils.rng import key_or_next
        import jax.random as jr

        key = key_or_next(key)
        self.batch_shape = tuple(batch_shape)
        self.batch_dim = len(batch_shape)
        self.independent = independent
        self.A = MatrixNormalWishart.create(
            (n, p),
            tuple(batch_shape) + (mixture_dim,),
            scale=mixture_dim ** (-1.0 / n),
            pad_X=True,
            key=key,
        )
        if independent:
            self.X = NormalGamma.create((p,), tuple(batch_shape) + (mixture_dim,), key=jr.fold_in(key, 1))
        else:
            self.X = NormalInverseWishart.create((p,), tuple(batch_shape) + (mixture_dim,), key=jr.fold_in(key, 1))
        self.pi = Dirichlet.create((mixture_dim,), tuple(batch_shape), key=jr.fold_in(key, 2))
        self.ELBO_last = -jnp.inf
        self.ELBO_save = []

    def raw_update(self, X, Y, iters=1, lr=1.0, verbose=False):
        for _ in range(self.batch_dim + 1):
            X = X[..., None, :]
            Y = Y[..., None, :]
        Xv = X[..., None]
        Yv = Y[..., None]
        for _ in range(int(iters)):
            log_p = (
                self.A.Elog_like(Xv, Yv)
                + self.X.Elog_like(X)
                + self.pi.loggeomean()
            )
            self.logZ = jax.scipy.special.logsumexp(log_p, -1, keepdims=True)
            log_p = log_p - log_p.max(-1, keepdims=True)
            p = jnp.exp(log_p)
            p = p / p.sum(-1, keepdims=True)
            self.p = p
            self.NA = p.sum(0)
            ELBO = self.ELBO().sum()
            if verbose:
                print(
                    "Percent Change in ELBO = ",
                    (ELBO - self.ELBO_last) / jnp.abs(self.ELBO_last) * 100,
                )
            self.ELBO_last = ELBO
            self.ELBO_save.append(float(ELBO))
            self.pi = self.pi.ss_update(self.NA, lr)
            self.A = self.A.raw_update(Xv, Yv, p=p, lr=lr)
            self.X = self.X.raw_update(X, p=p, lr=lr)

    def predict(self, X):
        log_p = self.X.Elog_like(X[..., None, :]) + self.pi.loggeomean()
        log_p = log_p - log_p.max(-1, keepdims=True)
        p = jnp.exp(log_p)
        p = p / p.sum(-1, keepdims=True)
        EinvUX = self.A.EinvUX()
        if self.A.pad_X:
            invSigmamu_y = EinvUX[..., :-1] @ X[..., None, :, None] + EinvUX[..., -1:]
        else:
            invSigmamu_y = EinvUX @ X[..., None, :, None]
        pv = p[..., None, None]
        invSigma_y = (self.A.EinvSigma() * pv).sum(-3)
        invSigmamu_y = (invSigmamu_y * pv).sum(-3)
        Sigma_y = psd_inv(invSigma_y)
        mu_y = Sigma_y @ invSigmamu_y
        return MVN_vf(mu=mu_y, Sigma=Sigma_y), p

    forward = predict

    def ELBO(self):
        return self.logZ.sum(0) - self.KLqprior()

    def KLqprior(self):
        return (
            self.A.KLqprior().sum(-1)
            + self.X.KLqprior().sum(-1)
            + self.pi.KLqprior()
        )


class NLRegression_low_rank:
    """Low-rank NL regression with shared W: u|z ~ NG, x|u ~ MNW(W), y|u,z ~ MNW(A)
    (reference NLRegression_low_rank)."""

    def __init__(self, n, p, hidden_dim, mixture_dim, batch_shape=(), independent=False, key=None):
        from ..utils.rng import key_or_next
        import jax.random as jr

        key = key_or_next(key)
        self.hidden_dim = hidden_dim
        self.batch_shape = tuple(batch_shape)
        self.batch_dim = len(batch_shape)
        self.mixture_dim = mixture_dim
        self.independent = independent
        cls = MatrixNormalGamma if independent else MatrixNormalWishart
        self.W = cls.create((p, hidden_dim), tuple(batch_shape) + (1,), key=key)
        self.A = MatrixNormalWishart.create(
            (n, hidden_dim + 1),
            tuple(batch_shape) + (mixture_dim,),
            scale=mixture_dim ** (-1.0 / n),
            key=jr.fold_in(key, 1),
        )
        self.U = NormalGamma.create((hidden_dim,), tuple(batch_shape) + (mixture_dim,), key=jr.fold_in(key, 2))
        self.pi = Dirichlet.create((mixture_dim,), tuple(batch_shape), key=jr.fold_in(key, 3))
        self.ELBO_last = -jnp.inf
        self.ELBO_save = []

    def raw_update(self, X, Y, iters=1, lr=1.0, verbose=False):
        for _ in range(self.batch_dim + 1):
            X = X[..., None, :]
            Y = Y[..., None, :]
        Xv = X[..., None]
        Yv = Y[..., None]
        h = self.hidden_dim
        if self.independent:
            SExx = (Xv**2).sum(0)[..., 0]
        else:
            SExx = (Xv @ mT(Xv)).sum(0)
        for _ in range(int(iters)):
            AXT = self.A.EXTinvUX()
            AXU = self.A.EXTinvU()
            invSigma_u_u = self.U.EinvSigma() + AXT[..., :-1, :-1] + self.W.EXTinvUX()
            invSigmamu_u = (
                self.U.EinvSigmamu()[..., None]
                + AXU[..., :-1, :] @ Yv
                - AXT[..., :-1, -1:]
                + self.W.EXTinvU() @ Xv
            )
            Sigma_u_u = psd_inv(invSigma_u_u)
            mu_u = Sigma_u_u @ invSigmamu_u

            logZ = (
                -0.5 * mT(Yv) @ self.A.EinvSigma() @ Yv
                - 0.5 * mT(Xv) @ self.W.EinvSigma() @ Xv
                - 0.5 * AXT[..., -1:, -1:]
                + AXU[..., -1:, :] @ Yv
                + 0.5 * mT(mu_u) @ invSigma_u_u @ mu_u
            )
            logZ = (
                logZ[..., 0, 0]
                + 0.5 * self.A.ElogdetinvSigma()
                + 0.5 * self.U.ElogdetinvSigma()
                + 0.5 * self.W.ElogdetinvSigma()
                - 0.5 * psd_logdet(invSigma_u_u)
                - 0.5 * self.U.EXTinvUX()
            )
            log_p = logZ + self.pi.loggeomean()
            shift = log_p.max(-1, keepdims=True)
            self.logZ = (
                jax.scipy.special.logsumexp(log_p - shift, -1, keepdims=True) + shift
            )[..., 0]
            p = jnp.exp(log_p - shift)
            p = p / p.sum(-1, keepdims=True)
            self.p = p

            SEuu = Sigma_u_u + mu_u @ mT(mu_u)
            SEux = mu_u @ mT(Xv)
            SEu1u1 = jnp.concatenate([SEuu, mu_u], -1)
            mu_u1 = jnp.concatenate(
                [mu_u, jnp.ones(mu_u.shape[:-2] + (1, 1), mu_u.dtype)], -2
            )
            SEu1u1 = jnp.concatenate([SEu1u1, mT(mu_u1)], -2)
            SEyy = Yv @ mT(Yv)
            SEyu1 = Yv @ mT(mu_u1)

            self.NA = p.sum(0)
            pv = p[..., None, None]
            SEu = (mu_u * pv).sum(0)
            SEuu = (SEuu * pv).sum(0)
            SEux = (SEux * pv).sum(0)
            SEu1u1 = (SEu1u1 * pv).sum(0)
            SEyy = (SEyy * pv).sum(0)
            SEyu1 = (SEyu1 * pv).sum(0)

            ELBO = self.ELBO().sum()
            if verbose:
                print(
                    "Percent Change in ELBO = ",
                    (ELBO - self.ELBO_last) / jnp.abs(self.ELBO_last) * 100,
                )
            self.ELBO_last = ELBO
            self.ELBO_save.append(float(ELBO))
            self.pi = self.pi.ss_update(self.NA, lr)
            self.A = self.A.ss_update(SEu1u1, SEyu1, SEyy, self.NA, lr)
            self.W = self.W.ss_update(
                SEuu.sum(-3, keepdims=True),
                mT(SEux.sum(-3, keepdims=True)),
                SExx,
                self.NA.sum(-1, keepdims=True),
                lr,
            )
            self.U = self.U.ss_update(
                jnp.diagonal(SEuu, axis1=-1, axis2=-2), SEu[..., 0], self.NA, lr
            )

    def predict(self, X):
        for _ in range(self.batch_dim + 1):
            X = X[..., None, :]
        Xv = X[..., None]
        invSigma_u_u = self.U.EinvSigma() + self.W.EXTinvUX()
        invSigmamu_u = self.U.EinvSigmamu()[..., None] + self.W.EXTinvU() @ Xv
        Sigma_u_u = psd_inv(invSigma_u_u)
        mu_u = Sigma_u_u @ invSigmamu_u

        logZ = -0.5 * mT(Xv) @ self.W.EinvSigma() @ Xv + 0.5 * mT(mu_u) @ invSigma_u_u @ mu_u
        logZ = (
            logZ[..., 0, 0]
            + 0.5 * self.U.ElogdetinvSigma()
            + 0.5 * self.W.ElogdetinvSigma()
            - 0.5 * psd_logdet(invSigma_u_u)
            - 0.5 * self.U.EXTinvUX()
        )
        log_p = logZ + self.pi.loggeomean()
        shift = log_p.max(-1, keepdims=True)
        logZt = jax.scipy.special.logsumexp(log_p - shift, -1, keepdims=True) + shift
        p = jnp.exp(log_p - logZt)
        mu_u1 = jnp.concatenate(
            [mu_u, jnp.ones(mu_u.shape[:-2] + (1, 1), mu_u.dtype)], -2
        )
        mu_y = self.A.mu @ mu_u1
        Sigma_y = (
            self.A.mu[..., :, :-1] @ Sigma_u_u @ mT(self.A.mu[..., :, :-1])
            + self.A.ESigma()
        )
        pv = p[..., None, None]
        Sigma_y = ((Sigma_y + mu_y @ mT(mu_y)) * pv).sum(-3)
        mu_y = (mu_y * pv).sum(-3)
        Sigma_y = Sigma_y - mu_y @ mT(mu_y)
        return MVN_vf(mu=mu_y, Sigma=Sigma_y), p, mu_u[..., 0]

    forward = predict

    def ELBO(self):
        return self.logZ.sum(0) - self.KLqprior()

    def KLqprior(self):
        return (
            self.A.KLqprior().sum(-1)
            + self.W.KLqprior().sum(-1)
            + self.U.KLqprior().sum(-1)
            + self.pi.KLqprior()
        )


class NLRegression_Multinomial:
    """z ~ MNLR(x); y|z,x ~ MNW (reference NLRegression_Multinomial;
    self-describes as superseded by dMixtureofLinearTransforms)."""

    def __init__(self, n, p, mixture_dim, batch_shape=(), key=None):
        from ..utils.rng import key_or_next
        import jax.random as jr

        key = key_or_next(key)
        self.batch_shape = tuple(batch_shape)
        self.batch_dim = len(batch_shape)
        self.event_dim = 2
        self.n, self.p, self.mixture_dim = n, p, mixture_dim
        self.ELBO_last = -jnp.inf
        self.ELBO_save = []
        self.A = MatrixNormalWishart.create(
            (n, p),
            tuple(batch_shape) + (mixture_dim,),
            scale=1.0 / mixture_dim ** (1.0 / n),
            pad_X=True,
            key=key,
        )
        self.Z = MultiNomialLogisticRegression(
            mixture_dim, p, batch_shape=tuple(batch_shape), pad_X=True, key=jr.fold_in(key, 1)
        )

    def raw_update(self, X, Y, iters=1, lr=1.0, verbose=False):
        AX = X[..., None]
        AY = Y[..., None]
        AX = AX.reshape(AX.shape[:-2] + (self.batch_dim + 1) * (1,) + AX.shape[-2:])
        AY = AY.reshape(AY.shape[:-2] + (self.batch_dim + 1) * (1,) + AY.shape[-2:])
        for _ in range(int(iters)):
            log_p = self.A.Elog_like(AX, AY) + self.Z.log_predict(X)
            shift = log_p.max(-1, keepdims=True)
            self.logZ = shift[..., 0] + jax.scipy.special.logsumexp(log_p - shift, -1)
            p = jnp.exp(log_p - shift)
            p = p / p.sum(-1, keepdims=True)
            self.p = p
            self.NA = p.sum(0)
            ELBO = self.logZ.sum() - self.KLqprior()
            if verbose:
                print(
                    "Percent Change in ELBO = ",
                    (ELBO - self.ELBO_last) / jnp.abs(self.ELBO_last) * 100,
                )
            self.ELBO_last = ELBO
            self.ELBO_save.append(float(jnp.sum(ELBO)))
            self.A = self.A.raw_update(AX, AY, p=p, lr=lr)
            self.Z.raw_update(X, p, lr=lr)

    def predict(self, X):
        p = self.Z.predict(X)
        pv = p[..., None, None]
        pY = self.A.predict(X[..., None, :, None])[0]
        mu = (pY.mean() * pv).sum(-3)
        Sigma = (pY.EXXT() * pv).sum(-3) - mu @ mT(mu)
        return MVN_vf(mu=mu, Sigma=Sigma), p

    def ELBO(self):
        return self.logZ - self.KLqprior()

    def KLqprior(self):
        return self.A.KLqprior().sum(-1) + self.Z.KLqprior()


class NLRegression_orig:
    """Legacy low-rank NL regression with the row-noise Wishart SHARED between
    the latent prior q(u|z)=NIW and the encoder W (reference
    transforms/NLRegression_orig.py:10-145; not exported by the reference's
    __init__ but listed in its source inventory).

    Generative model: u|x,z ~ N(mu_z + W x, Sigma_uu), y|u,z ~ N(A_z [u;1],
    Sigma_z). q(Sigma_uu) is shared between mu_z and W, so U is created with
    fixed_precision and its invU node is re-attached to W's after every W
    update (the reference aliases the objects; here the functional update
    re-binds).
    """

    def __init__(self, n, p, hidden_dim, mixture_dim, batch_shape=(), key=None):
        from ..utils.rng import key_or_next
        import jax.random as jr

        key = key_or_next(key)
        self.hidden_dim = hidden_dim
        self.batch_shape = tuple(batch_shape)
        self.batch_dim = len(batch_shape)
        self.n, self.p, self.mixture_dim = n, p, mixture_dim
        self.W = MatrixNormalWishart.create(
            (hidden_dim, p), tuple(batch_shape) + (1,), key=key
        )
        self.A = MatrixNormalWishart.create(
            (n, hidden_dim + 1),
            tuple(batch_shape) + (mixture_dim,),
            key=jr.fold_in(key, 1),
        )
        self.U = NormalInverseWishart.create(
            (hidden_dim,),
            tuple(batch_shape) + (mixture_dim,),
            fixed_precision=True,
            key=jr.fold_in(key, 2),
        )
        self.U = jax.tree_util.tree_map(lambda x: x, self.U)
        self._share_invU()
        self.pi = Dirichlet.create(
            (mixture_dim,), tuple(batch_shape), key=jr.fold_in(key, 3)
        )
        self.ELBO_last = -jnp.inf
        self.ELBO_save = []

    def _share_invU(self):
        """q(Sigma_uu) is shared: U's precision node IS W's
        (reference NLRegression_orig.py:33)."""
        from ..utils.jaxutils import replace

        self.U = replace(self.U, invU=self.W.invU)

    def raw_update(self, X, Y, iters=1, lr=1.0, verbose=False):
        for _ in range(self.batch_dim + 1):
            X = X[..., None, :]
            Y = Y[..., None, :]
        Xv = X[..., None]
        Yv = Y[..., None]
        SExx = (Xv @ mT(Xv)).sum(0)

        for _ in range(int(iters)):
            AXT = self.A.EXTinvUX()
            AXU = self.A.EXTinvU()
            invSigma_u_u = self.W.EinvSigma() + AXT[..., :-1, :-1]
            invSigmamu_u = (
                self.U.EinvSigmamu()[..., None]
                + self.W.EinvUX() @ Xv
                + AXU[..., :-1, :] @ Yv
                - AXT[..., :-1, -1:]
            )
            Sigma_u_u = psd_inv(invSigma_u_u)
            mu_u = Sigma_u_u @ invSigmamu_u

            Res = (
                -0.5 * mT(Yv) @ self.A.EinvSigma() @ Yv
                - 0.5 * AXT[..., -1:, -1:]
                + AXU[..., -1:, :] @ Yv
            )
            Res = (
                Res
                - 0.5 * mT(Xv) @ self.W.EXTinvUX() @ Xv
                - self.U.mean()[..., None, :] @ self.W.EinvUX() @ Xv
                + 0.5 * mT(mu_u) @ invSigmamu_u
            )
            Res = (
                Res[..., 0, 0]
                + 0.5 * self.A.ElogdetinvSigma()
                + 0.5 * self.W.ElogdetinvSigma()
                - 0.5 * psd_logdet(invSigma_u_u)
                - 0.5 * self.U.EXTinvUX()
                - 0.5 * self.n * jnp.log(2 * jnp.pi)
            )
            log_p = Res + self.pi.loggeomean()
            shift = log_p.max(-1, keepdims=True)
            self.logZ = (
                jax.scipy.special.logsumexp(log_p - shift, -1, keepdims=True) + shift
            )
            log_p = log_p - self.logZ
            self.p = jnp.exp(log_p)
            self.logZ = self.logZ[..., 0].sum(0)
            self.NA = self.p.sum(0)

            ELBO = self.ELBO()
            if verbose:
                print(
                    "Percent Change in ELBO = ",
                    (ELBO - self.ELBO_last) / jnp.abs(self.ELBO_last) * 100,
                )
            self.ELBO_last = ELBO
            self.ELBO_save.append(float(jnp.sum(ELBO)))

            self.pi = self.pi.ss_update(self.NA, lr)

            pv = self.p[..., None, None]
            NAv = self.NA[..., None, None]
            SEuu = ((Sigma_u_u + mu_u @ mT(mu_u)) * pv).sum(0)
            SEu = (mu_u * pv).sum(0)
            SEu1u1 = jnp.concatenate([SEuu, SEu], -1)
            SEu1 = jnp.concatenate([SEu, NAv], -2)
            SEu1u1 = jnp.concatenate([SEu1u1, mT(SEu1)], -2)
            SEyy = ((Yv @ mT(Yv)) * pv).sum(0)
            SEyu1 = jnp.concatenate(
                [((Yv @ mT(mu_u)) * pv).sum(0), (Yv * pv).sum(0)], -1
            )
            self.A = self.A.ss_update(SEu1u1, SEyu1, SEyy, self.NA, lr)

            # U's mean updates manually; its covariance rides along with W
            # (reference NLRegression_orig.py:90-101)
            SEx = (Xv * pv).sum(0)
            ubar = self.U.mean()[..., None]
            SEdux = (((mu_u - ubar) @ mT(Xv)) * pv).sum(0).sum(-3, keepdims=True)
            SEdudu = (
                SEuu
                - SEu @ mT(ubar)
                - ubar @ mT(SEu)
                + ubar @ mT(ubar) * NAv
            ).sum(-3, keepdims=True)
            mu = (
                SEu[..., 0]
                - (self.W.mean() @ SEx)[..., 0]
                + self.U.mu_0 * self.U.lambda_mu_0[..., None]
            ) / (self.U.lambda_mu_0[..., None] + self.NA[..., None])
            self.W = self.W.ss_update(
                SExx, SEdux, SEdudu, self.NA.sum(-1, keepdims=True), lr
            )
            from ..utils.jaxutils import replace

            self.U = replace(
                self.U,
                lambda_mu=self.U.lambda_mu
                + lr * (self.NA + self.U.lambda_mu_0 - self.U.lambda_mu),
                mu=self.U.mu + lr * (mu - self.U.mu),
            )
            self._share_invU()

    def predict(self, X):
        # single mixture-axis unsqueeze (reference NLRegression_orig.py:108
        # assumes X is already batch-consistent)
        X = X[..., None, :]
        Xv = X[..., None]
        invSigma_u_u = self.W.EinvSigma()
        invSigmamu_u = (
            self.W.EinvSigma() @ self.U.mean()[..., None] + self.W.EinvUX() @ Xv
        )
        Sigma_u_u = psd_inv(invSigma_u_u)
        mu_u = Sigma_u_u @ invSigmamu_u

        Res = (
            -0.5 * mT(Xv) @ self.W.EXTinvUX() @ Xv
            - self.U.mean()[..., None, :] @ self.W.EinvUX() @ Xv
            + 0.5 * mT(mu_u) @ invSigmamu_u
        )
        Res = (
            Res[..., 0, 0]
            + 0.5 * self.W.ElogdetinvSigma()
            - 0.5 * psd_logdet(invSigma_u_u)
            - 0.5 * self.U.EXTinvUX()
        )
        log_p = Res + self.pi.loggeomean()
        log_p = log_p - log_p.max(-1, keepdims=True)
        p = jnp.exp(log_p)
        p = p / p.sum(-1, keepdims=True)

        mu_u1 = jnp.concatenate(
            [mu_u, jnp.ones(mu_u.shape[:-2] + (1, 1), mu_u.dtype)], -2
        )
        mu_y = self.A.mean() @ mu_u1
        Sigma_y = self.A.ESigma() + self.A.mean()[..., :-1] @ Sigma_u_u @ mT(
            self.A.mean()[..., :-1]
        )
        pv = p[..., None, None]
        Sigma_y = ((Sigma_y + mu_y @ mT(mu_y)) * pv).sum(-3)
        mu_y = (mu_y * pv).sum(-3)
        Sigma_y = Sigma_y - mu_y @ mT(mu_y)
        return MVN_vf(mu=mu_y, Sigma=Sigma_y), p

    forward = predict

    def ELBO(self):
        return self.logZ.sum() - self.KLqprior()

    def KLqprior(self):
        # U.KLqprior includes the shared invU KL (broadcast over mixture);
        # the reference subtracts it once "because invU is shared with W"
        # (NLRegression_orig.py:139-141)
        KL = (
            self.A.KLqprior().sum(-1)
            + self.W.KLqprior().sum(-1)
            + self.U.KLqprior().sum(-1)
        )
        return KL + self.pi.KLqprior() - self.U.invU.KLqprior().sum(-1)
