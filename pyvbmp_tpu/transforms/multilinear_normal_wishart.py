"""Multilinear model Y = sum_i A_i X_i + b with factorized posterior and one
shared noise Wishart (reference transforms/MultiLinearNormalWishart.py; the
reference flags itself 'not working' — behavior reproduced, including the
shared-precision coupling via fixed_precision blocks)."""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..dists.diagonal_wishart import DiagonalWishart
from ..dists.mvn_vector_format import MultivariateNormal_vector_format as MVN_vf
from ..dists.niw_vector_format import NormalInverseWishart_vector_format_invSigma
from ..dists.wishart import Wishart
from ..utils import math as um
from ..utils.jaxutils import replace
from ..utils.linalg import mT
from .matrix_normal_gamma import MatrixNormalGamma
from .matrix_normal_wishart import MatrixNormalWishart


class MultiLinearNormalWishart:
    def __init__(self, n, p_list, batch_shape=(), mask_list=None, X_mask_list=None,
                 pad_X=False, noise_type="Wishart", key=None):
        from ..utils.rng import key_or_next
        import jax.random as jr

        key = key_or_next(key)
        self.noise_type = noise_type
        self.pad_X = pad_X
        self.p_list = list(p_list)
        self.n = n
        self.event_dim = 2
        self.batch_dim = len(batch_shape)
        self.event_shape = (n, 0)
        self.batch_shape = tuple(batch_shape)
        if mask_list is None:
            mask_list = [None] * len(p_list)
        if X_mask_list is None:
            X_mask_list = [None] * len(p_list)

        self.A = []
        if noise_type == "Wishart":
            self.invSigma = Wishart.create((n, n), tuple(batch_shape))
            cls = MatrixNormalWishart
        else:
            self.invSigma = DiagonalWishart.create((n,), tuple(batch_shape))
            cls = MatrixNormalGamma
        for i, p in enumerate(self.p_list):
            A = cls.create(
                (n, p), tuple(batch_shape), mask=mask_list[i], X_mask=X_mask_list[i],
                fixed_precision=True, pad_X=False, key=jr.fold_in(key, i),
            )
            self.A.append(replace(A, invU=self.invSigma))
        self.bias = NormalInverseWishart_vector_format_invSigma.create(
            event_shape=(n, 1), batch_shape=tuple(batch_shape), fixed_precision=True
        )
        self.bias = replace(self.bias, invSigma=self.invSigma)

    def _sync(self):
        """Propagate the shared noise node into each factor (the reference
        aliases the same object; the functional analogue is re-attachment)."""
        self.A = [replace(A, invU=self.invSigma) for A in self.A]
        self.bias = replace(self.bias, invSigma=self.invSigma)

    def raw_update(self, X_list, Y, p=None, iters=1, lr=1.0, beta=None):
        nd = self.event_dim + self.batch_dim
        sample_shape = Y.shape[: Y.ndim - nd]
        sdims = tuple(range(len(sample_shape)))
        if p is None:
            N = jnp.broadcast_to(
                jnp.asarray(float(np.prod(sample_shape, dtype=np.float64))),
                self.batch_shape + self.event_shape[:-2],
            )
        else:
            N = p.sum(sdims)

        Y_res = Y - self.bias.mean()
        for i in range(len(self.p_list)):
            Y_res = Y_res - self.A[i].mean() @ X_list[i]

        for _ in range(iters):
            for i in range(len(self.p_list)):
                Y_res = Y_res + self.A[i].mean() @ X_list[i]
                self.A[i] = self.A[i].raw_update(X_list[i], Y_res, p=p, lr=lr, beta=beta)
                Y_res = Y_res - self.A[i].weights() @ X_list[i]
            Y_res = Y_res + self.bias.mean()
            self.bias = self.bias.raw_update(Y_res, p=p, lr=lr, beta=0.0 if beta is None else beta)
            Y_res = Y_res - self.bias.mean()

        if p is None:
            SEyy = (Y_res * mT(Y_res)).sum(sdims)
        else:
            SEyy = ((Y_res * mT(Y_res)) * p.reshape(p.shape + (1, 1))).sum(sdims)
        for i in range(len(self.p_list)):
            SEyy = SEyy + self.A[i].mu_0 @ self.A[i].invV_0 @ mT(self.A[i].mu_0)
            SEyy = SEyy + self.bias.mu_0 @ mT(self.bias.mu_0) * self.bias.lmbda_0

        if self.noise_type == "Wishart":
            self.invSigma = self.invSigma.ss_update(SEyy, N, lr, beta)
        else:
            self.invSigma = self.invSigma.ss_update(
                jnp.diagonal(SEyy, axis1=-1, axis2=-2), N[..., None], lr, beta
            )
        self._sync()

    def Elog_like(self, X_list, Y):
        temp = Y - self.bias.mean()
        ELL = (
            0.5 * self.ElogdetinvSigma()
            - 0.5 * self.n * um.LOG2PI
            - 0.5 * self.bias.EXmMUTinvUXmMU()[..., 0, 0]
        )
        for i in range(len(self.p_list)):
            temp = temp - self.A[i].mean() @ X_list[i]
            ELL = ELL - 0.5 * (
                mT(X_list[i]) @ self.A[i].EXmMUTinvUXmMU() @ X_list[i]
            )[..., 0, 0]
        ELL = ELL - 0.5 * (mT(temp) @ self.EinvSigma() @ temp)[..., 0, 0]
        return ELL

    def predict(self, X_list):
        mu_y = self.bias.mean()
        Res = -0.5 * self.bias.EXmMUTinvUXmMU()
        for i in range(len(self.p_list)):
            mu_y = mu_y + self.A[i].mean() @ X_list[i]
            Res = Res - 0.5 * (mT(X_list[i]) @ self.A[i].EXmMUTinvUXmMU() @ X_list[i])
        Res = Res[..., 0, 0]
        return (
            MVN_vf(
                invSigma=self.EinvSigma(),
                Sigma=self.ESigma(),
                invSigmamu=self.EinvSigma() @ mu_y,
                mu=mu_y,
            ),
            Res,
        )

    def forward(self, pX_list):
        mu_y = self.bias.mean()
        Sigma_y = 0.0
        Res = 0.0
        for i in range(len(self.p_list)):
            pY_i, Res_i = self.A[i].forward(pX_list[i])
            mu_y = mu_y + pY_i.mean()
            Sigma_y = Sigma_y + pY_i.ESigma()
            Res = Res + Res_i
        return MVN_vf(mu=mu_y, Sigma=Sigma_y), Res

    def postdict(self, Y, iters=10):
        assert iters > 1
        Y_res = Y - self.bias.mean()
        pX_list = [None] * len(self.p_list)
        for i in range(len(self.p_list)):
            pX_list[i] = self.A[i].postdict(Y_res)[0]
            Y_res = Y_res - self.A[i].mean() @ pX_list[i].mean()
        for _ in range(iters - 1):
            for i in range(len(self.p_list)):
                Y_res = Y_res + self.A[i].mean() @ pX_list[i].mean()
                pX_list[i] = self.A[i].postdict(Y_res)[0]
                Y_res = Y_res - self.A[i].mean() @ pX_list[i].mean()
        return pX_list

    def KLqprior(self):
        KL = -self.invSigma.KLqprior() * (len(self.p_list) - 1)
        for A in self.A:
            KL = KL + A.KLqprior()
        return KL

    def ElogdetinvSigma(self):
        return self.invSigma.ElogdetinvSigma()

    def EinvSigma(self):
        return self.invSigma.EinvSigma()

    def ESigma(self):
        return self.invSigma.ESigma()
