"""Autoregressive HMMs: p(y_t | x_t, z_t) = N(A_{z_t} x_t, Sigma_{z_t})
(reference models/ARHMM.py: ARHMM, ARHMM_prXY, ARHMM_prXRY)."""
from __future__ import annotations

import jax.numpy as jnp

from .hmm import HMM
from ..dists.delta import Delta
from ..dists.mvn_vector_format import MultivariateNormal_vector_format as MVN_vf
from ..transforms import MatrixNormalWishart
from ..utils.linalg import block_diag_matrix_builder, mT


class ARHMM(HMM):
    """Observed (X, Y) pairs; obs_dist = MNW batched over states."""

    def __init__(
        self,
        dim,
        n,
        p,
        batch_shape=(),
        pad_X=True,
        X_mask=None,
        mask=None,
        transition_mask=None,
        key=None,
    ):
        dist = MatrixNormalWishart.create(
            event_shape=(n, p),
            batch_shape=tuple(batch_shape) + (dim,),
            pad_X=pad_X,
            X_mask=X_mask,
            mask=mask,
            key=key,
        )
        super().__init__(dist, transition_mask=transition_mask)

    def _obs_logits(self, obs_dist, XY):
        return obs_dist.Elog_like(XY[0], XY[1])

    def _obs_update(self, obs_dist, XY, p, lr, beta):
        return obs_dist.raw_update(XY[0], XY[1], p=p, lr=lr, beta=beta)

    def Elog_like_X_given_Y(self, Y):
        invSigma_x_x, invSigmamu_x, Residual = self.obs_dist.Elog_like_X(Y)
        if self.p is not None:
            invSigma_x_x = (invSigma_x_x * self.p[..., None, None]).sum(-3)
            invSigmamu_x = (invSigmamu_x * self.p[..., None, None]).sum(-3)
            Residual = (Residual * self.p).sum(-1)
        return invSigma_x_x, invSigmamu_x, Residual


class ARHMM_prXY(HMM):
    """(X, Y) supplied as distributions/messages."""

    def __init__(
        self,
        dim,
        n,
        p,
        batch_shape=(),
        X_mask=None,
        mask=None,
        pad_X=True,
        transition_mask=None,
        key=None,
    ):
        dist = MatrixNormalWishart.create(
            event_shape=(n, p),
            batch_shape=tuple(batch_shape) + (dim,),
            pad_X=pad_X,
            X_mask=X_mask,
            mask=mask,
            key=key,
        )
        super().__init__(dist, transition_mask=transition_mask)

    def _obs_logits(self, obs_dist, XY):
        return obs_dist.Elog_like_given_pX_pY(XY[0], XY[1])

    def _obs_update(self, obs_dist, XY, p, lr, beta):
        return obs_dist.update(XY[0], XY[1], p, lr=lr, beta=beta)

    def Elog_like_X_given_pY(self, pY):
        px, Res = self.obs_dist.Elog_like_X_given_pY(pY)
        invSigma_x_x = px.EinvSigma()
        invSigmamu_x = px.EinvSigmamu()
        if self.p is not None:
            from ..utils.jaxutils import brole_avg

            invSigma_x_x = brole_avg(invSigma_x_x, self.p)
            invSigmamu_x = brole_avg(invSigmamu_x, self.p)
            Res = (Res * self.p).sum(-1)
        return invSigma_x_x, invSigmamu_x, Res


class ARHMM_prXRY(HMM):
    """(pX, R, Y) with pX a Gaussian message, R and Y observed; the regressor R
    is spliced onto X with a block-diagonal covariance
    (reference models/ARHMM.py:55-91).  This is DMBD's observation model."""

    def __init__(
        self,
        dim,
        n,
        p1,
        p2,
        batch_shape=(),
        mask=None,
        X_mask=None,
        transition_mask=None,
        pad_X=False,
        key=None,
    ):
        self.p1 = p1
        self.p2 = p2
        dist = MatrixNormalWishart.create(
            event_shape=(n, p1 + p2),
            batch_shape=tuple(batch_shape) + (dim,),
            pad_X=pad_X,
            X_mask=X_mask,
            mask=mask,
            key=key,
        )
        super().__init__(dist, transition_mask=transition_mask)

    def _splice(self, pX, R):
        Sigma = block_diag_matrix_builder(
            pX.ESigma(),
            jnp.zeros(pX.shape[:-2] + (self.p2, self.p2), pX.mean().dtype),
        )
        mu = jnp.concatenate(
            [pX.mean(), jnp.broadcast_to(R, pX.shape[:-2] + R.shape[-2:])], -2
        )
        return MVN_vf(mu=mu, Sigma=Sigma)

    def _obs_logits(self, obs_dist, XRY):
        pX, R, Y = XRY
        return obs_dist.Elog_like_given_pX_pY(self._splice(pX, R), Delta(Y))

    def _obs_update(self, obs_dist, XRY, p, lr, beta):
        pX, R, Y = XRY
        return obs_dist.update(self._splice(pX, R), Delta(Y), p=p, lr=lr, beta=beta)

    def Elog_like(self, XRY):
        return (self._obs_logits(self.obs_dist, XRY) * self.p).sum(-1)

    def Elog_like_X(self, YR, p=None):
        """Latent-message extraction: natural-parameter likelihood of the X
        block with the R block conditioned out (reference ARHMM.py:79-91).
        ``p`` overrides stored assignments (pure-call use inside jit)."""
        Y, R = YR
        invSigma_xr_xr, invSigmamu_xr, Residual = self.obs_dist.Elog_like_X(Y)
        p1 = self.p1
        invSigma_x_x = invSigma_xr_xr[..., :p1, :p1]
        invSigmamu_x = (
            invSigmamu_xr[..., :p1, :] - invSigma_xr_xr[..., :p1, p1:] @ R
        )
        Residual = Residual - 0.5 * (
            invSigma_xr_xr[..., p1:, p1:] * (R * mT(R))
        ).sum((-1, -2))
        Residual = Residual + (invSigmamu_xr[..., p1:, :] * R).sum((-1, -2))
        if p is None:
            p = self.p
        if p is not None:
            pv = p[..., None, None]
            invSigma_x_x = (invSigma_x_x * pv).sum(-3)
            invSigmamu_x = (invSigmamu_x * pv).sum(-3)
            Residual = (Residual * p).sum(-1)
        return invSigma_x_x, invSigmamu_x, Residual
