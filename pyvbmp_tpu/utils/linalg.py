"""Batched dense linear algebra: the framework's "kernel layer".

The torch reference leans on ``.inverse()`` / ``.logdet()`` /
``linalg.solve`` for every small (d<=~50) matrix (its de-facto kernel layer,
SURVEY.md L0).  On TPU we route every PSD op through one batched Cholesky so
XLA fuses factor+solve+logdet, keeps everything on the MXU, and never calls a
general LU.  Block 2x2 precision algebra mirrors reference
utils/matrix_utils.py:4-55.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import PSD_JITTER


def _sym(A):
    return 0.5 * (A + jnp.swapaxes(A, -1, -2))


def chol(A):
    """Batched Cholesky of a PSD matrix with optional jitter."""
    if PSD_JITTER:
        A = A + PSD_JITTER * jnp.eye(A.shape[-1], dtype=A.dtype)
    return jnp.linalg.cholesky(_sym(A))


def _bcast(A, B):
    """Broadcast batch dims of A (...,m,m) and B (...,m,k) like torch solve."""
    bshape = jnp.broadcast_shapes(A.shape[:-2], B.shape[:-2])
    return (
        jnp.broadcast_to(A, bshape + A.shape[-2:]),
        jnp.broadcast_to(B, bshape + B.shape[-2:]),
    )


def psd_solve(A, B):
    """Solve A X = B for symmetric PD A via Cholesky (batch-broadcasting)."""
    A, B = _bcast(A, B)
    L = chol(A)
    return jax.scipy.linalg.cho_solve((L, True), B)


def psd_inv(A):
    L = chol(A)
    eye = jnp.broadcast_to(jnp.eye(A.shape[-1], dtype=A.dtype), A.shape)
    return jax.scipy.linalg.cho_solve((L, True), eye)


def psd_logdet(A):
    L = chol(A)
    return 2.0 * jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)).sum(-1)


def psd_inv_and_logdet(A):
    """Fused inverse + logdet off one Cholesky factor."""
    L = chol(A)
    eye = jnp.broadcast_to(jnp.eye(A.shape[-1], dtype=A.dtype), A.shape)
    inv = jax.scipy.linalg.cho_solve((L, True), eye)
    logdet = 2.0 * jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)).sum(-1)
    return inv, logdet


def psd_solve_and_logdet(A, B):
    A, B = _bcast(A, B)
    L = chol(A)
    X = jax.scipy.linalg.cho_solve((L, True), B)
    logdet = 2.0 * jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)).sum(-1)
    return X, logdet


def mT(A):
    return jnp.swapaxes(A, -1, -2)


# --- block 2x2 matrix algebra (reference utils/matrix_utils.py) -------------

def block_diag_matrix_builder(A, B):
    """[[A,0],[0,B]] (reference utils/matrix_utils.py:4-9)."""
    n1, n2 = A.shape[-1], B.shape[-1]
    t_shape = jnp.broadcast_shapes(A.shape[:-2], B.shape[:-2])
    A = jnp.broadcast_to(A, t_shape + A.shape[-2:])
    B = jnp.broadcast_to(B, t_shape + B.shape[-2:])
    top = jnp.concatenate([A, jnp.zeros(t_shape + (A.shape[-2], n2), A.dtype)], -1)
    bot = jnp.concatenate([jnp.zeros(t_shape + (B.shape[-2], n1), B.dtype), B], -1)
    return jnp.concatenate([top, bot], -2)


def block_matrix_builder(A, B, C, D):
    """[[A,B],[C,D]] (reference utils/matrix_utils.py:27-29)."""
    return jnp.concatenate(
        [jnp.concatenate([A, B], -1), jnp.concatenate([C, D], -1)], -2
    )


def block_precision_marginalizer(A, B, C, D):
    """Schur-complement precisions without the final inverse.

    Returns (A_prec, -B invD, -C invA, D_prec); see reference
    utils/matrix_utils.py:31-46 for why this saves an inverse when producing
    marginal natural parameters.
    """
    invA = psd_inv(A)
    invD = psd_inv(D)
    A_prec = A - B @ invD @ C
    D_prec = D - C @ invA @ B
    return A_prec, -B @ invD, -C @ invA, D_prec


def block_matrix_inverse(A, B, C, D, block_form=True):
    """Blockwise inverse (reference utils/matrix_utils.py:11-25)."""
    invA = psd_inv(A)
    invD = psd_inv(D)
    Ainv = psd_inv(A - B @ invD @ C)
    Dinv = psd_inv(D - C @ invA @ B)
    if block_form == "left":
        return Ainv, -B @ invD, -C @ invA, Dinv
    elif block_form == "right":
        return Ainv, -invA @ B, -invD @ C, Dinv
    elif block_form == "True" or block_form is True:
        return Ainv, -Ainv @ B @ Dinv, -invD @ C @ invA, Dinv
    else:
        return block_matrix_builder(Ainv, -Ainv @ B @ Dinv, -invD @ C @ Ainv, Dinv)


def block_matrix_logdet(A, B, C, D, singular=False):
    """logdet of [[A,B],[C,D]] (reference utils/matrix_utils.py:49-55)."""
    if singular == "A":
        return psd_logdet(D) + psd_logdet(A - B @ psd_solve(D, C))
    return psd_logdet(D) + psd_logdet(A - B @ psd_solve(D, C))
