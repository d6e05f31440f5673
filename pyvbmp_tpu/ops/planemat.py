"""Plane ("stacked-component") layout for medium-size matrices on TPU.

The lane form (ops/smallmat.py) splits every h x h matrix into h^2 separate
(T, N) arrays and metaprograms the algebra as straight-line scalar code.
That wins for h <= ~8 but the HLO graph grows like O(h^3) ops *per combine*;
at the Flocking north-star config (h = K = 14) trace + compile explodes
(>10 min measured in round 2) — the gates in ops/parallel_kalman.py and
ops/parallel_hmm.py therefore kept h=14 on the dense (..., h, h) path, whose
minormost (h, h) dims land on the TPU's (8, 128) memory tile at a few
percent lane utilization.

Plane form is the middle ground: a matrix is ONE array of shape
``(T, h, w, N)`` — each matrix entry is a (T, N) "plane", the flattened
batch N rides the 128-wide lanes exactly like lane form, but the algebra is
expressed with O(1) HLO ops per operation:

    (A @ B)[i, j] = sum_m A[i, m] * B[m, j]
                  = (A[..., :, :, None, :] * B[..., None, :, :, :]).sum(-3)

one broadcast multiply + one reduction, which XLA fuses into a single
lane-resident loop nest.  The symmetric inverse keeps smallmat's recursion
(closed-form adjugates at h <= 3, symmetric Schur split above) but on block
*slices* of the stacked array, so the op count per combine is O(log h)
matmul-ops instead of O(h^3) scalar ops.  FLOPs are identical to lane form;
only the instruction count (and hence compile time) changes.

Layout conventions (all functions):
  matrix  (..., h, w, N)   — matrix dims on axes -3, -2; lanes on -1
  vector  (..., h, N)
  scalar  (..., N)
"""
from __future__ import annotations

import jax.numpy as jnp


def bT(A):
    """Matrix transpose in plane layout."""
    return A.swapaxes(-3, -2)


def bmm(A, B, t_a=False, t_b=False):
    """op(A) @ op(B): one broadcast multiply + one reduction."""
    if t_a:
        A = bT(A)
    if t_b:
        B = bT(B)
    return (A[..., :, :, None, :] * B[..., None, :, :, :]).sum(-3)


def bmv(A, x, t_a=False):
    """op(A) @ x for a plane matrix and a plane vector."""
    if t_a:
        A = bT(A)
    return (A * x[..., None, :, :]).sum(-2)


def bvdot(x, y):
    return (x * y).sum(-2)


def bsym(A):
    return 0.5 * (A + bT(A))


def pack(A):
    """(...,) + bshape + (h, w) dense -> (..., h, w, N) plane layout, with
    ... = the leading (scan/time) axes in ``lead`` and bshape flattened to N.

    Only the simple T-leading case is supported: A is (T,) + bshape + (h, w).
    """
    T = A.shape[0]
    h, w = A.shape[-2], A.shape[-1]
    N = 1
    for s in A.shape[1:-2]:
        N *= s
    return A.reshape(T, N, h, w).transpose(0, 2, 3, 1)


def unpack(A, bshape):
    """(T, h, w, N) -> (T,) + bshape + (h, w)."""
    T, h, w = A.shape[0], A.shape[1], A.shape[2]
    return A.transpose(0, 3, 1, 2).reshape((T,) + tuple(bshape) + (h, w))


def pack_vec(x):
    """(T,) + bshape + (h, 1) -> (T, h, N)."""
    T, h = x.shape[0], x.shape[-2]
    N = 1
    for s in x.shape[1:-2]:
        N *= s
    return x.reshape(T, N, h).transpose(0, 2, 1)


def unpack_vec(x, bshape):
    T, h = x.shape[0], x.shape[1]
    return x.transpose(0, 2, 1).reshape((T,) + tuple(bshape) + (h, 1))


def bsym_inv_and_logdet(A):
    """Inverse + logdet of a symmetric PD plane matrix (..., h, h, N).

    Same recursion as smallmat.sym_inv_and_logdet / utils.linalg: closed-form
    adjugate for h <= 3, symmetric 2x2-block Schur split above — but each
    level is O(1) HLO ops on block slices.
    """
    h = A.shape[-3]
    if h == 1:
        det = A[..., 0, 0, :]
        return (1.0 / det)[..., None, None, :], jnp.log(det)
    if h == 2:
        a = A[..., 0, 0, :]
        b = A[..., 0, 1, :]
        d = A[..., 1, 1, :]
        det = a * d - b * b
        row0 = jnp.stack([d, -b], -2)
        row1 = jnp.stack([-b, a], -2)
        inv = jnp.stack([row0, row1], -3) / det[..., None, None, :]
        return inv, jnp.log(det)
    if h == 3:
        a = A[..., 0, 0, :]
        b = A[..., 0, 1, :]
        c = A[..., 0, 2, :]
        e = A[..., 1, 1, :]
        f = A[..., 1, 2, :]
        i = A[..., 2, 2, :]
        A11 = e * i - f * f
        A12 = -(b * i - c * f)
        A13 = b * f - c * e
        A22 = a * i - c * c
        A23 = -(a * f - c * b)
        A33 = a * e - b * b
        det = a * A11 + b * A12 + c * A13
        row0 = jnp.stack([A11, A12, A13], -2)
        row1 = jnp.stack([A12, A22, A23], -2)
        row2 = jnp.stack([A13, A23, A33], -2)
        inv = jnp.stack([row0, row1, row2], -3) / det[..., None, None, :]
        return inv, jnp.log(det)
    k = h // 2
    A11 = A[..., :k, :k, :]
    A12 = A[..., :k, k:, :]
    A22 = A[..., k:, k:, :]
    inv11, ld11 = bsym_inv_and_logdet(A11)
    W = bmm(inv11, A12)  # (k, h-k)
    S = A22 - bmm(A12, W, t_a=True)
    S = bsym(S)
    invS, ldS = bsym_inv_and_logdet(S)
    TR = -bmm(W, invS)  # (k, h-k)
    TL = inv11 - bmm(TR, W, t_b=True)
    TL = bsym(TL)
    top = jnp.concatenate([TL, TR], -2)
    bot = jnp.concatenate([bT(TR), invS], -2)
    return jnp.concatenate([top, bot], -3), ld11 + ldS
