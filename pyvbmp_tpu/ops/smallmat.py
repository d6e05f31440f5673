"""Component ("lane") form algebra for tiny matrices on TPU.

The smoother scans operate on huge batches of tiny (h<=~8) matrices. Stored
dense as ``(..., h, h)``, the two minormost dims land on the TPU's (8, 128)
memory tile, so every op runs at a few percent lane utilization and the
associative-scan smoother is latency-bound (measured: ~13 ms/iter at
T=100, batch=800, h=2 — ~60x off the bandwidth bound).

Component form fixes the layout: a symmetric h x h matrix becomes
``h*(h+1)/2`` separate arrays (a dict keyed by (i, j), i<=j), a general
matrix ``h*h`` arrays, a vector ``h`` arrays — each of shape ``(T, N)`` with
the flattened batch N on the lanes. All algebra is straight-line elementwise
code metaprogrammed over the index dicts (h is a trace-time constant), which
XLA fuses into a handful of full-width VPU loops per combine stage.

The symmetric inverse recursion mirrors utils.linalg.sym_inv_and_logdet
(adjugate h<=3, Schur split above) so results match the dense path to float
association order.
"""
from __future__ import annotations

import jax.numpy as jnp


def sym_idx(h):
    """Pairs (i, j), i<=j, in row-major upper-triangle order."""
    return [(i, j) for i in range(h) for j in range(i, h)]


def sym_get(A, i, j):
    return A[(i, j)] if i <= j else A[(j, i)]


# ------------------------------------------------------------- pack / unpack
def sym_pack(A):
    """(..., h, h) symmetric -> component dict of (...,) arrays."""
    h = A.shape[-1]
    return {(i, j): A[..., i, j] for (i, j) in sym_idx(h)}


def sym_unpack(A, h):
    rows = [
        jnp.stack([sym_get(A, i, j) for j in range(h)], -1) for i in range(h)
    ]
    return jnp.stack(rows, -2)


def gen_pack(A):
    h, w = A.shape[-2], A.shape[-1]
    return {(i, j): A[..., i, j] for i in range(h) for j in range(w)}


def gen_unpack(A, h, w=None):
    w = h if w is None else w
    rows = [jnp.stack([A[(i, j)] for j in range(w)], -1) for i in range(h)]
    return jnp.stack(rows, -2)


def vec_pack(v):
    """(..., h, 1) -> list of h (...,) arrays."""
    return [v[..., i, 0] for i in range(v.shape[-2])]


def vec_unpack(v):
    return jnp.stack(v, -1)[..., None]


# ------------------------------------------------------------------ algebra
def _get(A, i, j, sym, t):
    if t:
        i, j = j, i
    return sym_get(A, i, j) if sym else A[(i, j)]


def mm(h, A, B, sym_a=False, sym_b=False, t_a=False, t_b=False, sym_out=False):
    """C = op(A) @ op(B) for h x h component matrices.

    ``sym_out=True`` computes only the upper triangle (caller asserts the
    product is symmetric).
    """
    out = {}
    for i in range(h):
        for j in range(i if sym_out else 0, h):
            out[(i, j)] = sum(
                _get(A, i, m, sym_a, t_a) * _get(B, m, j, sym_b, t_b)
                for m in range(h)
            )
    return out


def mv(h, A, x, sym_a=False, t_a=False):
    """op(A) @ x for a component matrix and a component vector (list)."""
    return [
        sum(_get(A, i, m, sym_a, t_a) * x[m] for m in range(h)) for i in range(h)
    ]


def vdot(x, y):
    return sum(a * b for a, b in zip(x, y))


def sym_add(A, B):
    return {k: A[k] + B[k] for k in A}


def sym_sub(A, B):
    return {k: A[k] - B[k] for k in A}


def sym_inv_and_logdet(h, A):
    """Inverse + logdet of a symmetric PD component matrix.

    Same recursion as utils.linalg.sym_inv_and_logdet: closed-form adjugate
    for h<=3, symmetric 2x2-block Schur split above.
    """
    if h == 1:
        det = A[(0, 0)]
        return {(0, 0): 1.0 / det}, jnp.log(det)
    if h == 2:
        a, b, d = A[(0, 0)], A[(0, 1)], A[(1, 1)]
        det = a * d - b * b
        return {(0, 0): d / det, (0, 1): -b / det, (1, 1): a / det}, jnp.log(det)
    if h == 3:
        a, b, c = A[(0, 0)], A[(0, 1)], A[(0, 2)]
        e, f = A[(1, 1)], A[(1, 2)]
        i = A[(2, 2)]
        A11 = e * i - f * f
        A12 = -(b * i - c * f)
        A13 = b * f - c * e
        A22 = a * i - c * c
        A23 = -(a * f - c * b)
        A33 = a * e - b * b
        det = a * A11 + b * A12 + c * A13
        inv = {
            (0, 0): A11 / det, (0, 1): A12 / det, (0, 2): A13 / det,
            (1, 1): A22 / det, (1, 2): A23 / det, (2, 2): A33 / det,
        }
        return inv, jnp.log(det)
    k = h // 2
    A11 = {(i, j): A[(i, j)] for i in range(k) for j in range(i, k)}
    A12 = {(i, j): sym_get(A, i, j + k) for i in range(k) for j in range(h - k)}
    A22 = {
        (i, j): A[(i + k, j + k)] for i in range(h - k) for j in range(i, h - k)
    }
    inv11, ld11 = sym_inv_and_logdet(k, A11)
    # W = inv11 @ A12  (k x (h-k))
    W = {
        (i, j): sum(sym_get(inv11, i, m) * A12[(m, j)] for m in range(k))
        for i in range(k)
        for j in range(h - k)
    }
    # S = A22 - A12^T W (symmetric)
    S = {
        (i, j): A22[(i, j)] - sum(A12[(m, i)] * W[(m, j)] for m in range(k))
        for i in range(h - k)
        for j in range(i, h - k)
    }
    invS, ldS = sym_inv_and_logdet(h - k, S)
    # TR = -W @ invS  (k x (h-k))
    TR = {
        (i, j): -sum(W[(i, m)] * sym_get(invS, m, j) for m in range(h - k))
        for i in range(k)
        for j in range(h - k)
    }
    out = {}
    # TL = inv11 - TR @ W^T (symmetric)
    for i in range(k):
        for j in range(i, k):
            out[(i, j)] = sym_get(inv11, i, j) - sum(
                TR[(i, m)] * W[(j, m)] for m in range(h - k)
            )
    for i in range(k):
        for j in range(h - k):
            out[(i, j + k)] = TR[(i, j)]
    for i in range(h - k):
        for j in range(i, h - k):
            out[(i + k, j + k)] = sym_get(invS, i, j)
    return out, ld11 + ldS
