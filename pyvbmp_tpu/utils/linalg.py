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
    """Solve A X = B for symmetric PD A via Cholesky (batch-broadcasting).

    On accelerator backends dims in the Schur-dispatch range (see
    _schur_inv_n_max) route through the straight-line symmetric inverse
    instead — same rationale as psd_inv: XLA's blocked Cholesky lowers to a
    sequential loop, the Schur recursion is pure batched matmul code.

    Conditioning assumption: the Schur branch solves via the explicit
    inverse (sym_inv(A) @ B), which is not backward-stable the way
    cho_solve is — error grows with cond(A).  This is a deliberate
    accelerator trade-off: the framework's per-iteration solves act on
    posterior precision/covariance blocks kept well-conditioned by the
    conjugate updates (priors contribute >= nu_0 * I-scale mass) and by
    PSD_JITTER.  If ill-conditioned M-step precisions ever show up, set
    PYVBMP_PSD_INV=chol to keep solves on the Cholesky path."""
    A, B = _bcast(A, B)
    if 2 <= A.shape[-1] <= _schur_inv_n_max():
        if PSD_JITTER:
            A = A + PSD_JITTER * jnp.eye(A.shape[-1], dtype=A.dtype)
        with _apply_pin(A.shape[-1]):
            return sym_inv(_sym(A)) @ B
    L = chol(A)
    return jax.scipy.linalg.cho_solve((L, True), B)


def _schur_inv_n_max():
    """Full-inverse dispatch: Cholesky vs the straight-line Schur recursion.

    XLA lowers batched Cholesky + cho_solve on TPU to a sequential blocked
    loop; the recursive symmetric Schur inverse below is pure batched
    matmul/elementwise code.  Measured on the v5e chip (K=16 batch,
    inverse+logdet, device-side rep-scan): chol 157/206/308/524 us at
    d=16/32/64/128 vs Schur 123/135/173/241 us — Schur wins everywhere in
    the framework's d range, so ``auto`` (the default) routes full PSD
    inverses through it on accelerator backends.  Round 5: the recursion's
    matmuls are pinned to f32-accurate precision (bf16 Schur complements
    of ~65-dim matrices corrupted the PG classifiers to chance — see
    sym_inv_and_logdet) and the win was re-measured with the pin in place:
    chol 2292/697/551/1534 us vs pinned Schur 594/444/350/591 at
    d=16/32/64/128 (per-call sync protocol, same-session) — still faster
    at every dim, so the dispatch is unchanged.  CPU (the parity gate)
    always stays on Cholesky.  ``PYVBMP_PSD_INV`` = "chol" forces Cholesky
    everywhere; an integer sets the max dim for the Schur path (0 disables,
    read at trace time)."""
    import os

    mode = os.environ.get("PYVBMP_PSD_INV", "auto").lower()
    if mode == "chol":
        return 0
    if mode == "auto":
        return 128 if jax.default_backend() != "cpu" else 0
    return int(mode)


def psd_inv(A):
    if 2 <= A.shape[-1] <= _schur_inv_n_max():
        if PSD_JITTER:
            A = A + PSD_JITTER * jnp.eye(A.shape[-1], dtype=A.dtype)
        return sym_inv_and_logdet(_sym(A))[0]
    L = chol(A)
    eye = jnp.broadcast_to(jnp.eye(A.shape[-1], dtype=A.dtype), A.shape)
    return jax.scipy.linalg.cho_solve((L, True), eye)


def psd_logdet(A):
    if 2 <= A.shape[-1] <= _schur_inv_n_max():
        if PSD_JITTER:
            A = A + PSD_JITTER * jnp.eye(A.shape[-1], dtype=A.dtype)
        return sym_logdet(_sym(A))
    L = chol(A)
    return 2.0 * jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)).sum(-1)


def psd_inv_and_logdet(A):
    """Fused inverse + logdet off one Cholesky factor (or the straight-line
    Schur recursion on accelerator backends — see _schur_inv_n_max)."""
    if 2 <= A.shape[-1] <= _schur_inv_n_max():
        if PSD_JITTER:
            A = A + PSD_JITTER * jnp.eye(A.shape[-1], dtype=A.dtype)
        return sym_inv_and_logdet(_sym(A))
    L = chol(A)
    eye = jnp.broadcast_to(jnp.eye(A.shape[-1], dtype=A.dtype), A.shape)
    inv = jax.scipy.linalg.cho_solve((L, True), eye)
    logdet = 2.0 * jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)).sum(-1)
    return inv, logdet


def psd_solve_and_logdet(A, B):
    A, B = _bcast(A, B)
    if 2 <= A.shape[-1] <= _schur_inv_n_max():
        if PSD_JITTER:
            A = A + PSD_JITTER * jnp.eye(A.shape[-1], dtype=A.dtype)
        inv, logdet = sym_inv_and_logdet(_sym(A))
        with _apply_pin(A.shape[-1]):
            return inv @ B, logdet
    L = chol(A)
    X = jax.scipy.linalg.cho_solve((L, True), B)
    logdet = 2.0 * jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)).sum(-1)
    return X, logdet


def mT(A):
    return jnp.swapaxes(A, -1, -2)


# --- fast small-matrix inverse (TPU hot path) --------------------------------
#
# XLA lowers Cholesky/LU on TPU to sequential loop code, which is the
# throughput bottleneck for the huge batches of tiny (<=8x8) PSD matrices in
# the smoother scans.  For small n we instead use closed-form adjugates
# (n<=3) and recursive 2x2 block inversion (Schur complements) — straight-line
# elementwise/matmul code that vectorizes over the whole batch.


def _inv2(A):
    a = A[..., 0, 0]
    b = A[..., 0, 1]
    c = A[..., 1, 0]
    d = A[..., 1, 1]
    det = a * d - b * c
    inv = jnp.stack(
        [jnp.stack([d, -b], -1), jnp.stack([-c, a], -1)], -2
    ) / det[..., None, None]
    return inv, jnp.log(det)


def _inv3(A):
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    A11 = e * i - f * h
    A12 = -(b * i - c * h)
    A13 = b * f - c * e
    A21 = -(d * i - f * g)
    A22 = a * i - c * g
    A23 = -(a * f - c * d)
    A31 = d * h - e * g
    A32 = -(a * h - b * g)
    A33 = a * e - b * d
    det = a * A11 + b * A21 + c * A31
    inv = jnp.stack(
        [
            jnp.stack([A11, A12, A13], -1),
            jnp.stack([A21, A22, A23], -1),
            jnp.stack([A31, A32, A33], -1),
        ],
        -2,
    ) / det[..., None, None]
    return inv, jnp.log(det)


def small_inv_and_logdet(A):
    """Inverse + logdet of small PD matrices via straight-line code."""
    n = A.shape[-1]
    if n == 1:
        return 1.0 / A, jnp.log(A[..., 0, 0])
    if n == 2:
        return _inv2(A)
    if n == 3:
        return _inv3(A)
    k = n // 2
    A11 = A[..., :k, :k]
    A12 = A[..., :k, k:]
    A21 = A[..., k:, :k]
    A22 = A[..., k:, k:]
    inv11, ld11 = small_inv_and_logdet(A11)
    inv11_A12 = inv11 @ A12
    S = A22 - A21 @ inv11_A12
    invS, ldS = small_inv_and_logdet(S)
    A21_inv11 = A21 @ inv11
    top_left = inv11 + inv11_A12 @ invS @ A21_inv11
    top_right = -inv11_A12 @ invS
    bot_left = -invS @ A21_inv11
    inv = jnp.concatenate(
        [
            jnp.concatenate([top_left, top_right], -1),
            jnp.concatenate([bot_left, invS], -1),
        ],
        -2,
    )
    return inv, ld11 + ldS


def small_inv(A):
    return small_inv_and_logdet(A)[0]


def small_solve(A, B):
    return small_inv(A) @ B


def small_solve_and_logdet(A, B):
    inv, ld = small_inv_and_logdet(A)
    return inv @ B, ld




def _sym_pin(bit):
    """f32-accurate matmul context for the Schur recursion levels
    (PYVBMP_SYM_PIN bitmask; default 3 = both recursions pinned).

    bf16 error COMPOUNDS across Schur levels: at ~65 dims it corrupted
    the inverses badly enough to collapse the PG classifiers to chance
    on TPU (digits 0.082 vs 0.93).  The recursion only exists for n > 3
    blocks, so this pin costs nothing on the per-time tiny-matrix hot
    paths; measured on chip it leaves MixLDS at 429.6 it/s (pre-pin 537
    is within the tunnel-jitter band)."""
    import contextlib
    import os

    mask = int(os.environ.get("PYVBMP_SYM_PIN", "3"))
    if mask & bit:
        return jax.default_matmul_precision("highest")
    return contextlib.nullcontext()


APPLY_PIN_MIN_DIM_DEFAULT = 16


def _apply_pin(n):
    """Dimension-gated f32-accurate context for solve-APPLY matmuls
    (inv @ B): one product adds one rounding per k-term dot, so bf16 is
    harmless at tiny k but at k~65 (the MVN_ard / MNLR weight solves) the
    accumulation is enough to break the PG fixed point — verified on chip
    both ways.  Gating by the contraction dim keeps the (T*B)-batched
    2x2 message applies (the lazy mu = solve(invSigma, invSigmamu) on
    EVERY per-time message) at default precision: pinning those turned a
    fusible elementwise op into per-element padded MXU calls and cost
    MixLDS 9x (48.9 vs 429.6 it/s measured).  Threshold knob:
    PYVBMP_APPLY_PIN_MIN_DIM (default 16; production smoother dims h<=14
    were validated at default precision to ~0.3% ELBO, the transform-level
    d>=16 solves are seconds-scale work where accuracy wins)."""
    import contextlib
    import os

    thresh = int(
        os.environ.get("PYVBMP_APPLY_PIN_MIN_DIM", str(APPLY_PIN_MIN_DIM_DEFAULT))
    )
    if thresh > 0 and n >= thresh:
        return jax.default_matmul_precision("highest")
    return contextlib.nullcontext()

# --- symmetric-specialized straight-line inverses ---------------------------
# The associative-scan smoothers invert symmetric PD matrices in every combine
# stage; exploiting A = A^T drops the lower-triangle cofactors and one
# (k,k)@(k,n-k) matmul per Schur recursion level.

def _inv2_sym(A):
    a = A[..., 0, 0]
    b = A[..., 0, 1]
    d = A[..., 1, 1]
    det = a * d - b * b
    inv = jnp.stack(
        [jnp.stack([d, -b], -1), jnp.stack([-b, a], -1)], -2
    ) / det[..., None, None]
    return inv, jnp.log(det)


def _inv3_sym(A):
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    e, f = A[..., 1, 1], A[..., 1, 2]
    i = A[..., 2, 2]
    A11 = e * i - f * f
    A12 = -(b * i - c * f)
    A13 = b * f - c * e
    A22 = a * i - c * c
    A23 = -(a * f - c * b)
    A33 = a * e - b * b
    det = a * A11 + b * A12 + c * A13
    inv = jnp.stack(
        [
            jnp.stack([A11, A12, A13], -1),
            jnp.stack([A12, A22, A23], -1),
            jnp.stack([A13, A23, A33], -1),
        ],
        -2,
    ) / det[..., None, None]
    return inv, jnp.log(det)


def sym_inv_and_logdet(A):
    """Inverse + logdet of small SYMMETRIC PD matrices (straight-line).

    The n > 3 Schur recursion pins its matmuls to float32-accurate MXU
    precision: TPU's default feeds bf16 into the MXU, and a bf16 Schur
    complement of a ~65-dim precision matrix corrupts the inverse enough
    to collapse the Polya-Gamma classifiers to chance (measured on the
    digits bake-off: 0.082 at default vs 0.93 pinned/Cholesky — the
    conditioning risk ADVICE r4 flagged, observed in the wild)."""
    n = A.shape[-1]
    if n == 1:
        return 1.0 / A, jnp.log(A[..., 0, 0])
    if n == 2:
        return _inv2_sym(A)
    if n == 3:
        return _inv3_sym(A)
    with _sym_pin(1):
        k = n // 2
        A11 = A[..., :k, :k]
        A12 = A[..., :k, k:]
        A22 = A[..., k:, k:]
        inv11, ld11 = sym_inv_and_logdet(A11)
        inv11_A12 = inv11 @ A12
        S = A22 - mT(A12) @ inv11_A12
        S = 0.5 * (S + mT(S))
        invS, ldS = sym_inv_and_logdet(S)
        top_right = -inv11_A12 @ invS
        top_left = inv11 - top_right @ mT(inv11_A12)
        inv = jnp.concatenate(
            [
                jnp.concatenate([top_left, top_right], -1),
                jnp.concatenate([mT(top_right), invS], -1),
            ],
            -2,
        )
    return inv, ld11 + ldS


def sym_logdet(A):
    """logdet of small SYMMETRIC PD matrices via the Schur recursion.

    Cheaper than sym_inv_and_logdet: each level still needs inv11 (to form
    the Schur complement) but never assembles the inverse's off-diagonal /
    trailing blocks, and the trailing block recursion is logdet-only.

    fp32 dynamic-range assumption: the n<=3 leaves take log of a raw
    cofactor determinant (a*d - b*b etc.), which can underflow to -inf or
    cancel for blocks whose determinant is far below fp32 range — unlike
    the Cholesky path's sum of log-diagonals.  Fine for this framework's
    jitter-regularized posterior blocks; if extreme scales arise, rescale
    first (logdet(cA) = n*log(c) + logdet(A)) or use the Cholesky path
    (PYVBMP_PSD_INV=chol)."""
    n = A.shape[-1]
    if n == 1:
        return jnp.log(A[..., 0, 0])
    if n == 2:
        a = A[..., 0, 0]
        b = A[..., 0, 1]
        d = A[..., 1, 1]
        return jnp.log(a * d - b * b)
    if n == 3:
        a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
        e, f = A[..., 1, 1], A[..., 1, 2]
        i = A[..., 2, 2]
        det = (
            a * (e * i - f * f)
            - b * (b * i - c * f)
            + c * (b * f - c * e)
        )
        return jnp.log(det)
    k = n // 2
    A11 = A[..., :k, :k]
    A12 = A[..., :k, k:]
    A22 = A[..., k:, k:]
    inv11, ld11 = sym_inv_and_logdet(A11)
    with _sym_pin(2):
        S = A22 - mT(A12) @ (inv11 @ A12)
    return ld11 + sym_logdet(0.5 * (S + mT(S)))


def sym_inv(A):
    return sym_inv_and_logdet(A)[0]


def sym_solve(A, B):
    with _apply_pin(A.shape[-1]):
        return sym_inv(A) @ B


def sym_solve_and_logdet(A, B):
    inv, ld = sym_inv_and_logdet(A)
    with _apply_pin(A.shape[-1]):
        return inv @ B, ld


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
