"""Pytree plumbing shared by every distribution / transform / model node.

Design note (vs. the torch reference): reference objects mutate their natural
parameters in place (e.g. ``Dirichlet.ss_update`` at
/root/reference/dists/Dirichlet.py:22-28).  Here every node is a mutable
dataclass *registered as a JAX pytree*: array fields are pytree leaves,
shape/config fields are static aux data.  ``ss_update`` and friends return a
**new node**, so whole VB-EM steps jit cleanly and nodes can be donated /
sharded as ordinary pytrees.  Thin stateful model wrappers (models/) re-assign
the returned nodes to give users the reference's familiar imperative API.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax


def pytree_dataclass(cls=None, *, meta_fields: tuple = ()):
    """Decorate a dataclass as a pytree; ``meta_fields`` are static aux data.

    All other dataclass fields are pytree children (arrays / sub-nodes /
    ``None``).
    """

    def wrap(c):
        c = dataclass(c)
        data_fields = tuple(
            f.name for f in dataclasses.fields(c) if f.name not in meta_fields
        )
        jax.tree_util.register_dataclass(
            c, data_fields=data_fields, meta_fields=tuple(meta_fields)
        )
        # constructors must produce strong-typed leaves so the model pytree's
        # abstract values stay identical across updates (see strongify)
        create = c.__dict__.get("create")
        if create is not None and not getattr(
            create.__func__, "_strongified", False
        ):
            orig = create.__func__

            def _create(cls, *a, **k):
                return strongify(orig(cls, *a, **k))

            _create._strongified = True
            _create.__doc__ = orig.__doc__
            c.create = classmethod(_create)
        return c

    if cls is None:
        return wrap
    return wrap(cls)


class HashableArray:
    """Immutable numpy array usable as pytree METADATA.

    Static aux data must hash and compare with simple (bool) equality; a raw
    numpy array hashes only by object identity and its ``==`` is elementwise,
    so two models built with equal masks raise "truth value of an array is
    ambiguous" inside the jit signature check. This wrapper compares by value
    and exposes enough of the array interface (shape / reshape / ~ /
    __array__) for the static-mask code paths."""

    __slots__ = ("arr",)

    def __init__(self, a):
        import numpy as _np

        arr = _np.asarray(a)
        arr.setflags(write=False)
        object.__setattr__(self, "arr", arr)

    def __eq__(self, other):
        import numpy as _np

        if not isinstance(other, HashableArray):
            return NotImplemented
        return (
            self.arr.shape == other.arr.shape
            and self.arr.dtype == other.arr.dtype
            and bool(_np.array_equal(self.arr, other.arr))
        )

    def __hash__(self):
        return hash((self.arr.shape, str(self.arr.dtype), self.arr.tobytes()))

    def __array__(self, dtype=None, copy=None):
        import numpy as _np

        return _np.asarray(self.arr, dtype)

    @property
    def shape(self):
        return self.arr.shape

    def reshape(self, *a):
        return self.arr.reshape(*a)

    def __invert__(self):
        return ~self.arr

    def __getitem__(self, i):
        return self.arr[i]

    def __repr__(self):
        return f"HashableArray({self.arr!r})"


def strongify(node):
    """Strip weak_type from every array leaf (same dtype).

    Prior fields built from python scalars are weak-typed; after one
    ss_update the corresponding posteriors become strong, which changes the
    abstract values of the model pytree and forces one spurious re-trace of
    the fused VB step (minutes of XLA compile on remote-attached TPUs).
    Calling this at the end of every ``create`` keeps avals stable."""
    return jax.tree_util.tree_map(
        lambda a: a.astype(a.dtype) if isinstance(a, jax.Array) else a, node
    )


def replace(node, **changes):
    """dataclasses.replace for pytree nodes."""
    return dataclasses.replace(node, **changes)


def damp(new, old, lr):
    """Learning-rate damped natural-parameter blend: lr*new + (1-lr)*old.

    Matches the reference's ubiquitous ``lr*(eta_0+SS) + (1-lr)*eta`` pattern
    (e.g. /root/reference/dists/Wishart.py:52-53).
    """
    return jax.tree_util.tree_map(lambda n, o: lr * n + (1.0 - lr) * o, new, old)


def accumulate(old_ss, new_ss, beta):
    """Stale-statistic decay used for minibatch / streaming VB.

    beta=None -> use fresh stats; otherwise SS <- beta*SS_old + SS_new
    (reference semantics, e.g. /root/reference/dists/Dirichlet.py:22-28).
    Returns the stats to *use* and the stats to *store*.
    """
    if beta is None:
        return new_ss, new_ss
    acc = jax.tree_util.tree_map(lambda o, n: beta * o + n, old_ss, new_ss)
    return acc, acc


def mxu_precision():
    """MXU pass-count for the f32 matmul hot paths (read at trace time).

    ``PYVBMP_MXU_PRECISION`` in {"highest" (default), "high", "default"}:
    HIGHEST = 6 bf16 passes (~full f32), HIGH = 3 passes (~f32 minus ~2
    mantissa bits), DEFAULT = 1 bf16 pass.  Measured on the v5e chip (GMM
    n=1e5 d=64 K=16, device-side slope): HIGHEST 2.37 ms/iter, HIGH 1.52
    (1.56x), DEFAULT 0.87 (2.7x); 30-iter fit ELBO drift vs HIGHEST is
    7e-5 relative for HIGH but 1.6e-2 for DEFAULT — bf16 single-pass loses
    exactly the centered-residual accumulation these contractions protect,
    so "high" is the supported speed mode and "default" is for exploratory
    fits only.  HIGHEST stays the default because parity — not throughput —
    is this repo's contract.  Set the env var before the first update() of a
    process (jit programs trace it in).
    """
    import os

    import jax

    name = os.environ.get("PYVBMP_MXU_PRECISION", "highest").lower()
    return {
        "default": jax.lax.Precision.DEFAULT,
        "high": jax.lax.Precision.HIGH,
        "highest": jax.lax.Precision.HIGHEST,
    }[name]


def _scatter_dot(A, B, sdims):
    """``sum over sdims of A[..., :, None] * B[..., None, :]`` expressed as a
    single ``dot_general`` (contracting the sample axes, batching every other
    non-event axis) so XLA tiles it onto the MXU instead of fusing a VPU
    reduce loop.  Measured on the v5e chip (GMM n=1e5 suff stats): the
    broadcast-reduce form runs at ~100-150 GFLOP/s; this form is matmul-
    shaped.  precision=HIGHEST keeps f32-accurate accumulation (the default
    TPU matmul feeds bf16 into the MXU, which would forfeit exactly the
    precision the centered form exists to protect)."""
    import jax

    nd = A.ndim
    sd = tuple(d % nd for d in sdims)
    batch = tuple(i for i in range(nd - 1) if i not in sd)
    out = jax.lax.dot_general(
        A,
        B,
        dimension_numbers=((sd, sd), (batch, batch)),
        precision=mxu_precision(),
    )
    return out  # batch + (d_A, d_B)


def bcontract_pp(X, W):
    """``(X * W).sum((-1, -2))`` where W is a param-batched matrix stack
    (B..., p, q) and X carries broadcast 1s at every B position — the
    mixture/role pattern of every per-component expected log-likelihood
    (reference MatrixNormalWishart.py:234-249, NormalInverseWishart.py:91-97
    consumers).  Lowered to ONE dot_general over the flattened p*q channel
    so XLA tiles it onto the MXU instead of fusing a (B, p, q)-broadcast
    VPU reduce loop; precision=HIGHEST keeps f32 accumulation (default TPU
    matmul feeds bf16 into the MXU).  Falls back to the broadcast-reduce
    form whenever the shapes don't match the pattern."""
    import jax
    import jax.numpy as jnp

    k = W.ndim - 2
    if (
        k < 1
        or X.ndim < W.ndim
        or X.shape[-2:] != W.shape[-2:]
        or any(s != 1 for s in X.shape[-2 - k : -2])
    ):
        return (X * W).sum((-1, -2))
    rows = X.reshape(X.shape[: -2 - k] + (X.shape[-2] * X.shape[-1],))
    cols = W.reshape((-1, W.shape[-2] * W.shape[-1]))
    out = jnp.matmul(rows, cols.T, precision=mxu_precision())
    return out.reshape(out.shape[:-1] + W.shape[:-2])


def brole_avg(M, p):
    """``sum_k p[..., k] * M[..., k, :, :]`` — the role/component average of
    per-component matrix messages (reference ARHMM.py:46-52, 79-91).  When M
    is param-only (one (K, i, j) stack shared by every sample), this is ONE
    (samples, K) @ (K, i*j) matmul on the MXU; otherwise a batched einsum.
    precision=HIGHEST (default TPU matmul feeds bf16 into the MXU)."""
    import jax
    import jax.numpy as jnp

    K = p.shape[-1]
    if M.ndim == 3 and M.shape[0] == K:
        # dot_general with the sample dims as LHS free dims — XLA flattens
        # free dims onto the MXU rows itself, but unlike an explicit
        # p.reshape((-1, K)) it PRESERVES any mesh sharding of the batch
        # axis (the reshape merged the sharded dim and forced an O(T*B)
        # all-gather into every data-parallel sweep; measured in
        # tests/test_mesh_parallel.py's collective-footprint assertion)
        out = jax.lax.dot_general(
            p,
            M.reshape((K, -1)),
            dimension_numbers=(((p.ndim - 1,), (0,)), ((), ())),
            precision=mxu_precision(),
        )
        return out.reshape(p.shape[:-1] + M.shape[-2:])
    return jnp.einsum(
        "...kij,...k->...ij", M, p, precision=mxu_precision()
    )


def bquad(X, W):
    """Per-component quadratic form ``x^T W_k x``: X is (..., B-broadcast-1s,
    d), W is (B..., d, d); returns (..., B...).  Lowered as ONE
    (samples, d) @ (d, B*d) MXU matmul followed by a light elementwise
    reduce — the E-step hot pattern of every mixture/HMM observation
    likelihood (reference NormalInverseWishart.py:91-97) — instead of a
    (B, d, d)-broadcast VPU loop.  No n*d^2 intermediate is materialized
    (safe at d=128).  Falls back to the broadcast-reduce form when the
    shapes don't match the pattern."""
    import jax
    import jax.numpy as jnp

    k = W.ndim - 2
    d = W.shape[-1]
    if (
        k < 1
        or W.shape[-2] != d
        or X.ndim < W.ndim - 1
        or X.shape[-1] != d
        or any(s != 1 for s in X.shape[-1 - k : -1])
    ):
        return ((X[..., None] * W).sum(-2) * X).sum(-1)
    lead = X.shape[: -1 - k]
    rows = X.reshape(lead + (d,))
    Bf = 1
    for s in W.shape[:-2]:
        Bf *= s
    Wm = W.reshape((Bf, d, d)).transpose(1, 0, 2).reshape((d, Bf * d))
    Z = jnp.matmul(rows, Wm, precision=mxu_precision())
    Z = Z.reshape(lead + (Bf, d))
    out = (Z * rows[..., None, :]).sum(-1)
    return out.reshape(lead + W.shape[:-2])


def centered_scatter(X, pv, sdims):
    """Numerically-stable weighted scatter sum: (SExx, SEx, N).

    Computes ``SExx = sum_s p_s x x^T`` via the two-pass centered form
    ``sum_s p_s (x-c)(x-c)^T + N c c^T`` so large means don't destroy float32
    precision (the torch reference accumulates uncentered sums, which loses
    ~3 digits at mean/std ~ 30; this is exact in infinite precision and far
    better conditioned in f32 — the TPU fast path).  The rank-1-sum is
    contracted on the MXU via ``_scatter_dot``.

    X:  sample + batch + (d,)   (matrix layout, event dim = last axis)
    pv: weights broadcastable against X (or None)
    sdims: sample axes to reduce over
    """
    import jax.numpy as jnp

    if pv is None:
        N = None
        SEx = X.sum(sdims)
        nsamp = 1.0
        for d in sdims:
            nsamp = nsamp * X.shape[d]
        c = SEx / nsamp
        Xc = X - c
        SExx = _scatter_dot(Xc, Xc, sdims) + nsamp * (
            c[..., :, None] * c[..., None, :]
        )
        return SExx, SEx, None
    N = pv.sum(sdims)
    SEx = (X * pv).sum(sdims)
    c = SEx / jnp.maximum(N, 1e-20)
    Xc = X - c
    SExx = _scatter_dot(Xc * pv, Xc, sdims) + N[..., None] * (
        c[..., :, None] * c[..., None, :]
    )
    return SExx, SEx, N


def tsum(x, dims):
    """torch-style ``Tensor.sum(list)``: an EMPTY dim list sums over ALL axes
    (torch semantics relied on by the reference, e.g. dists/MVN_ard.py:77)."""
    dims = tuple(dims)
    if len(dims) == 0:
        return x.sum()
    return x.sum(dims)


def sum_leading(x, ndim_keep):
    """Sum array over all leading dims so that x.ndim == ndim_keep."""
    if x.ndim > ndim_keep:
        return x.sum(tuple(range(x.ndim - ndim_keep)))
    return x
