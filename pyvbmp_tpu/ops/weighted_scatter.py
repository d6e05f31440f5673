"""Fused weighted sufficient-statistic scatter: O[k] = sum_s W[s,k] x_s x_s^T.

This is the single hottest pattern in the reference (SURVEY.md §7 kernel
priority #1: NormalInverseWishart.raw_update:79-84,
MatrixNormalWishart.raw_update:184-189, MNLR.raw_update:68-73).  A naive
broadcast-multiply-reduce materializes an (S, K, p, p) intermediate and runs
on the VPU; the Pallas kernel tiles the sample axis, fuses the weight
multiply into an MXU matmul per (k, s-tile), and accumulates in VMEM — no
intermediate ever touches HBM.

``weighted_outer(X, W)`` defaults to the matmul-formulated einsum (one MXU
matmul, one (S, K*p) intermediate); the Pallas kernel is OPT-IN via
``force="pallas"``.  Round-3 re-adjudication on the axon chip: Mosaic now
compiles and runs this kernel fine (the round-2 hang is gone from the
toolchain), but the einsum formulation beats it at every measured size
(S=4k..400k, p=8/32, K=16: einsum 1.9-2.5 ms vs pallas 3.0-13.4 ms) — the
kernel's per-class grid re-reads the sample tile K times while XLA feeds
the whole contraction through one MXU matmul.  It stays as the
interpret-mode-tested reference implementation of the fused scatter.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _kernel(w_ref, x_ref, o_ref):
    k = pl.program_id(0)
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    x = x_ref[...]  # (Ts, P)
    wall = w_ref[...]  # (Ts, Kp)
    # dynamic lane slices must be 128-aligned on TPU; select class k with a
    # one-hot mask + lane reduction instead
    lane = jax.lax.broadcasted_iota(jnp.int32, wall.shape, 1)
    w = jnp.sum(jnp.where(lane == k, wall, 0.0), axis=1, keepdims=True)
    xw = x * w
    o_ref[...] += jnp.dot(xw.T, x, preferred_element_type=jnp.float32)[None]


@functools.partial(jax.jit, static_argnames=("s_tile", "interpret"))
def weighted_outer_pallas(X, W, s_tile=512, interpret=False):
    """X: (S, p) float32, W: (S, K) float32 -> (K, p, p).

    jit-wrapped at the entry point: an eager pallas_call rebuilds (and
    recompiles) the kernel closure on every invocation — measured 480 ms/call
    vs 2 ms jitted on the axon chip."""
    S, p = X.shape
    K = W.shape[-1]
    P = max(128, _round_up(p, 128))
    Sp = _round_up(S, s_tile)
    Kp = max(128, _round_up(K, 128))
    Xp = jnp.zeros((Sp, P), X.dtype).at[:S, :p].set(X)
    Wp = jnp.zeros((Sp, Kp), W.dtype).at[:S, :K].set(W)

    out = pl.pallas_call(
        _kernel,
        grid=(K, Sp // s_tile),
        in_specs=[
            pl.BlockSpec((s_tile, Kp), lambda k, s: (s, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((s_tile, P), lambda k, s: (s, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, P, P), lambda k, s: (k, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((K, P, P), jnp.float32),
        interpret=interpret,
    )(Wp, Xp)
    return out[:, :p, :p]


def weighted_outer_einsum(X, W):
    """Matmul formulation: A = W ⊗ X reshaped (S, K*p); O = A^T X.
    One MXU matmul; the (S, K, p) intermediate is the only extra HBM."""
    S, p = X.shape
    K = W.shape[-1]
    A = (W[:, :, None] * X[:, None, :]).reshape(S, K * p)
    O = A.T @ X  # (K*p, p)
    return O.reshape(K, p, p)


def weighted_outer(X, W, force=None, interpret=False):
    """Dispatching entry point; X (S,p), W (S,K) -> (K,p,p).

    Default is the einsum formulation (a single MXU matmul) — measured
    faster than the Pallas kernel at every size on the v5e chip (see module
    docstring). The kernel is opt-in via ``force="pallas"``; correctness is
    covered in interpret mode (tests/test_untested_components.py).
    """
    if force == "pallas":
        return weighted_outer_pallas(X, W, interpret=interpret)
    return weighted_outer_einsum(X, W)
