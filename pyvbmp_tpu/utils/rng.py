"""Construction-time randomness.

The torch reference seeds symmetry-breaking random initializations from the
global torch RNG (e.g. ``torch.rand`` in Dirichlet.__init__,
/root/reference/dists/Dirichlet.py:10).  Constructors here accept an explicit
``key``; when omitted they draw from this module's global sequence so that
``seed(0)`` reproduces a whole model build deterministically.  This is impure
by design and must only run at construction time (never inside jit).
"""
from __future__ import annotations

import jax

_state = {"key": jax.random.key(0)}


def seed(s: int) -> None:
    _state["key"] = jax.random.key(s)


def next_key():
    _state["key"], sub = jax.random.split(_state["key"])
    return sub


def key_or_next(key):
    return next_key() if key is None else key
