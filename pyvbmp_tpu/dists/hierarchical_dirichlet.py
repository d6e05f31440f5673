"""Chain-factorized Dirichlet over a tensor-valued event
(reference dists/Hierarchical_Dirichlet.py:29-94).

Parameterizes p(x_0,...,x_{n-1}) = p(x_0) p(x_1|x_0) ... p(x_{n-1}|x_{n-2})
as a list of broadcast-shaped Dirichlets:
  dists[0]   ~ p(x_0):        event (e_0,1,...,1),        batch = batch_shape
  dists[k+1] ~ p(x_{k+1}|x_k): event (e_{k+1},1,...),     batch = batch+(1,)*k+(e_k,)
Joint expectations (mean / loggeomean) broadcast-multiply the chain back to
the full event shape.
"""
from __future__ import annotations

import jax.numpy as jnp
import jax.random as jr

from ..utils.jaxutils import pytree_dataclass, replace
from ..utils.rng import key_or_next
from .dirichlet import Dirichlet


@pytree_dataclass(meta_fields=("event_shape", "batch_shape", "sum_list"))
class Hierarchical_Dirichlet:
    dists: list
    NA: jnp.ndarray
    event_shape: tuple
    batch_shape: tuple
    sum_list: tuple

    @classmethod
    def create(cls, event_shape, batch_shape=(), prior_parms=None, key=None):
        key = key_or_next(key)
        event_shape = tuple(event_shape)
        batch_shape = tuple(batch_shape)
        n_dims = len(event_shape)

        shape = event_shape[:1] + (1,) * (n_dims - 1)
        dists = [
            Dirichlet.create(
                event_shape=shape,
                batch_shape=batch_shape,
                prior_parms=prior_parms,
                key=jr.fold_in(key, 0),
            )
        ]
        sum_list = [tuple(range(-n_dims + 1, 0))]
        for i in range(n_dims - 1):
            shape = event_shape[i + 1 : i + 2] + (1,) * (n_dims - 2 - i)
            bshape = batch_shape + (1,) * i + event_shape[i : i + 1]
            dists.append(
                Dirichlet.create(
                    event_shape=shape,
                    batch_shape=bshape,
                    prior_parms=prior_parms,
                    key=jr.fold_in(key, i + 1),
                )
            )
            sum_list.append(
                tuple(range(-n_dims, -n_dims + i))
                + tuple(range(-n_dims + i + 2, 0))
            )
        return cls(
            dists=dists,
            NA=jnp.zeros(batch_shape + event_shape),
            event_shape=event_shape,
            batch_shape=batch_shape,
            sum_list=tuple(sum_list),
        )

    @property
    def event_dim(self):
        return len(self.event_shape)

    @property
    def batch_dim(self):
        return len(self.batch_shape)

    def ss_update(self, NA, lr=1.0, beta=None):
        if beta is not None:
            NA = beta * self.NA + NA
        # NOTE (reference quirk, Hierarchical_Dirichlet.py:47-54): the
        # reference forwards ``beta`` to the sub-Dirichlets AFTER already
        # accumulating NA here, so the children decay their own stored stats
        # a second time. Reproduced for parity.
        dists = [
            d.ss_update(
                NA.sum(self.sum_list[i], keepdims=True) if self.sum_list[i] else NA,
                lr=lr,
                beta=beta,
            )
            for i, d in enumerate(self.dists)
        ]
        return replace(self, dists=dists, NA=NA)

    def raw_update(self, X, p=None, lr=1.0, beta=None):
        nd = self.batch_dim + self.event_dim
        sdims = tuple(range(X.ndim - nd))
        if p is None:
            NA = X.sum(sdims)
        else:
            NA = (X * p.reshape(p.shape + (1,) * self.event_dim)).sum(sdims)
        return self.ss_update(NA, lr, beta)

    update = raw_update

    def marginal(self, idx):
        raise NotImplementedError

    def mean(self):
        p = self.dists[0].mean()
        for d in self.dists[1:]:
            p = p * d.mean()
        return p

    def loggeomean(self):
        logp = self.dists[0].ElogX()
        for d in self.dists[1:]:
            logp = logp + d.ElogX()
        return logp

    ElogX = loggeomean

    def KLqprior(self):
        KL = self.dists[0].KLqprior()
        for i, d in enumerate(self.dists[1:], start=1):
            KL = KL + d.KLqprior().sum(tuple(range(-i, 0)))
        return KL
