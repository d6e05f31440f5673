"""Deep gradient-free network: a stack of dMixtureofLinearTransforms layers
with an MNLR head, trained by forward/backward message passing ("FBI" sweeps)
— working counterpart of reference models/wip_BayesNet.py (whose imports are
broken in the reference tree)."""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..dists.mvn_vector_format import MultivariateNormal_vector_format as MVN_vf
from ..transforms import MultiNomialLogisticRegression, dMixtureofLinearTransforms
from ..utils.rng import key_or_next


class BayesNet:
    def __init__(self, n, p, hidden_dims, mixture_dims, batch_shape=(), pad_X=True, key=None):
        import jax.random as jr

        key = key_or_next(key)
        self.num_layers = len(mixture_dims)
        self.mixture_dims = mixture_dims
        self.hidden_dims = hidden_dims
        self.batch_shape = tuple(batch_shape)
        self.layers = [
            dMixtureofLinearTransforms(
                hidden_dims[0], p, mixture_dims[0], batch_shape=batch_shape,
                pad_X=True, key=jr.fold_in(key, 0),
            )
        ]
        for i in range(1, self.num_layers):
            self.layers.append(
                dMixtureofLinearTransforms(
                    hidden_dims[i], hidden_dims[i - 1], mixture_dims[i],
                    batch_shape=batch_shape, pad_X=True, key=jr.fold_in(key, i),
                )
            )
        self.head = MultiNomialLogisticRegression(
            n, hidden_dims[-1], batch_shape=tuple(batch_shape), pad_X=True,
            key=jr.fold_in(key, self.num_layers),
        )
        self.MSE = []
        self.ELBO_save = []

    def _forward_messages(self, X):
        pX_forward = [self.layers[0].predict(X)[0]]
        for i in range(1, self.num_layers):
            pX_forward.append(self.layers[i].forward(pX_forward[i - 1]))
        return pX_forward

    def update(self, X, Y, iters=1, lr=1.0, verbose=False, FBI=True):
        """Forward/backward message sweeps with interleaved layer updates
        (reference wip_BayesNet.update:43-90)."""
        for _ in range(int(iters)):
            pX_forward = self._forward_messages(X)
            pX_backward = [None] * self.num_layers
            pX = [None] * self.num_layers

            pX_backward[-1] = self.head.backward(Y)[0]
            pX[-1] = pX_forward[-1].combiner(pX_backward[-1])
            if FBI:
                self.head.update(pX[-1], Y, lr=lr)
                pX_backward[-1] = self.head.backward(Y)[0]
                pX[-1] = pX_forward[-1].combiner(pX_backward[-1])

            for n in range(self.num_layers - 1, 0, -1):
                pX_backward[n - 1] = self.layers[n].backward(pX_backward[n])[0]
                pX[n - 1] = pX_forward[n - 1].combiner(pX_backward[n - 1])
                if FBI:
                    self.layers[n].update(pX[n - 1], pX[n], lr=lr)
                    pX_backward[n - 1] = self.layers[n].backward(pX_backward[n])[0]
                    pX[n - 1] = pX_forward[n - 1].combiner(pX_backward[n - 1])

            # input layer update from raw X to the first combined message
            pX0 = MVN_vf(
                mu=X[..., None],
                Sigma=1e-8 * jnp.eye(X.shape[-1]),
                invSigma=1e8 * jnp.eye(X.shape[-1]),
                invSigmamu=1e8 * X[..., None],
            )
            self.layers[0].update(pX0, pX[0], lr=lr)

    def predict(self, X):
        pX_forward = self._forward_messages(X)
        return self.head.forward(pX_forward[-1])

    def accuracy(self, X, y_labels):
        pred = np.asarray(self.predict(X)).argmax(-1)
        return (pred == np.asarray(y_labels)).mean()
