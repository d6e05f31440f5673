"""Deep gradient-free classifier: two stacked dMixtureofLinearTransforms
layers trained by forward/backward message passing on two-moons data
(reference examples/two_moons.py:35-66)."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from pyvbmp_tpu.dists import MultivariateNormal_vector_format as MVN_vf, Delta
from pyvbmp_tpu.transforms import dMixtureofLinearTransforms, MultiNomialLogisticRegression
from pyvbmp_tpu.utils import rng


def two_moons(n=400, noise=0.08, seed=0):
    rs = np.random.RandomState(seed)
    t = np.pi * rs.rand(n // 2)
    outer = np.stack([np.cos(t), np.sin(t)], -1)
    inner = np.stack([1 - np.cos(t), -np.sin(t) + 0.5], -1)
    X = np.concatenate([outer, inner]) + noise * rs.randn(n, 2)
    y = np.concatenate([np.zeros(n // 2, int), np.ones(n // 2, int)])
    return X.astype(np.float32), y


def main(iters=20):
    smoke = bool(int(os.environ.get("PYVBMP_EXAMPLE_SMOKE", "0")))
    if smoke:
        iters = 3
    rng.seed(0)
    X, y = two_moons(n=80) if smoke else two_moons()
    Y = np.eye(2, dtype=np.float32)[y]
    hidden = 2
    layer = dMixtureofLinearTransforms(hidden, 2, 4, pad_X=True)
    head = MultiNomialLogisticRegression(2, hidden, pad_X=True)

    pX = MVN_vf(
        mu=jnp.asarray(X)[..., None],
        Sigma=1e-4 * jnp.broadcast_to(jnp.eye(2), (X.shape[0], 2, 2)),
    )
    for i in range(iters):
        # forward pass through the layer
        pH = layer.forward(pX)
        # train head on layer output
        head.update(pH, jnp.asarray(Y), iters=1)
        # backward message from labels through the head
        pH_msg, _ = head.backward(jnp.asarray(Y))
        # combine and update layer
        pH_comb = pH.combiner(pH_msg)
        layer.update(pX, pH_comb, iters=1)
    pH = layer.forward(pX)
    pred = np.asarray(head.forward(pH)).argmax(-1)
    acc = (pred == y).mean()
    print("two-moons accuracy (gradient-free deep message passing):", acc)
    return acc


if __name__ == "__main__":
    main()
