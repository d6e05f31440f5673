"""Classifier bake-off: MNLR vs dMixLT vs NLRegression variants vs MixLT
(counterpart of reference tests/test_vb_mnist.py:107-160, which compares
percent-correct and wall-clock on MNIST-16x16; no MNIST files ship with this
environment, so a synthetic 10-class 64-dim task with non-linear class
boundaries stands in — same models, same protocol, recorded numbers).

Run: python benchmarks/classification_bakeoff.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def make_task(n_train=4000, n_test=1000, K=10, d=16, seed=0):
    rs = np.random.RandomState(seed)
    # each class = a pair of Gaussian prototypes (bimodal -> nonlinear
    # boundaries that a plain linear classifier cannot fully separate)
    protos = rs.randn(K, 2, d) * 1.5
    def draw(n):
        y = rs.randint(0, K, n)
        mode = rs.randint(0, 2, n)
        X = protos[y, mode] + rs.randn(n, d)
        return X.astype(np.float32), y
    Xtr, ytr = draw(n_train)
    Xte, yte = draw(n_test)
    return Xtr, ytr, Xte, yte


def main():
    import jax
    import jax.numpy as jnp
    from pyvbmp_tpu.transforms import (
        MultiNomialLogisticRegression,
        MultiNomialLogisticRegression_Bouchard,
        dMixtureofLinearTransforms,
        NLRegression_Multinomial,
    )
    from pyvbmp_tpu.utils import rng

    Xtr, ytr, Xte, yte = make_task()
    K = 10
    Ytr = np.eye(K, dtype=np.float32)[ytr]
    jXtr, jYtr, jXte = jnp.asarray(Xtr), jnp.asarray(Ytr), jnp.asarray(Xte)

    results = {}

    rng.seed(0)
    m = MultiNomialLogisticRegression(K, Xtr.shape[1])
    t0 = time.perf_counter()
    for _ in range(10):
        m.raw_update(jXtr, jYtr, iters=2)
    jax.block_until_ready(m.beta.mu)
    dt = time.perf_counter() - t0
    acc = (np.asarray(m.predict(jXte)).argmax(-1) == yte).mean()
    results["MNLR (PG)"] = (acc, dt)

    rng.seed(0)
    m = MultiNomialLogisticRegression_Bouchard(K, Xtr.shape[1])
    t0 = time.perf_counter()
    for _ in range(10):
        m.raw_update(jXtr, jYtr, iters=2)
    jax.block_until_ready(m.beta.mu)
    dt = time.perf_counter() - t0
    acc = (np.asarray(m.predict(jXte)).argmax(-1) == yte).mean()
    results["MNLR (Bouchard)"] = (acc, dt)

    rng.seed(0)
    # predict class scores via one-hot regression through a mixture of experts
    m = dMixtureofLinearTransforms(K, Xtr.shape[1], 4)
    t0 = time.perf_counter()
    m.raw_update(jXtr, jYtr, iters=10)
    jax.block_until_ready(m.A.mu)
    dt = time.perf_counter() - t0
    pY, _ = m.predict(jXte)
    acc = (np.asarray(pY.mean())[..., 0].argmax(-1) == yte).mean()
    results["dMixLT (4 experts)"] = (acc, dt)

    rng.seed(0)
    m = NLRegression_Multinomial(K, Xtr.shape[1], 4)
    t0 = time.perf_counter()
    m.raw_update(jXtr, jYtr, iters=10)
    jax.block_until_ready(m.A.mu)
    dt = time.perf_counter() - t0
    pY, _ = m.predict(jXte)
    acc = (np.asarray(pY.mean())[..., 0].argmax(-1) == yte).mean()
    results["NLR-multinomial"] = (acc, dt)

    for name, (acc, dt) in results.items():
        print("%-22s accuracy %.3f   fit %.1fs" % (name, acc, dt))
    return results


def main_ref():
    """torch-CPU reference on the same task (MNIST bake-off analogue,
    reference tests/test_vb_mnist.py:107-160; MNIST itself needs a download
    this environment doesn't allow, so the same synthetic task is used for
    both sides)."""
    import sys as _s
    _s.path.insert(0, "/root/reference")
    import torch
    from transforms import (
        MultiNomialLogisticRegression,
        dMixtureofLinearTransforms,
        NLRegression_Multinomial,
    )

    Xtr, ytr, Xte, yte = make_task()
    K = 10
    Ytr = np.eye(K, dtype=np.float32)[ytr]
    tX, tY, tXe = map(torch.tensor, (Xtr, Ytr, Xte))

    results = {}
    torch.manual_seed(0)
    m = MultiNomialLogisticRegression(K, Xtr.shape[1], pad_X=True)
    t0 = time.perf_counter()
    for _ in range(10):
        m.raw_update(tX, tY, iters=2)
    dt = time.perf_counter() - t0
    acc = (m.predict(tXe).argmax(-1).numpy() == yte).mean()
    results["MNLR (PG)"] = (acc, dt)

    torch.manual_seed(0)
    m = dMixtureofLinearTransforms(K, Xtr.shape[1], 4)
    t0 = time.perf_counter()
    m.raw_update(tX, tY, iters=10)
    dt = time.perf_counter() - t0
    pY = m.predict(tXe)[0]
    acc = (pY.mean().squeeze(-1).argmax(-1).numpy() == yte).mean()
    results["dMixLT (4 experts)"] = (acc, dt)

    torch.manual_seed(0)
    m = NLRegression_Multinomial(K, Xtr.shape[1], 4)
    t0 = time.perf_counter()
    m.raw_update(tX, tY, iters=10)
    dt = time.perf_counter() - t0
    pY = m.predict(tXe)[0]
    acc = (pY.mean().squeeze(-1).argmax(-1).numpy() == yte).mean()
    results["NLR-multinomial"] = (acc, dt)

    for name, (acc, dt) in results.items():
        print("%-22s accuracy %.3f   fit %.1fs   [torch-CPU reference]" % (name, acc, dt))
    return results


if __name__ == "__main__":
    import sys as _sys
    if len(_sys.argv) > 1 and _sys.argv[1] == "ref":
        main_ref()
    else:
        main()

