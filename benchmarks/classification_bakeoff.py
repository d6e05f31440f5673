"""Classifier bake-off: MNLR vs dMixLT vs NLRegression variants vs MixLT
(counterpart of reference tests/test_vb_mnist.py:107-160, which compares
percent-correct and wall-clock on MNIST-16x16).

Two tasks:
- ``digits``: REAL data — the classic 8x8 handwritten-digit set (1797
  samples, 10 classes), vendored at benchmarks/data/digits8x8.npz (MNIST
  itself needs a download this environment forbids; digits is the same task
  family at 8x8 instead of 16x16).
- ``synthetic``: a 10-class bimodal 16-dim task with nonlinear boundaries.

Run: python benchmarks/classification_bakeoff.py {ours|ref} {digits|synthetic}
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


def load_digits_task(n_test=450, seed=0):
    """Real 8x8 handwritten digits (vendored npz); deterministic split."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "data", "digits8x8.npz")
    d = np.load(path)
    X, y = d["X"], d["y"]
    rs = np.random.RandomState(seed)
    idx = rs.permutation(len(X))
    X, y = X[idx], y[idx]
    X = (X / 16.0 - 0.5).astype(np.float32)  # pixel range [0,16] -> [-0.5,0.5]
    return X[n_test:], y[n_test:], X[:n_test], y[:n_test]


def get_task(name):
    return load_digits_task() if name == "digits" else make_task()


def main(task="synthetic"):
    import jax
    import jax.numpy as jnp
    from pyvbmp_tpu.transforms import (
        MultiNomialLogisticRegression,
        MultiNomialLogisticRegression_Bouchard,
        dMixtureofLinearTransforms,
        NLRegression_Multinomial,
    )
    from pyvbmp_tpu.utils import rng

    Xtr, ytr, Xte, yte = get_task(task)
    K = 10
    Ytr = np.eye(K, dtype=np.float32)[ytr]
    jXtr, jYtr, jXte = jnp.asarray(Xtr), jnp.asarray(Ytr), jnp.asarray(Xte)

    results = {}

    def timed(fit_and_predict):
        """Run twice from identical fresh state: first pass pays the jit
        compiles, second is the reported fit time (torch pays no compile, so
        this is the apples-to-apples number)."""
        fit_and_predict()
        t0 = time.perf_counter()
        yhat = fit_and_predict()
        dt = time.perf_counter() - t0
        return (yhat == yte).mean(), dt

    def fit_mnlr(cls):
        def run():
            rng.seed(0)
            m = cls(K, Xtr.shape[1])
            for _ in range(10):
                m.raw_update(jXtr, jYtr, iters=2)
            return np.asarray(m.predict(jXte)).argmax(-1)
        return run

    results["MNLR (PG)"] = timed(fit_mnlr(MultiNomialLogisticRegression))
    results["MNLR (Bouchard)"] = timed(
        fit_mnlr(MultiNomialLogisticRegression_Bouchard)
    )

    def fit_moe(cls):
        def run():
            rng.seed(0)
            m = cls(K, Xtr.shape[1], 4)
            m.raw_update(jXtr, jYtr, iters=10)
            pY, _ = m.predict(jXte)
            return np.asarray(pY.mean())[..., 0].argmax(-1)
        return run

    results["dMixLT (4 experts)"] = timed(fit_moe(dMixtureofLinearTransforms))
    results["NLR-multinomial"] = timed(fit_moe(NLRegression_Multinomial))

    for name, (acc, dt) in results.items():
        print("%-22s accuracy %.3f   fit %.1fs   [%s]" % (name, acc, dt, task))
    return results


def main_ref(task="synthetic"):
    """torch-CPU reference on the same task (MNIST bake-off analogue,
    reference tests/test_vb_mnist.py:107-160)."""
    import sys as _s
    _s.path.insert(0, "/root/reference")
    import torch
    from transforms import (
        MultiNomialLogisticRegression,
        dMixtureofLinearTransforms,
        NLRegression_Multinomial,
    )

    Xtr, ytr, Xte, yte = get_task(task)
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
        print(
            "%-22s accuracy %.3f   fit %.1fs   [torch-CPU reference, %s]"
            % (name, acc, dt, task)
        )
    return results


if __name__ == "__main__":
    import sys as _sys
    which = _sys.argv[1] if len(_sys.argv) > 1 else "ours"
    task = _sys.argv[2] if len(_sys.argv) > 2 else "synthetic"
    if which == "ref":
        main_ref(task)
    else:
        main(task)

