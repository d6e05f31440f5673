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

    from pyvbmp_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()  # first run pays compiles once, then cached
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

    def fit_convnet():
        """Gradient-SGD baseline arm (reference tests/mnist_net_vanilla.py:
        1-108 — the reference's only gradient-trained model, used there as a
        wall-clock/accuracy comparison point for the VB classifiers).  A
        small conv net on the 8x8 digits (conv-relu-pool x2 + dense), or an
        MLP on the non-spatial synthetic task; plain momentum-SGD on
        softmax cross-entropy, hand-rolled (no optax)."""
        spatial = Xtr.shape[1] == 64

        def init_params(key):
            ks = jax.random.split(key, 4)
            he = lambda k, sh, fan: jax.random.normal(k, sh, jnp.float32) * np.sqrt(2.0 / fan)
            if spatial:
                return {
                    "c1": he(ks[0], (3, 3, 1, 16), 9),
                    "c2": he(ks[1], (3, 3, 16, 32), 9 * 16),
                    "w": he(ks[2], (2 * 2 * 32, K), 128),
                    "b": jnp.zeros((K,), jnp.float32),
                }
            return {
                "w1": he(ks[0], (Xtr.shape[1], 128), Xtr.shape[1]),
                "b1": jnp.zeros((128,), jnp.float32),
                "w2": he(ks[1], (128, K), 128),
                "b2": jnp.zeros((K,), jnp.float32),
            }

        def forward(p, x):
            if spatial:
                x = x.reshape(-1, 8, 8, 1)
                x = jax.lax.conv_general_dilated(
                    x, p["c1"], (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                x = jax.nn.relu(x)
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
                x = jax.lax.conv_general_dilated(
                    x, p["c2"], (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                x = jax.nn.relu(x)
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
                return x.reshape(x.shape[0], -1) @ p["w"] + p["b"]
            h = jax.nn.relu(x @ p["w1"] + p["b1"])
            return h @ p["w2"] + p["b2"]

        def loss(p, x, y1h):
            lp = jax.nn.log_softmax(forward(p, x))
            return -(y1h * lp).sum(-1).mean()

        NB = jXtr.shape[0] // 50  # drop the ragged last minibatch

        @jax.jit
        def epoch(p, v, key):
            idx = jax.random.permutation(key, jXtr.shape[0])[: NB * 50]
            xb = jXtr[idx].reshape(NB, 50, jXtr.shape[1])
            yb = jYtr[idx].reshape(NB, 50, K)

            def step(carry, batch):
                p, v = carry
                g = jax.grad(loss)(p, *batch)
                v = jax.tree.map(lambda v_, g_: 0.9 * v_ - 0.05 * g_, v, g)
                p = jax.tree.map(lambda p_, v_: p_ + v_, p, v)
                return (p, v), None

            (p, v), _ = jax.lax.scan(step, (p, v), (xb, yb))
            return p, v

        def run():
            p = init_params(jax.random.key(0))
            v = jax.tree.map(jnp.zeros_like, p)
            for e in range(20):
                p, v = epoch(p, v, jax.random.key(e + 1))
            return np.asarray(forward(p, jXte)).argmax(-1)

        return run

    results["SGD conv-net (jax)"] = timed(fit_convnet())

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

    # gradient-SGD conv-net arm (reference tests/mnist_net_vanilla.py:1-108,
    # its Net scaled to the 8x8 digits; MLP on the non-spatial synthetic task)
    import torch.nn as nn
    import torch.nn.functional as F

    spatial = Xtr.shape[1] == 64
    torch.manual_seed(0)
    if spatial:
        net = nn.Sequential(
            nn.Unflatten(1, (1, 8, 8)),
            nn.Conv2d(1, 16, 3, padding=1), nn.ReLU(), nn.MaxPool2d(2),
            nn.Conv2d(16, 32, 3, padding=1), nn.ReLU(), nn.MaxPool2d(2),
            nn.Flatten(), nn.Linear(2 * 2 * 32, K),
        )
    else:
        net = nn.Sequential(
            nn.Linear(Xtr.shape[1], 128), nn.ReLU(), nn.Linear(128, K)
        )
    opt = torch.optim.SGD(net.parameters(), lr=0.05, momentum=0.9)
    ty = torch.tensor(ytr)
    t0 = time.perf_counter()
    NB = len(Xtr) // 50
    for e in range(20):
        perm = torch.randperm(len(Xtr))[: NB * 50]
        for b in perm.reshape(NB, 50):
            opt.zero_grad()
            F.cross_entropy(net(tX[b]), ty[b]).backward()
            opt.step()
    dt = time.perf_counter() - t0
    with torch.no_grad():
        acc = (net(tXe).argmax(-1).numpy() == yte).mean()
    results["SGD conv-net (torch)"] = (acc, dt)

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

