"""DMBD on batched Lorenz-63 trajectories
(reference examples/Lorenz_example.py:20-34)."""
import jax


import numpy as np
import jax.numpy as jnp

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyvbmp_tpu.models import DynamicMarkovBlanketDiscovery
from pyvbmp_tpu.simulations import Lorenz
from pyvbmp_tpu.utils import rng


def pc_scores(model, out="lorenz_pc_scores.png"):
    """Top principal-component score per latent block (s/b/z) plus assigned
    node counts over time (reference Lorenz_example.py:83-130)."""
    import matplotlib
    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    sbz = np.asarray(model.px.mean())[..., 0]      # (T, batch, 1, h)
    sbz = sbz.reshape(sbz.shape[0], sbz.shape[1], -1)
    h1 = model.hidden_dims[0]
    h2 = h1 + model.hidden_dims[1]
    h3 = h2 + model.hidden_dims[2]
    p = np.asarray(model.assignment_pr()).sum(-2)  # (T, batch, 3)

    def top_pc(x):
        x = x - x.mean((0, 1))
        c = np.einsum("tbi,tbj->ij", x, x) / (x.shape[0] * x.shape[1])
        _, v = np.linalg.eigh(c)
        sc = x @ v[:, -1]
        return sc / sc.std()

    ss = top_pc(sbz[..., :h1])
    bb = top_pc(sbz[..., h1:h2])
    zz = top_pc(sbz[..., h2:h3])

    fig, axs = plt.subplots(2, 1, sharex=True)
    axs[0].plot(zz[:, 0], "r", label="z")
    axs[0].plot(bb[:, 0], "g", label="b")
    axs[0].plot(ss[:, 0], "b", label="s")
    axs[0].set_title("Top PC Score")
    axs[0].legend()
    axs[1].plot(p[:, 0, 2], "r")
    axs[1].plot(p[:, 0, 1], "g")
    axs[1].plot(p[:, 0, 0], "b")
    axs[1].set_title("Number of Assigned Nodes")
    axs[1].set_xlabel("Time")
    plt.savefig(out)
    plt.close(fig)
    return out


def main(batch_num=20, iters=20):
    smoke = bool(int(os.environ.get("PYVBMP_EXAMPLE_SMOKE", "0")))
    if smoke:  # tiny-config smoke run for the test gate
        batch_num, iters = 2, 2
    rng.seed(0)
    sim = Lorenz()
    if smoke:
        sim.num_steps = 150
    data = sim.simulate(batch_num)  # (T, batch, 3, 2) position+velocity
    if smoke:
        data = data[:24]
    print("data:", data.shape)

    model = DynamicMarkovBlanketDiscovery(
        obs_shape=(3, 2),
        role_dims=(1, 2, 1),
        hidden_dims=(2, 2, 2),
    )
    model.update(data, iters=iters, latent_iters=1, lr=0.5, verbose=True)
    p = model.assignment_pr()
    print("ELBO trace:", ["%.0f" % e for e in model.ELBO_save])
    print("assignment fractions (s,b,z):", np.asarray(p.mean((0, 1, 2))))
    try:
        out = "/tmp/lorenz_pc_scores.png" if smoke else "lorenz_pc_scores.png"
        print("wrote", pc_scores(model, out=out))
    except Exception as e:
        print("pc-score plot skipped:", e)
    # labeled role/dynamics structure heatmaps (reference DMBD.py:344-415)
    model.plot_observation(path="/tmp/dmbd_lorenz_observation.png")
    model.plot_transition(type="obs", path="/tmp/dmbd_lorenz_role_transition.png")
    model.plot_transition(type="latent", path="/tmp/dmbd_lorenz_A.png")
    model.plot_transition(type="latent", use_mask=True, path="/tmp/dmbd_lorenz_A_mask.png")
    print("wrote /tmp/dmbd_lorenz_{observation,role_transition,A,A_mask}.png")
    return model


if __name__ == "__main__":
    main()
