"""Runtime smoke tests for every example script (the framework's de-facto
user documentation — reference examples/*.py, SURVEY.md §2.6).

``PYVBMP_EXAMPLE_SMOKE=1`` makes each example's ``main()`` shrink its
T/batch/iters to a tiny config and redirect file outputs to /tmp, so an
import drift, API change, or plotting regression in any example fails the
gate instead of shipping silently.  The DMBD-family examples are slow-marked
(each compiles its own fused sweep on this 1-core box); ``two_moons`` and
``nlds`` stay in the default gate.
"""
import importlib.util
import os
import sys

import numpy as np
import pytest

EXAMPLES_DIR = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "examples")
)


def _run_example(name):
    """Import examples/<name>.py in smoke mode and run its main()."""
    os.environ["PYVBMP_EXAMPLE_SMOKE"] = "1"
    os.environ.setdefault("MPLBACKEND", "Agg")
    if EXAMPLES_DIR not in sys.path:  # for `from animate_results import ...`
        sys.path.insert(0, EXAMPLES_DIR)
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(EXAMPLES_DIR, name + ".py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.main()


DMBD_EXAMPLES = [
    "lorenz_example",
    "flame_example",
    "flocking_example",
    "newtons_cradle_example",
    "calcium_imaging_example",
    "artificial_life_example",
    "life_as_we_know_it_example",
]


@pytest.mark.slow
@pytest.mark.parametrize("name", DMBD_EXAMPLES)
def test_dmbd_example_smoke(name):
    model = _run_example(name)
    elbos = np.asarray(model.ELBO_save, dtype=np.float64)
    assert np.isfinite(elbos).all(), f"{name}: non-finite ELBO {elbos}"


@pytest.mark.slow
def test_lorenz_example_feeds_animate_results():
    """animate_results (the GIF writer, reference examples/animate_results.py)
    must accept a fitted model end to end."""
    model = _run_example("lorenz_example")
    sys.path.insert(0, EXAMPLES_DIR)
    from animate_results import animate_results

    from pyvbmp_tpu.simulations import Lorenz
    from pyvbmp_tpu.utils import rng
    import jax

    rng.seed(0)
    data = np.asarray(Lorenz().simulate(2, key=jax.random.key(0)))[:24]
    out = animate_results("sbz", "/tmp/test_movie.gif", fps=5).make_movie(
        model, data, (0,)
    )
    assert os.path.exists(out)
    os.remove(out)


def test_two_moons_example_smoke():
    acc = _run_example("two_moons")
    assert np.isfinite(acc)
    assert acc >= 0.5, f"two-moons classifier at chance: {acc}"


def test_nlds_example_smoke():
    model = _run_example("nlds_example")
    assert np.isfinite(np.asarray(model.ELBO_save, dtype=np.float64)).all()
