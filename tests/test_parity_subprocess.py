"""Run the x64 ELBO-parity oracles vs the torch reference in subprocesses.

The default gate runs ALL 11 oracles in one subprocess (``run_parity.py all
3``: one jax+torch import, 3 VB iterations each — the trajectories hit
machine epsilon within 2-3 iterations) and asserts every MAXDEV <= 1e-5, the
BASELINE.md acceptance bar. The slow-marked deep runs keep the full per-case
iteration counts for by-hand verification. Skipped when the reference tree
is absent.
"""
import os
import re
import subprocess
import sys

import pytest

REF = "/root/reference"
HARNESS = os.path.join(os.path.dirname(__file__), "parity", "run_parity.py")
N_ORACLES = 26

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not mounted"
)


def _run(*args, timeout=1200):
    out = subprocess.run(
        [sys.executable, HARNESS, *args],
        capture_output=True,
        text=True,
        timeout=timeout,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    devs = [float(v) for v in re.findall(r"MAXDEV ([0-9eE.+-]+)", out.stdout)]
    assert devs, f"no MAXDEV in output:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    return devs, out.stdout


def test_parity_all_oracles():
    """Every parity oracle, every default run (VERDICT r1 item 5)."""
    devs, stdout = _run("all", "2", timeout=1800)
    assert len(devs) == N_ORACLES, stdout
    assert max(devs) <= 1e-5, stdout


@pytest.mark.slow
@pytest.mark.parametrize(
    "which",
    [
        "gmm", "hmm", "lds", "mnw", "mnlr", "dmbd",
        "gmm_isotropic", "arhmm", "mixlds", "hdir", "nlr_orig",
        "bfa", "dhmm", "tensor_hmm", "factorial_hmm", "hhmm",
        "dmixlt", "mixlt", "bouchard", "tnw",
        "nlr_full", "nlr_low", "rrr", "unit_constraints",
        "dmbd_multiobj", "dmbd_deep",
    ],
)
def test_parity_deep(which):
    devs, _ = _run(which)
    assert max(devs) <= 1e-5
