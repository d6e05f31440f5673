"""Run the x64 ELBO-parity oracles vs the torch reference in subprocesses.

Each case launches tests/parity/run_parity.py (which flips jax to float64 —
hence the subprocess isolation) and asserts MAXDEV <= 1e-5, the BASELINE.md
acceptance bar.  Skipped when the reference tree is absent.
"""
import os
import re
import subprocess
import sys

import pytest

REF = "/root/reference"
HARNESS = os.path.join(os.path.dirname(__file__), "parity", "run_parity.py")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not mounted"
)


def _run(which):
    out = subprocess.run(
        [sys.executable, HARNESS, which],
        capture_output=True,
        text=True,
        timeout=1200,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    m = re.search(r"MAXDEV ([0-9eE.+-]+)", out.stdout)
    assert m, f"no MAXDEV in output:\n{out.stdout}\n{out.stderr}"
    return float(m.group(1))


@pytest.mark.parametrize("which", ["gmm", "mnw"])
def test_parity_fast(which):
    assert _run(which) <= 1e-5


@pytest.mark.slow
@pytest.mark.parametrize("which", ["hmm", "lds", "mnlr", "dmbd"])
def test_parity_slow(which):
    assert _run(which) <= 1e-5
