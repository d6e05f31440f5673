"""Guard the driver entry points (__graft_entry__.py).

The driver imports the module and calls ``dryrun_multichip(8)`` directly, in a
process whose environment points JAX at the real TPU tunnel
(``JAX_PLATFORMS=axon``). Round 1 crashed exactly there (MULTICHIP_r01.json):
the CPU-platform forcing lived only under ``__main__``. This test reproduces
the driver's call path — import + function call — under the hostile env so a
regression can never ship silently.
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_driver_call_path():
    env = dict(os.environ)
    # simulate the box: env routes JAX at the TPU tunnel, no virtual devices
    env["JAX_PLATFORMS"] = "axon"
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "import __graft_entry__; __graft_entry__.dryrun_multichip(8)",
        ],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "dryrun_multichip OK on 8 devices" in proc.stdout
