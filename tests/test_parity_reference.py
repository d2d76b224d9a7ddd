"""End-to-end numeric parity vs /root/reference (see PARITY.md).

Each harness runs in a subprocess: the reference repo uses generic module
names (main, model, data, train) that must not leak into this process.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.isdir("/root/reference"),
                       reason="reference repo not present"),
]


def _run(tool, *args):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", tool), *args],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=540)
    assert proc.returncode == 0, (
        f"{tool} failed:\n{proc.stdout[-3000:]}\n{proc.stderr[-2000:]}")
    return proc.stdout


def test_gaussian_trajectory_parity():
    out = _run("parity_gaussian.py", "--steps", "40")
    assert "FAIL" not in out


def test_multibench_forward_and_train_parity():
    # 3 epochs = the PARITY.md protocol; at 2 the undertrained probes sit
    # right at the tolerance edge (both sides are seeded/deterministic)
    out = _run("parity_multibench.py", "--epochs", "3")
    assert "FAIL" not in out


def test_supervised_trajectory_parity():
    # PARITY.md §3: reference finetune.py train()/validate() vs our jitted
    # supervised loop, identical batches/init, 90 iters incl. ragged
    # batches, grad probes, the capture-set CKA/mkNN side loop, and the
    # saved test_result.pth artifact (scalars + best-snapshot weights)
    out = _run("parity_supervised.py", "--iters", "90")
    assert "FAIL" not in out


def test_supervised_early_stop_parity():
    # the early-stopping path itself (finetune.py:262-271): with finite
    # patience both sides must break at the SAME iteration, select the
    # SAME best-val snapshot, and run the SAME number of evals; the
    # trajectory rows are informational at this horizon (fp32 drift) —
    # see tools/parity_supervised.py compare(behavioral=True)
    out = _run("parity_supervised.py", "--iters", "400",
               "--patience", "2", "--behavioral")
    assert "FAIL" not in out
    assert "Early stopping" in out  # the break actually fired
