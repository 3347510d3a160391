"""Executed TF2 parity: run the reference's own code against our goldens.

This is the certification the numpy oracles cannot give (they were written by
the same hands as the framework): `tools/tf2_goldens.py verify` loads the
reference's actual classes (vae/model.py:174-218, spair/spair.py:52-106),
injects our exported weights, runs the reference forward eagerly, recomposes
the reference losses from its own helpers (vae/trainer.py:121-146,
spair/trainer.py:137-199), and compares — forward tensors <= 2e-3 abs,
losses <= 1% rel (the BASELINE.json ELBO target).

Runs only where tensorflow imports (it does in this image since round 4);
export + verify go through the real CLI in subprocesses so the one-command
contract documented in the tool header is what is tested.
"""

import importlib.util
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"

needs_tf = pytest.mark.skipif(
    importlib.util.find_spec("tensorflow") is None
    or not os.path.isdir(REFERENCE),
    reason="needs tensorflow + the mounted reference")


@needs_tf
def test_tf2_executed_parity_passes(tmp_path):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    goldens = str(tmp_path / "goldens")

    r = subprocess.run(
        [sys.executable, "tools/tf2_goldens.py", "export", "--out", goldens],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]

    r = subprocess.run(
        [sys.executable, "tools/tf2_goldens.py", "verify",
         "--goldens", goldens, "--reference", REFERENCE],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stdout[-4000:] + r.stderr[-4000:]
    assert "PARITY: PASS" in r.stdout
    # Every comparison row is individually ok (no row-level FAIL slipped
    # through a miscounted fails tally).
    assert "FAIL" not in r.stdout
