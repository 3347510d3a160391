"""Real 2-process multi-host execution (tools/multihost_dryrun.py) in CI.

Covers what the mocked unit tests cannot: the jax.distributed coordinator
handshake, a global mesh spanning two OS processes, multi-process state
placement, per-host disjoint shards assembled into global arrays, and the
cross-process gradient all-reduce — asserting bit-for-bit lockstep between
hosts.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_dryrun_lockstep():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "multihost_dryrun.py")],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        timeout=540)
    assert proc.returncode == 0, proc.stdout[-3000:]
    assert "multihost dryrun OK" in proc.stdout
