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
    # Budget covers the tool's worst case: one cold-compile attempt (420s)
    # plus two bounded retries (240s each) — the tool kills stuck children at
    # each attempt's deadline, so this outer timeout is a backstop only.
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "multihost_dryrun.py")],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        timeout=1020)
    assert proc.returncode == 0, proc.stdout[-3000:]
    assert "multihost dryrun OK" in proc.stdout
