"""One-shot TPU task queue for the round-3 quality runs.

The remote-relay TPU dies/wedges for tens of minutes at a time (CLAUDE.md);
this driver polls a tiny-matmul probe in a subprocess (so a hang cannot wedge
this process), and when the relay answers, runs the remaining quality runs
sequentially, re-probing between tasks. Each task is a fresh process, per the
relay-poisoning note.

Usage: python tools/tpu_queue_r3.py  (logs to stdout; run under nohup)
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PROBE = [sys.executable, "-c",
         "import jax, jax.numpy as jnp; "
         "print((jnp.ones((8,8)) @ jnp.ones((8,8))).sum())"]

TASKS = [
    ("ablB_zwb01", [sys.executable, "tools/quality_runs.py", "spair",
                    "--model", "lg_spair", "--dataset", "cub_ckb_rot_6",
                    "--z_what_beta", "0.1", "--steps", "25000",
                    "--out_dir", "output/quality_r3"]),
    ("gmvae_digits", [sys.executable, "tools/quality_runs.py", "gmvae",
                      "--style", "digits", "--steps", "30000",
                      "--out_dir", "output/quality_r3"]),
    ("bgspair_resume_80k", [sys.executable, "tools/quality_runs.py", "spair",
                            "--model", "bg_spair", "--dataset", "cub_solid_fixed",
                            "--z_what_beta", "0.1", "--steps", "80000",
                            "--resume", "output/quality_r3/20260817-162053/checkpoints",
                            "--out_dir", "output/quality_r3"]),
]


def log(msg: str) -> None:
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def probe_ok(timeout: float = 120.0) -> bool:
    try:
        r = subprocess.run(PROBE, cwd=REPO, timeout=timeout,
                           capture_output=True, text=True)
        return r.returncode == 0 and "512" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def wait_for_tpu(poll_gap: float = 240.0) -> None:
    while True:
        if probe_ok():
            log("probe OK")
            return
        log(f"probe failed; retrying in {poll_gap:.0f}s")
        time.sleep(poll_gap)


def newest_metrics_mtime(started_after: float) -> float:
    """mtime of the newest metrics.jsonl in a run dir created after t0."""
    best = 0.0
    root = os.path.join(REPO, "output", "quality_r3")
    for d in os.listdir(root) if os.path.isdir(root) else []:
        p = os.path.join(root, d, "metrics.jsonl")
        if os.path.exists(p) and os.path.getctime(os.path.join(root, d)) >= started_after - 5:
            best = max(best, os.path.getmtime(p))
    return best


def run_with_watchdog(name: str, cmd: list, stall_secs: float = 4000.0) -> bool:
    """Run cmd; kill it if its run dir's metrics stop advancing (relay wedge).
    Startup (cache build + compile) gets a longer grace period. Thresholds are
    generous: concurrent host CPU load slows TPU steps ~50x through the relay,
    and killing a build mid-flight is itself a relay-wedge trigger — only kill
    when the run is unambiguously dead."""
    t0 = time.time()
    log(f"starting {name}: {' '.join(cmd)}")
    proc = subprocess.Popen(cmd, cwd=REPO)
    grace = 3600.0  # data-cache build + remote compile + init
    while True:
        time.sleep(60)
        rc = proc.poll()
        if rc is not None:
            log(f"{name} exited rc={rc} after {time.time()-t0:.0f}s")
            return rc == 0
        m = newest_metrics_mtime(t0)
        stalled = (time.time() - m > stall_secs) if m else (time.time() - t0 > grace)
        if stalled:
            log(f"{name} STALLED (no metrics progress); killing")
            proc.kill()
            proc.wait()
            return False


def main() -> None:
    for name, cmd in TASKS:
        for attempt in (1, 2):
            wait_for_tpu()
            # settle gap: launching a heavy build immediately after another
            # process exited has wedged the relay before
            time.sleep(30)
            if run_with_watchdog(f"{name}#{attempt}", cmd):
                break
    log("queue complete")


if __name__ == "__main__":
    main()
