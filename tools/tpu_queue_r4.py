"""One-shot TPU task queue for the round-4 evidence items (VERDICT #2-4).

Tasks, in priority order (the relay can die at any time — cheapest,
highest-leverage evidence first):
  1. bench          — driver bench capture (6 JSON lines -> docs/bench_r4_local.jsonl)
  2. ablB_zwb01     — Multi-Bird-Hard z_what_beta=0.1 ablation (VERDICT #3)
  3. cfg5_bgconstr  — canonical config #5 with the constrained background
                      (--z_bg_beta 10 --bg_latent_size 4), VERDICT #3
  4. gmvae_digits   — LGGMVae `digits` clustering demonstration (VERDICT #4)

Same relay discipline as tools/tpu_queue_r3.py: probe in a subprocess, fresh
process per task (relay-poisoning note in CLAUDE.md), metrics-mtime watchdog
with generous thresholds, one retry per task.

Usage: nohup python tools/tpu_queue_r4.py > output/queue_r4.log 2>&1 &
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_DIR = "output/quality_r4"
BENCH_LOG = os.path.join(REPO, "docs", "bench_r4_local.jsonl")

PROBE = [sys.executable, "-c",
         "import jax, jax.numpy as jnp; "
         "print((jnp.ones((8,8)) @ jnp.ones((8,8))).sum())"]

# (name, cmd, kind): kind 'bench' trusts bench.py's internal stall watchdog +
# a hard process timeout; kind 'quality' watches OUT_DIR metrics mtimes.
TASKS = [
    ("bench", [sys.executable, "bench.py"], "bench"),
    ("ablB_zwb01", [sys.executable, "tools/quality_runs.py", "spair",
                    "--model", "lg_spair", "--dataset", "cub_ckb_rot_6",
                    "--z_what_beta", "0.1", "--steps", "30000",
                    "--out_dir", OUT_DIR], "quality"),
    ("cfg5_bgconstr", [sys.executable, "tools/quality_runs.py", "spair",
                       "--model", "lg_spair", "--dataset", "cub_ckb_rot_6",
                       "--z_bg_beta", "10", "--bg_latent_size", "4",
                       "--steps", "40000",
                       "--out_dir", OUT_DIR], "quality"),
    ("gmvae_digits", [sys.executable, "tools/quality_runs.py", "gmvae",
                      "--style", "digits", "--steps", "30000",
                      "--out_dir", OUT_DIR], "quality"),
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
    best = 0.0
    root = os.path.join(REPO, OUT_DIR)
    for d in (os.listdir(root) if os.path.isdir(root) else []):
        p = os.path.join(root, d, "metrics.jsonl")
        if os.path.exists(p) and os.path.getctime(os.path.join(root, d)) >= started_after - 5:
            best = max(best, os.path.getmtime(p))
    return best


def run_quality(name: str, cmd: list, stall_secs: float = 4000.0) -> bool:
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


def run_bench(name: str, cmd: list, timeout: float = 9000.0) -> bool:
    log(f"starting {name}: {' '.join(cmd)} (stdout -> {BENCH_LOG})")
    t0 = time.time()
    try:
        with open(BENCH_LOG, "a") as f:
            f.write(f"# run at {time.strftime('%Y-%m-%d %H:%M:%S')}\n")
            f.flush()
            proc = subprocess.run(cmd, cwd=REPO, stdout=f, timeout=timeout)
        log(f"{name} exited rc={proc.returncode} after {time.time()-t0:.0f}s")
        return proc.returncode == 0
    except subprocess.TimeoutExpired:
        log(f"{name} hard timeout after {timeout:.0f}s")
        return False


def main() -> None:
    os.makedirs(os.path.join(REPO, OUT_DIR), exist_ok=True)
    selected = sys.argv[1:]
    tasks = [t for t in TASKS if not selected or t[0] in selected]
    if selected:
        log(f"running selected tasks: {[t[0] for t in tasks]}")
    for name, cmd, kind in tasks:
        for attempt in (1, 2):
            wait_for_tpu()
            time.sleep(30)  # settle gap (see tpu_queue_r3 note)
            runner = run_bench if kind == "bench" else run_quality
            if runner(f"{name}#{attempt}", cmd):
                break
    log("queue complete")


if __name__ == "__main__":
    main()
