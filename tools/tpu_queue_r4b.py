"""Second round-4 TPU queue: extend the two quality stories to bigger budgets.

Round-4a landed the VERDICT #3/#4 evidence at 30-40k steps; both curves were
still moving at cutoff (BASELINE.md "Round-4"):
  1. cfg5_bgconstr_100k — canonical config #5 with ONLY the background
     constrained (--z_bg_beta 10 --bg_latent_size 4): count-acc 0.24 @ 40k
     and climbing (the reference budget is 200k). Re-run fresh at 100k steps
     (2.5x) — the 40k checkpoint did not survive the session reset.
  2. gmvae_digits_300k — LGGMVae `digits` clustering: 0.375 peak @ 20k of a
     30k run vs a 3M-step reference budget. 300k steps is 10x and ~35 min
     at measured B=64 throughput.
  3. ablB_zwb01_seed1 — seed replication of the z_what_beta=0.1 rescue
     (0.89 seen count-acc at seed 0): 30k steps at seed 1.

Same relay discipline as tpu_queue_r4: probe in a subprocess, fresh process
per task, metrics-mtime watchdog, one retry per task. New here: the spair
retry RESUMES from the newest checkpointed run dir instead of restarting
(checkpoint_interval=5000 in tools/quality_runs.py), so a mid-run relay
outage costs <=5k steps.

Usage: nohup python tools/tpu_queue_r4b.py [task ...] > output/queue_r4b.log 2>&1 &
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_DIR = "output/quality_r4b"

PROBE = [sys.executable, "-c",
         "import jax, jax.numpy as jnp; "
         "print((jnp.ones((8,8)) @ jnp.ones((8,8))).sum())"]

# (name, cmd, resumable): resumable tasks get --resume <newest run dir>
# appended on retry when a checkpoint exists.
TASKS = [
    ("cfg5_bgconstr_100k", [sys.executable, "tools/quality_runs.py", "spair",
                            "--model", "lg_spair", "--dataset", "cub_ckb_rot_6",
                            "--z_bg_beta", "10", "--bg_latent_size", "4",
                            "--steps", "100000",
                            "--out_dir", OUT_DIR], True),
    ("gmvae_digits_300k", [sys.executable, "tools/quality_runs.py", "gmvae",
                           "--style", "digits", "--steps", "300000",
                           "--out_dir", OUT_DIR], True),
    # Seed replication of the headline z_what_beta=0.1 rescue (round-4a was
    # seed 0 only; a second seed shows the rescue is not a seed artifact).
    ("ablB_zwb01_seed1", [sys.executable, "tools/quality_runs.py", "spair",
                          "--model", "lg_spair", "--dataset", "cub_ckb_rot_6",
                          "--z_what_beta", "0.1", "--steps", "30000",
                          "--seed", "1",
                          "--out_dir", OUT_DIR], True),
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


def run_dirs(started_after: float):
    root = os.path.join(REPO, OUT_DIR)
    out = []
    for d in (os.listdir(root) if os.path.isdir(root) else []):
        p = os.path.join(root, d)
        if os.path.isdir(p) and os.path.getctime(p) >= started_after - 5:
            out.append(p)
    return out


def newest_metrics_mtime(started_after: float) -> float:
    best = 0.0
    for d in run_dirs(started_after):
        p = os.path.join(d, "metrics.jsonl")
        if os.path.exists(p):
            best = max(best, os.path.getmtime(p))
    return best


def newest_checkpointed_dir(started_after: float):
    """Newest run dir holding a checkpoint (loop saves checkpoint_<step>.msgpack
    under <run_dir>/checkpoints; restore_checkpoint accepts that dir)."""
    best, best_m = None, 0.0
    for d in run_dirs(started_after):
        ck_dir = os.path.join(d, "checkpoints")
        if not os.path.isdir(ck_dir):
            continue
        cks = [f for f in os.listdir(ck_dir) if f.endswith(".msgpack")]
        if not cks:
            continue
        m = max(os.path.getmtime(os.path.join(ck_dir, f)) for f in cks)
        if m > best_m:
            best, best_m = ck_dir, m
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


def main() -> None:
    os.makedirs(os.path.join(REPO, OUT_DIR), exist_ok=True)
    selected = sys.argv[1:]
    tasks = [t for t in TASKS if not selected or t[0] in selected]
    if selected:
        log(f"running selected tasks: {[t[0] for t in tasks]}")
    for name, cmd, resumable in tasks:
        # Resume candidates are scoped to run dirs created during THIS task's
        # attempts — an earlier task's checkpoint has a different state tree.
        task_t0 = time.time()
        for attempt in (1, 2, 3):
            wait_for_tpu()
            time.sleep(30)  # settle gap (see tpu_queue_r3 note)
            run_cmd = list(cmd)
            if resumable and attempt > 1:
                ck = newest_checkpointed_dir(task_t0)
                if ck:
                    run_cmd += ["--resume", ck]
                    log(f"{name}#{attempt} resuming from {ck}")
            if run_quality(f"{name}#{attempt}", run_cmd):
                break
    log("queue complete")


if __name__ == "__main__":
    main()
