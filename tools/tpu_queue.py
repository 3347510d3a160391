"""TPU quality-run queue: one task-table-driven runner for all rounds.

Consolidates tools/tpu_queue_r3.py / _r4.py / _r4b.py (VERDICT round-4 Weak
#6): those three shared ~80% scaffolding — relay probe loop, fresh process
per task, metrics-mtime stall watchdog, retry-with-resume — and differed only
in their task lists. The scaffolding now lives here once and each round's
queue is data in ROUNDS.

Relay discipline (CLAUDE.md): the remote TPU tunnel dies for tens of minutes
at a time and intermittently poisons a process, so every task runs in a fresh
subprocess, the queue probes the relay with a tiny matmul before each attempt,
a watchdog kills tasks whose metrics.jsonl stops advancing, and retries resume
from the newest checkpoint written by THIS task's earlier attempts
(checkpoint_interval=5000 in tools/quality_runs.py => a relay outage costs
at most 5k steps).

Usage:
  nohup python tools/tpu_queue.py r5 [task ...] > output/queue_r5.log 2>&1 &

With task names, runs only those (resume mid-queue); without, the whole round.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PY = sys.executable

PROBE = [PY, "-c",
         "import jax, jax.numpy as jnp; "
         "print((jnp.ones((8,8)) @ jnp.ones((8,8))).sum())"]


def _spair(*args: str) -> list:
    return [PY, "tools/quality_runs.py", "spair", *args]


def _gmvae(*args: str) -> list:
    return [PY, "tools/quality_runs.py", "gmvae", *args]


# Each round: out_dir + [(name, cmd_builder(out_dir), resumable)].
# Historical rounds (r3/r4/r4b) are kept as data for provenance — their
# results are archived in docs/quality and BASELINE.md.
ROUNDS = {
    "r4b": {
        "out_dir": "output/quality_r4b",
        "tasks": [
            ("cfg5_bgconstr_100k",
             _spair("--z_bg_beta", "10", "--bg_latent_size", "4",
                    "--steps", "100000"), True),
            ("gmvae_digits_300k",
             _gmvae("--style", "digits", "--steps", "300000"), True),
            ("ablB_zwb01_seed1",
             _spair("--z_what_beta", "0.1", "--steps", "30000",
                    "--seed", "1"), True),
        ],
    },
    "r5": {
        "out_dir": "output/quality_r5",
        "tasks": [
            # Ordered cheapest-evidence-first so a relay outage mid-round
            # still leaves the highest-value curves on disk.
            # Textbook SPLIT signature as a CURVE (VERDICT r4 #3): the non-GM
            # LGVae's z_g probe resamples from N(0,1) unconditionally
            # (vae/trainer.py:223), so probe_random_z_g_acc_rangefix should
            # fall to chance while probe_random_z_l_acc_rangefix tracks the
            # recon probe. ~30 min at B=64.
            ("lgvae_digits_probe_100k",
             _gmvae("--model", "lgvae", "--style", "digits",
                    "--steps", "100000"), True),
            # VERDICT r4 #4: the VERBATIM canonical Multi-Bird-Hard config
            # (reference README.md:105-107) at its full 200k budget — settles
            # whether its early collapse is terminal or an annealing-horizon
            # artifact. quality_runs.py spair defaults ARE this config.
            ("canonical5_200k", _spair("--steps", "200000"), True),
            # VERDICT r4 #4 diagnosis: constrained background + the
            # z_what_beta=0.1 rescue knob at 200k — does unseen-bg count-acc
            # hold instead of collapsing (cfg5_bgconstr decayed 0.43 -> 0.09;
            # zwb01 at 30k held 0.38-0.55 unseen)?
            ("cfg5_bgconstr_zwb01_200k",
             _spair("--z_bg_beta", "10", "--bg_latent_size", "4",
                    "--z_what_beta", "0.1", "--steps", "200000"), True),
            # VERDICT r4 #3: fresh digits clustering run with the FIXED probe
            # classifier (train/probes.py round-5 fix) to produce the full
            # disentanglement curve (recon/z_l/z_g/swapped-y probe columns).
            ("gmvae_digits_probe_300k",
             _gmvae("--style", "digits", "--steps", "300000"), True),
        ],
    },
}


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


def run_dirs(out_dir: str, started_after: float):
    root = os.path.join(REPO, out_dir)
    out = []
    for d in (os.listdir(root) if os.path.isdir(root) else []):
        p = os.path.join(root, d)
        if os.path.isdir(p) and os.path.getctime(p) >= started_after - 5:
            out.append(p)
    return out


def newest_metrics_mtime(out_dir: str, started_after: float) -> float:
    best = 0.0
    for d in run_dirs(out_dir, started_after):
        p = os.path.join(d, "metrics.jsonl")
        if os.path.exists(p):
            best = max(best, os.path.getmtime(p))
    return best


def newest_checkpointed_dir(out_dir: str, started_after: float):
    """Newest run dir holding a checkpoint (loop saves
    checkpoint_<step>.msgpack under <run_dir>/checkpoints;
    restore_checkpoint accepts that dir)."""
    best, best_m = None, 0.0
    for d in run_dirs(out_dir, started_after):
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


def run_task(name: str, cmd: list, out_dir: str,
             stall_secs: float = 4000.0) -> bool:
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
        m = newest_metrics_mtime(out_dir, t0)
        stalled = (time.time() - m > stall_secs) if m else (time.time() - t0 > grace)
        if stalled:
            log(f"{name} STALLED (no metrics progress); killing")
            proc.kill()
            proc.wait()
            return False


def main() -> None:
    if len(sys.argv) < 2 or sys.argv[1] not in ROUNDS:
        print(f"usage: tpu_queue.py <{'|'.join(ROUNDS)}> [task ...]")
        sys.exit(2)
    spec = ROUNDS[sys.argv[1]]
    out_dir = spec["out_dir"]
    os.makedirs(os.path.join(REPO, out_dir), exist_ok=True)
    selected = sys.argv[2:]
    tasks = [t for t in spec["tasks"] if not selected or t[0] in selected]
    if selected:
        log(f"running selected tasks: {[t[0] for t in tasks]}")
    for name, cmd, resumable in tasks:
        # Resume candidates are scoped to run dirs created during THIS task's
        # attempts — an earlier task's checkpoint has a different state tree.
        cmd = cmd + ["--out_dir", out_dir]
        task_t0 = time.time()
        for attempt in (1, 2, 3):
            wait_for_tpu()
            time.sleep(30)  # settle gap: back-to-back heavy programs poison
            run_cmd = list(cmd)
            if resumable and attempt > 1:
                ck = newest_checkpointed_dir(out_dir, task_t0)
                if ck:
                    run_cmd += ["--resume", ck]
                    log(f"{name}#{attempt} resuming from {ck}")
            if run_task(f"{name}#{attempt}", run_cmd, out_dir):
                break
    log("queue complete")


if __name__ == "__main__":
    main()
