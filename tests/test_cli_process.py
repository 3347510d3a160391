"""Process-level CLI smoke tests (VERDICT r3 #8).

The reference's public surface is ``python vae/main.py`` / ``python
spair/main.py`` (vae/main.py:15-79, spair/main.py:19-111). The in-process
train_vae/train_spair tests cover the loops; these run the actual CLI modules
as subprocesses so argument plumbing, the ``--runs`` repeat loop, run-dir
allocation, exit codes, and the artifact contract are covered end-to-end.

Each subprocess forces ``--platform cpu`` (the machine pins JAX_PLATFORMS=axon
via sitecustomize) and gets XLA_FLAGS scrubbed of the conftest's 8-virtual-
device forcing so the child is a plain single-device CPU run.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _child_env():
    env = dict(os.environ)
    flags = env.get("XLA_FLAGS", "")
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "", flags)
    env["XLA_FLAGS"] = flags.strip()
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def _run_cli(module: str, args: list, cwd: str, timeout: float = 480.0):
    cmd = [sys.executable, "-m", module, "--platform", "cpu",
           "-synthetic_data"] + args
    return subprocess.run(cmd, cwd=cwd, env=_child_env(), timeout=timeout,
                          capture_output=True, text=True)


VAE_ARGS = ["--training_steps", "4", "--eval_interval", "2",
            "--batch_size", "8", "--beta", "1", "--patch_size", "2",
            "--global_latent_dims", "4", "--local_latent_dims", "4",
            "-no_label"]


def test_vae_main_process_end_to_end_and_resume(tmp_path):
    r = _run_cli("split_vae_tpu.cli.vae_main", VAE_ARGS, str(tmp_path))
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    assert "Training done!" in r.stdout

    runs = os.listdir(tmp_path / "output")
    assert len(runs) == 1
    run_dir = tmp_path / "output" / runs[0]
    files = os.listdir(run_dir)
    # Artifact contract: reference filenames (vae/trainer.py:385-395).
    for pat in ("metrics.jsonl", "generate_it_4.png", "style_transfer_it_4.png",
                "x_reconstruction_test_it_4.png", "vary_lower_it_4.png",
                "vary_upper_it_4.png", "x_hat_reconstruction_test_it_4.png"):
        assert pat in files, (pat, files)
    assert os.listdir(run_dir / "checkpoints")
    # Final weights land in models/<run-name>.msgpack relative to cwd.
    assert (tmp_path / "models" / (runs[0] + ".msgpack")).exists()

    # Resume: a longer run picking up from the first run's checkpoints.
    r2 = _run_cli("split_vae_tpu.cli.vae_main",
                  ["--training_steps", "6"] + VAE_ARGS[2:] +
                  ["--resume", str(run_dir / "checkpoints")], str(tmp_path))
    assert r2.returncode == 0, r2.stdout[-3000:] + r2.stderr[-3000:]
    assert "Resumed from" in r2.stdout and "at step 4" in r2.stdout
    assert "[step 6]" in r2.stdout


def test_spair_main_process_runs_loop(tmp_path):
    # --runs 2 repeats training (spair/main.py:95); both runs typically start
    # within the same wall-clock second, exercising the run-dir dedupe.
    args = ["--model", "spair", "--runs", "2", "--training_steps", "2",
            "--eval_interval", "2", "--batch_size", "4",
            "--latent_size", "8", "--bg_latent_size", "4",
            "--local_latent_size", "4", "--patch_size", "8"]
    r = _run_cli("split_vae_tpu.cli.spair_main", args, str(tmp_path),
                 timeout=900.0)
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    assert r.stdout.count("Training done!") == 2

    runs = sorted(os.listdir(tmp_path / "output"))
    assert len(runs) == 2, runs  # distinct dirs even same-second
    for run in runs:
        files = os.listdir(tmp_path / "output" / run)
        assert "metrics.jsonl" in files
        # Artifact contract incl. the reference's filename typo
        # (spair/visualizer.py:79).
        assert any(f.startswith("x_reconstrcution_test_it_2") for f in files), files
        assert any(f.startswith("x_reconstrcution_bbox_it_2") for f in files), files
        assert any(f.startswith("glimpses_it_2") for f in files), files
        assert (tmp_path / "models" / (run + ".msgpack")).exists()


def test_bad_flag_exits_nonzero(tmp_path):
    r = _run_cli("split_vae_tpu.cli.vae_main", ["--not_a_flag", "3"],
                 str(tmp_path), timeout=120.0)
    assert r.returncode != 0
    assert "not_a_flag" in r.stderr
