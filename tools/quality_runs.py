"""Quality-metric training runs on synthetic data.

The reference's headline claims are runtime-computed quality metrics:
unsupervised cluster accuracy (vae/trainer.py:345-349, paper Table 2) and
object-count MAE/MAPE/accuracy (spair/trainer.py:292-301, Table 1). Real
datasets are undownloadable in this image (zero egress), so these runs
demonstrate the training loops LEARN — converging metric trajectories on the
learnable synthetic stand-ins — and their curves are recorded in BASELINE.md.

Usage (run on the TPU, one at a time — the relay starves under host load):
  python tools/quality_runs.py spair  [--steps 20000]
  python tools/quality_runs.py gmvae  [--steps 30000]

Outputs: the normal run dir (metrics.jsonl + artifacts) plus a final summary
line QUALITY_RESULT {...} for easy scraping.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_spair(steps: int, batch: int, out_dir: str, model: str = "lg_spair",
              lr: float = 1e-4, dataset: str = "cub_ckb_rot_6",
              z_what_beta: float = 0.5, z_pres_anneal_step: float = 10_000.0,
              sprite_contrast: float = 60.0, seed: int = 0,
              z_bg_beta: float = None, bg_latent_size: int = None,
              resume: str = None):
    """z_what_beta / z_pres_anneal_step / sprite_contrast are the
    anti-collapse ablation knobs for the Multi-Bird-Hard config (round-2
    finding: the canonical run collapses to zero detected objects at the
    anneal endpoint; these isolate whether that is the objective's trade-off
    on low-contrast data or a framework bug)."""
    from split_vae_tpu.core.config import SpairConfig
    from split_vae_tpu.data.multicub import get_multicub
    from split_vae_tpu.train import loop

    # Larger synthetic MultiCUB than the test-suite default so count metrics
    # measure generalization, not memorization.
    loop.get_multicub = functools.partial(
        get_multicub, n_train=20_000, n_eval=512,
        sprite_min_color=sprite_contrast)

    lg = model == "lg_spair"
    # bg_spair's canonical Table-1 command constrains the background VAE
    # (z_bg_beta 10, bg_latent_size 4): with a rich unconstrained background
    # (beta 1, latent 64) the z_pres anneal hands the whole scene to the
    # background model and counts collapse to zero — measured both ways; see
    # BASELINE.md. (-dense_bg in the reference command is inert for bg_spair:
    # its BackgroundModel is always the conv VAE, spair/spair.py:27-30.)
    if z_bg_beta is None:
        z_bg_beta = 1.0 if lg else 10.0
    if bg_latent_size is None:
        bg_latent_size = 64 if lg else 4
    config = SpairConfig(
        seed=seed, resume=resume,
        model=model, dataset=dataset, batch_size=batch, learning_rate=lr,
        latent_size=64, bg_latent_size=bg_latent_size, local_latent_size=64,
        z_bg_beta=z_bg_beta, z_what_beta=z_what_beta,
        z_pres_anneal_step=z_pres_anneal_step, patch_size=8, split_z_l=lg,
        concat_z_what=lg, dense_local=lg, dense_bg=lg,
        synthetic_data=True, training_steps=steps, eval_interval=1000,
        checkpoint_interval=5_000, output_dir=out_dir, log_every=500)
    state, run_dir = loop.train_spair(config)
    return run_dir, ("test0/MAE test", "test0/count_acc", "test1/MAE test",
                     "test1/count_acc")


def run_gmvae(steps: int, batch: int, out_dir: str, style: str = "blobs",
              resume: str = None, model: str = "lggmvae"):
    from split_vae_tpu.core.config import VaeConfig
    from split_vae_tpu.train import loop

    # Larger synthetic SVHN so the 30-way clustering has data to cluster
    # (synthetic_size=8192 -> 1024 held-out test images; the cluster-accuracy
    # linear assignment needs more samples than clusters to be meaningful).
    # model="lgvae" runs the canonical SVHN SPLIT-VAE knobs instead
    # (--beta 1 --patch_size 1, vae/main.py defaults per README Fig. 4):
    # its z_g probe resamples from N(0,1) UNCONDITIONALLY
    # (vae/trainer.py:223), so the full textbook signature
    # (z_l-resampled high, z_g-resampled chance) shows up as a curve.
    if model == "lgvae":
        config = VaeConfig(
            model="lgvae", dataset="svhn", beta=1.0, patch_size=1,
            batch_size=batch, synthetic_data=True,
            synthetic_size=8192, synthetic_style=style, resume=resume,
            training_steps=steps, eval_interval=2000,
            checkpoint_interval=5_000, output_dir=out_dir, log_every=500)
        keys = ("test/classifier_recon_acc",
                "test/probe_random_z_l_acc_rangefix",
                "test/probe_random_z_g_acc_rangefix")
    else:
        config = VaeConfig(
            model="lggmvae", dataset="svhn", beta=40.0, alpha=40.0, y_size=30,
            patch_size=4, batch_size=batch, synthetic_data=True,
            synthetic_size=8192, synthetic_style=style, resume=resume,
            training_steps=steps, eval_interval=2000,
            checkpoint_interval=5_000, output_dir=out_dir, log_every=500)
        keys = ("test/classifier_cluster_acc",
                "test/classifier_recon_acc",
                "test/probe_random_z_l_acc_rangefix",
                "test/probe_swapped_y_z_g_acc_rangefix")
    state, run_dir = loop.train_vae(config)
    return run_dir, keys


def summarize(run_dir: str, keys):
    path = os.path.join(run_dir, "metrics.jsonl")
    records = [json.loads(l) for l in open(path)]
    traj = {k: [] for k in keys}
    for r in records:
        for k in keys:
            if k in r:
                traj[k].append((r.get("step"), r[k]))
    summary = {
        "run_dir": run_dir,
        "final": {k: v[-1] for k, v in traj.items() if v},
        "trajectory": {k: v for k, v in traj.items()},
    }
    print("QUALITY_RESULT " + json.dumps(summary))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workload", choices=["spair", "gmvae"])
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--model", default="lg_spair")
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--dataset", default="cub_ckb_rot_6")
    ap.add_argument("--out_dir", default="output")
    ap.add_argument("--z_what_beta", type=float, default=0.5)
    ap.add_argument("--z_pres_anneal_step", type=float, default=10_000.0)
    ap.add_argument("--sprite_contrast", type=float, default=60.0)
    ap.add_argument("--style", default="blobs",
                    help="gmvae synthetic flavor: blobs|digits")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--z_bg_beta", type=float, default=None)
    ap.add_argument("--bg_latent_size", type=int, default=None)
    ap.add_argument("--resume", default=None,
                    help="checkpoint dir to resume from")
    args = ap.parse_args()
    if args.workload == "spair":
        run_dir, keys = run_spair(args.steps or 20_000, args.batch or 256,
                                  args.out_dir, model=args.model, lr=args.lr,
                                  dataset=args.dataset,
                                  z_what_beta=args.z_what_beta,
                                  z_pres_anneal_step=args.z_pres_anneal_step,
                                  sprite_contrast=args.sprite_contrast,
                                  seed=args.seed, z_bg_beta=args.z_bg_beta,
                                  bg_latent_size=args.bg_latent_size,
                                  resume=args.resume)
    else:
        run_dir, keys = run_gmvae(args.steps or 30_000, args.batch or 64,
                                  args.out_dir, style=args.style,
                                  resume=args.resume, model=args.model
                                  if args.model in ("lgvae", "lggmvae")
                                  else "lggmvae")
    summarize(run_dir, keys)


if __name__ == "__main__":
    main()
