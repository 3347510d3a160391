"""Re-score the frozen-classifier disentanglement probes on a saved checkpoint.

The reference computes these inline during evaluation (vae/trainer.py:213-264):
accuracy of a frozen SVHN classifier on (a) reconstructions, (b) decodes with
z_l resampled, (c) decodes with z_g resampled. The SPLIT signature is
(b) >> (c): class identity must live in the global latent, so resampling the
local latent preserves the predicted class while resampling the global one
destroys it.

This tool replays that evaluation offline against an archived checkpoint —
needed after the round-4 probe-classifier bug (the classifier was trained on
the wrong synthetic flavor, scoring chance on everything; see
train/probes.py::classifier_weights_path) so the 300k digits run can be
re-scored without re-training it.

Usage:
  python tools/probe_rescore.py --checkpoint output/.../checkpoints \
      [--style digits] [--size 8192] [--platform cpu]

Prints one line: PROBE_RESCORE {...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True,
                    help="checkpoint file or directory (latest used)")
    ap.add_argument("--model", default="lggmvae",
                    choices=["lgvae", "lggmvae"])
    ap.add_argument("--style", default="digits")
    ap.add_argument("--size", type=int, default=8192)
    ap.add_argument("--y_size", type=int, default=30)
    ap.add_argument("--beta", type=float, default=40.0)
    ap.add_argument("--alpha", type=float, default=40.0)
    ap.add_argument("--patch_size", type=int, default=4)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp
    import numpy as np

    from split_vae_tpu.core import checkpoint as ckpt
    from split_vae_tpu.core.config import VaeConfig
    from split_vae_tpu.core.metrics import MeanMetrics, linear_assignment
    from split_vae_tpu.core.state import create_train_state
    from split_vae_tpu.data import get_vae_dataset
    from split_vae_tpu.data.loader import iterate_batches
    from split_vae_tpu.ops.patches import augmented_channels
    from split_vae_tpu.train import loop as loop_mod
    from split_vae_tpu.train import probes as probes_mod
    from split_vae_tpu.train.steps import make_vae_eval_step

    config = VaeConfig(
        model=args.model, dataset="svhn", beta=args.beta, alpha=args.alpha,
        y_size=args.y_size, patch_size=args.patch_size, seed=args.seed,
        batch_size=args.batch, synthetic_data=True,
        synthetic_size=args.size, synthetic_style=args.style)

    train_ds, test_ds, input_shape = get_vae_dataset(config)
    h, w = input_shape[1], input_shape[2]
    in_ch = augmented_channels(config.augmentation)
    model, tx = loop_mod.build_vae_model(config, (h, w))
    state = create_train_state(
        model, jnp.zeros((8, h, w, in_ch)), tx, seed=config.seed,
        training_kwargs={"training": True})
    state = ckpt.restore_checkpoint(args.checkpoint, state)
    step = int(state.step)
    print(f"restored step {step} from {args.checkpoint}")

    cls_vars, cls_model = probes_mod.load_or_train_classifier(config)
    cls_test_acc = probes_mod.evaluate_classifier(cls_vars, cls_model, test_ds)
    print(f"Classifier test acc: {cls_test_acc:.4f}")

    gm = args.model == "lggmvae"
    eval_step = make_vae_eval_step(config, model.apply)
    probe_step = probes_mod.make_vae_probe_step(model, cls_model, gm=gm)

    mm = MeanMetrics()
    all_labels, all_pred = [], []
    key = jax.random.PRNGKey(config.seed + 1)
    for t_imgs, t_labels in iterate_batches(test_ds, config.batch_size,
                                            shuffle=False):
        key, k_eval, k_probe = jax.random.split(key, 3)
        out, m, _ = eval_step(state.params, k_eval, jnp.asarray(t_imgs))
        mm.update(m)
        mm.update(probe_step(state.params, cls_vars, k_probe, out,
                             jnp.asarray(t_labels)))
        if gm:
            all_labels.append(np.asarray(t_labels))
            all_pred.append(np.asarray(out.y_logits))
    results = {k: float(v) for k, v in mm.result().items()}
    if all_labels:
        labels_cat = np.concatenate(all_labels)
        pred_cat = np.concatenate(all_pred)
        cluster_pred = linear_assignment(labels_cat, pred_cat)
        results["classifier_cluster_acc"] = float(
            (cluster_pred.argmax(1) == labels_cat.argmax(1)).mean())
    results["classifier_test_acc"] = float(cls_test_acc)
    print("PROBE_RESCORE " + json.dumps(
        {"checkpoint": args.checkpoint, "step": step, "metrics": results}))


if __name__ == "__main__":
    main()
