"""Locate the source of non-finite SPAIR gradients from a live checkpoint.

Round-2 quality runs showed a burst of non-finite gradients around the z_pres
anneal midpoint (steps ~3.5k-7k). ``nan_robust`` now skips those updates, but
the source should still be identified (and ideally fixed at the math level).

This tool loads a checkpoint, replays training batches at the checkpoint's
step, and for every batch whose total-loss gradient is non-finite:
  - reports which loss TERM (value) is non-finite, per term;
  - reports per-gradient-leaf finiteness for the total loss;
  - reports per-term gradient finiteness (term-at-a-time vjp) for the
    offending batch, isolating the branch that produces the NaN/Inf.

Usage (idle TPU or --platform cpu):
  python tools/nan_probe.py <run_dir> --step 4000 --batches 50
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--step", type=int, default=4000)
    ap.add_argument("--batches", type=int, default=50)
    ap.add_argument("--batch_size", type=int, default=256)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--data_dir", default="data")
    ap.add_argument("--synthetic_size", type=int, default=20000)
    args = ap.parse_args()

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import optax

    from split_vae_tpu.core import checkpoint as ckpt
    from split_vae_tpu.core.config import SpairConfig
    from split_vae_tpu.core.state import create_train_state
    from split_vae_tpu.data.multicub import get_multicub
    from split_vae_tpu.models.spair import get_spair_model
    from split_vae_tpu.ops.patches import augment_batch
    from split_vae_tpu.train import losses as losses_mod
    from split_vae_tpu.train import optim
    from split_vae_tpu.train.steps import normalize_images

    config = SpairConfig(
        model="lg_spair", dataset="cub_ckb_rot_6", batch_size=args.batch_size,
        latent_size=64, bg_latent_size=64, local_latent_size=64,
        z_bg_beta=1.0, z_what_beta=0.5, patch_size=8, split_z_l=True,
        concat_z_what=True, dense_local=True, dense_bg=True,
        synthetic_data=True, synthetic_size=args.synthetic_size,
        data_dir=args.data_dir)
    train_ds, _, input_shape, _ = get_multicub(config)
    size, ch = input_shape[1], input_shape[3]
    config.image_size = (size, size, ch)
    model = get_spair_model(config)
    tx = optim.nan_robust(optax.chain(
        optim.clip_by_per_tensor_norm(1.0), optim.adam(config.learning_rate)))
    state = create_train_state(
        model, jnp.zeros((args.batch_size, size, size, ch * 2), jnp.float32),
        tx, seed=0, training_kwargs={"training": True})
    path = os.path.join(args.run_dir, "checkpoints",
                        f"checkpoint_{args.step}.msgpack")
    if not os.path.exists(path):
        path = os.path.join(args.run_dir, "checkpoints")
    state = ckpt.restore_checkpoint(path, state)
    print(f"restored step {int(state.step)}")

    step_f = jnp.float32(args.step)

    def forward_terms(params, key, batch):
        k_aug, k_sample = jax.random.split(key)
        x = normalize_images(batch, "unit")
        images = augment_batch(k_aug, x, config.augmentation, config.patch_size)
        out = model.apply({"params": params}, images, True,
                          rngs={"sample": k_sample})
        total, metrics = losses_mod.spair_loss(out, images, config, step_f,
                                               training=True)
        return total, metrics

    term_names = sorted(forward_terms(
        state.params, jax.random.PRNGKey(0),
        jnp.zeros((args.batch_size, size, size, ch), jnp.float32))[1].keys())

    @jax.jit
    def probe(params, key, batch):
        (total, metrics), grads = jax.value_and_grad(
            lambda p: forward_terms(p, key, batch), has_aux=True)(params)
        leaf_ok = jax.tree.map(lambda g: jnp.all(jnp.isfinite(g)), grads)
        term_leaf_ok = {}
        for term in term_names:
            g_t = jax.grad(lambda p: forward_terms(p, key, batch)[1][term])(params)
            term_leaf_ok[term] = jax.tree.map(
                lambda g: jnp.all(jnp.isfinite(g)), g_t)
        return total, metrics, leaf_ok, term_leaf_ok

    images = train_ds.images
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(123)
    n_bad = 0
    for i in range(args.batches):
        idx = rng.randint(0, len(images), args.batch_size)
        batch = jnp.asarray(images[idx])
        key, k = jax.random.split(key)
        total, metrics, leaf_ok, term_leaf_ok = probe(state.params, k, batch)
        all_ok = all(bool(v) for v in jax.tree.leaves(leaf_ok))
        if all_ok and np.isfinite(float(total)):
            continue
        n_bad += 1
        print(f"\n=== batch {i}: total={float(total)} ===")
        for name, v in sorted(metrics.items()):
            v = float(v)
            if not np.isfinite(v):
                print(f"  term value NON-FINITE: {name} = {v}")
        flat, _ = jax.tree_util.tree_flatten_with_path(leaf_ok)
        bad_leaves = [jax.tree_util.keystr(p) for p, v in flat if not bool(v)]
        print(f"  non-finite grad leaves ({len(bad_leaves)}):")
        for p in bad_leaves[:12]:
            print(f"    {p}")
        for term in term_names:
            flat, _ = jax.tree_util.tree_flatten_with_path(term_leaf_ok[term])
            bad = [jax.tree_util.keystr(p) for p, v in flat if not bool(v)]
            if bad:
                print(f"  term '{term}' grad non-finite in {len(bad)} leaves, "
                      f"e.g. {bad[0]}")
        if n_bad >= 3:
            break
    print(f"\n{n_bad} non-finite batches out of {i + 1} probed")


if __name__ == "__main__":
    main()
