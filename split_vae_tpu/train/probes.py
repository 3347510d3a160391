"""Evaluation probes: classifier disentanglement accuracies + cluster metrics.

Reference: vae/trainer.py:213-264 (frozen-classifier probes on reconstructions
with resampled latents) and :345-349 (majority-vote clustering accuracy),
vae/classifier.py (probe pretraining).

Reference quirk preserved deliberately: the recon-accuracy probe feeds the
*un-rescaled* decoder mean (range [-1, 1]-ish, vae/trainer.py:214) to the
classifier while the resampled-latent probes use the rescaled [0, 1] decode
(vae/trainer.py:219,224) — asymmetric, but it is the published behavior.

Measured consequence of that quirk (digits stand-in, round 5): the classifier
is trained on [-1, 1] inputs, and merely rescaling REAL test images to [0, 1]
drops its accuracy 1.00 -> 0.24 — so the parity `classifier_random_z_*_acc`
columns are dominated by the input-range mismatch, not by disentanglement.
Redesign: each probe therefore also emits a `probe_*_rangefix` companion that
feeds the raw decoder mean (classifier-distribution inputs, rescale=False),
plus — for the GM variant, whose reference z_g probe resamples WITHIN the
inferred cluster (vae/trainer.py:261) and so is expected to stay high — a
`probe_swapped_y_z_g_acc_rangefix` cross-cluster probe (decode with a batch
neighbour's y-prior draw). The SPLIT signature is then directly visible:
z_l-resampled accuracy tracks recon accuracy while cross-cluster z_g drops to
chance, and the swapped-y decode predicts the NEIGHBOUR's class at recon
fidelity (probe_swapped_y_transfer_acc_rangefix).
"""

from __future__ import annotations

import os
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from split_vae_tpu.train import optim

from split_vae_tpu.core import checkpoint as ckpt
from split_vae_tpu.core.metrics import AccuracyMetric, MeanMetrics
from split_vae_tpu.data.loader import iterate_batches
from split_vae_tpu.data.svhn import get_svhn
from split_vae_tpu.nn.classifier import Classifier
from split_vae_tpu.train.steps import normalize_images

Array = jax.Array


def make_vae_probe_step(model, classifier: Classifier, gm: bool) -> Callable:
    """jitted (params, cls_vars, rng, out, labels) -> accuracy fractions."""

    @jax.jit
    def probe(params, cls_vars, rng, out, labels):
        k_l, k_g = jax.random.split(rng)
        y_true = jnp.argmax(labels, axis=-1)

        pred = classifier.apply(cls_vars, out.x_mean)
        recon_acc = jnp.mean((jnp.argmax(pred, -1) == y_true).astype(jnp.float32))

        # vary z_l: decode(z_x, random z_l)
        random_z_l = jax.random.normal(k_l, out.z_x_hat.shape)
        x_r_zl, _ = model.apply({"params": params}, out.z_x, random_z_l, method="decode")
        pred_zl = classifier.apply(cls_vars, x_r_zl)
        zl_acc = jnp.mean((jnp.argmax(pred_zl, -1) == y_true).astype(jnp.float32))

        # vary z_g: N(0,1) for lgvae; N(prior_y) for lggmvae (vae/trainer.py:223,261)
        if gm:
            random_z_g = out.z_prior_mean + jax.random.normal(
                k_g, out.z_prior_mean.shape) * out.z_prior_sig
        else:
            random_z_g = jax.random.normal(k_g, out.z_x.shape)
        x_r_zg, _ = model.apply({"params": params}, random_z_g, out.z_x_hat, method="decode")
        pred_zg = classifier.apply(cls_vars, x_r_zg)
        zg_acc = jnp.mean((jnp.argmax(pred_zg, -1) == y_true).astype(jnp.float32))

        def _acc(x):
            return jnp.mean(
                (jnp.argmax(classifier.apply(cls_vars, x), -1) == y_true
                 ).astype(jnp.float32))

        # Redesign: range-corrected companions (rescale=False -> raw decoder
        # mean, the classifier's training range). See module docstring.
        x_zl_raw, _ = model.apply({"params": params}, out.z_x, random_z_l,
                                  method="decode", rescale=False)
        x_zg_raw, _ = model.apply({"params": params}, random_z_g, out.z_x_hat,
                                  method="decode", rescale=False)
        metrics = {
            "classifier_recon_acc": recon_acc,
            "classifier_random_z_l_acc": zl_acc,
            "classifier_random_z_g_acc": zg_acc,
            "probe_random_z_l_acc_rangefix": _acc(x_zl_raw),
            "probe_random_z_g_acc_rangefix": _acc(x_zg_raw),
        }
        if gm:
            # Cross-cluster z_g: decode with a batch neighbour's y-prior draw
            # (jnp.roll = static permutation). Chance accuracy vs OWN labels +
            # recon-level accuracy vs the NEIGHBOUR's labels = the class
            # lives entirely in the global latent.
            k_swap = jax.random.fold_in(k_g, 1)
            swap_mean = jnp.roll(out.z_prior_mean, 1, axis=0)
            swap_sig = jnp.roll(out.z_prior_sig, 1, axis=0)
            z_g_swap = swap_mean + jax.random.normal(k_swap, swap_mean.shape) * swap_sig
            x_swap, _ = model.apply({"params": params}, z_g_swap, out.z_x_hat,
                                    method="decode", rescale=False)
            pred_swap = jnp.argmax(classifier.apply(cls_vars, x_swap), -1)
            metrics["probe_swapped_y_z_g_acc_rangefix"] = jnp.mean(
                (pred_swap == y_true).astype(jnp.float32))
            metrics["probe_swapped_y_transfer_acc_rangefix"] = jnp.mean(
                (pred_swap == jnp.roll(y_true, 1)).astype(jnp.float32))
        return metrics

    return probe


def classifier_weights_path(config) -> str:
    """Weights path, keyed by dataset flavor for synthetic runs.

    The reference uses the single fixed path
    ``models/svhn_classifier_weights.h5`` (vae/trainer.py:81-88) — fine when
    there is exactly one SVHN. Our offline stand-ins come in flavors
    (blobs/digits, varying sizes); sharing one path let a blobs-trained
    classifier silently serve a digits run, which scored 0.034 on the digits
    test set and zeroed every disentanglement probe for the round-4 300k run.
    Real-data runs keep the reference-shaped name.
    """
    if getattr(config, "synthetic_data", False):
        style = getattr(config, "synthetic_style", "blobs") or "blobs"
        size = getattr(config, "synthetic_size", 0) or 512
        name = f"svhn_classifier_weights_synth_{style}_{size}.msgpack"
    else:
        name = "svhn_classifier_weights.msgpack"
    return os.path.join("models", name)


def train_classifier(config, epochs: int = None, verbose: bool = True):
    """Train the SVHN probe classifier (vae/classifier.py:14-109).

    Returns {'params': ..., 'batch_stats': ...}. Reference quirk preserved:
    the training set is train ∪ test concatenated (vae/classifier.py:35).
    """
    epochs = epochs if epochs is not None else (2 if config.synthetic_data else 20)
    batch_size = 32
    import types

    # Propagate every dataset-shaping flag: the probe classifier must be
    # trained on the SAME distribution as the VAE run it scores. Round-4 bug:
    # synthetic_style/synthetic_size were dropped here, so digits runs probed
    # with a blobs-trained classifier (chance on digits; VERDICT.md round 4
    # Missing #2). Reference contract: one shared SVHN (vae/classifier.py:35).
    cfg = types.SimpleNamespace(
        label=True, synthetic_data=config.synthetic_data,
        data_dir=config.data_dir, seed=config.seed,
        synthetic_style=getattr(config, "synthetic_style", "blobs"),
        synthetic_size=getattr(config, "synthetic_size", 0))
    train_ds, test_ds, _ = get_svhn(cfg, extra=False)
    # quirk: concatenate test into train (vae/classifier.py:35)
    import numpy as _np

    from split_vae_tpu.data.loader import ArrayDataset

    train_ds = ArrayDataset(
        _np.concatenate([train_ds.images, test_ds.images]),
        _np.concatenate([train_ds.labels, test_ds.labels]),
    )

    model = Classifier(latent_dims=256, target_shape=10)
    x0 = jnp.zeros((8, 32, 32, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(config.seed), "dropout": jax.random.PRNGKey(1)}, x0
    )
    tx = optim.adam(1e-4, amsgrad=True)  # Adam(amsgrad=True), vae/classifier.py:40
    opt_state = tx.init(variables["params"])

    @jax.jit
    def train_step(params, batch_stats, opt_state, rng, images, labels):
        x = normalize_images(images, "tanh")

        def loss_fn(p):
            logits, updates = model.apply(
                {"params": p, "batch_stats": batch_stats}, x, True,
                rngs={"dropout": rng}, mutable=["batch_stats"])
            loss = jnp.mean(optax.softmax_cross_entropy(logits, labels))
            return loss, (logits, updates["batch_stats"])

        (loss, (logits, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        acc = jnp.mean((jnp.argmax(logits, -1) == jnp.argmax(labels, -1)).astype(jnp.float32))
        return params, new_bs, opt_state, loss, acc

    @jax.jit
    def test_step(params, batch_stats, images, labels):
        x = normalize_images(images, "tanh")
        logits = model.apply({"params": params, "batch_stats": batch_stats}, x)
        acc = jnp.mean((jnp.argmax(logits, -1) == jnp.argmax(labels, -1)).astype(jnp.float32))
        return acc

    params, batch_stats = variables["params"], variables["batch_stats"]
    rng = jax.random.PRNGKey(config.seed + 17)
    for epoch in range(epochs):
        mm = MeanMetrics()
        for images, labels in iterate_batches(train_ds, batch_size, seed=epoch):
            rng, sub = jax.random.split(rng)
            params, batch_stats, opt_state, loss, acc = train_step(
                params, batch_stats, opt_state, sub, jnp.asarray(images), jnp.asarray(labels))
            mm.update({"loss": loss, "acc": acc})
        accs = [test_step(params, batch_stats, jnp.asarray(i), jnp.asarray(l))
                for i, l in iterate_batches(test_ds, batch_size, shuffle=False)]
        if verbose:
            r = mm.result()
            print(f"classifier epoch {epoch + 1}: train loss {r['loss']:.4f} "
                  f"acc {r['acc']:.4f} test acc {float(np.mean(jax.device_get(accs))):.4f}")

    cls_vars = {"params": params, "batch_stats": batch_stats}
    ckpt.save_weights(classifier_weights_path(config), cls_vars)
    return cls_vars


def load_or_train_classifier(config, verbose: bool = True):
    """Lazy train-or-load like vae/trainer.py:81-89."""
    path = classifier_weights_path(config)
    model = Classifier(latent_dims=256, target_shape=10)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((8, 32, 32, 3)))
    if os.path.exists(path):
        return ckpt.load_weights(path, jax.device_get(variables)), model
    if verbose:
        print("Classifier model not found, training a new classifier")
    return train_classifier(config, verbose=verbose), model


def evaluate_classifier(cls_vars, model: Classifier, test_ds, batch_size: int = 256) -> float:
    """Frozen-probe sanity accuracy on real test images (vae/trainer.py:90-96)."""
    acc = AccuracyMetric()
    for images, labels in iterate_batches(test_ds, batch_size, shuffle=False,
                                          drop_remainder=False):
        x = normalize_images(jnp.asarray(images), "tanh")
        pred = model.apply(cls_vars, x)
        acc.update(labels, pred)
    return acc.result()
