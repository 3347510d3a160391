"""Jitted train/eval steps: one fused device program per step.

Design (replaces the reference's @tf.function graphs, vae/trainer.py:120-292
and spair/trainer.py:136-308):
  - The raw batch crosses PCIe in its compact storage dtype (uint8 for
    SVHN/CelebA); normalization to [-1, 1] / [0, 1] happens on device.
  - Augmentation (patch scramble etc.) runs inside the step (ops/patches.py),
    so the widened 6/9-channel view never leaves HBM.
  - The whole forward + loss + backward + Adam update is one XLA program with
    the TrainState donated (true in-place update).
  - With a batch sharded over the 'data' mesh axis, XLA's SPMD partitioner
    emits the gradient all-reduce automatically — no explicit collectives.
"""

from __future__ import annotations

import contextlib
import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from split_vae_tpu.core.state import TrainState
from split_vae_tpu.ops.patches import augment_batch
from split_vae_tpu.train import losses
from split_vae_tpu.train.optim import notfinite_count

Array = jax.Array


def _add_notfinite_metric(metrics, state: TrainState) -> None:
    """Observability for nan_robust-wrapped optimizers: cumulative count of
    updates skipped because the gradients contained NaN/Inf."""
    cnt = notfinite_count(state.opt_state)
    if cnt is not None:
        metrics["notfinite_updates"] = cnt.astype(jnp.float32)


def normalize_images(batch: Array, mode: str) -> Array:
    """uint8 -> float in the model's expected range.

    'tanh': [-1, 1] like the VAE datasets (vae/data.py:52); 'unit': [0, 1] like
    MultiCUB canvases (spair/data.py:160-174). float inputs pass through.
    """
    if batch.dtype == jnp.uint8:
        x = batch.astype(jnp.float32) / 255.0
        return x * 2.0 - 1.0 if mode == "tanh" else x
    return batch.astype(jnp.float32)


def _check_activation_dtype(config) -> None:
    """Fail fast if the process-global activation dtype (nn/common.py) drifted
    from config.compute_dtype — a step traced before set_activation_dtype ran
    would otherwise silently bake the wrong dtype into every Dense/Conv."""
    from split_vae_tpu.nn import common

    want = jnp.bfloat16 if getattr(
        config, "compute_dtype", "float32") == "bfloat16" else jnp.float32
    have = common.activation_dtype()
    if have != want:
        raise ValueError(
            f"activation dtype mismatch: config.compute_dtype asks for "
            f"{want.__name__} but nn.common.set_activation_dtype left the "
            f"process global at {have.__name__}; call "
            f"set_activation_dtype(config.compute_dtype) before building "
            f"models or train steps")


def matmul_precision(config):
    """Precision context from config.compute_dtype.

    'float32' keeps the backend default (on TPU: bf16 multiplies with f32
    accumulation for f32 operands — the standard fast path); 'bfloat16'
    additionally pins single-pass bf16 for every dot/conv traced inside.
    """
    if getattr(config, "compute_dtype", "float32") == "bfloat16":
        return jax.default_matmul_precision("bfloat16")
    return contextlib.nullcontext()


def _vae_loss_fn(model_kind: str, config):
    if model_kind == "lgvae":
        return lambda out, images: losses.lgvae_loss(out, images, config.beta)
    if model_kind == "lggmvae":
        return lambda out, images: losses.lggmvae_loss(
            out, images, config.beta, config.alpha, config.y_size
        )
    if model_kind == "gmvae":
        return lambda out, images: losses.gmvae_loss(
            out, images, config.beta, config.alpha, config.y_size
        )
    raise ValueError(model_kind)


def make_vae_train_step(config) -> Callable:
    """Returns jitted (state, raw_batch_u8) -> (state, metrics)."""
    _check_activation_dtype(config)
    loss_of = _vae_loss_fn(config.model, config)

    @functools.partial(jax.jit, donate_argnums=0)
    def train_step(state: TrainState, batch: Array):
        state, keys = state.next_rng(3)
        k_aug, k_sample, k_drop = keys
        x = normalize_images(batch, "tanh")
        images = augment_batch(k_aug, x, config.augmentation, config.patch_size)

        def loss(params):
            out = state.apply_fn(
                {"params": params},
                images,
                True,
                rngs={"sample": k_sample, "dropout": k_drop},
            )
            return loss_of(out, images)

        with matmul_precision(config):
            (_, metrics), grads = jax.value_and_grad(loss, has_aux=True)(state.params)
        state = state.apply_gradients(grads)
        _add_notfinite_metric(metrics, state)
        return state, metrics

    return train_step


def make_vae_eval_step(config, apply_fn) -> Callable:
    """Returns jitted (params, rng, raw_batch) -> (out, metrics, images).

    Eval runs with training=False (no dropout) but sampling noise stays on, as
    in the reference test steps (vae/trainer.py:199-292 call model(images)).
    """
    loss_of = _vae_loss_fn(config.model, config)

    @jax.jit
    def eval_step(params, rng: Array, batch: Array):
        k_aug, k_sample = jax.random.split(rng)
        x = normalize_images(batch, "tanh")
        images = augment_batch(k_aug, x, config.augmentation, config.patch_size)
        out = apply_fn({"params": params}, images, False, rngs={"sample": k_sample})
        _, metrics = loss_of(out, images)
        return out, metrics, images

    return eval_step


def make_spair_train_step(config) -> Callable:
    """Returns jitted (state, raw_batch) -> (state, metrics).

    Deliberately does NOT return the forward outputs: materializing the
    [B, K, H, W, C+1] per-object canvases as a step output costs ~7% step time
    (XLA must keep them in HBM instead of fusing the paste+composite chain).
    Callers that need outputs for visualization run the eval step on the same
    batch at eval cadence.
    """
    _check_activation_dtype(config)
    augmented = config.model == "lg_spair"

    @functools.partial(jax.jit, donate_argnums=0)
    def train_step(state: TrainState, batch: Array):
        state, keys = state.next_rng(2)
        k_aug, k_sample = keys
        x = normalize_images(batch, "unit")
        if augmented:
            images = augment_batch(k_aug, x, config.augmentation, config.patch_size)
        else:
            images = x
        step_f = state.step.astype(jnp.float32)

        def loss(params):
            out = state.apply_fn(
                {"params": params}, images, True, rngs={"sample": k_sample}
            )
            total, metrics = losses.spair_loss(out, images, config, step_f, training=True)
            return total, metrics

        with matmul_precision(config):
            (_, metrics), grads = jax.value_and_grad(loss, has_aux=True)(state.params)
        state = state.apply_gradients(grads)
        _add_notfinite_metric(metrics, state)
        return state, metrics

    return train_step


def make_spair_eval_step(config, apply_fn) -> Callable:
    """Returns jitted (params, rng, raw_batch, labels?) -> (out, metrics, images).

    Reference quirk preserved: the test step calls the model with
    training=True (spair/trainer.py:241), so Concrete sampling and render
    noise stay on during eval.
    """
    augmented = config.model == "lg_spair"

    @jax.jit
    def eval_step(params, rng: Array, batch: Array, labels: Optional[Array] = None):
        k_aug, k_sample = jax.random.split(rng)
        x = normalize_images(batch, "unit")
        if augmented:
            images = augment_batch(k_aug, x, config.augmentation, config.patch_size)
        else:
            images = x
        # fused=False: eval consumers (viz) need the materialized per-cell
        # canvases that the fused kernel elides.
        out = apply_fn({"params": params}, images, True, fused=False,
                       rngs={"sample": k_sample})
        _, metrics = losses.spair_loss(out, images, config, jnp.float32(0.0), training=False)
        if labels is not None:
            pred_count = jnp.sum(
                jnp.round(jax.nn.sigmoid(out.z_pres_logits)), axis=(1, 2, 3)
            )
            metrics.update(count_metrics(pred_count, labels))
        return out, metrics, images

    return eval_step


def count_metrics(pred_count: Array, labels: Array) -> dict:
    """Object-count eval columns (spair/trainer.py:292-301).

    `MAPE test` keeps exact tf.keras mean_absolute_percentage_error
    semantics (spair/trainer.py:298): denominator clipped at 1e-7, so
    zero-count images contribute err*1e9 — preserved for comparability with
    reference logs. Redesign companion `MAPE_nonzero test` is the same
    statistic restricted to images whose denominator is real (count > 0);
    the quirk column reads ~1e9 whenever any batch image has zero objects,
    which hides all signal.
    """
    err = jnp.abs(labels - pred_count)
    pct = err / jnp.maximum(jnp.abs(labels), 1e-7) * 100.0
    nonzero = (jnp.abs(labels) > 0).astype(jnp.float32)
    return {
        "MAE test": jnp.mean(err),
        "MAPE test": jnp.mean(pct),
        "MAPE_nonzero test": (jnp.sum(pct * nonzero)
                              / jnp.maximum(jnp.sum(nonzero), 1.0)),
        "count_acc": jnp.mean((pred_count == labels).astype(jnp.float32)),
    }
