"""Per-model loss functions (pure, jit-traceable).

Behavioral contract:
  - VAE family: vae/trainer.py:120-196 (train) / :199-292 (test share formulas)
  - SPAIR family: spair/trainer.py:136-234 with annealing schedules

Each returns (total_loss, metrics_dict). Metrics keys follow the reference's
metric names so logs are comparable.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from split_vae_tpu.models.spair import SpairOutput
from split_vae_tpu.models.vae import GMVaeOutput, LGGMVaeOutput, LGVaeOutput
from split_vae_tpu.ops.count_prior import z_pres_count_kl
from split_vae_tpu.ops.distributions import (
    bernoulli_xent,
    categorical_kl_uniform,
    discretized_logistic_nll,
    gaussian_kl,
    gaussian_kl_safe,
    gaussian_kl_two,
    gaussian_kl_two_safe,
    mean_sum,
)
from split_vae_tpu.train import schedules

Array = jax.Array


def _upcast(out):
    """Cast model outputs to f32 for loss math.

    With --compute_dtype bfloat16 the modules emit bf16 activations; losses
    (logs, KLs, reductions over thousands of pixels) must accumulate in f32
    or the 8-bit mantissa corrupts totals. No-op for the default f32 path.
    """
    return jax.tree.map(
        lambda a: a.astype(jnp.float32)
        if hasattr(a, "dtype") and a.dtype == jnp.bfloat16 else a, out)


def _recon_nll(x: Array, mean: Array, log_scale: Array) -> Array:
    """mean over batch of pixel-summed discretized-logistic NLL
    (vae/trainer.py:127-128)."""
    return jnp.mean(
        jnp.sum(discretized_logistic_nll(x, mean, log_scale), axis=(1, 2, 3))
    )


def lgvae_loss(out: LGVaeOutput, images: Array, beta: float) -> Tuple[Array, Dict]:
    """total = x_recon + x_hat_recon + beta*KL(concat z) (vae/trainer.py:120-144)."""
    out = _upcast(out)
    x, x_hat = images[..., :3], images[..., 3:]
    x_recon_loss = _recon_nll(x, out.x_mean, out.x_log_scale)
    x_hat_recon_loss = _recon_nll(x_hat, out.x_hat_mean, out.x_hat_log_scale)
    total_kl = beta * gaussian_kl(
        jnp.concatenate([out.z_mean_x, out.z_mean_x_hat], axis=1),
        jnp.concatenate([out.z_sig_x, out.z_sig_x_hat], axis=1),
    )
    x_kl = gaussian_kl(out.z_mean_x, out.z_sig_x)
    x_hat_kl = gaussian_kl(out.z_mean_x_hat, out.z_sig_x_hat)
    total = x_recon_loss + x_hat_recon_loss + total_kl
    return total, {
        "x_recon_loss": x_recon_loss,
        "x_kl_loss": x_kl,
        "x_hat_recon_loss": x_hat_recon_loss,
        "x_hat_kl_loss": x_hat_kl,
        "total_kl_loss": total_kl,
        "total_loss": total,
    }


def lggmvae_loss(
    out: LGGMVaeOutput, images: Array, beta: float, alpha: float, y_size: int
) -> Tuple[Array, Dict]:
    """vae/trainer.py:146-173."""
    out = _upcast(out)
    x, x_hat = images[..., :3], images[..., 3:]
    x_recon_loss = _recon_nll(x, out.x_mean, out.x_log_scale)
    x_hat_recon_loss = _recon_nll(x_hat, out.x_hat_mean, out.x_hat_log_scale)
    x_kl = gaussian_kl_two(out.z_mean_x, out.z_sig_x, out.z_prior_mean, out.z_prior_sig)
    x_hat_kl = gaussian_kl_two(out.z_mean_x_hat, out.z_sig_x_hat, 0.0, 1.0)
    y_kl = categorical_kl_uniform(out.y_logits, y_size)
    total = x_recon_loss + x_hat_recon_loss + beta * (x_kl + x_hat_kl) + alpha * y_kl
    return total, {
        "x_recon_loss": x_recon_loss,
        "x_kl_loss": x_kl,
        "x_hat_recon_loss": x_hat_recon_loss,
        "x_hat_kl_loss": x_hat_kl,
        "y_kl_loss": y_kl,
        "total_loss": total,
    }


def gmvae_loss(
    out: GMVaeOutput, images: Array, beta: float, alpha: float, y_size: int
) -> Tuple[Array, Dict]:
    """vae/trainer.py:175-195."""
    out = _upcast(out)
    x = images[..., :3]
    x_recon_loss = _recon_nll(x, out.x_mean, out.x_log_scale)
    x_kl = gaussian_kl_two(out.z_mean_x, out.z_sig_x, out.z_prior_mean, out.z_prior_sig)
    y_kl = categorical_kl_uniform(out.y_logits, y_size)
    total = x_recon_loss + beta * x_kl + alpha * y_kl
    return total, {
        "x_recon_loss": x_recon_loss,
        "x_kl_loss": x_kl,
        "y_kl_loss": y_kl,
        "total_loss": total,
    }


def spair_loss(
    out: SpairOutput, images: Array, config, step, training: bool = True
) -> Tuple[Array, Dict]:
    """SPAIR-family total loss with annealing (spair/trainer.py:136-234).

    ``step`` is a traced float scalar. For test steps (spair/trainer.py:237-261)
    the annealings are pinned: prior_z_pres_prob = 0.99 and
    prior_z_zoom_mean = config.prior_z_zoom.
    """
    out = _upcast(out)
    if config.model == "lg_spair":
        x, x_hat = images[..., :3], images[..., 3:]
    else:
        x, x_hat = images, None

    x_recon_loss = mean_sum(bernoulli_xent(x, out.x_recon))

    if training:
        prior_z_pres_prob = schedules.z_pres_prior_prob(step, config.z_pres_anneal_step)
        prior_z_zoom_mean = schedules.z_zoom_prior_mean(
            step, config.prior_z_zoom, config.prior_z_zoom_start, config.z_pres_anneal_step
        )
        beta_t = schedules.beta_warmup(step, config.beta, config.anneal_until)
    else:
        prior_z_pres_prob = jnp.float32(0.99)
        prior_z_zoom_mean = jnp.float32(config.prior_z_zoom)
        beta_t = jnp.float32(config.beta)

    # unroll=16: the 16-cell recurrence fully unrolled, as the reference's
    # in-graph Python loop is (spair/trainer.py:64-92) — measured 13% faster
    # fwd+bwd than the rolled scan on TPU (tools/bench_count_prior.py).
    z_pres_kl = z_pres_count_kl(
        out.z_pres, out.z_pres_logits, out.z_pres_pre_sigmoid, prior_z_pres_prob, config.tau,
        unroll=16,
    )
    z_where_zoom_kl = gaussian_kl_two_safe(
        out.z_where_mean[..., :2], out.z_where_sigma[..., :2], prior_z_zoom_mean, 0.5
    )
    z_what_kl = gaussian_kl_safe(out.z_what_mean, out.z_what_sigma)
    z_where_kl = gaussian_kl_safe(out.z_where_mean[..., 2:], out.z_where_sigma[..., 2:])
    z_depth_kl = gaussian_kl_safe(out.z_depth_mean, out.z_depth_sigma)

    metrics = {
        "x_recon_loss": x_recon_loss,
        "z_zoom_kl_loss": z_where_zoom_kl,
        "z_what_kl_loss": z_what_kl,
        "z_where_kl_loss": z_where_kl,
        "z_depth_kl_loss": z_depth_kl,
        "z_pres_kl_loss": z_pres_kl,
    }

    obj_kls = (
        config.z_what_beta * z_what_kl
        + z_depth_kl
        + z_where_kl
        + z_where_zoom_kl
        + z_pres_kl
    )
    total = config.reconstruction_weight * x_recon_loss + beta_t * obj_kls

    if config.model == "lg_spair":
        x_hat_recon_loss = mean_sum(bernoulli_xent(x_hat, out.x_hat_recon))
        z_l_kl = gaussian_kl_safe(out.z_l_mean, out.z_l_sig)
        if not config.split_z_l:
            # spair/trainer.py:170-188
            if config.concat_z_bg:
                z_bg_kl = gaussian_kl_safe(
                    jnp.concatenate([out.z_bg_mean, out.z_l_mean], axis=1),
                    jnp.concatenate([out.z_bg_sig, out.z_l_sig], axis=1),
                )
            else:
                z_bg_kl = gaussian_kl_safe(out.z_bg_mean, out.z_bg_sig)
            if config.concat_z_what:
                gh, gw = out.z_what_mean.shape[1], out.z_what_mean.shape[2]
                tiled_m = jnp.tile(out.z_l_mean[:, None, None, :], (1, gh, gw, 1))
                tiled_s = jnp.tile(out.z_l_sig[:, None, None, :], (1, gh, gw, 1))
                z_what_kl = gaussian_kl_safe(
                    jnp.concatenate([out.z_what_mean, tiled_m], axis=-1),
                    jnp.concatenate([out.z_what_sigma, tiled_s], axis=-1),
                )
            obj_kls = (
                config.z_what_beta * z_what_kl
                + z_depth_kl
                + z_where_kl
                + z_where_zoom_kl
                + z_pres_kl
            )
            # No beta warm-up on this branch (reference uses raw config.beta).
            total = (
                config.z_bg_beta * z_bg_kl
                + config.reconstruction_weight * x_recon_loss
                + config.beta * obj_kls
                + x_hat_recon_loss
            )
        else:
            # spair/trainer.py:190-200
            z_bg_kl = gaussian_kl_safe(out.z_bg_mean, out.z_bg_sig)
            total = (
                config.z_bg_beta * z_bg_kl
                + config.z_l_beta * z_l_kl
                + x_hat_recon_loss
                + config.reconstruction_weight * x_recon_loss
                + config.beta * obj_kls
            )
        # The logged z_what KL stays the plain per-cell KL (already in
        # ``metrics``): the reference's losses list captures the tensor before
        # the concat_z_what reassignment (spair/trainer.py:162), so the concat
        # form enters only the total.
        metrics.update(
            {
                "z_bg_kl_loss": z_bg_kl,
                "z_l_kl_loss": z_l_kl,
                "x_hat_recon_loss": x_hat_recon_loss,
            }
        )
        if not training:
            # Reference test-step quirk: the reported z_bg KL always uses the
            # concat([z_bg, z_l]) form regardless of concat_z_bg
            # (spair/trainer.py:266).
            metrics["z_bg_kl_loss"] = gaussian_kl_safe(
                jnp.concatenate([out.z_bg_mean, out.z_l_mean], axis=1),
                jnp.concatenate([out.z_bg_sig, out.z_l_sig], axis=1),
            )
    elif config.model == "lg_glimpse_spair":
        # spair/trainer.py:203-214 (the loss branch the reference ships for its
        # missing model class).
        z_bg_kl = gaussian_kl_safe(out.z_bg_mean, out.z_bg_sig)
        z_l_kl = gaussian_kl_safe(out.z_l_mean, out.z_l_sig)
        z_what_concat_kl = gaussian_kl_safe(
            jnp.concatenate([out.z_what_mean, out.z_l_mean], axis=-1),
            jnp.concatenate([out.z_what_sigma, out.z_l_sig], axis=-1),
        )
        x_hat_recon_loss = mean_sum(
            bernoulli_xent(jax.lax.stop_gradient(out.x_hat), out.x_hat_recon))
        total = (
            config.z_bg_beta * z_bg_kl
            + x_hat_recon_loss
            + config.reconstruction_weight * x_recon_loss
            + config.beta * (
                config.z_what_beta * z_what_concat_kl
                + z_depth_kl + z_where_kl + z_where_zoom_kl + z_pres_kl)
        )
        # As in the lg_spair branch, log the plain per-cell z_what KL; the
        # concat([z_what, z_l]) KL enters only the total.
        metrics.update({
            "z_bg_kl_loss": z_bg_kl,
            "z_l_kl_loss": z_l_kl,
            "x_hat_recon_loss": x_hat_recon_loss,
        })
    elif config.model == "bg_spair":
        # spair/trainer.py:217-224
        z_bg_kl = gaussian_kl_safe(out.z_bg_mean, out.z_bg_sig)
        total = (
            config.z_bg_beta * z_bg_kl
            + config.reconstruction_weight * x_recon_loss
            + beta_t * obj_kls
        )
        metrics["z_bg_kl_loss"] = z_bg_kl

    metrics["total_loss"] = total
    return total, metrics
