"""Pure schedule functions of the (traced) step counter.

The reference bakes its annealing schedules into tf.function train steps
(spair/trainer.py:150-166) and uses a staircase exponential LR decay for the
GM models (vae/main.py:67-72). Here they are pure functions traced into the
jitted update.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def gm_lr_schedule(base_lr: float) -> optax.Schedule:
    """ExponentialDecay(decay_steps=1e6, rate=0.4, staircase=True).

    Reference: vae/main.py:67-72.
    """

    def schedule(step):
        return base_lr * jnp.power(0.4, jnp.floor(step / 1_000_000.0))

    return schedule


def z_pres_prior_prob(step, z_pres_anneal_step: float):
    """0 -> 0.99 linear anneal (spair/trainer.py:150)."""
    return 0.99 * jnp.minimum(1.0, (step + 1.0) / z_pres_anneal_step)


def z_zoom_prior_mean(step, prior_z_zoom: float, prior_z_zoom_start: float,
                      z_pres_anneal_step: float):
    """prior_z_zoom_start -> prior_z_zoom anneal (spair/trainer.py:153)."""
    frac = jnp.minimum((step + 1.0) / z_pres_anneal_step, 1.0)
    return prior_z_zoom + prior_z_zoom_start * (1.0 - frac)


def beta_warmup(step, beta: float, anneal_until: float):
    """min(beta, beta * (step+1)/anneal_until) (spair/trainer.py:165)."""
    return jnp.minimum(beta, beta * (step + 1.0) / anneal_until)
