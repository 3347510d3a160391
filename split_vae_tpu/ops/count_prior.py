"""SPAIR z_pres count-prior KL as a ``lax.scan`` over cells.

The reference unrolls a 16-iteration Python loop into the TF graph
(spair/trainer.py:45-94, after auto_yolo's yolo_air): a geometric prior over
object counts is sequentially conditioned on each cell's presence sample while
accumulating a per-cell Binary-Concrete KL. We express the same recurrence as a
single ``lax.scan`` over the flattened cell axis — one compiled loop body
instead of 16 inlined copies, identical math.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from split_vae_tpu.ops.distributions import concrete_binary_sample_kl, safe_log

Array = jax.Array


def z_pres_count_kl(
    z_pres: Array,
    z_pres_logits: Array,
    z_pres_pre_sigmoid: Array,
    prior_prob: Array,
    temperature: float,
    unroll: int = 1,
) -> Array:
    """Count-prior KL for z_pres, batch-meaned and summed over cells.

    Args:
      z_pres / z_pres_logits / z_pres_pre_sigmoid: [B, gh, gw, 1].
      prior_prob: scalar success probability of the geometric count prior
        (annealed 0 -> 0.99 during training, spair/trainer.py:150).
      temperature: Concrete temperature (config.tau).

    Matches spair/trainer.py:45-94 exactly: geometric count distribution over
    0..K objects, per-cell conditional presence probability
    p(z|C,z_prev) = max(support - count_so_far, 0) / (K - i), Binary-Concrete
    KL at the sampled pre-sigmoid value, posterior count update with
    renormalization, final mean-over-batch sum-over-cells.
    """
    b, gh, gw, _ = z_pres.shape
    k = gh * gw
    dtype = z_pres.dtype

    support = jnp.arange(k + 1, dtype=dtype)  # [K+1]
    count_prior_prob = 1.0 - prior_prob
    dist = (1.0 - count_prior_prob) * jnp.power(count_prior_prob, support)
    dist = dist / jnp.maximum(jnp.sum(dist), 1e-6)
    count_distribution = jnp.tile(dist[None, :], (b, 1))  # [B, K+1]
    count_so_far = jnp.zeros((b, 1), dtype=dtype)

    # Flatten cells in the reference's row-major (h, w) order.
    pre = z_pres_pre_sigmoid.reshape(b, k).T[..., None]  # [K, B, 1]
    logits = z_pres_logits.reshape(b, k).T[..., None]
    pres = z_pres.reshape(b, k).T[..., None]
    idx = jnp.arange(k, dtype=dtype)

    def body(carry, inp):
        count_distribution, count_so_far = carry
        pre_i, logits_i, pres_i, i = inp

        p_z_given_cz = jnp.maximum(support[None, :] - count_so_far, 0.0) / (k - i)  # [B, K+1]
        p_z = jnp.sum(count_distribution * p_z_given_cz, axis=1, keepdims=True)  # [B, 1]
        prior_log_odds = safe_log(p_z) - safe_log(1.0 - p_z)

        obj_kl = concrete_binary_sample_kl(
            pre_i, prior_log_odds, temperature, logits_i, temperature
        )  # [B, 1]

        sample = (pres_i > 0.5).astype(dtype)  # [B, 1]
        mult = sample * p_z_given_cz + (1.0 - sample) * (1.0 - p_z_given_cz)
        count_distribution = mult * count_distribution
        normalizer = jnp.maximum(jnp.sum(count_distribution, axis=1, keepdims=True), 1e-6)
        count_distribution = count_distribution / normalizer
        count_so_far = count_so_far + sample

        return (count_distribution, count_so_far), obj_kl

    # ``unroll`` trades scan dispatch latency for code size (the reference
    # unrolls all 16 iterations); measured A/B in tools/bench_count_prior.py.
    (_, _), obj_kls = jax.lax.scan(
        body, (count_distribution, count_so_far), (pre, logits, pres, idx),
        unroll=unroll)
    # obj_kls: [K, B, 1] -> mean over batch of sum over cells (spair/trainer.py:94).
    return jnp.mean(jnp.sum(obj_kls[..., 0], axis=0))
