"""Distribution / loss primitives for the SPLIT framework, in pure JAX.

Behavioral contract is the reference TF2 implementation:
  - Gaussian KLs:            vae/trainer.py:11-18, spair/trainer.py:13-24
  - Discretized logistic:    vae/trainer.py:21-38 (pixel-cnn style)
  - Gumbel-softmax:          vae/model.py:122-123, spair/utils.py:29-44
  - Binary-Concrete:         spair/utils.py:14-17, spair/trainer.py:28-42
  - safe log / xent / sums:  spair/trainer.py:97-109

All functions are shape-polymorphic over leading batch dims, use explicit PRNG
keys, and are jit/vmap/grad friendly (no Python control flow on traced values).
Reductions keep the reference convention: mean over batch, sum over the rest.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

Array = jax.Array


def reparameterize(key: Array, mean: Array, sigma: Array) -> Array:
    """z = mean + sigma * eps, eps ~ N(0, 1).

    Reference: vae/model.py:9-13 and spair/utils.py:19-24 (``Sampling`` layer).
    ``sigma`` is a standard deviation (softplus head), NOT a log-variance.
    """
    eps = jax.random.normal(key, sigma.shape, dtype=sigma.dtype)
    return mean + sigma * eps


def _sum_over_nonbatch(x: Array) -> Array:
    return jnp.sum(x.reshape(x.shape[0], -1), axis=1)


def mean_sum(x: Array) -> Array:
    """Mean over batch dim, sum over everything else (spair/trainer.py:107-109)."""
    return jnp.mean(_sum_over_nonbatch(x))


def gaussian_kl(mean: Array, sigma: Array) -> Array:
    """KL(N(mean, sigma^2) || N(0, 1)), summed over non-batch dims, batch-meaned.

    Matches vae/trainer.py:11-15: computed via log-var = log(sigma^2) with a
    plain (unsafe) log.
    """
    log_var = jnp.log(jnp.square(sigma))
    kl = -0.5 * (1.0 + log_var - jnp.square(mean) - jnp.exp(log_var))
    return jnp.mean(_sum_over_nonbatch(kl))


def gaussian_kl_safe(mean: Array, sigma: Array) -> Array:
    """SPAIR-flavored Gaussian KL using safe_log (spair/trainer.py:13-21).

    The reference dispatches on rank (2D vs 4D) but both reduce to
    mean-over-batch / sum-over-rest, which this handles for any rank.
    """
    log_var = safe_log(jnp.square(sigma))
    kl = -0.5 * (1.0 + log_var - jnp.square(mean) - jnp.exp(log_var))
    return jnp.mean(_sum_over_nonbatch(kl))


def gaussian_kl_two(mean1: Array, sig1: Array, mean2, sig2) -> Array:
    """KL(N(mean1,sig1^2) || N(mean2,sig2^2)) with plain logs (vae/trainer.py:17-18)."""
    mean2 = jnp.asarray(mean2, dtype=mean1.dtype)
    sig2 = jnp.asarray(sig2, dtype=sig1.dtype)
    kl = (
        jnp.log(sig2)
        - jnp.log(sig1)
        + (jnp.square(sig1) + jnp.square(mean1 - mean2)) / (2.0 * jnp.square(sig2))
        - 0.5
    )
    kl = jnp.broadcast_to(kl, jnp.broadcast_shapes(kl.shape, mean1.shape))
    return jnp.mean(_sum_over_nonbatch(kl))


def gaussian_kl_two_safe(mean1: Array, sig1: Array, mean2, sig2) -> Array:
    """Two-Gaussian KL with safe logs (spair/trainer.py:23-24)."""
    mean2 = jnp.asarray(mean2, dtype=mean1.dtype)
    sig2 = jnp.asarray(sig2, dtype=sig1.dtype)
    kl = (
        safe_log(sig2)
        - safe_log(sig1)
        + (jnp.square(sig1) + jnp.square(mean1 - mean2)) / (2.0 * jnp.square(sig2))
        - 0.5
    )
    kl = jnp.broadcast_to(kl, jnp.broadcast_shapes(kl.shape, mean1.shape))
    return jnp.mean(_sum_over_nonbatch(kl))


def discretized_logistic_nll(x: Array, mean: Array, log_scales: Array) -> Array:
    """Per-element negative log-likelihood of a discretized logistic.

    Pixel-CNN style binning over 1/255-wide intervals with the reference's edge
    handling (vae/trainer.py:21-38): closed-form CDF difference in the bulk,
    one-sided CDFs at x < -0.999 / x > 0.999, and a PDF approximation when the
    CDF delta underflows below 1e-5. Returns elementwise NLL (caller reduces).
    """
    centered = x - mean
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered + 1.0 / 255.0)
    min_in = inv_stdv * (centered - 1.0 / 255.0)
    cdf_plus = jax.nn.sigmoid(plus_in)
    cdf_min = jax.nn.sigmoid(min_in)
    cdf_delta = cdf_plus - cdf_min

    mid_in = inv_stdv * centered
    log_pdf_mid = mid_in - log_scales - 2.0 * jax.nn.softplus(mid_in)

    log_cdf_plus = plus_in - jax.nn.softplus(plus_in)
    log_one_minus_cdf_min = -jax.nn.softplus(min_in)

    log_prob = jnp.where(
        x < -0.999,
        log_cdf_plus,
        jnp.where(
            x > 0.999,
            log_one_minus_cdf_min,
            jnp.where(
                cdf_delta > 1e-5,
                jnp.log(jnp.maximum(cdf_delta, 1e-12)),
                log_pdf_mid - math.log(127.5),
            ),
        ),
    )
    return -log_prob


def categorical_kl_uniform(y_logits: Array, num_classes: int, eps: float = 1e-8) -> Array:
    """KL(softmax(y_logits) || Uniform(num_classes)), batch-meaned.

    Matches vae/trainer.py:160-161: ``sum py * (log(py + 1e-8) - log(1/K))``.
    """
    py = jax.nn.softmax(y_logits, axis=-1)
    kl = jnp.sum(py * (jnp.log(py + eps) - math.log(1.0 / num_classes)), axis=-1)
    return jnp.mean(kl)


def gumbel_softmax(key: Array, logits: Array, tau: float, eps: float = 0.0) -> Array:
    """Gumbel-softmax sample: softmax((logits + G)/tau), G = -log(-log U).

    Matches both reference parameterizations, which are algebraically equal:
    vae/model.py:122-123 computes softmax((logits - log(-log U))/tau) and
    spair/utils.py:29-44 computes a max-subtracted softmax of (logits+G)/tau.
    """
    u = jax.random.uniform(key, logits.shape, dtype=logits.dtype, minval=eps)
    g = -jnp.log(-jnp.log(u))
    return jax.nn.softmax((logits + g) / tau, axis=-1)


def concrete_binary_pre_sigmoid_sample(
    key: Array, log_odds: Array, temperature: float, eps: float = 1e-8
) -> Array:
    """Binary-Concrete pre-sigmoid sample: (log_odds + logistic noise)/temperature.

    Reference: spair/utils.py:14-17 (after auto_yolo).
    """
    u = jax.random.uniform(key, log_odds.shape, dtype=log_odds.dtype)
    noise = jnp.log(u + eps) - jnp.log(1.0 - u + eps)
    return (log_odds + noise) / temperature


def concrete_binary_sample_kl(
    pre_sigmoid_sample: Array,
    prior_log_odds: Array,
    prior_temperature,
    posterior_log_odds: Array,
    posterior_temperature,
    eps: float = 1e-8,
) -> Array:
    """Elementwise KL estimate between Binary-Concrete posterior and prior.

    Reference: spair/trainer.py:28-42 (after auto_yolo). Evaluated at the
    sampled pre-sigmoid value: log q(y) - log p(y).
    """
    y = pre_sigmoid_sample

    y_prior = y * prior_temperature
    log_prior = (
        jnp.log(prior_temperature + eps)
        - y_prior
        + prior_log_odds
        - 2.0 * jnp.log(1.0 + jnp.exp(-y_prior + prior_log_odds) + eps)
    )

    y_post = y * posterior_temperature
    log_posterior = (
        jnp.log(posterior_temperature + eps)
        - y_post
        + posterior_log_odds
        - 2.0 * jnp.log(1.0 + jnp.exp(-y_post + posterior_log_odds) + eps)
    )
    return log_posterior - log_prior


@jax.custom_jvp
def safe_log(value: Array, replacement_value: float = -100.0, eps: float = 1e-8) -> Array:
    """log(value + 1e-8) with NaN/Inf replaced by -100 (spair/trainer.py:97-101).

    Redesign (numerics): carries a custom derivative so the gradient is total.
    The autodiff cotangent of the ``where`` is ``select(bad, 0, g) / (value +
    eps)``, and XLA's algebraic simplifier can constant-fold the epsilon away
    across an upstream subtraction — e.g. ``(1 - pred) + 1e-8`` reassociates to
    ``(1 + 1e-8) - pred`` whose folded constant rounds to exactly ``1.0f`` —
    so at ``pred == 1`` the denominator becomes 0 and the masked cotangent is
    ``0/0 = NaN``, which poisoned every SPAIR gradient once z_pres saturated
    (observed as the round-2 quality-run stall; repro in tests). The custom
    derivative applies the replacement mask AFTER the division, so a folded
    ``inf`` becomes a clean 0 on the replaced branch and the reference's
    ``1/(value+eps)`` everywhere else.
    """
    log_value = jnp.log(value + eps)
    bad = jnp.logical_or(jnp.isnan(log_value), jnp.isinf(log_value))
    return jnp.where(bad, jnp.full_like(log_value, replacement_value), log_value)


@safe_log.defjvp
def _safe_log_jvp(primals, tangents):
    value, replacement_value, eps = primals
    t_value = tangents[0]
    log_value = jnp.log(value + eps)
    bad = jnp.logical_or(jnp.isnan(log_value), jnp.isinf(log_value))
    out = jnp.where(bad, jnp.full_like(log_value, replacement_value), log_value)
    deriv = 1.0 / (value + eps)
    deriv = jnp.where(jnp.logical_or(bad, ~jnp.isfinite(deriv)),
                      jnp.zeros_like(deriv), deriv)
    return out, deriv * t_value


def bernoulli_xent(label: Array, pred: Array) -> Array:
    """Elementwise Bernoulli cross-entropy with safe logs (spair/trainer.py:103-104)."""
    return -(label * safe_log(pred) + (1.0 - label) * safe_log(1.0 - pred))
