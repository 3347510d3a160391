"""Unit tests for ops/distributions.py against closed forms and scipy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats

from split_vae_tpu.ops import distributions as D


def test_gaussian_kl_closed_form(rng):
    mean = rng.randn(4, 7).astype(np.float32)
    sigma = np.abs(rng.randn(4, 7)).astype(np.float32) + 0.1
    got = D.gaussian_kl(jnp.array(mean), jnp.array(sigma))
    # Closed form per-dim: log(1/sigma) + (sigma^2 + mean^2)/2 - 1/2
    want = (-np.log(sigma) + (sigma**2 + mean**2) / 2 - 0.5).sum(axis=1).mean()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_gaussian_kl_standard_normal_is_zero():
    mean = jnp.zeros((3, 5))
    sigma = jnp.ones((3, 5))
    np.testing.assert_allclose(D.gaussian_kl(mean, sigma), 0.0, atol=1e-6)
    np.testing.assert_allclose(D.gaussian_kl_safe(mean, sigma), 0.0, atol=1e-5)


def test_gaussian_kl_two_reduces_to_standard(rng):
    mean = rng.randn(4, 7).astype(np.float32)
    sigma = np.abs(rng.randn(4, 7)).astype(np.float32) + 0.1
    got = D.gaussian_kl_two(jnp.array(mean), jnp.array(sigma), 0.0, 1.0)
    want = D.gaussian_kl(jnp.array(mean), jnp.array(sigma))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_gaussian_kl_two_4d_broadcast_scalar_prior(rng):
    mean = rng.randn(2, 4, 4, 2).astype(np.float32)
    sigma = np.abs(rng.randn(2, 4, 4, 2)).astype(np.float32) + 0.3
    got = D.gaussian_kl_two_safe(jnp.array(mean), jnp.array(sigma), 10.0, 0.5)
    per = (
        np.log(0.5)
        - np.log(sigma + 0.0)
        + (sigma**2 + (mean - 10.0) ** 2) / (2 * 0.25)
        - 0.5
    )
    # safe_log adds 1e-8 inside the log; tolerance absorbs it
    want = per.reshape(2, -1).sum(axis=1).mean()
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_discretized_logistic_matches_scipy_bulk(rng):
    """In the bulk (|x|<0.999, healthy scale) the NLL is -log of CDF delta."""
    x = np.clip(rng.uniform(-0.9, 0.9, size=(64,)), -0.9, 0.9).astype(np.float32)
    m = rng.uniform(-0.5, 0.5, size=(64,)).astype(np.float32)
    log_s = rng.uniform(-3, -1, size=(64,)).astype(np.float32)
    got = D.discretized_logistic_nll(jnp.array(x), jnp.array(m), jnp.array(log_s))
    s = np.exp(log_s)
    cdf = scipy.stats.logistic.cdf
    delta = cdf(x + 1 / 255, loc=m, scale=s) - cdf(x - 1 / 255, loc=m, scale=s)
    mask = delta > 1e-5
    np.testing.assert_allclose(np.array(got)[mask], -np.log(delta[mask]), rtol=1e-3)


def test_discretized_logistic_edges():
    """x < -0.999 uses log CDF(x+1/255); x > 0.999 uses log(1-CDF(x-1/255))."""
    m = jnp.zeros(())
    log_s = jnp.array(-2.0)
    s = np.exp(-2.0)
    lo = D.discretized_logistic_nll(jnp.array(-1.0), m, log_s)
    want_lo = -scipy.stats.logistic.logcdf(-1.0 + 1 / 255, scale=s)
    np.testing.assert_allclose(lo, want_lo, rtol=1e-5)
    hi = D.discretized_logistic_nll(jnp.array(1.0), m, log_s)
    want_hi = -scipy.stats.logistic.logsf(1.0 - 1 / 255, scale=s)
    np.testing.assert_allclose(hi, want_hi, rtol=1e-5)


def test_categorical_kl_uniform():
    logits = jnp.zeros((5, 10))
    np.testing.assert_allclose(D.categorical_kl_uniform(logits, 10), 0.0, atol=1e-5)
    peaked = jnp.array([[100.0] + [0.0] * 9])
    got = D.categorical_kl_uniform(peaked, 10)
    np.testing.assert_allclose(got, np.log(10.0), rtol=1e-4)


def test_gumbel_softmax_statistics(key):
    """Gumbel-softmax argmax frequencies should follow softmax(logits)."""
    logits = jnp.log(jnp.array([0.6, 0.3, 0.1]))
    samples = D.gumbel_softmax(key, jnp.tile(logits, (20000, 1)), tau=0.1)
    freq = np.bincount(np.argmax(np.array(samples), axis=1), minlength=3) / 20000
    np.testing.assert_allclose(freq, [0.6, 0.3, 0.1], atol=0.02)
    np.testing.assert_allclose(np.array(samples).sum(axis=1), 1.0, atol=1e-5)


def test_concrete_binary_sample_statistics(key):
    """sigmoid of pre-sigmoid samples should concentrate near sigmoid(logits/..)."""
    log_odds = jnp.full((50000,), 2.0)
    pre = D.concrete_binary_pre_sigmoid_sample(key, log_odds, temperature=0.5)
    frac_on = np.mean(np.array(jax.nn.sigmoid(pre)) > 0.5)
    # P(sigmoid(pre) > .5) = P(logistic noise > -log_odds) = sigmoid(log_odds)
    np.testing.assert_allclose(frac_on, jax.nn.sigmoid(2.0), atol=0.01)


def test_concrete_binary_kl_zero_when_prior_equals_posterior(key):
    log_odds = jnp.array([0.3, -1.2, 2.0])
    pre = D.concrete_binary_pre_sigmoid_sample(key, log_odds, 0.7)
    kl = D.concrete_binary_sample_kl(pre, log_odds, 0.7, log_odds, 0.7)
    np.testing.assert_allclose(kl, 0.0, atol=1e-5)


def test_safe_log_replaces_non_finite():
    out = D.safe_log(jnp.array([1.0, 0.0, -5.0]))
    assert np.isfinite(np.array(out)).all()
    np.testing.assert_allclose(out[0], 0.0, atol=1e-7)
    assert out[2] == -100.0


def test_bernoulli_xent_matches_manual():
    label = jnp.array([1.0, 0.0, 0.5])
    pred = jnp.array([0.9, 0.2, 0.5])
    got = D.bernoulli_xent(label, pred)
    want = -(np.array([1, 0, 0.5]) * np.log(np.array([0.9, 0.2, 0.5]) + 1e-8)
             + np.array([0, 1, 0.5]) * np.log(np.array([0.1, 0.8, 0.5]) + 1e-8))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_mean_sum():
    x = jnp.arange(24.0).reshape(2, 3, 4)
    np.testing.assert_allclose(D.mean_sum(x), np.arange(24.0).reshape(2, -1).sum(1).mean())


def test_reparameterize_statistics(key):
    mean = jnp.full((100000,), 2.0)
    sigma = jnp.full((100000,), 0.5)
    z = D.reparameterize(key, mean, sigma)
    assert abs(float(z.mean()) - 2.0) < 0.01
    assert abs(float(z.std()) - 0.5) < 0.01


def test_safe_log_grad_total_under_jit(xla_full_optimizations):
    """Regression: XLA folds '(1 - pred) + 1e-8' to '(1+1e-8) - pred' whose
    constant rounds to exactly 1.0f, so at pred==1 the safe_log cotangent was
    select(bad,0,g)/0 = NaN under jit (poisoned all SPAIR grads once z_pres
    saturated). safe_log's custom JVP must stay finite for any input, jitted
    or eager. (Needs full XLA optimizations — the folding is the bug trigger —
    hence the fixture; the suite default is fast-compile.)"""
    from split_vae_tpu.ops.distributions import bernoulli_xent, safe_log

    f = lambda p: bernoulli_xent(jnp.float32(0.5), p)
    for delta in [0.0, 1e-8, 1e-7, -1e-7, 0.5, -2.0]:
        p = jnp.float32(1.0) + jnp.float32(delta)
        for g in (jax.jit(jax.grad(f))(p), jax.grad(f)(p)):
            assert np.isfinite(float(g)), (delta, float(g))
    # interior derivative matches log(value + eps)
    g = jax.grad(safe_log)(jnp.float32(2.0))
    np.testing.assert_allclose(float(g), 1.0 / (2.0 + 1e-8), rtol=1e-6)
    # replaced branch has zero derivative
    assert float(jax.grad(safe_log)(jnp.float32(-1.0))) == 0.0
