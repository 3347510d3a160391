"""Count-prior KL scan vs a direct numpy port of spair/trainer.py:45-94."""

import jax
import jax.numpy as jnp
import numpy as np

from split_vae_tpu.ops.count_prior import z_pres_count_kl


def _np_safe_log(v, eps=1e-8):
    out = np.log(v + eps)
    bad = ~np.isfinite(out)
    out[bad] = -100.0
    return out


def _np_concrete_kl(y, prior_log_odds, prior_t, post_log_odds, post_t, eps=1e-8):
    yp = y * prior_t
    log_prior = np.log(prior_t + eps) - yp + prior_log_odds - 2.0 * np.log(
        1.0 + np.exp(-yp + prior_log_odds) + eps)
    yq = y * post_t
    log_post = np.log(post_t + eps) - yq + post_log_odds - 2.0 * np.log(
        1.0 + np.exp(-yq + post_log_odds) + eps)
    return log_post - log_prior


def _np_reference(z_pres, z_pres_logits, z_pres_pre_sigmoid, prior_prob, temperature):
    """Direct numpy port of the reference's 16-cell unrolled loop."""
    b, h, w, _ = z_pres.shape
    k = h * w
    support = np.arange(k + 1, dtype=np.float64)
    cpp = 1.0 - prior_prob
    dist = (1 - cpp) * cpp**support
    dist = dist / max(dist.sum(), 1e-6)
    count_distribution = np.tile(dist[None], (b, 1))
    count_so_far = np.zeros((b, 1))
    obj_kl = []
    i = 0
    for hh in range(h):
        for ww in range(w):
            p_z_given_cz = np.maximum(support[None] - count_so_far, 0) / (k - i)
            p_z = (count_distribution[:, None, :] @ p_z_given_cz[:, :, None])[:, :, 0]
            prior_log_odds = _np_safe_log(p_z) - _np_safe_log(1 - p_z)
            obj_kl.append(_np_concrete_kl(
                z_pres_pre_sigmoid[:, hh, ww, :], prior_log_odds, temperature,
                z_pres_logits[:, hh, ww, :], temperature))
            sample = (z_pres[:, hh, ww, :] > 0.5).astype(np.float64)
            mult = sample * p_z_given_cz + (1 - sample) * (1 - p_z_given_cz)
            count_distribution = mult * count_distribution
            norm = np.maximum(count_distribution.sum(axis=1, keepdims=True), 1e-6)
            count_distribution = count_distribution / norm
            count_so_far += sample
            i += 1
    stacked = np.stack(obj_kl)[:, :, 0]  # [K, B]
    return stacked.T.sum(axis=1).mean()


def test_count_kl_matches_reference_loop(rng):
    b, h, w = 3, 4, 4
    logits = rng.randn(b, h, w, 1).astype(np.float64) * 3
    pre = rng.randn(b, h, w, 1).astype(np.float64) * 2
    pres = 1 / (1 + np.exp(-pre))
    for prior_prob in (0.1, 0.5, 0.99):
        want = _np_reference(pres, logits, pre, prior_prob, 0.8)
        got = z_pres_count_kl(
            jnp.array(pres, jnp.float32), jnp.array(logits, jnp.float32),
            jnp.array(pre, jnp.float32), jnp.float32(prior_prob), 0.8)
        np.testing.assert_allclose(float(got), want, rtol=2e-4)


def test_count_kl_jits_and_differentiates(rng):
    b, h, w = 2, 4, 4
    logits = jnp.array(rng.randn(b, h, w, 1).astype(np.float32))
    pre = jnp.array(rng.randn(b, h, w, 1).astype(np.float32))
    pres = jax.nn.sigmoid(pre)

    f = jax.jit(lambda l, p: z_pres_count_kl(jax.nn.sigmoid(p), l, p, jnp.float32(0.9), 0.8))
    val = f(logits, pre)
    assert np.isfinite(float(val))

    g = jax.grad(lambda l: z_pres_count_kl(pres, l, pre, jnp.float32(0.9), 0.8))(logits)
    assert np.isfinite(np.array(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_count_kl_unroll_equivalent(rng):
    """unroll only changes scheduling, never math (incl. gradients)."""
    b, h, w = 2, 4, 4
    logits = jnp.array(rng.randn(b, h, w, 1).astype(np.float32))
    pre = jnp.array(rng.randn(b, h, w, 1).astype(np.float32))
    pres = jax.nn.sigmoid(pre)

    def f(l, p, unroll):
        return z_pres_count_kl(pres, l, p, jnp.float32(0.7), 0.8, unroll=unroll)

    base = float(f(logits, pre, 1))
    gbase = jax.grad(f)(logits, pre, 1)
    for unroll in (4, 16):
        np.testing.assert_allclose(float(f(logits, pre, unroll)), base, rtol=1e-6)
        np.testing.assert_allclose(np.array(jax.grad(f)(logits, pre, unroll)),
                                   np.array(gbase), rtol=1e-5)
