"""Golden-value tests: full model losses vs independent numpy ports of the
reference loss formulas (vae/trainer.py:120-196, spair/trainer.py:136-234)."""

import jax
import jax.numpy as jnp
import numpy as np

from split_vae_tpu.models.vae import GMVaeOutput, LGGMVaeOutput, LGVaeOutput
from split_vae_tpu.train import losses

rs = np.random.RandomState(42)


def _np_dll(x, m, log_s):
    """Numpy port of discretised_logistic_loss (vae/trainer.py:21-38)."""
    centered = x - m
    inv = np.exp(-log_s)
    plus_in = inv * (centered + 1 / 255)
    min_in = inv * (centered - 1 / 255)
    sig = lambda v: 1 / (1 + np.exp(-v))
    softplus = lambda v: np.log1p(np.exp(-np.abs(v))) + np.maximum(v, 0)
    cdf_delta = sig(plus_in) - sig(min_in)
    mid_in = inv * centered
    log_pdf_mid = mid_in - log_s - 2 * softplus(mid_in)
    log_cdf_plus = plus_in - softplus(plus_in)
    log_one_minus = -softplus(min_in)
    log_prob = np.where(
        x < -0.999, log_cdf_plus,
        np.where(x > 0.999, log_one_minus,
                 np.where(cdf_delta > 1e-5, np.log(np.maximum(cdf_delta, 1e-12)),
                          log_pdf_mid - np.log(127.5))))
    return -log_prob


def _np_kl(m, s):
    lv = np.log(s**2)
    return (-0.5 * (1 + lv - m**2 - np.exp(lv))).reshape(m.shape[0], -1).sum(1).mean()


def _np_kl2(m1, s1, m2, s2):
    kl = np.log(s2) - np.log(s1) + (s1**2 + (m1 - m2) ** 2) / (2 * s2**2) - 0.5
    return kl.reshape(m1.shape[0], -1).sum(1).mean()


def test_lgvae_total_loss_golden():
    B, H, W = 3, 8, 8
    f = lambda *shape: rs.randn(*shape).astype(np.float32)
    pos = lambda *shape: np.abs(rs.randn(*shape)).astype(np.float32) + 0.1
    images = np.clip(f(B, H, W, 6), -1, 1)
    out = LGVaeOutput(
        x_mean=f(B, H, W, 3), x_log_scale=f(B, H, W, 3) * 0.3,
        z_x=f(B, 4), z_mean_x=f(B, 4), z_sig_x=pos(B, 4),
        z_x_hat=f(B, 5), x_hat_mean=f(B, H, W, 3),
        x_hat_log_scale=f(B, H, W, 3) * 0.3, z_mean_x_hat=f(B, 5),
        z_sig_x_hat=pos(B, 5))
    beta = 7.0
    total, metrics = losses.lgvae_loss(
        jax.tree.map(jnp.asarray, out), jnp.asarray(images), beta)

    x, x_hat = images[..., :3], images[..., 3:]
    want_xr = _np_dll(x, out.x_mean, out.x_log_scale).reshape(B, -1).sum(1).mean()
    want_hr = _np_dll(x_hat, out.x_hat_mean, out.x_hat_log_scale).reshape(B, -1).sum(1).mean()
    want_kl = beta * _np_kl(np.concatenate([out.z_mean_x, out.z_mean_x_hat], 1),
                            np.concatenate([out.z_sig_x, out.z_sig_x_hat], 1))
    np.testing.assert_allclose(float(metrics["x_recon_loss"]), want_xr, rtol=1e-5)
    np.testing.assert_allclose(float(metrics["x_hat_recon_loss"]), want_hr, rtol=1e-5)
    np.testing.assert_allclose(float(metrics["total_kl_loss"]), want_kl, rtol=1e-5)
    np.testing.assert_allclose(float(total), want_xr + want_hr + want_kl, rtol=1e-5)


def test_lggmvae_total_loss_golden():
    B, H, W, Y = 3, 8, 8, 6
    f = lambda *shape: rs.randn(*shape).astype(np.float32)
    pos = lambda *shape: np.abs(rs.randn(*shape)).astype(np.float32) + 0.1
    images = np.clip(f(B, H, W, 6), -1, 1)
    y_logits = f(B, Y)
    out = LGGMVaeOutput(
        x_mean=f(B, H, W, 3), x_log_scale=f(B, H, W, 3) * 0.3,
        z_x=f(B, 4), z_mean_x=f(B, 4), z_sig_x=pos(B, 4),
        z_x_hat=f(B, 5), x_hat_mean=f(B, H, W, 3),
        x_hat_log_scale=f(B, H, W, 3) * 0.3, z_mean_x_hat=f(B, 5),
        z_sig_x_hat=pos(B, 5), y=f(B, Y), y_logits=y_logits,
        z_prior_mean=f(B, 4), z_prior_sig=pos(B, 4))
    beta, alpha = 3.0, 2.0
    total, metrics = losses.lggmvae_loss(
        jax.tree.map(jnp.asarray, out), jnp.asarray(images), beta, alpha, Y)

    x, x_hat = images[..., :3], images[..., 3:]
    want_xr = _np_dll(x, out.x_mean, out.x_log_scale).reshape(B, -1).sum(1).mean()
    want_hr = _np_dll(x_hat, out.x_hat_mean, out.x_hat_log_scale).reshape(B, -1).sum(1).mean()
    want_xkl = _np_kl2(out.z_mean_x, out.z_sig_x, out.z_prior_mean, out.z_prior_sig)
    want_hkl = _np_kl2(out.z_mean_x_hat, out.z_sig_x_hat, 0.0, 1.0)
    py = np.exp(y_logits) / np.exp(y_logits).sum(1, keepdims=True)
    want_ykl = (py * (np.log(py + 1e-8) - np.log(1 / Y))).sum(1).mean()
    want = want_xr + want_hr + beta * (want_xkl + want_hkl) + alpha * want_ykl
    np.testing.assert_allclose(float(total), want, rtol=1e-4)


def test_gmvae_total_loss_golden():
    B, H, W, Y = 2, 8, 8, 4
    f = lambda *shape: rs.randn(*shape).astype(np.float32)
    pos = lambda *shape: np.abs(rs.randn(*shape)).astype(np.float32) + 0.1
    images = np.clip(f(B, H, W, 6), -1, 1)
    out = GMVaeOutput(
        x_mean=f(B, H, W, 3), x_log_scale=f(B, H, W, 3) * 0.3,
        z_x=f(B, 4), z_mean_x=f(B, 4), z_sig_x=pos(B, 4),
        y=f(B, Y), y_logits=f(B, Y), z_prior_mean=f(B, 4), z_prior_sig=pos(B, 4))
    total, metrics = losses.gmvae_loss(
        jax.tree.map(jnp.asarray, out), jnp.asarray(images), 2.0, 3.0, Y)
    x = images[..., :3]
    want_xr = _np_dll(x, out.x_mean, out.x_log_scale).reshape(B, -1).sum(1).mean()
    want_xkl = _np_kl2(out.z_mean_x, out.z_sig_x, out.z_prior_mean, out.z_prior_sig)
    py = np.exp(out.y_logits) / np.exp(out.y_logits).sum(1, keepdims=True)
    want_ykl = (py * (np.log(py + 1e-8) - np.log(1 / Y))).sum(1).mean()
    np.testing.assert_allclose(float(total), want_xr + 2 * want_xkl + 3 * want_ykl,
                               rtol=1e-4)


def test_spair_annealing_schedule_values():
    """Annealing formulas at specific steps (spair/trainer.py:150-166)."""
    from split_vae_tpu.train import schedules

    np.testing.assert_allclose(
        float(schedules.z_pres_prior_prob(jnp.float32(4999.0), 10000.0)),
        0.99 * 0.5, rtol=1e-6)
    np.testing.assert_allclose(
        float(schedules.z_pres_prior_prob(jnp.float32(1e6), 10000.0)), 0.99, rtol=1e-6)
    np.testing.assert_allclose(
        float(schedules.z_zoom_prior_mean(jnp.float32(-1.0), 0.0, 10.0, 10000.0)),
        10.0, rtol=1e-5)
    np.testing.assert_allclose(
        float(schedules.z_zoom_prior_mean(jnp.float32(1e6), 0.0, 10.0, 10000.0)),
        0.0, atol=1e-6)
    np.testing.assert_allclose(
        float(schedules.beta_warmup(jnp.float32(499.0), 2.0, 1000.0)), 1.0, rtol=1e-5)
    np.testing.assert_allclose(
        float(schedules.beta_warmup(jnp.float32(1e6), 2.0, 1000.0)), 2.0, rtol=1e-6)
    # GM LR decay: staircase 0.4^floor(step/1e6) (vae/main.py:67-72)
    sch = schedules.gm_lr_schedule(1e-4)
    np.testing.assert_allclose(float(sch(999_999)), 1e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sch(1_000_000)), 4e-5, rtol=1e-6)
