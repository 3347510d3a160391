"""Independent full-forward golden tests.

A pure-numpy implementation of the ENTIRE model graph — explicit SAME-padding
conv arithmetic, half-pixel bilinear resize, softplus heads, STN gather
sampler, renderer compositing — is loaded with the *same* flax params and must
reproduce ``model.apply`` and the full ELBO to <= 1e-4. This converts
"loss formulas match my port" (tests/test_loss_golden.py) into "the whole
graph matches an independent implementation": the closest achievable proxy to
TF2 parity in a no-egress image (the reference graph is vae/model.py:100-169,
spair/spair.py:368-579 + spair/trainer.py:136-234).

Sampling noise is factored out exactly, not approximated: every eps is derived
from the jax outputs ((z - mean) / sigma; pre_sigmoid*tau - logits for the
Concrete), so any numerical disagreement is in the deterministic math.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from split_vae_tpu.models.vae import LGVae
from split_vae_tpu.models.spair import SPAIR
from split_vae_tpu.train import losses
from split_vae_tpu.core.config import SpairConfig

from test_loss_golden import _np_dll, _np_kl
from test_count_prior import _np_reference as np_count_prior_kl
from test_stn import _coords, _ref_bilinear, _ref_params

# ----------------------------------------------------------------------------
# Independent numpy layer zoo (float64 throughout)
# ----------------------------------------------------------------------------


def np_relu(x):
    return np.maximum(x, 0.0)


def np_sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def np_softplus(x):
    return np.log1p(np.exp(-np.abs(x))) + np.maximum(x, 0.0)


def np_dense(p, x):
    return x @ np.asarray(p["kernel"], np.float64) + np.asarray(p["bias"], np.float64)


def np_conv_same(p, x, stride=1):
    """NHWC conv with explicit TF/XLA 'SAME' padding arithmetic:
    out = ceil(in/stride); pad_total = max((out-1)*stride + k - in, 0);
    pad_before = pad_total // 2 (the larger half goes after)."""
    k = np.asarray(p["kernel"], np.float64)  # [kh, kw, Cin, Cout]
    bias = np.asarray(p["bias"], np.float64)
    B, H, W, Ci = x.shape
    kh, kw, _, Co = k.shape
    s = stride
    oh, ow = -(-H // s), -(-W // s)
    ph = max((oh - 1) * s + kh - H, 0)
    pw = max((ow - 1) * s + kw - W, 0)
    pt, pl = ph // 2, pw // 2
    xp = np.zeros((B, H + ph, W + pw, Ci), np.float64)
    xp[:, pt : pt + H, pl : pl + W] = x
    out = np.zeros((B, oh, ow, Co), np.float64)
    for i in range(kh):
        for j in range(kw):
            patch = xp[:, i : i + (oh - 1) * s + 1 : s, j : j + (ow - 1) * s + 1 : s, :]
            out += np.einsum("bhwc,co->bhwo", patch, k[i, j])
    return out + bias


def np_resize_bilinear(x, oh, ow):
    """Half-pixel-center bilinear resize with edge clamping (upsampling only;
    equals tf.image.resize / jax.image.resize for scale >= 1)."""
    B, H, W, C = x.shape

    def taps(o, n):
        src = (np.arange(o) + 0.5) * (n / o) - 0.5
        i0 = np.floor(src)
        frac = src - i0
        lo = np.clip(i0, 0, n - 1).astype(int)
        hi = np.clip(i0 + 1, 0, n - 1).astype(int)
        return lo, hi, frac

    y0, y1, fy = taps(oh, H)
    x0, x1, fx = taps(ow, W)
    fy = fy[None, :, None, None]
    fx = fx[None, None, :, None]
    top = x[:, y0][:, :, x0] * (1 - fx) + x[:, y0][:, :, x1] * fx
    bot = x[:, y1][:, :, x0] * (1 - fx) + x[:, y1][:, :, x1] * fx
    return top * (1 - fy) + bot * fy


def np_flatten(x):
    return x.reshape(x.shape[0], -1)


# ----------------------------------------------------------------------------
# LGVae (vae/model.py:100-114, 145-169, 189-200)
# ----------------------------------------------------------------------------


def np_conv_encoder(p, x, eps):
    h = np_relu(np_conv_same(p["Conv_0"], x, 2))
    h = np_relu(np_conv_same(p["Conv_1"], h, 2))
    h = np_relu(np_conv_same(p["Conv_2"], h, 2))
    h = np_flatten(h)
    mean = np_dense(p["Dense_0"], h)
    sig = np_softplus(np_dense(p["Dense_1"], h))
    return mean + sig * eps, mean, sig


def np_conv_decoder(p, z, hw):
    h, w = hw
    x = np_relu(np_dense(p["Dense_0"], z))
    x = x.reshape(-1, h // 8, w // 8, 128)
    x = np_relu(np_conv_same(p["Conv_0"], x))
    x = np_resize_bilinear(x, h // 4, w // 4)
    x = np_relu(np_conv_same(p["Conv_1"], x))
    x = np_resize_bilinear(x, h // 2, w // 2)
    x = np_relu(np_conv_same(p["Conv_2"], x))
    x = np_resize_bilinear(x, h, w)
    x = np_conv_same(p["Conv_3"], x)
    half = x.shape[-1] // 2
    return x[..., :half], x[..., half:]


def test_lgvae_full_forward_and_elbo_match_numpy():
    hw = (16, 16)
    model = LGVae(global_latent_dims=6, local_latent_dims=5, image_hw=hw)
    rng = np.random.RandomState(0)
    images = np.clip(rng.randn(2, hw[0], hw[1], 6) * 0.5, -1, 1).astype(np.float32)

    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.asarray(images))
    params = variables["params"]
    out = model.apply({"params": params}, jnp.asarray(images),
                      rngs={"sample": jax.random.PRNGKey(2)})

    p = jax.tree.map(np.asarray, jax.device_get(params))
    x64 = images.astype(np.float64)

    eps_x = (np.asarray(out.z_x) - np.asarray(out.z_mean_x)) / np.asarray(out.z_sig_x)
    eps_h = (np.asarray(out.z_x_hat) - np.asarray(out.z_mean_x_hat)) / np.asarray(
        out.z_sig_x_hat)

    z_x, mean_x, sig_x = np_conv_encoder(p["encoder_x"], x64[..., :3], eps_x)
    z_h, mean_h, sig_h = np_conv_encoder(p["encoder_x_hat"], x64[..., 3:], eps_h)
    x_mean, x_log_scale = np_conv_decoder(
        p["decoder_x"], np.concatenate([z_x, z_h], axis=1), hw)
    xh_mean, xh_log_scale = np_conv_decoder(p["decoder_x_hat"], z_h, hw)

    atol = 5e-5
    np.testing.assert_allclose(np.asarray(out.z_mean_x), mean_x, atol=atol)
    np.testing.assert_allclose(np.asarray(out.z_sig_x), sig_x, atol=atol)
    np.testing.assert_allclose(np.asarray(out.z_mean_x_hat), mean_h, atol=atol)
    np.testing.assert_allclose(np.asarray(out.z_sig_x_hat), sig_h, atol=atol)
    np.testing.assert_allclose(np.asarray(out.x_mean), x_mean, atol=5e-4)
    np.testing.assert_allclose(np.asarray(out.x_log_scale), x_log_scale, atol=5e-4)
    np.testing.assert_allclose(np.asarray(out.x_hat_mean), xh_mean, atol=5e-4)

    # Full ELBO: independent numpy pipeline end-to-end vs the jitted loss.
    beta = 7.0
    total_jax, _ = losses.lgvae_loss(out, jnp.asarray(images), beta)
    want_xr = _np_dll(x64[..., :3], x_mean, x_log_scale).reshape(2, -1).sum(1).mean()
    want_hr = _np_dll(x64[..., 3:], xh_mean, xh_log_scale).reshape(2, -1).sum(1).mean()
    want_kl = beta * _np_kl(np.concatenate([mean_x, mean_h], 1),
                            np.concatenate([sig_x, sig_h], 1))
    want_total = want_xr + want_hr + want_kl
    np.testing.assert_allclose(float(total_jax), want_total, rtol=1e-4)


# ----------------------------------------------------------------------------
# SPAIR (spair/spair.py:368-579 + spair/trainer.py:136-234, test branch)
# ----------------------------------------------------------------------------


def np_obj_encoder(p, glimpses, eps):
    b, k, gh, gw, c = glimpses.shape
    x = glimpses.reshape(b * k, gh, gw, c)
    x = np_relu(np_conv_same(p["Conv_0"], x, 2))
    x = np_relu(np_conv_same(p["Conv_1"], x, 2))
    x = np_flatten(x)
    hdn = np_relu(np_dense(p["Dense_0"], x))
    mean = np_dense(p["Dense_1"], hdn)
    sig = np_softplus(np_dense(p["Dense_2"], hdn))
    return mean + sig * eps, mean, sig


def np_obj_decoder(p, z_what, object_size, num_channel):
    os_ = object_size
    x = np_relu(np_dense(p["Dense_0"], z_what))
    x = np_relu(np_dense(p["Dense_1"], x))
    x = x.reshape(-1, os_ // 4, os_ // 4, 32)
    x = np_relu(np_conv_same(p["Conv_0"], x))
    x = np_resize_bilinear(x, os_ // 2, os_ // 2)
    x = np_relu(np_conv_same(p["Conv_1"], x))
    x = np_resize_bilinear(x, os_, os_)
    x = np_conv_same(p["Conv_2"], x)
    return np_sigmoid(x[..., :num_channel]), np_sigmoid(x[..., num_channel:])


def np_render_test_mode(obj_full, bg, z_depth_grid, z_pres_logits_grid, num_channel):
    """spair/spair.py:534-579, training=False branch: z_pres =
    max(round(sigmoid(logits)), 1e-8), no rgb noise."""
    b = z_depth_grid.shape[0]
    k = z_depth_grid.shape[1] * z_depth_grid.shape[2]
    z_depth = z_depth_grid.reshape(b, k, 1, 1, 1)
    zp = np_sigmoid(z_pres_logits_grid).reshape(b, k, 1, 1, 1)
    zp = np.maximum(np.round(zp), 1e-8)
    rgb = np.clip(obj_full[..., :num_channel], 0.0, 1.0)
    alpha = np.clip(obj_full[..., num_channel:], 1e-8, 1.0)
    transparency = zp * alpha
    importance = zp * alpha * (np_sigmoid(-z_depth) + 0.5)
    unnorm = (importance * rgb).sum(axis=1)
    norm_const = importance.sum(axis=1)
    canvas = unnorm / (norm_const + 1e-8)
    alpha_canvas = (transparency * importance).sum(axis=1) / (norm_const + 1e-8)
    return alpha_canvas * canvas + (1.0 - alpha_canvas) * bg


def _np_kl_safe(m, s):
    lv = np.log(s**2 + 1e-8)
    kl = -0.5 * (1.0 + lv - m**2 - np.exp(lv))
    return kl.reshape(m.shape[0], -1).sum(1).mean()


def _np_kl2_safe(m1, s1, m2, s2):
    kl = (np.log(s2 + 1e-8) - np.log(s1 + 1e-8)
          + (s1**2 + (m1 - m2) ** 2) / (2.0 * s2**2) - 0.5)
    return kl.reshape(m1.shape[0], -1).sum(1).mean()


def _np_bernoulli_xent(label, pred):
    sl = lambda v: np.log(v + 1e-8)
    xent = -(label * sl(pred) + (1.0 - label) * sl(1.0 - pred))
    return xent.reshape(label.shape[0], -1).sum(1).mean()


def test_spair_full_forward_and_total_loss_match_numpy():
    B, size, os_, latent, tau = 2, 48, 32, 6, 0.8
    config = SpairConfig(model="spair", batch_size=B, latent_size=latent,
                         object_size=os_, tau=tau, image_size=(size, size, 3))
    model = SPAIR(image_hw=(size, size), object_size=os_, latent_size=latent,
                  tau=tau, num_channel=3)
    rng = np.random.RandomState(1)
    images = rng.uniform(0, 1, (B, size, size, 3)).astype(np.float32)

    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.asarray(images))
    params = variables["params"]
    out = model.apply({"params": params}, jnp.asarray(images), False,
                      rngs={"sample": jax.random.PRNGKey(2)})
    p = jax.tree.map(np.asarray, jax.device_get(params))
    pe, pd = p["encoder"], p["decoder"]

    g = lambda a: np.asarray(a, np.float64)
    x64 = images.astype(np.float64)
    gh = gw = 4
    K = gh * gw

    # --- derive every noise draw exactly from the jax outputs ---
    eps_where = ((g(out.z_where) - g(out.z_where_mean)) / g(out.z_where_sigma)
                 ).reshape(B * K, 4)
    eps_what = ((g(out.z_what) - g(out.z_what_mean)) / g(out.z_what_sigma)
                ).reshape(B * K, latent)
    eps_depth = ((g(out.z_depth) - g(out.z_depth_mean)) / g(out.z_depth_sigma)
                 ).reshape(B * K, 1)
    concrete_noise = (g(out.z_pres_pre_sigmoid) * tau - g(out.z_pres_logits)
                      ).reshape(B * K, 1)

    # --- backbone (spair/spair.py:381-387,416-421) ---
    h = np_relu(np_conv_same(pe["conv1"], x64, 2))
    h = np_relu(np_conv_same(pe["conv2"], h, 2))
    h = np_relu(np_conv_same(pe["conv3"], h, 3))
    h = np_relu(np_conv_same(pe["z1"], h))
    h = np_relu(np_conv_same(pe["z2"], h))
    z = np_relu(np_conv_same(pe["z3"], h))  # [B, 4, 4, 100]
    features = z.reshape(B * K, 100)

    # --- box net (spair/spair.py:430-440) ---
    wh = np_dense(pe["where_d3"], np_relu(np_dense(
        pe["where_d2"], np_relu(np_dense(pe["where_d1"], features)))))
    z_where_mean = wh[:, :4]
    z_where_sigma = np_softplus(wh[:, 4:8] - 1.0)
    features_1 = np_relu(wh[:, 8:])
    z_where = z_where_mean + z_where_sigma * eps_where
    np.testing.assert_allclose(g(out.z_where_mean).reshape(B * K, 4), z_where_mean,
                               atol=1e-4)

    # --- STN glimpse crop (spair/utils.py:119-330 gather oracle) ---
    zw_grid = z_where.reshape(B, gh, gw, 4)
    sx, sy, tx, ty = _ref_params(zw_grid)
    xs = _coords(sx, tx, os_, size)
    ys = _coords(sy, ty, os_, size)
    glimpses = _ref_bilinear(x64, xs, ys, per_cell_img=False)  # [B,K,os,os,3]
    np.testing.assert_allclose(g(out.all_glimpses).reshape(B, K, os_, os_, 3),
                               glimpses, atol=5e-4)

    # --- object encoder -> z_what (spair/spair.py:246-273) ---
    z_what, z_what_mean, z_what_sigma = np_obj_encoder(
        pe["obj_encoder"], glimpses, eps_what)
    np.testing.assert_allclose(g(out.z_what_mean).reshape(B * K, latent),
                               z_what_mean, atol=1e-3)

    # --- depth net (spair/spair.py:457-461) ---
    partial = np.concatenate([z_where, z_what], axis=1)
    layer_inp = np.concatenate([features, features_1, partial], axis=1)
    dh = np_dense(pe["depth_d2"], np_relu(np_dense(pe["depth_d1"], layer_inp)))
    z_depth_mean, z_depth_sigma = dh[:, :1], np_softplus(dh[:, 1:2])
    features_2 = np_relu(dh[:, 2:])
    z_depth = z_depth_mean + z_depth_sigma * eps_depth
    partial = np.concatenate([partial, z_depth], axis=1)

    # --- presence net (spair/spair.py:467-469) ---
    layer_inp = np.concatenate([features, features_2, partial], axis=1)
    z_pres_logits = np.clip(
        np_dense(pe["pres_d2"], np_relu(np_dense(pe["pres_d1"], layer_inp))),
        -10.0, 10.0)
    z_pres_pre = (z_pres_logits + concrete_noise) / tau
    z_pres = np_sigmoid(z_pres_pre)
    np.testing.assert_allclose(g(out.z_pres_logits).reshape(B * K, 1),
                               z_pres_logits, atol=1e-3)

    # --- decode + paste (spair/spair.py:341-366,500-532) ---
    rgb, alpha = np_obj_decoder(pd["ObjDecoder_0"], z_what, os_, 3)
    concat = np.concatenate([rgb, alpha], axis=-1).reshape(B, K, os_, os_, 4)
    eps = 1e-5
    pxs = _coords(1 / (sx + eps), -tx / (sx + eps), size, os_)
    pys = _coords(1 / (sy + eps), -ty / (sy + eps), size, os_)
    obj_full = _ref_bilinear(concat, pxs, pys, per_cell_img=True)

    # --- render, test mode (spair/spair.py:548-579) ---
    x_recon = np_render_test_mode(
        obj_full, 0.0, z_depth.reshape(B, gh, gw, 1),
        z_pres_logits.reshape(B, gh, gw, 1), 3)
    np.testing.assert_allclose(g(out.x_recon), x_recon, atol=2e-3)

    # --- full total loss, test branch (spair/trainer.py:237-261) ---
    total_jax, metrics_jax = losses.spair_loss(
        out, jnp.asarray(images), config, jnp.float32(0.0), training=False)

    xr = _np_bernoulli_xent(x64, x_recon)
    # KLs reduce as mean-over-batch, sum-over-cells: feed grid shapes [B, ...]
    grid = lambda v: v.reshape(B, gh, gw, -1)
    zwhat_kl = _np_kl_safe(grid(z_what_mean), grid(z_what_sigma))
    zdepth_kl = _np_kl_safe(grid(z_depth_mean), grid(z_depth_sigma))
    zwhere_kl = _np_kl_safe(grid(z_where_mean[:, 2:]), grid(z_where_sigma[:, 2:]))
    zzoom_kl = _np_kl2_safe(grid(z_where_mean[:, :2]), grid(z_where_sigma[:, :2]),
                            config.prior_z_zoom, 0.5)
    zpres_kl = np_count_prior_kl(
        z_pres.reshape(B, gh, gw, 1), z_pres_logits.reshape(B, gh, gw, 1),
        z_pres_pre.reshape(B, gh, gw, 1), 0.99, tau)
    obj_kls = (config.z_what_beta * zwhat_kl + zdepth_kl + zwhere_kl
               + zzoom_kl + zpres_kl)
    want_total = config.reconstruction_weight * xr + config.beta * obj_kls

    np.testing.assert_allclose(float(metrics_jax["x_recon_loss"]), xr, rtol=1e-4)
    np.testing.assert_allclose(float(metrics_jax["z_pres_kl_loss"]), zpres_kl,
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(float(total_jax), want_total, rtol=1e-4)
