"""Golden shape/dtype tests for the VAE family + loss finiteness + overfit."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from split_vae_tpu.core.state import create_train_state
from split_vae_tpu.models.vae import GMVae, LGGMVae, LGVae
from split_vae_tpu.nn.classifier import Classifier
from split_vae_tpu.train import losses

B, H, W = 4, 32, 32


def _init(model, in_ch=6, training_kwargs=None):
    x = jnp.zeros((B, H, W, in_ch))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        x, **(training_kwargs or {}),
    )
    return variables, x


def test_lgvae_forward_shapes():
    model = LGVae(global_latent_dims=16, local_latent_dims=8, image_hw=(H, W))
    variables, x = _init(model)
    out = model.apply(variables, x, rngs={"sample": jax.random.PRNGKey(3)})
    assert out.x_mean.shape == (B, H, W, 3)
    assert out.x_log_scale.shape == (B, H, W, 3)
    assert out.z_x.shape == (B, 16)
    assert out.z_x_hat.shape == (B, 8)
    assert out.z_sig_x.min() >= 0  # softplus head
    # 10-tuple like vae/model.py:200
    assert len(out) == 10


def test_lgvae_encode_decode_roundtrip_shapes():
    model = LGVae(global_latent_dims=16, local_latent_dims=8, image_hw=(H, W))
    variables, x = _init(model)
    z_x, z_l = model.apply(variables, x, method="encode", rngs={"sample": jax.random.PRNGKey(3)})
    xr, xhr = model.apply(variables, z_x, z_l, method="decode")
    assert xr.shape == (B, H, W, 3) and xhr.shape == (B, H, W, 3)
    assert float(xr.min()) >= 0.0 and float(xr.max()) <= 1.0  # rescale clip


def test_lggmvae_forward_shapes():
    model = LGGMVae(global_latent_dims=16, local_latent_dims=8, image_hw=(H, W),
                    y_size=10, tau=0.4)
    variables, x = _init(model)
    out = model.apply(variables, x, True,
                      rngs={"sample": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)})
    assert len(out) == 14  # vae/model.py:248
    assert out.y.shape == (B, 10)
    np.testing.assert_allclose(np.array(out.y.sum(axis=1)), 1.0, atol=1e-5)
    assert out.z_prior_mean.shape == (B, 16)
    # encode_y method parity (vae/model.py:268-270)
    pm, ps = model.apply(variables, jnp.eye(10)[:4], method="encode_y")
    assert pm.shape == (4, 16) and float(ps.min()) >= 0


def test_gmvae_forward_shapes():
    model = GMVae(global_latent_dims=16, image_hw=(H, W), y_size=10, tau=0.4)
    variables, x = _init(model)
    out = model.apply(variables, x, rngs={"sample": jax.random.PRNGKey(3)})
    assert len(out) == 9  # vae/model.py:297
    y, y_logits = model.apply(variables, x, method="get_y",
                              rngs={"sample": jax.random.PRNGKey(5)})
    assert y.shape == (B, 10) and y_logits.shape == (B, 10)


def test_classifier_shapes_and_batchstats():
    model = Classifier(latent_dims=64, target_shape=10)
    x = jnp.zeros((B, H, W, 3))
    variables = model.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, x)
    assert "batch_stats" in variables
    logits = model.apply(variables, x)
    assert logits.shape == (B, 10)
    logits, updates = model.apply(
        variables, x, True, rngs={"dropout": jax.random.PRNGKey(2)},
        mutable=["batch_stats"])
    assert logits.shape == (B, 10) and "batch_stats" in updates


@pytest.mark.parametrize("kind", ["lgvae", "lggmvae", "gmvae"])
def test_losses_finite(kind):
    if kind == "lgvae":
        model = LGVae(global_latent_dims=16, local_latent_dims=8, image_hw=(H, W))
    elif kind == "lggmvae":
        model = LGGMVae(global_latent_dims=16, local_latent_dims=8, image_hw=(H, W),
                        y_size=10, tau=0.4)
    else:
        model = GMVae(global_latent_dims=16, image_hw=(H, W), y_size=10, tau=0.4)
    variables, _ = _init(model)
    x = jnp.array(np.random.RandomState(0).uniform(-1, 1, (B, H, W, 6)), jnp.float32)
    out = model.apply(variables, x, rngs={"sample": jax.random.PRNGKey(3)})
    if kind == "lgvae":
        total, metrics = losses.lgvae_loss(out, x, beta=1.0)
    elif kind == "lggmvae":
        total, metrics = losses.lggmvae_loss(out, x, 1.0, 1.0, 10)
    else:
        total, metrics = losses.gmvae_loss(out, x, 1.0, 1.0, 10)
    assert np.isfinite(float(total))
    assert all(np.isfinite(float(v)) for v in metrics.values())


def test_lgvae_single_batch_overfit():
    """A few hundred Adam steps on one batch must slash the loss (integration)."""
    from split_vae_tpu.core.config import VaeConfig
    from split_vae_tpu.train.steps import make_vae_train_step

    config = VaeConfig(model="lgvae", beta=1.0, patch_size=2, batch_size=B,
                       global_latent_dims=16, local_latent_dims=16, learning_rate=1e-3)
    model = LGVae(16, 16, (H, W))
    state = create_train_state(model, jnp.zeros((B, H, W, 6)), optax.adam(1e-3), seed=0)
    step = make_vae_train_step(config)
    # Smooth images (a VAE can fit these quickly, unlike uint8 noise).
    yy, xx = np.mgrid[0:H, 0:W] / H
    imgs = np.stack([
        np.stack([np.sin(6 * xx + p), np.cos(4 * yy + p), xx * yy], axis=-1)
        for p in np.linspace(0, 3, B)
    ])
    batch = jnp.array(((imgs * 0.5 + 0.5) * 255).astype(np.uint8))
    first = None
    for i in range(500):
        state, metrics = step(state, batch)
        if i == 0:
            first = float(metrics["x_recon_loss"])
    last = float(metrics["x_recon_loss"])
    assert last < first * 0.8, (first, last)


def test_lgvae_celeba128_shapes():
    """CelebA128 path: decoder handles 128x128 (vae/data.py:127-129)."""
    model = LGVae(global_latent_dims=8, local_latent_dims=8, image_hw=(128, 128))
    x = jnp.zeros((2, 128, 128, 6))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x)
    out = model.apply(variables, x, rngs={"sample": jax.random.PRNGKey(2)})
    assert out.x_mean.shape == (2, 128, 128, 3)
