"""Golden shape tests + loss finiteness + gradient flow for the SPAIR family."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from split_vae_tpu.core.config import SpairConfig
from split_vae_tpu.core.state import create_train_state
from split_vae_tpu.models.spair import LGSPAIR, SPAIR, get_spair_model
from split_vae_tpu.train import losses

B, S, OS = 2, 48, 32  # batch, image size, object size
RNGS = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}


def _cfg(**kw):
    cfg = SpairConfig(latent_size=16, bg_latent_size=4, local_latent_size=8, **kw)
    cfg.image_size = (S, S, 3)
    cfg.test_size = (S, S, 3)
    return cfg


def test_spair_forward_shapes():
    model = SPAIR(image_hw=(S, S), object_size=OS, latent_size=16, tau=0.8)
    x = jnp.zeros((B, S, S, 3))
    variables = model.init(RNGS, x)
    out = model.apply(variables, x, rngs={"sample": jax.random.PRNGKey(2)})
    assert out.x_recon.shape == (B, S, S, 3)
    assert out.z_what.shape == (B, 4, 4, 16)
    assert out.z_where.shape == (B, 4, 4, 4)
    assert out.z_depth.shape == (B, 4, 4, 1)
    assert out.z_pres.shape == (B, 4, 4, 1)
    assert out.all_glimpses.shape == (B, 16, OS, OS, 3)
    assert out.obj_recon_unnorm.shape == (B, 16, OS, OS, 3)
    assert out.obj_recon_alpha.shape == (B, 16, OS, OS, 1)
    assert out.obj_full_recon_unnorm.shape == (B, 16, S, S, 4)
    assert out.obj_bbox_mask.shape == (B, 16, 4)
    assert out.z_bg is None and out.z_l is None
    # z_pres_logits clipped to +-10 (spair/spair.py:467)
    assert float(jnp.abs(out.z_pres_logits).max()) <= 10.0


def test_bg_spair_forward():
    model = SPAIR(image_hw=(S, S), object_size=OS, latent_size=16, tau=0.8,
                  bg=True, bg_latent_size=4)
    x = jnp.zeros((B, S, S, 3))
    variables = model.init(RNGS, x)
    out = model.apply(variables, x, rngs={"sample": jax.random.PRNGKey(2)})
    assert out.z_bg.shape == (B, 4)
    assert out.x_recon.shape == (B, S, S, 3)


@pytest.mark.parametrize("flags", [
    dict(),
    dict(dense_bg=True, dense_local=True),
    dict(concat_z_what=True),
    dict(concat_backbone=True),
    dict(concat_z_bg=True),
])
def test_lgspair_forward_variants(flags):
    model = LGSPAIR(image_hw=(S, S), object_size=OS, latent_size=16, tau=0.8,
                    bg_latent_size=4, local_latent_size=8, **flags)
    x = jnp.zeros((B, S, S, 6))
    variables = model.init(RNGS, x)
    out = model.apply(variables, x, rngs={"sample": jax.random.PRNGKey(2)})
    assert out.x_recon.shape == (B, S, S, 3)
    assert out.x_hat_recon.shape == (B, S, S, 3)
    assert out.z_l.shape == (B, 8)
    assert out.z_bg.shape == (B, 4)
    expected_what = 16 + (8 if flags.get("concat_z_what") else 0)
    assert out.z_what.shape == (B, 4, 4, expected_what)


def test_get_spair_model_factory():
    from split_vae_tpu.models.spair import LGGlimpseSPAIR

    assert isinstance(get_spair_model(_cfg(model="spair")), SPAIR)
    assert get_spair_model(_cfg(model="bg_spair")).bg
    assert isinstance(get_spair_model(_cfg(model="lg_spair")), LGSPAIR)
    # The reference NameErrors here (spair/spair.py:14-15); we ship a working one.
    assert isinstance(get_spair_model(_cfg(model="lg_glimpse_spair")), LGGlimpseSPAIR)
    with pytest.raises(NotImplementedError):
        get_spair_model(_cfg(model="nonexistent"))


def test_lg_glimpse_spair_forward_and_loss():
    cfg = _cfg(model="lg_glimpse_spair", patch_size=8)
    model = get_spair_model(cfg)
    x = jnp.array(np.random.RandomState(0).rand(B, S, S, 3), jnp.float32)
    variables = model.init(RNGS, x)
    out = model.apply(variables, x, True, rngs={"sample": jax.random.PRNGKey(2)})
    assert out.x_hat.shape == (B, 16, OS, OS, 3)
    assert out.x_hat_recon.shape == (B, 16, OS, OS, 3)
    assert out.z_l.shape == (B, 4, 4, 8)
    total, metrics = losses.spair_loss(out, x, cfg, jnp.float32(5.0), training=True)
    assert np.isfinite(float(total))
    assert "z_bg_kl_loss" in metrics and "x_hat_recon_loss" in metrics


@pytest.mark.parametrize("model_name,flags", [
    ("spair", {}),
    ("bg_spair", {}),
    ("lg_spair", {}),
    ("lg_spair", dict(split_z_l=True)),
    ("lg_spair", dict(concat_z_what=True)),
])
def test_spair_loss_finite_and_grads_flow(model_name, flags):
    cfg = _cfg(model=model_name, **flags)
    model = get_spair_model(cfg)
    ch = 6 if model_name == "lg_spair" else 3
    x = jnp.array(np.random.RandomState(0).rand(B, S, S, ch), jnp.float32)
    variables = model.init(RNGS, x)

    def loss_fn(params):
        out = model.apply({"params": params["params"]}, x, True,
                          rngs={"sample": jax.random.PRNGKey(2)})
        total, metrics = losses.spair_loss(out, x, cfg, jnp.float32(5.0), training=True)
        return total, metrics

    (total, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(variables)
    assert np.isfinite(float(total)), metrics
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    leaves = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # Gradient must reach every parameter group (no dead subgraphs).
    nonzero = sum(float(jnp.abs(g).sum()) > 0 for g in leaves)
    assert nonzero / len(leaves) > 0.9, f"{nonzero}/{len(leaves)} grads nonzero"


def test_spair_train_step_runs_and_improves():
    from split_vae_tpu.train.steps import make_spair_train_step

    cfg = _cfg(model="spair", learning_rate=1e-3, beta=0.1, anneal_until=1.0,
               z_pres_anneal_step=100.0)
    model = get_spair_model(cfg)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-3))
    state = create_train_state(model, jnp.zeros((B, S, S, 3)), tx, seed=0,
                               training_kwargs={"training": True})
    step = make_spair_train_step(cfg)
    rs = np.random.RandomState(0)
    canvas = np.zeros((B, S, S, 3), np.float32)
    canvas[:, 10:24, 10:24, 0] = 1.0  # one synthetic 'object'
    batch = jnp.array(canvas)
    first = None
    for i in range(60):
        state, metrics = step(state, batch)
        if i == 0:
            first = float(metrics["x_recon_loss"])
    last = float(metrics["x_recon_loss"])
    assert np.isfinite(last)
    assert last < first, (first, last)
