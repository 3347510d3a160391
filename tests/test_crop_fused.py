"""Fused Pallas STN crop vs the jnp separable-matmul path (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from tools.pallas_research.crop_fused import fused_stn_crop
from split_vae_tpu.ops.stn import stn_crop

B, K, OS, S, C = 2, 16, 32, 48, 3


def _inputs(seed=0):
    rng = np.random.RandomState(seed)
    img = jnp.asarray(rng.rand(B, S, S, C).astype(np.float32))
    z_where = jnp.asarray(rng.randn(B, 4, 4, 4).astype(np.float32))
    return img, z_where


def test_forward_matches_stn_crop():
    img, z_where = _inputs()
    got, bbox_f = fused_stn_crop(img, z_where, (OS, OS), interpret=True)
    want, bbox = stn_crop(img, z_where, (OS, OS))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)
    np.testing.assert_allclose(np.asarray(bbox_f), np.asarray(bbox), atol=1e-6)


def test_gradients_match_stn_crop():
    img, z_where = _inputs(1)

    def loss_f(img, zw):
        g, _ = fused_stn_crop(img, zw, (OS, OS), interpret=True)
        return jnp.sum(g * jnp.sin(g))

    def loss_o(img, zw):
        g, _ = stn_crop(img, zw, (OS, OS))
        return jnp.sum(g * jnp.sin(g))

    gf = jax.grad(loss_f, argnums=(0, 1))(img, z_where)
    go = jax.grad(loss_o, argnums=(0, 1))(img, z_where)
    for name, a, b in zip(("img", "z_where"), gf, go):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                                   atol=2e-4, err_msg=name)


def test_jit_value_and_grad():
    img, z_where = _inputs(2)

    @jax.jit
    def f(img):
        g, _ = fused_stn_crop(img, z_where, (OS, OS), interpret=True)
        return jnp.sum(g)

    v, grad = jax.value_and_grad(f)(img)
    assert np.isfinite(float(v)) and np.isfinite(np.asarray(grad)).all()
