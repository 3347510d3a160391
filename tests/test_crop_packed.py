"""Packed fused crop vs the jnp STN and the unpacked kernel (interpret)."""

import jax
import jax.numpy as jnp
import numpy as np

from tools.pallas_research.crop_fused import fused_stn_crop_apply
from tools.pallas_research.crop_packed import (
    crop_packing_supported, fused_stn_crop_packed)
from split_vae_tpu.ops import stn

B, K, HO, S = 2, 16, 32, 48


def _inputs(c, seed=0):
    rng = np.random.RandomState(seed)
    img = jnp.asarray(rng.rand(B, S, S, c).astype(np.float32))
    z_where = jnp.asarray(rng.randn(B, 4, 4, 4).astype(np.float32))
    sx, sy, tx, ty = stn.zwhere_to_params(z_where)
    xs = stn._sample_coords(sx, tx, HO, S)
    ys = stn._sample_coords(sy, ty, HO, S)
    wx = stn._interp_matrix(xs, S)  # [B, K, wo, W]
    wy = stn._interp_matrix(ys, S)  # [B, K, ho, H]
    return img, wy, wx, z_where


def test_packing_supported():
    assert crop_packing_supported((S, S), (HO, HO), 6)
    assert not crop_packing_supported((S, S), (30, 30), 6)


def test_forward_matches_unpacked_6ch():
    img, wy, wx, _ = _inputs(6)
    a = fused_stn_crop_packed(img, wy, wx, True)
    b = fused_stn_crop_apply(img, wy, wx, True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-6)


def test_forward_matches_stn_crop_oracle():
    img, wy, wx, z_where = _inputs(6, seed=1)
    got = fused_stn_crop_packed(img, wy, wx, True)
    want, _ = stn.stn_crop(img, z_where, (HO, HO))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)


def test_forward_3ch_odd_group():
    img, wy, wx, _ = _inputs(3, seed=2)
    a = fused_stn_crop_packed(img, wy, wx, True)
    b = fused_stn_crop_apply(img, wy, wx, True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-6)


def test_gradients_match_unpacked():
    img, wy, wx, _ = _inputs(6, seed=3)

    def loss(fn):
        def f(img, wy, wx):
            out = fn(img, wy, wx, True)
            return jnp.sum(out * jnp.sin(out))
        return f

    gp = jax.grad(loss(fused_stn_crop_packed), argnums=(0, 1, 2))(img, wy, wx)
    gu = jax.grad(loss(fused_stn_crop_apply), argnums=(0, 1, 2))(img, wy, wx)
    for name, a, b in zip(["img", "wy", "wx"], gp, gu):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5, err_msg=f"grad mismatch: {name}")


def test_value_and_grad_jit():
    img, wy, wx, _ = _inputs(6, seed=4)

    @jax.jit
    def f(img):
        return jnp.sum(fused_stn_crop_packed(img, wy, wx, True))

    v, g = jax.value_and_grad(f)(img)
    assert np.isfinite(float(v))
    assert np.isfinite(np.asarray(g)).all()
