"""Sublane-packed fused render vs oracle + vs the unpacked kernel (interpret)."""

import jax
import jax.numpy as jnp
import numpy as np

from split_vae_tpu.ops.pallas.render_fused import fused_paste_render
from split_vae_tpu.ops.pallas.render_packed import (
    fused_paste_render_packed, packing_supported)
from split_vae_tpu.ops.stn import paste_interp_weights
from tests.test_render_fused import _inputs, _oracle, B, K, OS, S, C


def _packed(objs, z_where, z_pres, depth_w, bg, noise=0.0):
    wy, wx, _ = paste_interp_weights(z_where, (S, S), (OS, OS))
    return fused_paste_render_packed(objs, wy, wx, z_pres, depth_w, bg,
                                     jnp.int32(0), noise, True)


def test_packing_supported():
    assert packing_supported(OS, (S, S))
    assert not packing_supported(30, (S, S))


def test_forward_matches_oracle():
    objs, z_where, z_pres, depth_w, bg = _inputs(7)
    got = _packed(objs, z_where, z_pres, depth_w, bg)
    want = _oracle(objs, z_where, z_pres, depth_w, bg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)


def test_forward_matches_unpacked_kernel():
    objs, z_where, z_pres, depth_w, bg = _inputs(8)
    wy, wx, _ = paste_interp_weights(z_where, (S, S), (OS, OS))
    a = fused_paste_render_packed(objs, wy, wx, z_pres, depth_w, bg,
                                  jnp.int32(0), 0.0, True)
    b = fused_paste_render(objs, wy, wx, z_pres, depth_w, bg,
                           jnp.int32(0), 0.0, True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-6)


def test_gradients_match_oracle():
    objs, z_where, z_pres, depth_w, bg = _inputs(9)

    def loss_packed(objs, z_where, z_pres, depth_w, bg):
        out = _packed(objs, z_where, z_pres, depth_w, bg)
        return jnp.sum(out * jnp.cos(out))

    def loss_oracle(objs, z_where, z_pres, depth_w, bg):
        out = _oracle(objs, z_where, z_pres, depth_w, bg)
        return jnp.sum(out * jnp.cos(out))

    gf = jax.grad(loss_packed, argnums=(0, 1, 2, 3, 4))(
        objs, z_where, z_pres, depth_w, bg)
    go = jax.grad(loss_oracle, argnums=(0, 1, 2, 3, 4))(
        objs, z_where, z_pres, depth_w, bg)
    for name, a, b in zip(["objs", "z_where", "z_pres", "depth_w", "bg"], gf, go):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                                   atol=2e-4, err_msg=f"grad mismatch: {name}")


def test_value_and_grad_jit():
    objs, z_where, z_pres, depth_w, bg = _inputs(10)

    @jax.jit
    def f(objs):
        return jnp.sum(_packed(objs, z_where, z_pres, depth_w, bg))

    v, g = jax.value_and_grad(f)(objs)
    assert np.isfinite(float(v))
    assert np.isfinite(np.asarray(g)).all()
