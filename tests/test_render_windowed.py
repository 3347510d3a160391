"""Windowed fused render vs oracle + vs the full-canvas kernels (interpret).

The window math is exact for the out-of-window alpha floor (handled in
closed form); the only deviations are the dropped out-of-window render-noise
term (~1e-10) and 1e-16 cross terms in g_zp/g_wd — so noiseless comparisons
hold to regular float tolerances.
"""

import jax
import jax.numpy as jnp
import numpy as np

from split_vae_tpu.ops.pallas.render_fused import fused_paste_render
from tools.pallas_research.render_windowed import (
    WINDOW_ROWS, compute_window_starts, fused_paste_render_windowed,
    windowing_supported)
from split_vae_tpu.ops.stn import paste_interp_weights_ys
from tests.test_render_fused import _inputs, _oracle, B, K, OS, S, C


def _windowed(objs, z_where, z_pres, depth_w, bg, noise=0.0):
    wy, wx, _, ys = paste_interp_weights_ys(z_where, (S, S), (OS, OS))
    return fused_paste_render_windowed(objs, wy, wx, z_pres, depth_w, bg,
                                       jnp.int32(0), ys, noise, True)


def test_supported():
    assert windowing_supported(OS, (S, S))
    assert not windowing_supported(OS, (24, 24))


def test_window_covers_support():
    """Every paste-support row must land inside [start, start+WINDOW_ROWS)."""
    _, z_where, _, _, _ = _inputs(11)
    # extreme boxes too
    z_where = jnp.concatenate(
        [z_where, 10.0 * jnp.ones_like(z_where), -10.0 * jnp.ones_like(z_where)])
    _, _, _, ys = paste_interp_weights_ys(z_where, (S, S), (OS, OS))
    starts = np.asarray(compute_window_starts(ys, S, OS))
    valid = np.asarray((ys > -1.0) & (ys < float(OS)))
    rows = np.arange(S)[None, None, :]
    in_window = (rows >= starts[..., None]) & (rows < starts[..., None] + WINDOW_ROWS)
    assert not np.any(valid & ~in_window), "support row escaped its window"


def test_forward_matches_oracle():
    objs, z_where, z_pres, depth_w, bg = _inputs(12)
    got = _windowed(objs, z_where, z_pres, depth_w, bg)
    want = _oracle(objs, z_where, z_pres, depth_w, bg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)


def test_forward_matches_full_kernel():
    objs, z_where, z_pres, depth_w, bg = _inputs(13)
    wy, wx, _, ys = paste_interp_weights_ys(z_where, (S, S), (OS, OS))
    a = fused_paste_render_windowed(objs, wy, wx, z_pres, depth_w, bg,
                                    jnp.int32(0), ys, 0.0, True)
    b = fused_paste_render(objs, wy, wx, z_pres, depth_w, bg,
                           jnp.int32(0), 0.0, True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-6)


def test_gradients_match_oracle():
    objs, z_where, z_pres, depth_w, bg = _inputs(14)

    def loss_win(objs, z_where, z_pres, depth_w, bg):
        out = _windowed(objs, z_where, z_pres, depth_w, bg)
        return jnp.sum(out * jnp.cos(out))

    def loss_oracle(objs, z_where, z_pres, depth_w, bg):
        out = _oracle(objs, z_where, z_pres, depth_w, bg)
        return jnp.sum(out * jnp.cos(out))

    gw = jax.grad(loss_win, argnums=(0, 1, 2, 3, 4))(
        objs, z_where, z_pres, depth_w, bg)
    go = jax.grad(loss_oracle, argnums=(0, 1, 2, 3, 4))(
        objs, z_where, z_pres, depth_w, bg)
    for name, a, b in zip(["objs", "z_where", "z_pres", "depth_w", "bg"],
                          gw, go):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                                   atol=3e-4, err_msg=f"grad mismatch: {name}")


def test_value_and_grad_jit():
    objs, z_where, z_pres, depth_w, bg = _inputs(15)

    @jax.jit
    def f(objs):
        return jnp.sum(_windowed(objs, z_where, z_pres, depth_w, bg))

    v, g = jax.value_and_grad(f)(objs)
    assert np.isfinite(float(v))
    assert np.isfinite(np.asarray(g)).all()
