"""STN tests: the separable-matmul sampler vs a direct numpy port of the
reference's gather-based bilinear sampler (spair/utils.py:119-330)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from split_vae_tpu.ops import stn


def _ref_params(z_where, cell_ratio=stn.DEFAULT_CELL_RATIO):
    """Numpy oracle of spair/utils.py:99-116,142-145,180-183."""
    b, gh, gw, _ = z_where.shape
    sig = lambda v: 1.0 / (1.0 + np.exp(-v))
    bias_tx = np.zeros((gh, gw))
    bias_ty = np.zeros((gh, gw))
    for i in range(gh):
        i_p = 0.0 if gh == 1 else (2.0 - cell_ratio) * i / (gh - 1) - (1 - 0.5 * cell_ratio)
        for j in range(gw):
            j_p = 0.0 if gw == 1 else (2.0 - cell_ratio) * j / (gw - 1) - (1 - 0.5 * cell_ratio)
            bias_ty[i, j] = i_p
            bias_tx[i, j] = j_p
    sx = 0.5 * sig(z_where[..., 0])
    sy = 0.5 * sig(z_where[..., 1])
    tx = 0.5 * np.tanh(z_where[..., 2]) + bias_tx
    ty = 0.5 * np.tanh(z_where[..., 3]) + bias_ty
    k = gh * gw
    return (sx.reshape(b, k), sy.reshape(b, k), tx.reshape(b, k), ty.reshape(b, k))


def _ref_bilinear(img, xs, ys, per_cell_img):
    """Numpy oracle of the 4-corner gather sampler (spair/utils.py:202-330).

    img: [B,H,W,C] (crop) or [B,K,h,w,C] (paste); xs/ys: [B,K,Wout]/[B,K,Hout]
    pixel coords.
    """
    b, k = xs.shape[:2]
    hout, wout = ys.shape[2], xs.shape[2]
    if per_cell_img:
        hx, wx = img.shape[2], img.shape[3]
    else:
        hx, wx = img.shape[1], img.shape[2]
    c = img.shape[-1]
    out = np.zeros((b, k, hout, wout, c), np.float64)
    for bi in range(b):
        for ki in range(k):
            x = xs[bi, ki][None, :].repeat(hout, 0)  # [Hout, Wout]
            y = ys[bi, ki][:, None].repeat(wout, 1)
            x0 = np.floor(x); x1 = x0 + 1
            y0 = np.floor(y); y1 = y0 + 1
            x0 = np.clip(x0, 0, wx - 1); x1 = np.clip(x1, 0, wx - 1)
            y0 = np.clip(y0, 0, hx - 1); y1 = np.clip(y1, 0, hx - 1)
            wa = (x1 - x) * (y1 - y)
            wb = (x1 - x) * (y - y0)
            wc = (x - x0) * (y1 - y)
            wd = (x - x0) * (y - y0)
            src = img[bi, ki] if per_cell_img else img[bi]
            ia = src[y0.astype(int), x0.astype(int)]
            ib = src[y1.astype(int), x0.astype(int)]
            ic = src[y0.astype(int), x1.astype(int)]
            id_ = src[y1.astype(int), x1.astype(int)]
            out[bi, ki] = (wa[..., None] * ia + wb[..., None] * ib
                           + wc[..., None] * ic + wd[..., None] * id_)
    return out


def _coords(scale, trans, out_size, in_size):
    grid = np.linspace(-1, 1, out_size)
    pos = scale[..., None] * grid + trans[..., None]
    return 0.5 * (pos + 1) * (in_size - 1)


def test_crop_matches_reference_gather(rng):
    img = rng.rand(2, 48, 48, 3).astype(np.float32)
    z_where = rng.randn(2, 4, 4, 4).astype(np.float32)
    got, bbox = stn.stn_crop(jnp.array(img), jnp.array(z_where), (32, 32))
    sx, sy, tx, ty = _ref_params(z_where.astype(np.float64))
    xs = _coords(sx, tx, 32, 48)
    ys = _coords(sy, ty, 32, 48)
    want = _ref_bilinear(img.astype(np.float64), xs, ys, per_cell_img=False)
    np.testing.assert_allclose(np.array(got), want, atol=2e-5)
    assert bbox.shape == (2, 16, 4)


def test_paste_matches_reference_gather(rng):
    objs = rng.rand(2, 16, 32, 32, 4).astype(np.float32)
    z_where = rng.randn(2, 4, 4, 4).astype(np.float32)
    got, _ = stn.stn_paste(jnp.array(objs), jnp.array(z_where), (48, 48))
    sx, sy, tx, ty = _ref_params(z_where.astype(np.float64))
    eps = 1e-5
    xs = _coords(1 / (sx + eps), -tx / (sx + eps), 48, 32)
    ys = _coords(1 / (sy + eps), -ty / (sy + eps), 48, 32)
    want = _ref_bilinear(objs.astype(np.float64), xs, ys, per_cell_img=True)
    np.testing.assert_allclose(np.array(got), want, atol=2e-4)


def test_bbox_matches_reference_formula(rng):
    z_where = rng.randn(1, 4, 4, 4).astype(np.float64)
    sx, sy, tx, ty = _ref_params(z_where)
    _, bbox = stn.stn_crop(jnp.zeros((1, 48, 48, 3)), jnp.array(z_where, jnp.float32), (32, 32))
    want = np.stack(
        [(ty + 1) / 2 - sy / 4, (tx + 1) / 2 - sx / 4,
         (ty + 1) / 2 + sy / 4, (tx + 1) / 2 + sx / 4], axis=-1)
    np.testing.assert_allclose(np.array(bbox), want, atol=1e-5)


def test_out_of_bounds_samples_are_zero():
    """Samples outside the image must net to zero (reference clip semantics)."""
    img = jnp.ones((1, 48, 48, 3))
    # Large positive translation bias pushes a corner cell's glimpse off-image:
    z_where = np.zeros((1, 4, 4, 4), np.float32)
    z_where[..., 2] = 20.0  # tanh -> +0.5 shift on top of corner bias
    z_where[..., 0] = 20.0  # sx -> 0.5 (wide box)
    out, _ = stn.stn_crop(img, jnp.array(z_where), (32, 32))
    # Cell (0, 3) is biased right already; +0.5 pushes samples past x=1.
    cell = np.array(out[0, 3])
    assert cell.min() >= -1e-6
    # Rightmost columns must be exactly 0 where coords exceed W-1.
    assert np.allclose(cell[:, -1, :], 0.0, atol=1e-6)


def test_crop_identity_box():
    """A box spanning the full image reproduces a (bilinear) resize of it."""
    rng = np.random.RandomState(1)
    img = rng.rand(1, 32, 32, 1).astype(np.float32)
    # sx = 0.5*sigmoid(w0) can't reach 1, so compare against the numpy oracle
    # at the max representable scale instead of exact identity.
    z_where = np.full((1, 1, 1, 4), 0.0, np.float32)
    got, _ = stn.stn_crop(jnp.array(img), jnp.array(z_where), (16, 16), cell_ratio=1.0)
    sx, sy, tx, ty = _ref_params(z_where.astype(np.float64), cell_ratio=1.0)
    xs = _coords(sx, tx, 16, 32)
    ys = _coords(sy, ty, 16, 32)
    want = _ref_bilinear(img.astype(np.float64), xs, ys, per_cell_img=False)
    np.testing.assert_allclose(np.array(got), want, atol=1e-5)


def test_crop_is_differentiable(rng):
    img = jnp.array(rng.rand(1, 48, 48, 3).astype(np.float32))
    z_where = jnp.array(rng.randn(1, 4, 4, 4).astype(np.float32))

    def loss(zw):
        g, _ = stn.stn_crop(img, zw, (32, 32))
        return jnp.sum(g**2)

    grads = jax.grad(loss)(z_where)
    assert np.isfinite(np.array(grads)).all()
    assert float(jnp.abs(grads).sum()) > 0.0


def test_paste_is_differentiable(rng):
    objs = jnp.array(rng.rand(1, 16, 32, 32, 4).astype(np.float32))
    z_where = jnp.array(rng.randn(1, 4, 4, 4).astype(np.float32))

    def loss(o, zw):
        c, _ = stn.stn_paste(o, zw, (48, 48))
        return jnp.sum(c**2)

    go, gz = jax.grad(loss, argnums=(0, 1))(objs, z_where)
    assert np.isfinite(np.array(go)).all() and np.isfinite(np.array(gz)).all()
