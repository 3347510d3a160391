"""Spatial Transformer (crop & paste) as separable MXU matmuls.

The reference STN (spair/utils.py:47-330) builds a per-cell affine grid and
bilinearly samples it with 4-corner ``gather_nd`` — a scatter/gather pattern
that maps poorly onto TPUs. The key observation for a TPU-native design: the
SPAIR affine is **axis-aligned** (A = [[sx,0,tx],[0,sy,ty]], no rotation or
shear, spair/utils.py:187-189), so bilinear sampling factorizes into two 1-D
interpolations:

    out[p, q] = sum_{i, j} Wy[p, i] * Wx[q, j] * img[i, j]

where ``Wy``/``Wx`` are sparse-banded interpolation-weight matrices built from
the 1-D sample coordinates. Each crop/paste then becomes two small batched
matmuls that run on the MXU — no gathers at all. The weight rows reproduce the
reference's clipping semantics exactly (spair/utils.py:229-246): coordinates
falling outside the image get a net weight of zero (both corner indices clip to
the same pixel and their weights cancel), so out-of-bounds samples are 0.

Parameter mapping (spair/utils.py:142-145):
    sx = 0.5 * sigmoid(z_where[..., 0])       # width scale, (0, 0.5)
    sy = 0.5 * sigmoid(z_where[..., 1])       # height scale
    tx = 0.5 * tanh(z_where[..., 2]) + bias_tx  # per-cell x center bias
    ty = 0.5 * tanh(z_where[..., 3]) + bias_ty

Cell biases place each cell's origin at its center with the reference's
hard-coded cell ratio (2*12)/48 (spair/utils.py:99-116).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

# Hard-coded in the reference: cell_width_ratio = (2.0 * 12) / 48 (spair/utils.py:102-103).
DEFAULT_CELL_RATIO = (2.0 * 12.0) / 48.0


@functools.lru_cache(maxsize=None)
def _cell_bias(grid_h: int, grid_w: int, cell_ratio: float) -> Tuple[tuple, tuple]:
    """Per-cell (tx, ty) center biases as nested tuples (hashable for jit).

    Reference: spair/utils.py:105-113 — i_p = (2-r)*i/(H-1) - (1 - r/2).
    """
    bias_ty = []
    bias_tx = []
    for i in range(grid_h):
        if grid_h == 1:
            i_p = 0.0  # single cell: centered (reference never hits this case)
        else:
            i_p = (2.0 - cell_ratio) * i / (grid_h - 1) - (1.0 - 0.5 * cell_ratio)
        bias_ty.append(i_p)
    for j in range(grid_w):
        if grid_w == 1:
            j_p = 0.0
        else:
            j_p = (2.0 - cell_ratio) * j / (grid_w - 1) - (1.0 - 0.5 * cell_ratio)
        bias_tx.append(j_p)
    return tuple(bias_tx), tuple(bias_ty)


def zwhere_to_params(
    z_where: Array, cell_ratio: float = DEFAULT_CELL_RATIO
) -> Tuple[Array, Array, Array, Array]:
    """Map raw z_where [B, gh, gw, 4] -> (sx, sy, tx, ty), each [B, gh*gw].

    Reference: spair/utils.py:142-145,180-183.
    """
    # Geometry stays f32: bf16 sample coordinates (8-bit mantissa over a
    # 0..47 pixel range) would quantize box positions by up to ~0.25 px.
    z_where = z_where.astype(jnp.float32)
    b, gh, gw, _ = z_where.shape
    bias_tx_1d, bias_ty_1d = _cell_bias(gh, gw, cell_ratio)
    bias_tx = jnp.asarray(bias_tx_1d, dtype=z_where.dtype)[None, :]  # [1, gw]
    bias_ty = jnp.asarray(bias_ty_1d, dtype=z_where.dtype)[:, None]  # [gh, 1]

    sx = 0.5 * jax.nn.sigmoid(z_where[..., 0])
    sy = 0.5 * jax.nn.sigmoid(z_where[..., 1])
    tx = 0.5 * jnp.tanh(z_where[..., 2]) + bias_tx[None]  # broadcast [1,1,gw]
    ty = 0.5 * jnp.tanh(z_where[..., 3]) + bias_ty[None]  # broadcast [1,gh,1]

    k = gh * gw
    return (sx.reshape(b, k), sy.reshape(b, k), tx.reshape(b, k), ty.reshape(b, k))


def zwhere_to_bbox(sx: Array, sy: Array, tx: Array, ty: Array) -> Array:
    """Normalized [ymin, xmin, ymax, xmax] corners, [B, K, 4].

    Reference: spair/utils.py:147-155 — centers mapped from [-1,1] to [0,1],
    half-extents sx/4, sy/4 (box_width = sx/2 in [-1,1] units -> /2 again).
    """
    box_h = sy / 2.0
    box_w = sx / 2.0
    cy = (ty + 1.0) / 2.0
    cx = (tx + 1.0) / 2.0
    return jnp.stack(
        [cy - box_h / 2.0, cx - box_w / 2.0, cy + box_h / 2.0, cx + box_w / 2.0], axis=-1
    )


def _interp_matrix(coords: Array, in_size: int) -> Array:
    """Build bilinear interpolation weight rows.

    coords: [..., n_out] sample positions in input pixel space.
    Returns [..., n_out, in_size] with the reference's clip-then-weight
    semantics (spair/utils.py:229-246): out-of-range samples net to zero.
    """
    x0 = jnp.floor(coords)
    x1 = x0 + 1.0
    x0c = jnp.clip(x0, 0.0, in_size - 1.0)
    x1c = jnp.clip(x1, 0.0, in_size - 1.0)
    w0 = x1c - coords  # weight on x0c
    w1 = coords - x0c  # weight on x1c

    idx = jax.lax.broadcasted_iota(jnp.int32, (in_size,), 0)
    one_hot0 = (x0c.astype(jnp.int32)[..., None] == idx).astype(coords.dtype)
    one_hot1 = (x1c.astype(jnp.int32)[..., None] == idx).astype(coords.dtype)
    return w0[..., None] * one_hot0 + w1[..., None] * one_hot1


def _sample_coords(scale: Array, trans: Array, out_size: int, in_size: int) -> Array:
    """Per-(batch, cell) 1-D sample coordinates in input pixel space.

    grid = linspace(-1, 1, out_size); pos = scale*grid + trans in [-1, 1];
    pixel = 0.5*(pos + 1)*(in_size - 1). Reference: spair/utils.py:81-95,
    193, 225-226.
    """
    grid = jnp.linspace(-1.0, 1.0, out_size, dtype=scale.dtype)
    pos = scale[..., None] * grid + trans[..., None]  # [B, K, out]
    return 0.5 * (pos + 1.0) * (in_size - 1)


def stn_crop(
    img: Array,
    z_where: Array,
    out_hw: Tuple[int, int],
    cell_ratio: float = DEFAULT_CELL_RATIO,
) -> Tuple[Array, Array]:
    """Crop per-cell glimpses from a full image (forward STN).

    img:     [B, H, W, C]
    z_where: [B, gh, gw, 4] raw network outputs
    Returns (glimpses [B, gh*gw, ho, wo, C], bbox [B, gh*gw, 4]).

    Reference behavior: spair/utils.py:119-200 with inverse=False.
    """
    h_in, w_in = img.shape[1], img.shape[2]
    ho, wo = out_hw
    sx, sy, tx, ty = zwhere_to_params(z_where, cell_ratio)
    bbox = zwhere_to_bbox(sx, sy, tx, ty)

    xs = _sample_coords(sx, tx, wo, w_in)  # [B, K, wo]
    ys = _sample_coords(sy, ty, ho, h_in)  # [B, K, ho]
    wx = _interp_matrix(xs, w_in)  # [B, K, wo, W]
    wy = _interp_matrix(ys, h_in)  # [B, K, ho, H]

    # out[b,k,p,q,c] = sum_{i,j} Wy[b,k,p,i] * img[b,i,j,c] * Wx[b,k,q,j]
    tmp = jnp.einsum("bkpi,bijc->bkpjc", wy, img)
    out = jnp.einsum("bkpjc,bkqj->bkpqc", tmp, wx)
    return out, bbox


def paste_interp_weights(
    z_where: Array,
    out_hw: Tuple[int, int],
    in_hw: Tuple[int, int],
    cell_ratio: float = DEFAULT_CELL_RATIO,
    eps: float = 1e-5,
) -> Tuple[Array, Array, Array]:
    """Interpolation weight matrices for the inverse (paste) transform.

    Returns (wy [B,K,H,h], wx [B,K,W,w], bbox [B,K,4]) so callers can feed the
    fused Pallas paste+render kernel while keeping the z_where -> weights chain
    in jnp autodiff.
    """
    wy, wx, bbox, _ = paste_interp_weights_ys(z_where, out_hw, in_hw, cell_ratio, eps)
    return wy, wx, bbox


def paste_interp_weights_ys(z_where, out_hw, in_hw,
                            cell_ratio=DEFAULT_CELL_RATIO, eps: float = 1e-5):
    """paste_interp_weights + the row sample coords ys [B,K,H] (used by the
    windowed render kernel to locate each cell's paste support)."""
    h_in, w_in = in_hw
    ho, wo = out_hw
    sx, sy, tx, ty = zwhere_to_params(z_where, cell_ratio)
    bbox = zwhere_to_bbox(sx, sy, tx, ty)
    sx_i = 1.0 / (sx + eps)
    sy_i = 1.0 / (sy + eps)
    tx_i = -tx / (sx + eps)
    ty_i = -ty / (sy + eps)
    xs = _sample_coords(sx_i, tx_i, wo, w_in)
    ys = _sample_coords(sy_i, ty_i, ho, h_in)
    wx = _interp_matrix(xs, w_in)
    wy = _interp_matrix(ys, h_in)
    return wy, wx, bbox, ys


def stn_paste(
    objs: Array,
    z_where: Array,
    out_hw: Tuple[int, int],
    cell_ratio: float = DEFAULT_CELL_RATIO,
    eps: float = 1e-5,
) -> Tuple[Array, Array]:
    """Paste per-cell objects back onto full-size canvases (inverse STN).

    objs:    [B, K, h, w, C] decoded objects (K = gh*gw)
    z_where: [B, gh, gw, 4] raw network outputs (same as used for crop)
    Returns (canvases [B, K, H, W, C], bbox [B, K, 4]).

    Reference behavior: spair/utils.py:158-162 — the affine is inverted
    (s' = 1/(s+1e-5), t' = -t/(s+1e-5)) and each cell samples from its own
    object image.
    """
    h_in, w_in = objs.shape[2], objs.shape[3]
    ho, wo = out_hw
    sx, sy, tx, ty = zwhere_to_params(z_where, cell_ratio)
    bbox = zwhere_to_bbox(sx, sy, tx, ty)

    sx_i = 1.0 / (sx + eps)
    sy_i = 1.0 / (sy + eps)
    tx_i = -tx / (sx + eps)
    ty_i = -ty / (sy + eps)

    xs = _sample_coords(sx_i, tx_i, wo, w_in)  # [B, K, W_out]
    ys = _sample_coords(sy_i, ty_i, ho, h_in)  # [B, K, H_out]
    wx = _interp_matrix(xs, w_in)  # [B, K, W_out, w]
    wy = _interp_matrix(ys, h_in)  # [B, K, H_out, h]

    tmp = jnp.einsum("bkpi,bkijc->bkpjc", wy, objs)
    out = jnp.einsum("bkpjc,bkqj->bkpqc", tmp, wx)
    return out, bbox
