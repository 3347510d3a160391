"""Sublane-packed fused paste+composite Pallas kernel (v2 of render_fused).

Same math and call contract as ``render_fused.fused_paste_render`` (renderer
semantics from spair/spair.py:534-579 via nn/spair_nets.py:render), but the
per-cell work is packed so the MXU actually fills:

- the C+1 object channels are stacked along the *sublane* axis, so the paste
  is 2 big dots per cell instead of 2*(C+1) tiny ones:

      tmp   = obj_stack [C1*h, w] @ wx^T [w, W]          (1 MXU pass)
      paste = blockdiag(wy) [C1*H, C1*h] @ tmp           (ceil(C1*H/128) passes)

  For the SPAIR defaults (C=3, h=w=32, H=W=48) that is 3 MXU passes per cell
  against 8 for the unpacked kernel; the backward pass drops from ~20 to ~12.
  Row-blocks of a matmul are independent, so sublane stacking is exact; the
  blockdiag left factor keeps each channel's contraction separate.

- compositing/clipping/noise run on the stacked [C1*H, W] canvases, cutting
  VPU op count ~C1x as well.

Alignment contract: requires H % 8 == 0 and h % 8 == 0 (sublane blocks);
``fused_decode_render`` falls back to the unpacked kernel otherwise.

Note (Redesign): the in-kernel PRNG consumes random bits in a different order
than the unpacked kernel (one [C*H, W] Box-Muller draw per cell instead of C
per-channel draws), so the render-noise stream differs between the two
kernels. The noise is a train-time regularizer (spair/spair.py:539); forward
and backward of *this* kernel re-generate identical streams, which is the
only correctness requirement.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from split_vae_tpu.ops.pallas.render_fused import _normal_from_bits

Array = jax.Array

_EPS = 1e-8


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _blockdiag(block, n):
    """[m, k] -> [n*m, n*k] block-diagonal (static concat build)."""
    m, k = block.shape
    zeros = jnp.zeros((m, k), block.dtype)
    rows = [jnp.concatenate([block if j == i else zeros for j in range(n)], axis=1)
            for i in range(n)]
    return jnp.concatenate(rows, axis=0)


def _tile_rows(x, n):
    return jnp.concatenate([x] * n, axis=0)


def _cell_paste(objs_ref, wy_ref, wx_ref, k, c1):
    """Returns (tmp [C1*h, W], paste [C1*H, W], wyb [C1*H, C1*h])."""
    obj_stack = objs_ref[0, k]              # [C1*h, w]
    wx_t = wx_ref[0, k].T                   # [w, W]
    tmp = _dot(obj_stack, wx_t)             # [C1*h, W]
    wyb = _blockdiag(wy_ref[0, k], c1)      # [C1*H, C1*h]
    paste = _dot(wyb, tmp)                  # [C1*H, W]
    return tmp, paste, wyb


def _cell_activations(paste, zp, wd, c, hh, noise_scale):
    """Returns (rgb [C*H, W] clipped, alpha [H, W] clipped, imp [H, W])."""
    alpha = jnp.clip(paste[c * hh:(c + 1) * hh], _EPS, 1.0)
    rgb = paste[: c * hh]
    if noise_scale > 0.0:
        rgb = rgb + noise_scale * _normal_from_bits(rgb.shape)
    rgb = jnp.clip(rgb, 0.0, 1.0)
    imp = zp * alpha * wd
    return rgb, alpha, imp


def _fwd_kernel(seed_ref, zp_ref, wd_ref, objs_ref, wy_ref, wx_ref, bg_ref,
                out_ref, *, num_channel: int, noise_scale: float):
    k_cells = objs_ref.shape[1]
    c = num_channel
    c1 = c + 1
    hh = wy_ref.shape[2]
    ww = wx_ref.shape[2]
    bi = pl.program_id(0)
    if noise_scale > 0.0:
        pltpu.prng_seed(seed_ref[0] + bi)

    s1 = jnp.zeros((c * hh, ww), jnp.float32)
    s2 = jnp.zeros((hh, ww), jnp.float32)
    s3 = jnp.zeros((hh, ww), jnp.float32)
    for k in range(k_cells):
        _, paste, _ = _cell_paste(objs_ref, wy_ref, wx_ref, k, c1)
        zp = zp_ref[bi, k]
        wd = wd_ref[bi, k]
        rgb, alpha, imp = _cell_activations(paste, zp, wd, c, hh, noise_scale)
        s1 = s1 + _tile_rows(imp, c) * rgb
        s2 = s2 + imp
        s3 = s3 + (zp * alpha) * imp

    d = s2 + _EPS
    ac = s3 / d
    ac_t = _tile_rows(ac, c)
    out_ref[0] = ac_t * (s1 / _tile_rows(d, c)) + (1.0 - ac_t) * bg_ref[0]


def _sum_blocks(x, n, rows):
    """Sum n sublane blocks of `rows` rows each: [n*rows, W] -> [rows, W]."""
    acc = x[:rows]
    for i in range(1, n):
        acc = acc + x[i * rows:(i + 1) * rows]
    return acc


def _bwd_kernel(seed_ref, zp_ref, wd_ref, objs_ref, wy_ref, wx_ref, bg_ref, g_ref,
                g_objs_ref, g_wy_ref, g_wx_ref, g_zp_ref, g_wd_ref, g_bg_ref,
                *, num_channel: int, noise_scale: float):
    k_cells = objs_ref.shape[1]
    c = num_channel
    c1 = c + 1
    hh = wy_ref.shape[2]
    ww = wx_ref.shape[2]
    bi = pl.program_id(0)
    if noise_scale > 0.0:
        pltpu.prng_seed(seed_ref[0] + bi)

    # Pass 1: recompute pastes (identical PRNG stream) and the three sums.
    all_tmp = []
    all_paste = []
    all_rgb = []
    s1 = jnp.zeros((c * hh, ww), jnp.float32)
    s2 = jnp.zeros((hh, ww), jnp.float32)
    s3 = jnp.zeros((hh, ww), jnp.float32)
    for k in range(k_cells):
        tmp, paste, _ = _cell_paste(objs_ref, wy_ref, wx_ref, k, c1)
        zp = zp_ref[bi, k]
        wd = wd_ref[bi, k]
        rgb, alpha, imp = _cell_activations(paste, zp, wd, c, hh, noise_scale)
        all_tmp.append(tmp)
        all_paste.append(paste)
        all_rgb.append(rgb)
        s1 = s1 + _tile_rows(imp, c) * rgb
        s2 = s2 + imp
        s3 = s3 + (zp * alpha) * imp

    d = s2 + _EPS
    inv_d = 1.0 / d
    inv_d2 = inv_d * inv_d
    g = g_ref[0]  # [C*H, W]
    # out_c = S3*S1_c/D^2 + bg_c - S3*bg_c/D
    g_s1 = g * _tile_rows(s3 * inv_d2, c)
    t = g * (s1 * _tile_rows(inv_d2, c) - bg_ref[0] * _tile_rows(inv_d, c))
    g_s3 = _sum_blocks(t, c, hh)
    t2 = g * (-2.0 * s1 * _tile_rows(s3 * inv_d2 * inv_d, c)
              + bg_ref[0] * _tile_rows(s3 * inv_d2, c))
    g_s2 = _sum_blocks(t2, c, hh)
    g_bg_ref[0] = g * (1.0 - _tile_rows(s3 * inv_d, c))

    # Pass 2: per-cell gradients back through the packed paste matmuls.
    g_zp_vals = []
    g_wd_vals = []
    for k in range(k_cells):
        tmp = all_tmp[k]
        paste = all_paste[k]
        rgb = all_rgb[k]
        alpha_raw = paste[c * hh:(c + 1) * hh]
        alpha = jnp.clip(alpha_raw, _EPS, 1.0)
        zp = zp_ref[bi, k]
        wd = wd_ref[bi, k]
        imp = zp * alpha * wd
        transp = zp * alpha

        g_imp = g_s2 + g_s3 * transp + _sum_blocks(g_s1 * rgb, c, hh)
        g_transp = g_s3 * imp

        alpha_mask = jnp.logical_and(alpha_raw > _EPS, alpha_raw < 1.0)
        g_alpha = (g_imp * (zp * wd) + g_transp * zp) * alpha_mask.astype(jnp.float32)

        g_zp_vals.append(jnp.sum(g_imp * alpha * wd + g_transp * alpha))
        g_wd_vals.append(jnp.sum(g_imp * zp * alpha))

        rgb_mask = jnp.logical_and(rgb > 0.0, rgb < 1.0).astype(jnp.float32)
        g_paste = jnp.concatenate(
            [g_s1 * _tile_rows(imp, c) * rgb_mask, g_alpha], axis=0)  # [C1*H, W]

        wy_k = wy_ref[0, k]                       # [H, h]
        wx_k = wx_ref[0, k]                       # [W, w]
        wyb_t = _blockdiag(wy_k.T, c1)            # [C1*h, C1*H]
        g_tmp = _dot(wyb_t, g_paste)              # [C1*h, W]
        g_objs_ref[0, k] = _dot(g_tmp, wx_k)      # [C1*h, w]
        wyb = _blockdiag(wy_k, c1)
        u = _dot(wyb, objs_ref[0, k])             # [C1*H, w]
        g_wx_ref[0, k] = _dot(g_paste.T, u)       # [W, w] (channel sum built in)
        g_wyb = _dot(g_paste, tmp.T)              # [C1*H, C1*h]
        g_wy_acc = g_wyb[:hh, :wy_k.shape[1]]
        for ch in range(1, c1):
            g_wy_acc = g_wy_acc + g_wyb[
                ch * hh:(ch + 1) * hh, ch * wy_k.shape[1]:(ch + 1) * wy_k.shape[1]]
        g_wy_ref[0, k] = g_wy_acc

    g_zp_ref[0] = jnp.stack(g_zp_vals).reshape(k_cells, 1)
    g_wd_ref[0] = jnp.stack(g_wd_vals).reshape(k_cells, 1)


def _specs(k, h, w, hh, ww, c1, c):
    vmem = lambda shape: pl.BlockSpec(
        (1,) + shape, lambda i: (i,) + (0,) * len(shape), memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # seed
        pl.BlockSpec(memory_space=pltpu.SMEM),  # zp [B, K]
        pl.BlockSpec(memory_space=pltpu.SMEM),  # wd [B, K]
        vmem((k, c1 * h, w)),       # objs (channel-sublane-stacked)
        vmem((k, hh, h)),           # wy
        vmem((k, ww, w)),           # wx
        vmem((c * hh, ww)),         # bg (channel-sublane-stacked)
    ]
    return in_specs, vmem


def _stack_objs(objs):
    b, k, h, w, c1 = objs.shape
    return objs.transpose(0, 1, 4, 2, 3).reshape(b, k, c1 * h, w)


def _stack_img(img):
    b, hh, ww, c = img.shape
    return img.transpose(0, 3, 1, 2).reshape(b, c * hh, ww)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def fused_paste_render_packed(objs, wy, wx, z_pres, depth_w, bg, seed,
                              noise_scale, interpret=False):
    """Drop-in packed variant of render_fused.fused_paste_render.

    objs [B,K,h,w,C+1], wy [B,K,H,h], wx [B,K,W,w], z_pres/depth_w [B,K],
    bg [B,H,W,C], seed int32 scalar -> x_recon [B,H,W,C].
    """
    return _forward(objs, wy, wx, z_pres, depth_w, bg, seed, noise_scale,
                    interpret)


def _forward(objs, wy, wx, z_pres, depth_w, bg, seed, noise_scale, interpret):
    b, k, h, w, c1 = objs.shape
    hh = wy.shape[2]
    ww = wx.shape[2]
    c = c1 - 1
    in_specs, vmem = _specs(k, h, w, hh, ww, c1, c)
    kernel = functools.partial(_fwd_kernel, num_channel=c,
                               noise_scale=float(noise_scale))
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=in_specs,
        out_specs=vmem((c * hh, ww)),
        out_shape=jax.ShapeDtypeStruct((b, c * hh, ww), jnp.float32),
        interpret=interpret,
    )(jnp.reshape(jnp.asarray(seed, jnp.int32), (1,)), z_pres, depth_w,
      _stack_objs(objs), wy, wx, _stack_img(bg))
    return out.reshape(b, c, hh, ww).transpose(0, 2, 3, 1)


def _fwd_rule(objs, wy, wx, z_pres, depth_w, bg, seed, noise_scale, interpret):
    out = _forward(objs, wy, wx, z_pres, depth_w, bg, seed, noise_scale, interpret)
    return out, (objs, wy, wx, z_pres, depth_w, bg, seed)


def _bwd_rule(noise_scale, interpret, residuals, g):
    objs, wy, wx, z_pres, depth_w, bg, seed = residuals
    b, k, h, w, c1 = objs.shape
    hh = wy.shape[2]
    ww = wx.shape[2]
    c = c1 - 1
    in_specs, vmem = _specs(k, h, w, hh, ww, c1, c)
    in_specs = in_specs + [vmem((c * hh, ww))]  # g (channel-sublane-stacked)
    kernel = functools.partial(_bwd_kernel, num_channel=c,
                               noise_scale=float(noise_scale))
    out_shapes = (
        jax.ShapeDtypeStruct((b, k, c1 * h, w), jnp.float32),
        jax.ShapeDtypeStruct(wy.shape, jnp.float32),
        jax.ShapeDtypeStruct(wx.shape, jnp.float32),
        jax.ShapeDtypeStruct(z_pres.shape + (1,), jnp.float32),
        jax.ShapeDtypeStruct(depth_w.shape + (1,), jnp.float32),
        jax.ShapeDtypeStruct((b, c * hh, ww), jnp.float32),
    )
    out_specs = (
        vmem((k, c1 * h, w)),
        vmem((k, hh, h)),
        vmem((k, ww, w)),
        vmem((k, 1)),
        vmem((k, 1)),
        vmem((c * hh, ww)),
    )
    grads = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(jnp.reshape(jnp.asarray(seed, jnp.int32), (1,)), z_pres, depth_w,
      _stack_objs(objs), wy, wx, _stack_img(bg),
      _stack_img(g.astype(jnp.float32)))
    g_objs, g_wy, g_wx, g_zp, g_wd, g_bg = grads
    g_objs = g_objs.reshape(b, k, c1, h, w).transpose(0, 1, 3, 4, 2)
    g_bg = g_bg.reshape(b, c, hh, ww).transpose(0, 2, 3, 1)
    g_seed = np.zeros(np.shape(seed), jax.dtypes.float0)
    return g_objs, g_wy, g_wx, g_zp[..., 0], g_wd[..., 0], g_bg, g_seed


fused_paste_render_packed.defvjp(_fwd_rule, _bwd_rule)


def packing_supported(object_size: int, image_hw) -> bool:
    """Sublane-block alignment check for the packed kernel."""
    return object_size % 8 == 0 and image_hw[0] % 8 == 0
