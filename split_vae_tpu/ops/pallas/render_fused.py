"""Fused STN-paste + depth-aware compositing as a Pallas TPU kernel.

Why: the unfused training path materializes per-cell full-canvas objects
[B, K, H, W, C+1] in HBM (stn_paste) and immediately reduces them over cells
(render) — ~100 MB of HBM round-trip per step at B=256 that the compiler
cannot fuse across the two einsums and the reduction. This kernel keeps each
cell's pasted canvas in VMEM, accumulates the three compositing sums on the
fly, and never writes per-cell canvases to HBM. Renderer math is identical to
nn/spair_nets.py:render (itself spair/spair.py:534-579):

    paste_k      = Wy_k @ obj_k @ Wx_k^T            (per channel)
    alpha_k      = clip(paste_k[..., C], 1e-8, 1)
    rgb_k        = clip(paste_k[..., :C] + noise, 0, 1)
    imp_k        = z_pres_k * alpha_k * depth_w_k
    out = (S3/D) * (S1/D) + (1 - S3/D) * bg,
      S1 = sum_k imp_k*rgb_k, S2 = sum_k imp_k, S3 = sum_k z_pres_k*alpha_k*imp_k,
      D = S2 + 1e-8

Kernel layout notes: Mosaic cannot shape-cast across the minor (lane) dims,
so all per-cell tensors are handled **channel-major** ([..., C, h, w]) and the
paste is C+1 independent 2-D MXU dots per cell; the public wrapper keeps the
framework's channel-last convention and transposes at the boundary (cheap,
fused by XLA).

Gradients: custom VJP with a backward Pallas kernel that recomputes the
per-cell pastes (re-seeding the in-kernel PRNG identically for the noise) —
residuals are just the small inputs, so no [B,K,H,W,C] tensor ever hits HBM in
either direction. Grads flow to objs, Wy, Wx, z_pres, depth_w, and bg; the
Wy/Wx -> z_where and depth_w -> z_depth chains stay in jnp autodiff.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_EPS = 1e-8
_TWO_PI = 2.0 * np.pi


def _normal_from_bits(shape) -> Array:
    """Box-Muller standard normals from the in-kernel PRNG."""
    b1 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    b2 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    # uint32 -> (0, 1): keep the top 24 bits, offset by half a ulp to avoid 0.
    # Mosaic has no uint32->f32 cast; after >>8 the value fits in int32.
    eight = jnp.uint32(8)

    def to_unit(b):
        h = pltpu.bitcast(jax.lax.shift_right_logical(b, eight), jnp.int32)
        return (h.astype(jnp.float32) + 0.5) * (1.0 / 16777216.0)

    return jnp.sqrt(-2.0 * jnp.log(to_unit(b1))) * jnp.cos(_TWO_PI * to_unit(b2))


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _paste_channels(wy_k, wx_k, objs_ref, bi, k, c1):
    """Per-channel paste: list of C1 canvases [H, W].

    objs_ref layout: [1, K, C1, h, w] (channel-major block).
    """
    wx_t = wx_k.T  # [w, W]
    return [_dot(_dot(wy_k, objs_ref[0, k, ch]), wx_t) for ch in range(c1)]


def _cell_forward(paste_chs, zp, wd, c, noise_scale):
    """Returns (rgb_tilde list[C], alpha [H,W], imp [H,W])."""
    alpha = jnp.clip(paste_chs[c], _EPS, 1.0)
    rgb = []
    for ch in range(c):
        v = paste_chs[ch]
        if noise_scale > 0.0:
            v = v + noise_scale * _normal_from_bits(v.shape)
        rgb.append(jnp.clip(v, 0.0, 1.0))
    imp = zp * alpha * wd
    return rgb, alpha, imp


def _fwd_kernel(seed_ref, zp_ref, wd_ref, objs_ref, wy_ref, wx_ref, bg_ref,
                out_ref, *, num_channel: int, noise_scale: float):
    k_cells = objs_ref.shape[1]
    c1 = objs_ref.shape[2]
    c = num_channel
    hh = wy_ref.shape[2]
    ww = wx_ref.shape[2]
    bi = pl.program_id(0)
    if noise_scale > 0.0:
        pltpu.prng_seed(seed_ref[0] + bi)

    s1 = [jnp.zeros((hh, ww), jnp.float32) for _ in range(c)]
    s2 = jnp.zeros((hh, ww), jnp.float32)
    s3 = jnp.zeros((hh, ww), jnp.float32)
    for k in range(k_cells):
        paste_chs = _paste_channels(wy_ref[0, k], wx_ref[0, k], objs_ref, bi, k, c1)
        zp = zp_ref[bi, k]
        wd = wd_ref[bi, k]
        rgb, alpha, imp = _cell_forward(paste_chs, zp, wd, c, noise_scale)
        for ch in range(c):
            s1[ch] = s1[ch] + imp * rgb[ch]
        s2 = s2 + imp
        s3 = s3 + (zp * alpha) * imp

    d = s2 + _EPS
    alpha_canvas = s3 / d
    for ch in range(c):
        out_ref[0, ch] = alpha_canvas * (s1[ch] / d) + (1.0 - alpha_canvas) * bg_ref[0, ch]


def _bwd_kernel(seed_ref, zp_ref, wd_ref, objs_ref, wy_ref, wx_ref, bg_ref, g_ref,
                g_objs_ref, g_wy_ref, g_wx_ref, g_zp_ref, g_wd_ref, g_bg_ref,
                *, num_channel: int, noise_scale: float):
    k_cells = objs_ref.shape[1]
    c1 = objs_ref.shape[2]
    c = num_channel
    hh = wy_ref.shape[2]
    ww = wx_ref.shape[2]
    bi = pl.program_id(0)
    if noise_scale > 0.0:
        pltpu.prng_seed(seed_ref[0] + bi)

    # Pass 1: recompute pastes (identical PRNG stream) and the three sums.
    all_paste = []  # [k][c1] canvases (alpha channel raw)
    all_rgb = []    # [k][c] noise-clipped rgb
    all_alpha = []  # [k] clipped alpha
    s1 = [jnp.zeros((hh, ww), jnp.float32) for _ in range(c)]
    s2 = jnp.zeros((hh, ww), jnp.float32)
    s3 = jnp.zeros((hh, ww), jnp.float32)
    for k in range(k_cells):
        paste_chs = _paste_channels(wy_ref[0, k], wx_ref[0, k], objs_ref, bi, k, c1)
        zp = zp_ref[bi, k]
        wd = wd_ref[bi, k]
        rgb, alpha, imp = _cell_forward(paste_chs, zp, wd, c, noise_scale)
        all_paste.append(paste_chs)
        all_rgb.append(rgb)
        all_alpha.append(alpha)
        for ch in range(c):
            s1[ch] = s1[ch] + imp * rgb[ch]
        s2 = s2 + imp
        s3 = s3 + (zp * alpha) * imp

    d = s2 + _EPS
    inv_d = 1.0 / d
    inv_d2 = inv_d * inv_d
    # out_c = S3*S1_c/D^2 + bg_c - S3*bg_c/D
    g_s1 = []
    g_s3 = jnp.zeros((hh, ww), jnp.float32)
    g_s2 = jnp.zeros((hh, ww), jnp.float32)
    for ch in range(c):
        g_ch = g_ref[0, ch]
        bg_ch = bg_ref[0, ch]
        g_s1.append(g_ch * s3 * inv_d2)
        g_s3 = g_s3 + g_ch * (s1[ch] * inv_d2 - bg_ch * inv_d)
        g_s2 = g_s2 + g_ch * (-2.0 * s3 * inv_d2 * inv_d * s1[ch] + s3 * inv_d2 * bg_ch)
        g_bg_ref[0, ch] = g_ch * (1.0 - s3 * inv_d)

    # Pass 2: per-cell gradients back through the paste matmuls.
    g_zp_vals = []
    g_wd_vals = []
    for k in range(k_cells):
        paste_chs = all_paste[k]
        rgb = all_rgb[k]
        alpha = all_alpha[k]
        zp = zp_ref[bi, k]
        wd = wd_ref[bi, k]
        imp = zp * alpha * wd
        transp = zp * alpha

        g_imp = g_s2 + g_s3 * transp
        for ch in range(c):
            g_imp = g_imp + g_s1[ch] * rgb[ch]
        g_transp = g_s3 * imp

        raw_alpha = paste_chs[c]
        alpha_mask = jnp.logical_and(raw_alpha > _EPS, raw_alpha < 1.0).astype(jnp.float32)
        g_alpha = (g_imp * (zp * wd) + g_transp * zp) * alpha_mask

        g_zp_vals.append(jnp.sum(g_imp * alpha * wd + g_transp * alpha))
        g_wd_vals.append(jnp.sum(g_imp * zp * alpha))

        wy_k = wy_ref[0, k]  # [H, h]
        wx_k = wx_ref[0, k]  # [W, w]
        g_wy_acc = jnp.zeros_like(wy_k)
        g_wx_acc = jnp.zeros_like(wx_k)
        for ch in range(c1):
            if ch < c:
                # rgb = clip(paste + noise): gradient passes strictly inside
                mask = jnp.logical_and(rgb[ch] > 0.0, rgb[ch] < 1.0).astype(jnp.float32)
                g_paste = g_s1[ch] * imp * mask
            else:
                g_paste = g_alpha
            obj_ch = objs_ref[0, k, ch]  # [h, w]
            gtmp = _dot(g_paste, wx_k)  # [H, w]
            g_objs_ref[0, k, ch] = _dot(wy_k.T, gtmp)  # [h, w]
            g_wy_acc = g_wy_acc + _dot(gtmp, obj_ch.T)  # [H, h]
            g_wx_acc = g_wx_acc + _dot(g_paste.T, _dot(wy_k, obj_ch))  # [W, w]
        g_wy_ref[0, k] = g_wy_acc
        g_wx_ref[0, k] = g_wx_acc

    g_zp_ref[0] = jnp.stack(g_zp_vals).reshape(k_cells, 1)
    g_wd_ref[0] = jnp.stack(g_wd_vals).reshape(k_cells, 1)


def _specs(k, h, w, hh, ww, c1, c):
    vmem = lambda shape: pl.BlockSpec(
        (1,) + shape, lambda i: (i,) + (0,) * len(shape), memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # seed (full array)
        pl.BlockSpec(memory_space=pltpu.SMEM),  # zp [B, K] (full array)
        pl.BlockSpec(memory_space=pltpu.SMEM),  # wd [B, K] (full array)
        vmem((k, c1, h, w)),        # objs (channel-major)
        vmem((k, hh, h)),           # wy
        vmem((k, ww, w)),           # wx
        vmem((c, hh, ww)),          # bg (channel-major)
    ]
    return in_specs, vmem


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def fused_paste_render(objs, wy, wx, z_pres, depth_w, bg, seed, noise_scale,
                       interpret=False):
    """Fused paste+composite. objs [B,K,h,w,C+1], wy [B,K,H,h], wx [B,K,W,w],
    z_pres/depth_w [B,K], bg [B,H,W,C], seed: int32 scalar (traced OK).
    Returns x_recon [B,H,W,C]."""
    return _forward(objs, wy, wx, z_pres, depth_w, bg, seed, noise_scale, interpret)


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
        out_specs=vmem((c, hh, ww)),
        out_shape=jax.ShapeDtypeStruct((b, c, hh, ww), jnp.float32),
        interpret=interpret,
    )(jnp.reshape(jnp.asarray(seed, jnp.int32), (1,)), z_pres, depth_w,
      objs.transpose(0, 1, 4, 2, 3), wy, wx, bg.transpose(0, 3, 1, 2))
    return out.transpose(0, 2, 3, 1)


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
    in_specs = in_specs + [vmem((c, hh, ww))]  # g (channel-major)
    kernel = functools.partial(_bwd_kernel, num_channel=c,
                               noise_scale=float(noise_scale))
    out_shapes = (
        jax.ShapeDtypeStruct((b, k, c1, h, w), jnp.float32),
        jax.ShapeDtypeStruct(wy.shape, jnp.float32),
        jax.ShapeDtypeStruct(wx.shape, jnp.float32),
        jax.ShapeDtypeStruct(z_pres.shape + (1,), jnp.float32),
        jax.ShapeDtypeStruct(depth_w.shape + (1,), jnp.float32),
        jax.ShapeDtypeStruct((b, c, hh, ww), jnp.float32),
    )
    out_specs = (
        vmem((k, c1, h, w)),
        vmem((k, hh, h)),
        vmem((k, ww, w)),
        vmem((k, 1)),  # g_zp [B, K, 1]
        vmem((k, 1)),  # g_wd [B, K, 1]
        vmem((c, hh, ww)),
    )
    grads = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(jnp.reshape(jnp.asarray(seed, jnp.int32), (1,)), z_pres, depth_w,
      objs.transpose(0, 1, 4, 2, 3), wy, wx, bg.transpose(0, 3, 1, 2),
      g.astype(jnp.float32).transpose(0, 3, 1, 2))
    g_objs, g_wy, g_wx, g_zp, g_wd, g_bg = grads
    g_seed = np.zeros(np.shape(seed), jax.dtypes.float0)  # int arg: zero cotangent
    return (g_objs.transpose(0, 1, 3, 4, 2), g_wy, g_wx, g_zp[..., 0],
            g_wd[..., 0], g_bg.transpose(0, 2, 3, 1), g_seed)


fused_paste_render.defvjp(_fwd_rule, _bwd_rule)
