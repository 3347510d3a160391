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

Gradients: custom VJP with a backward Pallas kernel that recomputes the
per-cell pastes (re-seeding the in-kernel PRNG identically for the noise) —
residuals are just the small inputs, so no [B,K,H,W,C] tensor ever hits HBM in
either direction. Grads flow to objs, Wy, Wx, z_pres, depth_w, and bg; the
Wy/Wx -> z_where and depth_w -> z_depth chains stay in jnp autodiff.
"""

from __future__ import annotations

import functools
from typing import Tuple

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
    # uint32 -> (0, 1): use the top 24 bits, offset by half a ulp to avoid 0.
    eight = jnp.uint32(8)
    u1 = (jax.lax.shift_right_logical(b1, eight).astype(jnp.float32)
          + 0.5) * (1.0 / 16777216.0)
    u2 = (jax.lax.shift_right_logical(b2, eight).astype(jnp.float32)
          + 0.5) * (1.0 / 16777216.0)
    return jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(_TWO_PI * u2)


def _paste_one(wy_k: Array, wx_k: Array, obj_k: Array) -> Array:
    """paste[p, q, ch] = sum_{i,j} wy[p,i] * obj[i,j,ch] * wx[q,j].

    wy_k: [H, h]; wx_k: [W, w]; obj_k: [h, w, C1]. Returns [H, W, C1].
    Expressed as two MXU dots with channel folded into the lane dim.
    """
    h, w, c1 = obj_k.shape
    hh = wy_k.shape[0]
    ww = wx_k.shape[0]
    tmp = jnp.dot(wy_k, obj_k.reshape(h, w * c1),
                  preferred_element_type=jnp.float32)  # [H, w*C1]
    tmp = tmp.reshape(hh, w, c1).transpose(0, 2, 1).reshape(hh * c1, w)
    out = jnp.dot(tmp, wx_k.T, preferred_element_type=jnp.float32)  # [H*C1, W]
    return out.reshape(hh, c1, ww).transpose(0, 2, 1)  # [H, W, C1]


def _cell_quantities(paste, zp, wd, num_channel, noise_scale):
    """Shared forward math for one cell: returns (rgb_tilde, alpha, imp)."""
    rgb = paste[..., :num_channel]
    alpha = jnp.clip(paste[..., num_channel:], _EPS, 1.0)[..., 0]  # [H, W]
    if noise_scale > 0.0:
        rgb = rgb + noise_scale * _normal_from_bits(rgb.shape)
    rgb = jnp.clip(rgb, 0.0, 1.0)
    imp = zp * alpha * wd
    return rgb, alpha, imp


def _fwd_kernel(seed_ref, zp_ref, wd_ref, objs_ref, wy_ref, wx_ref, bg_ref,
                out_ref, *, num_channel: int, noise_scale: float):
    k_cells = objs_ref.shape[1]
    hh = wy_ref.shape[2]
    ww = wx_ref.shape[2]
    if noise_scale > 0.0:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))

    s1 = jnp.zeros((hh, ww, num_channel), jnp.float32)
    s2 = jnp.zeros((hh, ww), jnp.float32)
    s3 = jnp.zeros((hh, ww), jnp.float32)
    for k in range(k_cells):
        paste = _paste_one(wy_ref[0, k], wx_ref[0, k], objs_ref[0, k])
        zp = zp_ref[0, k]
        wd = wd_ref[0, k]
        rgb, alpha, imp = _cell_quantities(paste, zp, wd, num_channel, noise_scale)
        s1 = s1 + imp[..., None] * rgb
        s2 = s2 + imp
        s3 = s3 + (zp * alpha) * imp

    d = s2 + _EPS
    canvas = s1 / d[..., None]
    alpha_canvas = (s3 / d)[..., None]
    out_ref[0] = alpha_canvas * canvas + (1.0 - alpha_canvas) * bg_ref[0]


def _bwd_kernel(seed_ref, zp_ref, wd_ref, objs_ref, wy_ref, wx_ref, bg_ref, g_ref,
                g_objs_ref, g_wy_ref, g_wx_ref, g_zp_ref, g_wd_ref, g_bg_ref,
                *, num_channel: int, noise_scale: float):
    k_cells = objs_ref.shape[1]
    hh = wy_ref.shape[2]
    ww = wx_ref.shape[2]
    c = num_channel
    if noise_scale > 0.0:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))

    # Pass 1: recompute pastes (identical PRNG stream) and the three sums.
    pastes, rgbs, alphas = [], [], []
    s1 = jnp.zeros((hh, ww, c), jnp.float32)
    s2 = jnp.zeros((hh, ww), jnp.float32)
    s3 = jnp.zeros((hh, ww), jnp.float32)
    for k in range(k_cells):
        paste = _paste_one(wy_ref[0, k], wx_ref[0, k], objs_ref[0, k])
        zp = zp_ref[0, k]
        wd = wd_ref[0, k]
        rgb, alpha, imp = _cell_quantities(paste, zp, wd, c, noise_scale)
        pastes.append(paste)
        rgbs.append(rgb)
        alphas.append(alpha)
        s1 = s1 + imp[..., None] * rgb
        s2 = s2 + imp
        s3 = s3 + (zp * alpha) * imp

    d = s2 + _EPS
    g = g_ref[0]  # [H, W, C]
    bg = bg_ref[0]
    inv_d = 1.0 / d
    inv_d2 = inv_d * inv_d
    # out_c = S3*S1_c/D^2 + bg_c - S3*bg_c/D
    g_s1 = g * (s3 * inv_d2)[..., None]
    g_s3 = jnp.sum(g * (s1 * inv_d2[..., None] - bg * inv_d[..., None]), axis=-1)
    g_s2 = jnp.sum(
        g * (-2.0 * (s3 * inv_d2 * inv_d)[..., None] * s1
             + (s3 * inv_d2)[..., None] * bg),
        axis=-1)
    g_bg_ref[0] = g * (1.0 - s3 * inv_d)[..., None]

    # Pass 2: per-cell gradients back through the paste matmuls.
    g_zp_vals = []
    g_wd_vals = []
    for k in range(k_cells):
        paste = pastes[k]
        rgb = rgbs[k]
        alpha = alphas[k]
        zp = zp_ref[0, k]
        wd = wd_ref[0, k]
        imp = zp * alpha * wd
        transp = zp * alpha

        g_rgb_tilde = g_s1 * imp[..., None]
        # rgb = clip(paste_rgb + noise, 0, 1): gradient passes where strictly inside
        rgb_mask = jnp.logical_and(rgb > 0.0, rgb < 1.0).astype(jnp.float32)
        g_rgb = g_rgb_tilde * rgb_mask

        g_imp = jnp.sum(g_s1 * rgb, axis=-1) + g_s2 + g_s3 * transp
        g_transp = g_s3 * imp

        g_alpha_c = g_imp * (zp * wd) + g_transp * zp
        raw_alpha = paste[..., c]
        alpha_mask = jnp.logical_and(raw_alpha > _EPS, raw_alpha < 1.0).astype(jnp.float32)
        g_alpha = g_alpha_c * alpha_mask

        g_zp_vals.append(jnp.sum(g_imp * alpha * wd + g_transp * alpha))
        g_wd_vals.append(jnp.sum(g_imp * zp * alpha))

        g_paste = jnp.concatenate([g_rgb, g_alpha[..., None]], axis=-1)  # [H, W, C+1]

        wy_k = wy_ref[0, k]  # [H, h]
        wx_k = wx_ref[0, k]  # [W, w]
        obj_k = objs_ref[0, k]  # [h, w, C+1]
        h, w, c1 = obj_k.shape

        # gtmp[p, j, ch] = sum_q g_paste[p, q, ch] * wx[q, j]
        gp = g_paste.transpose(0, 2, 1).reshape(hh * c1, ww)
        gtmp = jnp.dot(gp, wx_k, preferred_element_type=jnp.float32)  # [H*C1, w]
        gtmp = gtmp.reshape(hh, c1, w).transpose(0, 2, 1)  # [H, w, C1]

        # g_obj[i, j, ch] = sum_p wy[p, i] * gtmp[p, j, ch]
        g_obj = jnp.dot(wy_k.T, gtmp.reshape(hh, w * c1),
                        preferred_element_type=jnp.float32).reshape(h, w, c1)
        g_objs_ref[0, k] = g_obj

        # g_wy[p, i] = sum_{j,ch} gtmp[p, j, ch] * obj[i, j, ch]
        g_wy_ref[0, k] = jnp.dot(
            gtmp.reshape(hh, w * c1), obj_k.reshape(h, w * c1).T,
            preferred_element_type=jnp.float32)

        # g_wx[q, j] = sum_{p,ch} g_paste[p, q, ch] * T[p, j, ch],
        # T = wy @ obj  ([H, w, C1])
        t = jnp.dot(wy_k, obj_k.reshape(h, w * c1),
                    preferred_element_type=jnp.float32).reshape(hh, w, c1)
        g_wx_ref[0, k] = jnp.dot(
            g_paste.transpose(1, 0, 2).reshape(ww, hh * c1),
            t.transpose(0, 2, 1).reshape(hh * c1, w),
            preferred_element_type=jnp.float32)

    g_zp_ref[0, :] = jnp.stack(g_zp_vals)
    g_wd_ref[0, :] = jnp.stack(g_wd_vals)


def _specs(b, k, h, w, hh, ww, c1, c):
    smem = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.SMEM)
    vmem = lambda shape: pl.BlockSpec(
        (1,) + shape, lambda i: (i,) + (0,) * len(shape), memory_space=pltpu.VMEM)
    in_specs = [
        smem((1,)),                 # seed
        pl.BlockSpec((1, k), lambda i: (i, 0), memory_space=pltpu.SMEM),  # zp
        pl.BlockSpec((1, k), lambda i: (i, 0), memory_space=pltpu.SMEM),  # wd
        vmem((k, h, w, c1)),        # objs
        vmem((k, hh, h)),           # wy
        vmem((k, ww, w)),           # wx
        vmem((hh, ww, c)),          # bg
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
    in_specs, vmem = _specs(b, k, h, w, hh, ww, c1, c)
    kernel = functools.partial(_fwd_kernel, num_channel=c,
                               noise_scale=float(noise_scale))
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=in_specs,
        out_specs=vmem((hh, ww, c)),
        out_shape=jax.ShapeDtypeStruct((b, hh, ww, c), jnp.float32),
        interpret=interpret,
    )(jnp.reshape(jnp.asarray(seed, jnp.int32), (1,)), z_pres, depth_w, objs, wy, wx, bg)


def _fwd_rule(objs, wy, wx, z_pres, depth_w, bg, seed, noise_scale, interpret):
    out = _forward(objs, wy, wx, z_pres, depth_w, bg, seed, noise_scale, interpret)
    return out, (objs, wy, wx, z_pres, depth_w, bg, seed)


def _bwd_rule(noise_scale, interpret, residuals, g):
    objs, wy, wx, z_pres, depth_w, bg, seed = residuals
    b, k, h, w, c1 = objs.shape
    hh = wy.shape[2]
    ww = wx.shape[2]
    c = c1 - 1
    in_specs, vmem = _specs(b, k, h, w, hh, ww, c1, c)
    in_specs = in_specs + [vmem((hh, ww, c))]  # g
    kernel = functools.partial(_bwd_kernel, num_channel=c,
                               noise_scale=float(noise_scale))
    out_shapes = (
        jax.ShapeDtypeStruct(objs.shape, jnp.float32),
        jax.ShapeDtypeStruct(wy.shape, jnp.float32),
        jax.ShapeDtypeStruct(wx.shape, jnp.float32),
        jax.ShapeDtypeStruct(z_pres.shape, jnp.float32),
        jax.ShapeDtypeStruct(depth_w.shape, jnp.float32),
        jax.ShapeDtypeStruct(bg.shape, jnp.float32),
    )
    out_specs = (
        vmem((k, h, w, c1)),
        vmem((k, hh, h)),
        vmem((k, ww, w)),
        pl.BlockSpec((1, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        vmem((hh, ww, c)),
    )
    grads = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(jnp.reshape(jnp.asarray(seed, jnp.int32), (1,)), z_pres, depth_w, objs, wy, wx, bg,
      g.astype(jnp.float32))
    g_seed = np.zeros(np.shape(seed), jax.dtypes.float0)  # int arg: zero cotangent
    return grads + (g_seed,)


fused_paste_render.defvjp(_fwd_rule, _bwd_rule)
