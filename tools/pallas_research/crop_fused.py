"""Fused STN glimpse crop as a Pallas TPU kernel.

Companion to render_fused.py for the forward (crop) direction
(spair/utils.py:119-200, inverse=False). The jnp path (ops/stn.py:stn_crop)
materializes a [B, K, h, W, C] intermediate between its two einsums; this
kernel keeps everything per-(batch, cell) in VMEM and emits the glimpses
directly. Pure trilinear form

    glimpse[b,k,p,q,c] = sum_{i,j} wy[b,k,p,i] * img[b,i,j,c] * wx[b,k,q,j]

so the custom VJP is three matmul families (no nonlinearities). Channel-major
layout internally (Mosaic cannot shape-cast across lane dims); the wrapper
keeps the channel-last convention.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _fwd_kernel(img_ref, wy_ref, wx_ref, out_ref, *, num_channel: int):
    k_cells = wy_ref.shape[1]
    for k in range(k_cells):
        wy_k = wy_ref[0, k]  # [h_out, H]
        wx_t = wx_ref[0, k].T  # [W, w_out]
        for ch in range(num_channel):
            out_ref[0, k, ch] = _dot(_dot(wy_k, img_ref[0, ch]), wx_t)


def _bwd_kernel(img_ref, wy_ref, wx_ref, g_ref, g_img_ref, g_wy_ref, g_wx_ref,
                *, num_channel: int):
    k_cells = wy_ref.shape[1]
    h_in = img_ref.shape[2]
    w_in = img_ref.shape[3]
    g_img = [jnp.zeros((h_in, w_in), jnp.float32) for _ in range(num_channel)]
    for k in range(k_cells):
        wy_k = wy_ref[0, k]  # [h_out, H]
        wx_k = wx_ref[0, k]  # [w_out, W]
        g_wy_acc = jnp.zeros_like(wy_k)
        g_wx_acc = jnp.zeros_like(wx_k)
        for ch in range(num_channel):
            g_ch = g_ref[0, k, ch]  # [h_out, w_out]
            img_ch = img_ref[0, ch]  # [H, W]
            # g_img += wy^T @ g @ wx
            g_img[ch] = g_img[ch] + _dot(wy_k.T, _dot(g_ch, wx_k))
            # g_wy += g @ (img @ wx^T)^T
            g_wy_acc = g_wy_acc + _dot(g_ch, _dot(img_ch, wx_k.T).T)
            # g_wx += g^T @ (wy @ img)
            g_wx_acc = g_wx_acc + _dot(g_ch.T, _dot(wy_k, img_ch))
        g_wy_ref[0, k] = g_wy_acc
        g_wx_ref[0, k] = g_wx_acc
    for ch in range(num_channel):
        g_img_ref[0, ch] = g_img[ch]


def _vmem(shape):
    return pl.BlockSpec((1,) + shape, lambda i: (i,) + (0,) * len(shape),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_stn_crop_apply(img, wy, wx, interpret=False):
    """img [B,H,W,C], wy [B,K,h,H], wx [B,K,w,W] -> glimpses [B,K,h,w,C]."""
    return _forward(img, wy, wx, interpret)


def _forward(img, wy, wx, interpret):
    b, h_in, w_in, c = img.shape
    k = wy.shape[1]
    ho = wy.shape[2]
    wo = wx.shape[2]
    kernel = functools.partial(_fwd_kernel, num_channel=c)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[_vmem((c, h_in, w_in)), _vmem((k, ho, h_in)), _vmem((k, wo, w_in))],
        out_specs=_vmem((k, c, ho, wo)),
        out_shape=jax.ShapeDtypeStruct((b, k, c, ho, wo), jnp.float32),
        interpret=interpret,
    )(img.transpose(0, 3, 1, 2), wy, wx)
    return out.transpose(0, 1, 3, 4, 2)


def _fwd_rule(img, wy, wx, interpret):
    return _forward(img, wy, wx, interpret), (img, wy, wx)


def _bwd_rule(interpret, residuals, g):
    img, wy, wx = residuals
    b, h_in, w_in, c = img.shape
    k = wy.shape[1]
    ho = wy.shape[2]
    wo = wx.shape[2]
    kernel = functools.partial(_bwd_kernel, num_channel=c)
    g_img, g_wy, g_wx = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[_vmem((c, h_in, w_in)), _vmem((k, ho, h_in)), _vmem((k, wo, w_in)),
                  _vmem((k, c, ho, wo))],
        out_specs=(_vmem((c, h_in, w_in)), _vmem((k, ho, h_in)), _vmem((k, wo, w_in))),
        out_shape=(
            jax.ShapeDtypeStruct((b, c, h_in, w_in), jnp.float32),
            jax.ShapeDtypeStruct(wy.shape, jnp.float32),
            jax.ShapeDtypeStruct(wx.shape, jnp.float32),
        ),
        interpret=interpret,
    )(img.transpose(0, 3, 1, 2), wy, wx,
      g.astype(jnp.float32).transpose(0, 1, 4, 2, 3))
    return g_img.transpose(0, 2, 3, 1), g_wy, g_wx


fused_stn_crop_apply.defvjp(_fwd_rule, _bwd_rule)


def fused_stn_crop(img: Array, z_where: Array, out_hw, cell_ratio=None,
                   interpret: bool = False):
    """Drop-in fused variant of ops.stn.stn_crop (same return contract)."""
    from split_vae_tpu.ops import stn

    h_in, w_in = img.shape[1], img.shape[2]
    ho, wo = out_hw
    ratio = stn.DEFAULT_CELL_RATIO if cell_ratio is None else cell_ratio
    sx, sy, tx, ty = stn.zwhere_to_params(z_where, ratio)
    bbox = stn.zwhere_to_bbox(sx, sy, tx, ty)
    xs = stn._sample_coords(sx, tx, wo, w_in)
    ys = stn._sample_coords(sy, ty, ho, h_in)
    wx = stn._interp_matrix(xs, w_in)
    wy = stn._interp_matrix(ys, h_in)
    return fused_stn_crop_apply(img, wy, wx, interpret), bbox
