"""Packed fused STN glimpse crop (v2 of crop_fused) — MXU-filling layouts.

Same trilinear math as ``crop_fused.fused_stn_crop_apply``
(spair/utils.py:119-200, inverse=False):

    glimpse[b,k,p,q,c] = sum_{i,j} wy[b,k,p,i] * img[b,i,j,c] * wx[b,k,q,j]

but restructured so the MXU actually fills. The unpacked kernel issues
2*C tiny dots per cell (C=6 for the LG models -> 192 forward passes per batch
item); here:

- stage 1 runs ONCE for all cells and channels:
      t_all = img_subl [C*H, W] @ wxT_all [W, K*wo]          (~12 passes)
  (img channel-stacked along sublanes; all cells' wx^T concatenated along
  lanes — row blocks of a matmul are independent, so channel stacking is
  exact, and column blocks pick each cell's wx.)

- stage 2 applies wy per cell in channel GROUPS via a block-diagonal left
  factor, sized so the contraction fits one 128-wide MXU tile:
      out_grp = blockdiag(wy_k, g) [g*ho, g*H] @ t_grp [g*H, wo]
  with g = max group size s.t. g*H <= 128 and g*ho <= 128 (g=2 for the
  48->32 SPAIR shapes: 1 pass per group, 3 groups per cell).

Forward: ~60 MXU passes vs 192 unpacked (C=6, K=16). Backward uses the
channel-pairing contraction trick (sum_ch A_ch^T @ B_ch as ONE dot over the
stacked axis) for g_wx/g_wy: ~2.5x fewer passes than the unpacked backward.

Alignment contract: H % 8 == 0, ho % 8 == 0 (sublane blocks); the caller
falls back to the unpacked kernel otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _blockdiag(block, n):
    m, k = block.shape
    zeros = jnp.zeros((m, k), block.dtype)
    rows = [jnp.concatenate([block if j == i else zeros for j in range(n)], axis=1)
            for i in range(n)]
    return jnp.concatenate(rows, axis=0)


def _group_size(c: int, h_in: int, ho: int) -> int:
    g = 1
    for cand in range(2, c + 1):
        if c % cand == 0 and cand * h_in <= 128 and cand * ho <= 128:
            g = cand
    return g


def _fwd_kernel(img_ref, wxt_ref, wy_ref, out_ref, *, num_channel: int,
                h_in: int, ho: int):
    c = num_channel
    k_cells = wy_ref.shape[1]
    wo = wxt_ref.shape[2] // k_cells
    g = _group_size(c, h_in, ho)
    # Stage 1: every cell x channel at once.
    t_all = _dot(img_ref[0], wxt_ref[0])  # [C*H, K*wo]
    for k in range(k_cells):
        wy_k = wy_ref[0, k]  # [ho, H]
        for a in range(0, c, g):
            wyb = _blockdiag(wy_k, g)  # [g*ho, g*H]
            t_grp = t_all[a * h_in:(a + g) * h_in, k * wo:(k + 1) * wo]
            out_ref[0, k, a * ho:(a + g) * ho] = _dot(wyb, t_grp)  # [g*ho, wo]


def _bwd_kernel(img_ref, wxt_ref, wy_ref, g_ref, g_img_ref, g_wy_ref,
                g_wxt_ref, *, num_channel: int, h_in: int, ho: int):
    c = num_channel
    k_cells = wy_ref.shape[1]
    w_in = img_ref.shape[2]
    wo = wxt_ref.shape[2] // k_cells
    g = _group_size(c, h_in, ho)

    t_all = _dot(img_ref[0], wxt_ref[0])  # [C*H, K*wo]
    g_img = jnp.zeros((c * h_in, w_in), jnp.float32)
    for k in range(k_cells):
        wy_k = wy_ref[0, k]            # [ho, H]
        wx_t = wxt_ref[0][:, k * wo:(k + 1) * wo]  # [W, wo]
        g_k = g_ref[0, k]              # [C*ho, wo] channel-sublane-stacked

        # g_img += wy^T @ g @ wx  (per channel; rows independent per group)
        v_blocks = []
        for a in range(0, c, g):
            wyb_t = _blockdiag(wy_k.T, g)  # [g*H, g*ho]
            v = _dot(wyb_t, g_k[a * ho:(a + g) * ho])  # [g*H, wo]
            v_blocks.append(v)
        v_all = jnp.concatenate(v_blocks, axis=0)  # [C*H, wo]
        g_img = g_img + _dot(v_all, wx_t.T)  # [C*H, W] rows independent

        # u = wy @ img (per channel, grouped)
        u_blocks = []
        for a in range(0, c, g):
            wyb = _blockdiag(wy_k, g)
            u = _dot(wyb, img_ref[0][a * h_in:(a + g) * h_in])  # [g*ho, W]
            u_blocks.append(u)
        u_all = jnp.concatenate(u_blocks, axis=0)  # [C*ho, W]

        # g_wx^T = sum_ch u_ch^T ... -> g_wxt[:, k] = (g_wx)^T directly:
        # g_wx = sum_ch g_ch^T @ u_ch = (g_k^T stacked) . (u stacked): one dot
        # over the C*ho axis pairs channel blocks and sums them.
        g_wx = _dot(g_k.T, u_all)  # [wo, C*ho] @ [C*ho, W] -> [wo, W]
        g_wxt_ref[0, :, k * wo:(k + 1) * wo] = g_wx.T

        # g_wy = sum_ch g_ch @ t_ch^T: same pairing trick over C*wo.
        t_k = t_all[:, k * wo:(k + 1) * wo]  # [C*H, wo]
        g_lane = jnp.concatenate(
            [g_k[a * ho:(a + 1) * ho] for a in range(c)], axis=1)  # [ho, C*wo]
        t_lane_T = jnp.concatenate(
            [t_k[a * h_in:(a + 1) * h_in] for a in range(c)], axis=1).T
        # t_lane_T: [C*wo? no: concat gives [H, C*wo]].T -> [C*wo, H]
        g_wy_ref[0, k] = _dot(g_lane, t_lane_T)  # [ho, H]

    g_img_ref[0] = g_img


def _vmem(shape):
    return pl.BlockSpec((1,) + shape, lambda i: (i,) + (0,) * len(shape),
                        memory_space=pltpu.VMEM)


def _stack_img(img):
    b, hh, ww, c = img.shape
    return img.transpose(0, 3, 1, 2).reshape(b, c * hh, ww)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_stn_crop_packed(img, wy, wx, interpret=False):
    """Drop-in packed variant of crop_fused.fused_stn_crop_apply.

    img [B,H,W,C], wy [B,K,ho,H], wx [B,K,wo,W] -> glimpses [B,K,ho,wo,C].
    """
    return _forward(img, wy, wx, interpret)


def _prep(img, wy, wx):
    b, h_in, w_in, c = img.shape
    k = wy.shape[1]
    wo = wx.shape[2]
    img_subl = _stack_img(img)                                # [B, C*H, W]
    wxt_all = wx.transpose(0, 3, 1, 2).reshape(b, w_in, k * wo)  # [B, W, K*wo]
    return img_subl, wxt_all, (b, h_in, w_in, c, k, wo)


def _forward(img, wy, wx, interpret):
    img_subl, wxt_all, (b, h_in, w_in, c, k, wo) = _prep(img, wy, wx)
    ho = wy.shape[2]
    kernel = functools.partial(_fwd_kernel, num_channel=c, h_in=h_in, ho=ho)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[_vmem((c * h_in, w_in)), _vmem((w_in, k * wo)),
                  _vmem((k, ho, h_in))],
        out_specs=_vmem((k, c * ho, wo)),
        out_shape=jax.ShapeDtypeStruct((b, k, c * ho, wo), jnp.float32),
        interpret=interpret,
    )(img_subl, wxt_all, wy)
    return out.reshape(b, k, c, ho, wo).transpose(0, 1, 3, 4, 2)


def _fwd_rule(img, wy, wx, interpret):
    return _forward(img, wy, wx, interpret), (img, wy, wx)


def _bwd_rule(interpret, residuals, g):
    img, wy, wx = residuals
    img_subl, wxt_all, (b, h_in, w_in, c, k, wo) = _prep(img, wy, wx)
    ho = wy.shape[2]
    g_stacked = g.astype(jnp.float32).transpose(0, 1, 4, 2, 3).reshape(
        b, k, c * ho, wo)
    kernel = functools.partial(_bwd_kernel, num_channel=c, h_in=h_in, ho=ho)
    g_img_s, g_wy, g_wxt = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[_vmem((c * h_in, w_in)), _vmem((w_in, k * wo)),
                  _vmem((k, ho, h_in)), _vmem((k, c * ho, wo))],
        out_specs=(_vmem((c * h_in, w_in)), _vmem((k, ho, h_in)),
                   _vmem((w_in, k * wo))),
        out_shape=(
            jax.ShapeDtypeStruct((b, c * h_in, w_in), jnp.float32),
            jax.ShapeDtypeStruct(wy.shape, jnp.float32),
            jax.ShapeDtypeStruct((b, w_in, k * wo), jnp.float32),
        ),
        interpret=interpret,
    )(img_subl, wxt_all, wy, g_stacked)
    g_img = g_img_s.reshape(b, c, h_in, w_in).transpose(0, 2, 3, 1)
    g_wx = g_wxt.reshape(b, w_in, k, wo).transpose(0, 2, 3, 1)
    return g_img, g_wy, g_wx


fused_stn_crop_packed.defvjp(_fwd_rule, _bwd_rule)


def crop_packing_supported(in_hw, out_hw, num_channel: int) -> bool:
    """Alignment check: sublane blocks need 8-aligned H and ho."""
    return in_hw[0] % 8 == 0 and out_hw[0] % 8 == 0
