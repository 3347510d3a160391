"""Exact fusion of (half-pixel bilinear 2x resize -> 3x3 SAME conv).

ObjDecoder's hot chain (spair/spair.py:355-364: d2 -> resize -> d3 -> resize
-> d5) upsamples a feature map 2x and immediately convolves it. The
upsampled intermediates are the SPAIR step's largest HBM tensors (at B=256,
K=16, os=32: [4096,16,16,64] + [4096,32,32,32] per step, ~3x the traffic of
everything else in the decoder — BASELINE.md breakdown, ObjDecoder 5.8 ms
bf16 and bandwidth-bound).

This module computes conv(resize2x(x)) WITHOUT materializing resize2x(x),
exactly (not approximately):

  - Half-pixel 2x bilinear is a 2-phase 3-tap stencil on the source grid:
        U[2i]   = 0.25 x[i-1] + 0.75 x[i]
        U[2i+1] = 0.75 x[i]   + 0.25 x[i+1]
    with edge-clamp at the borders — which is exactly the same stencil
    applied to an edge-padded x.
  - Composing with a 3x3 conv therefore gives FOUR per-phase 3x3 kernels on
    the source grid (W[p] = A_p^T K A_p per axis, A below), evaluated as one
    conv with 4x output channels + a depth-to-space — same MACs, but the 2x
    upsampled tensor never exists, and the 4x-wider output channel dim packs
    the MXU lanes far better at ObjDecoder's small Cout (32/4).
  - The one place the fusion differs from the reference chain is the
    outermost OUTPUT ring: the conv on the upsampled grid zero-pads outside
    [0,2s)^2, while the fused stencil implicitly uses clamp-extended values
    there. The difference is a closed-form rank-1 band — four 1-D convs of
    the clamp-extended phantom rows/columns — subtracted from the ring.
    Corners are counted once: row corrections own every dy=+-1 tap
    (including corners), column corrections zero their phantom row ends.

Exactness is pinned to 1e-5 against jax.image.resize + conv on random
inputs including all borders (tests/test_pixel_shuffle.py).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# A_p[t, d]: contribution of source tap x[i+d-1] to U[2i+p+t-1]
# (rows t in {-1,0,1} are the conv taps on the upsampled grid, columns d in
# {-1,0,1} are taps on the source grid).
_A0 = np.array([[0.75, 0.25, 0.0],
                [0.25, 0.75, 0.0],
                [0.0, 0.75, 0.25]], np.float32)
_A1 = np.array([[0.25, 0.75, 0.0],
                [0.0, 0.75, 0.25],
                [0.0, 0.25, 0.75]], np.float32)


def _phase_kernels(kernel: Array) -> Array:
    """[3,3,Cin,Cout] conv kernel -> [3,3,Cin,4*Cout] per-phase kernels.

    Output channel blocks are ordered (py, px) = (0,0),(0,1),(1,0),(1,1) to
    match the depth-to-space reshape below.
    """
    a = [jnp.asarray(_A0, kernel.dtype), jnp.asarray(_A1, kernel.dtype)]
    blocks = [
        jnp.einsum("yxio,yd,xe->deio", kernel, a[py], a[px])
        for py in (0, 1) for px in (0, 1)
    ]
    return jnp.concatenate(blocks, axis=-1)


def _conv(x: Array, kernel: Array, padding: str) -> Array:
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _upsample1d_row(row: Array) -> Array:
    """[N, s, C] -> [N, 2s, C]: the exact half-pixel stencil with edge clamp."""
    pad = jnp.concatenate([row[:, :1], row, row[:, -1:]], axis=1)
    even = 0.25 * pad[:, :-2] + 0.75 * pad[:, 1:-1]  # U[2i]
    odd = 0.75 * pad[:, 1:-1] + 0.25 * pad[:, 2:]    # U[2i+1]
    n, s, c = row.shape
    return jnp.stack([even, odd], axis=2).reshape(n, 2 * s, c)


def _ring_correction(x: Array, kernel: Array, out: Array) -> Array:
    """Subtract the clamp-vs-zero-pad difference on the outermost ring.

    The fused conv implicitly used clamp-extended U values at the four
    phantom borders (row -1, row 2s, col -1, col 2s); the reference conv
    zero-pads there. Subtract K-slices convolved with the phantom lines.
    """
    n, h2, w2, _ = out.shape

    def row_fix(src_line, k_slice, clamp_pad=True):
        """src_line [N, s, Cin] -> phantom line [N, 2s, Cin], conv with
        k_slice [3, Cin, Cout] -> [N, 2s, Cout]."""
        line = _upsample1d_row(src_line)  # [N, 2s, Cin]
        if clamp_pad:
            pad = jnp.concatenate([line[:, :1], line, line[:, -1:]], axis=1)
        else:
            zero = jnp.zeros_like(line[:, :1])
            pad = jnp.concatenate([zero, line, zero], axis=1)
        return jax.lax.conv_general_dilated(
            pad[:, :, None, :], k_slice[:, None], (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[:, :, 0, :]

    # Rows own all dy=+-1 taps incl. corners (phantom rows clamp-padded in x).
    top = row_fix(x[:, 0], kernel[0])        # K[dy=-1,:] touches U row -1
    bot = row_fix(x[:, -1], kernel[2])       # K[dy=+1,:] touches U row 2s
    # Columns own dx=+-1 taps NOT in the phantom rows (zero row ends).
    left = row_fix(x[:, :, 0], kernel[:, 0], clamp_pad=False)
    right = row_fix(x[:, :, -1], kernel[:, 2], clamp_pad=False)

    out = out.at[:, 0, :, :].add(-top)
    out = out.at[:, -1, :, :].add(-bot)
    out = out.at[:, :, 0, :].add(-left)
    out = out.at[:, :, -1, :].add(-right)
    return out


class Resize2xConv(nn.Module):
    """Drop-in for ``resize_bilinear(x, 2h, 2w)`` followed by
    ``Conv(features, (3,3), padding='SAME')``.

    Parameter names/shapes/inits are identical to the flax Conv it replaces
    (kernel/bias, glorot-uniform/zeros, f32 params), so checkpoints and the
    TF2 golden layer maps are unaffected — give it the SAME ``name=`` the
    Conv had. Falls back to the materialized resize+conv when the requested
    output size is not exactly 2x (never the case for the /8-divisible
    reference shapes).
    """

    features: int
    out_hw: Tuple[int, int]

    @nn.compact
    def __call__(self, x: Array) -> Array:
        from split_vae_tpu.nn.common import activation_dtype

        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.glorot_uniform(),
                            (3, 3, cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        x, kernel, bias = nn.dtypes.promote_dtype(
            x, kernel, bias, dtype=activation_dtype())
        if self.out_hw == (2 * x.shape[1], 2 * x.shape[2]):
            return resize2x_conv(x, kernel, bias)
        n, _, _, _ = x.shape
        up = jax.image.resize(
            x, (n, self.out_hw[0], self.out_hw[1], cin), "bilinear")
        return _conv(up, kernel, "SAME") + bias


def _upsample2x_axis(x: Array, axis: int) -> Array:
    """Exact half-pixel 2x bilinear (with edge clamp) along one spatial axis
    of an NHWC tensor."""
    x = jnp.moveaxis(x, axis, 1)
    shp = x.shape
    flat = x.reshape(shp[0], shp[1], -1)
    up = _upsample1d_row(flat).reshape((shp[0], 2 * shp[1]) + shp[2:])
    return jnp.moveaxis(up, 1, axis)


def _stencil_matrix(k: int) -> np.ndarray:
    """S[t, j] with W[j] = sum_t S[t, j] K[t]: folds the 4-tap half-pixel
    stencil s = [0.25, 0.75, 0.75, 0.25] (coefficient of x[m] in U[2m+d],
    d = -1..2) into a conv kernel evaluated with lhs_dilation=2."""
    s_tap = {-1: 0.25, 0: 0.75, 1: 0.75, 2: 0.25}
    mat = np.zeros((k, k + 3), np.float32)
    for t in range(k):
        for j in range(k + 3):
            mat[t, j] = s_tap.get(2 + t - j, 0.0)
    return mat


def resize2x_conv_any(x: Array, kernel: Array, bias: Array | None = None) -> Array:
    """Exact conv(SAME)(half_pixel_bilinear_2x(x)) for ANY kernel size.

    x [N,s,s,Cin], kernel [kh,kw,Cin,Cout] -> [N,2s,2s,Cout]. Interior: the
    bilinear stencil is folded into the conv kernel and the composition is
    evaluated as ONE ``lhs_dilation=2`` conv on the edge-padded source —
    the exact form of XLA's conv-input-gradient pattern, which the TPU
    backend lowers natively (no upsampled intermediate, no depth-to-space
    transpose; a phase-conv + transpose variant measured 18% slower at the
    VAE decoder's C=6 output layer, where the interleave's contiguous runs
    are 2*C elements). The output ring where the reference conv's zero
    padding crosses the image edge is overwritten with the reference
    computation on thin upsampled strips (O(s) work), so the result is
    exact everywhere rather than approximating the border.
    """
    n, s, _, cin = x.shape
    kh, kw, _, cout = kernel.shape
    plo_h, phi_h = (kh - 1) // 2, kh // 2
    plo_w, phi_w = (kw - 1) // 2, kw // 2
    sh = jnp.asarray(_stencil_matrix(kh), kernel.dtype)
    sw = jnp.asarray(_stencil_matrix(kw), kernel.dtype)
    wd = jnp.einsum("yxio,yd,xe->deio", kernel, sh, sw)  # [kh+3, kw+3, i, o]
    xe = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    y = jax.lax.conv_general_dilated(
        xe, wd, window_strides=(1, 1),
        padding=((plo_h, kh - plo_h), (plo_w, kw - plo_w)),
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))  # [N, 2s, 2s, Cout]

    # --- exact border rings (reference path on thin strips) ----------------
    # Output row j uses U rows [j-plo_h, j-plo_h+kh); rows j < plo_h or
    # j >= 2s-phi_h see the conv's zero padding, which the fused path
    # replaced with clamp-extended values. Recompute those rows/cols exactly
    # and assemble the result with ONE concatenation — chained
    # ``y.at[ring].set`` dynamic-update-slices each materialize a full copy
    # of y, which at the VAE decoder's [B,64,64,C] output measurably
    # regressed the step (−20% f32 at B=1024).
    band = kh // 2 + 1  # source rows whose upsample covers U rows [0, kh-1)
    zpad_w = ((0, 0), (0, 0), (plo_w, phi_w), (0, 0))
    bandw = kw // 2 + 1

    mid = y[:, plo_h:2 * s - phi_h]
    if plo_w > 0 or phi_w > 0:
        cols = []
        if plo_w > 0:
            u_left = _upsample2x_axis(
                _upsample2x_axis(x[:, :, :bandw], 1), 2)[:, :, :kw - 1]
            u_left = jnp.pad(u_left, ((0, 0), (0, 0), (plo_w, 0), (0, 0)))
            cols.append(_conv(u_left, kernel, "VALID"))
        cols.append(mid[:, :, plo_w:2 * s - phi_w])
        if phi_w > 0:
            u_right = _upsample2x_axis(
                _upsample2x_axis(x[:, :, -bandw:], 1), 2)[:, :, -(kw - 1):]
            u_right = jnp.pad(u_right, ((0, 0), (0, 0), (0, phi_w), (0, 0)))
            cols.append(_conv(u_right, kernel, "VALID"))
        mid = jnp.concatenate(cols, axis=2)

    rows = []
    if plo_h > 0:
        u_top = _upsample2x_axis(_upsample2x_axis(x[:, :band], 2), 1)[:, :kh - 1]
        u_top = jnp.pad(u_top, ((0, 0), (plo_h, 0), (0, 0), (0, 0)))
        rows.append(_conv(jnp.pad(u_top, zpad_w), kernel, "VALID"))
    rows.append(mid)
    if phi_h > 0:
        u_bot = _upsample2x_axis(_upsample2x_axis(x[:, -band:], 2), 1)[:, -(kh - 1):]
        u_bot = jnp.pad(u_bot, ((0, 0), (0, phi_h), (0, 0), (0, 0)))
        rows.append(_conv(jnp.pad(u_bot, zpad_w), kernel, "VALID"))
    y = jnp.concatenate(rows, axis=1)

    if bias is not None:
        y = y + bias
    return y


class Resize2xConvAny(nn.Module):
    """Drop-in for ``resize_bilinear(x, 2h, 2w)`` followed by
    ``Conv(features, (k, k), padding='SAME')`` for any kernel size.

    Same param names/shapes/inits as the flax Conv it replaces (give it the
    Conv's ``name=``): checkpoints and TF2 golden layer maps are unaffected.
    Falls back to the materialized path when the output is not exactly 2x.
    """

    features: int
    kernel_size: Tuple[int, int]
    out_hw: Tuple[int, int]

    @nn.compact
    def __call__(self, x: Array) -> Array:
        from split_vae_tpu.nn.common import activation_dtype

        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.glorot_uniform(),
                            self.kernel_size + (cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        x, kernel, bias = nn.dtypes.promote_dtype(
            x, kernel, bias, dtype=activation_dtype())
        if self.out_hw == (2 * x.shape[1], 2 * x.shape[2]):
            return resize2x_conv_any(x, kernel, bias)
        n = x.shape[0]
        up = jax.image.resize(
            x, (n, self.out_hw[0], self.out_hw[1], cin), "bilinear")
        return _conv(up, kernel, "SAME") + bias


def resize2x_conv(x: Array, kernel: Array, bias: Array | None = None) -> Array:
    """Exact conv3x3(SAME)(half_pixel_bilinear_2x(x)) without the upsample.

    x [N,s,s,Cin], kernel [3,3,Cin,Cout] -> [N,2s,2s,Cout].
    """
    n, s, _, cin = x.shape
    cout = kernel.shape[-1]
    wall = _phase_kernels(kernel)
    xe = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    y = _conv(xe, wall, "VALID")  # [N, s, s, 4*Cout]
    # depth-to-space: channel blocks (py, px) -> spatial 2x2
    y = y.reshape(n, s, s, 2, 2, cout)
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * s, 2 * s, cout)
    y = _ring_correction(x, kernel, y)
    if bias is not None:
        y = y + bias
    return y


# --------------------------------------------------------------------------
# Mixed-VJP variants: fused forward + materialized-chain backward.
#
# The fused forwards above win because they never materialize the upsampled
# intermediate, but their *autodiff* backward differentiates through the
# edge-pad / ring-correction / lhs-dilation graph, which XLA's TPU backend
# schedules worse than the plain chain's backward at wide mid layers
# (round-3 A/B, BASELINE.md). Since ``resize2x_conv[_any]`` and
# ``conv(SAME)(upsample2x(x))`` are the SAME mathematical map, either
# backward is an exact gradient for either forward — so pair the fast
# forward with the chain backward via ``jax.custom_vjp``. The backward is
# hand-transposed (``jax.linear_transpose`` of the two linear factors), so
# no wasted forward conv is run: it recomputes U(x) (bandwidth only),
# then dx = U^T(conv_x^T(g)), dK = conv_K^T(g | U(x)), db = sum(g).
# VERDICT r3 #6; reference chain: spair/spair.py:355-364, vae/model.py:158-169.
# --------------------------------------------------------------------------


def _upsample2x(x: Array) -> Array:
    """Half-pixel bilinear 2x in both spatial axes of NHWC.

    ``jax.image.resize(..., "bilinear")`` at an exact 2x ratio IS the
    half-pixel 3-tap stencil with edge clamp (same map as
    ``_upsample2x_axis`` twice), but lowers to XLA's native resize pattern —
    the slice/stack formulation's transpose measured 3x slower on TPU.
    """
    n, s0, s1, c = x.shape
    return jax.image.resize(x, (n, 2 * s0, 2 * s1, c), "bilinear")


def _materialized_bwd(res, g):
    x, kernel = res
    up = _upsample2x(x)
    dup = jax.linear_transpose(lambda u: _conv(u, kernel, "SAME"), up)(g)[0]
    dx = jax.linear_transpose(_upsample2x, x)(dup)[0]
    dk = jax.linear_transpose(lambda k: _conv(up, k, "SAME"), kernel)(g)[0]
    return dx, dk


@jax.custom_vjp
def _resize2x_conv_mixed_core(x: Array, kernel: Array) -> Array:
    return resize2x_conv(x, kernel, None)


_resize2x_conv_mixed_core.defvjp(
    lambda x, kernel: (resize2x_conv(x, kernel, None), (x, kernel)),
    _materialized_bwd)


@jax.custom_vjp
def _resize2x_conv_any_mixed_core(x: Array, kernel: Array) -> Array:
    return resize2x_conv_any(x, kernel, None)


_resize2x_conv_any_mixed_core.defvjp(
    lambda x, kernel: (resize2x_conv_any(x, kernel, None), (x, kernel)),
    _materialized_bwd)


def resize2x_conv_mixed(x: Array, kernel: Array,
                        bias: Array | None = None) -> Array:
    """``resize2x_conv`` forward with the materialized chain's backward."""
    y = _resize2x_conv_mixed_core(x, kernel)
    return y if bias is None else y + bias


def resize2x_conv_any_mixed(x: Array, kernel: Array,
                            bias: Array | None = None) -> Array:
    """``resize2x_conv_any`` forward with the materialized chain's backward."""
    y = _resize2x_conv_any_mixed_core(x, kernel)
    return y if bias is None else y + bias
