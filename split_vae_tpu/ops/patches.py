"""On-device augmentation ops: patch scramble, blur, high/low pass.

The reference runs augmentation on the host inside ``tf.data`` map threads
(augmentation.py:12-104, wired at vae/main.py:56-61). TPU-native design: the
augmentation is pure elementwise/permutation math, so we run it **on device
inside the jitted train step**. Only compact raw images cross PCIe; the
6-channel concatenated view never leaves HBM, and the ops fuse with the
encoder's first conv.

Semantics contract with the reference:
  - ``scramble``: split into size x size patches, randomly permute, reassemble,
    return concat([x, x_aug], channel) (augmentation.py:43-57).
  - ``mix_scramble``: scramble with patch size drawn from {1,2,4,8}
    (augmentation.py:59-81). Reference quirk NOT reproduced: because
    ``np.random.choice`` runs at tf.function trace time, the reference freezes
    one patch size for the entire run. We sample per image (the documented
    intent) via ``lax.switch`` over the four static sizes.
  - ``gaussian_blur``: random sigma ~ U[5,10), half-width ~ U{3..6}, symmetric
    padding, depthwise conv (augmentation.py:83-94). Implemented with a fixed
    13-tap masked kernel so shapes stay static under jit.
  - ``high_low_pass``: fixed-kernel low-pass + residual high-pass, returns
    concat([x, high, low]) -> 9 channels (augmentation.py:97-101).
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp

Array = jax.Array

MIX_SIZES = (1, 2, 4, 8)
_BLUR_MAX_HALFWIDTH = 6  # sizes sampled in {3,...,6} => max 13-tap kernel


def patch_scramble(key: Array, x: Array, size: int) -> Array:
    """Randomly permute the size x size patches of a single image [H, W, C].

    Equivalent to augmentation.py:43-54 (extract_patches -> shuffle ->
    reassemble) expressed as reshape/transpose + a permutation gather.
    """
    h, w, c = x.shape
    gh, gw = h // size, w // size
    n = gh * gw
    patches = x.reshape(gh, size, gw, size, c).transpose(0, 2, 1, 3, 4).reshape(n, size, size, c)
    perm = jax.random.permutation(key, n)
    patches = jnp.take(patches, perm, axis=0)
    return patches.reshape(gh, gw, size, size, c).transpose(0, 2, 1, 3, 4).reshape(h, w, c)


def batched_scramble(key: Array, x: Array, size: int) -> Array:
    """Per-image independent patch scramble over a batch [B, H, W, C].

    TPU-native formulation: instead of a per-image gather (XLA TPU gathers run
    ~17x below HBM speed-of-light here), the permutation is applied as a
    one-hot batched matmul — permutation matrices hit the MXU. Random
    permutations come from one argsort of iid uniforms per image.

    Memory guard: the [B, n, n] one-hot is fine at the patch counts the
    matmul wins at (n <= ~256), but at size=1 on 64x64 inputs it would be a
    B x 4096 x 4096 transient (4.3 GB at B=64). Above a 128 MB one-hot budget
    the permutation falls back to a batched take_along_axis gather, which is
    also the faster choice there (payload per row is only size^2*c floats, so
    the matmul is MXU-starved anyway).
    """
    b, h, w, c = x.shape
    gh, gw = h // size, w // size
    n = gh * gw
    flat = (
        x.reshape(b, gh, size, gw, size, c)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(b, n, size * size * c)
    )
    perm = jnp.argsort(jax.random.uniform(key, (b, n)), axis=1)  # [B, n]
    if b * n * n * 4 > 128 * 2**20:
        shuffled = jnp.take_along_axis(flat, perm[:, :, None], axis=1)
    else:
        ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, n), 2)
        onehot = (perm[:, :, None] == ids).astype(flat.dtype)  # [B, n, n]
        shuffled = jnp.einsum("bij,bjd->bid", onehot, flat)
    return (
        shuffled.reshape(b, gh, gw, size, size, c)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(b, h, w, c)
    )


def mix_scramble(key: Array, x: Array) -> Array:
    """Scramble one image with patch size drawn uniformly from {1, 2, 4, 8}."""
    k_size, k_perm = jax.random.split(key)
    idx = jax.random.randint(k_size, (), 0, len(MIX_SIZES))
    branches = [functools.partial(patch_scramble, size=s) for s in MIX_SIZES]
    return jax.lax.switch(idx, branches, k_perm, x)


def _gaussian_kernel_1d(std: Array, halfwidth: Array, dtype) -> Array:
    """Masked 13-tap 1-D Gaussian, zero outside |i| <= halfwidth, sum-normalized.

    Matches augmentation.py:33-38: pdf values at integer offsets, normalized,
    with dynamic support emulated by masking a static 13-tap window (the extra
    zero taps read symmetric padding with weight 0 => identical output).
    """
    r = _BLUR_MAX_HALFWIDTH
    offs = jnp.arange(-r, r + 1, dtype=dtype)
    vals = jnp.exp(-0.5 * jnp.square(offs / std))
    mask = (jnp.abs(offs) <= halfwidth).astype(dtype)
    vals = vals * mask
    return vals / jnp.sum(vals)


def _separable_blur(x: Array, kernel_1d: Array) -> Array:
    """Symmetric-pad + depthwise separable blur of one image [H, W, C]."""
    r = _BLUR_MAX_HALFWIDTH
    xp = jnp.pad(x, ((r, r), (r, r), (0, 0)), mode="symmetric")
    # Two 1-D depthwise convs (separable Gaussian).
    c = x.shape[-1]
    lhs = xp[None].transpose(0, 3, 1, 2)  # [1, C, H+2r, W+2r]
    kh = jnp.tile(kernel_1d.reshape(1, 1, -1, 1), (c, 1, 1, 1))  # [C,1,k,1]
    kw = jnp.tile(kernel_1d.reshape(1, 1, 1, -1), (c, 1, 1, 1))  # [C,1,1,k]
    out = jax.lax.conv_general_dilated(
        lhs, kh, window_strides=(1, 1), padding="VALID", feature_group_count=c
    )
    out = jax.lax.conv_general_dilated(
        out, kw, window_strides=(1, 1), padding="VALID", feature_group_count=c
    )
    return out[0].transpose(1, 2, 0)


def gaussian_blur(key: Array, x: Array) -> Array:
    """Random-sigma Gaussian blur of one image (augmentation.py:83-94)."""
    k_std, k_size = jax.random.split(key)
    std = jax.random.uniform(k_std, (), dtype=x.dtype, minval=5.0, maxval=10.0)
    halfwidth = jax.random.randint(k_size, (), 3, 7).astype(x.dtype)
    kernel = _gaussian_kernel_1d(std, halfwidth, x.dtype)
    return _separable_blur(x, kernel)


def high_low_pass(x: Array, size: int, mean: float = 0.0, std: float = 1.0) -> Array:
    """Low-pass + residual high-pass of one image (augmentation.py:97-101).

    Returns (high, low); kernel has static support [-size, size].
    """
    dtype = x.dtype
    offs = jnp.arange(-size, size + 1, dtype=dtype)
    vals = jnp.exp(-0.5 * jnp.square((offs - mean) / std))
    vals = vals / jnp.sum(vals)
    xp = jnp.pad(x, ((size, size), (size, size), (0, 0)), mode="symmetric")
    c = x.shape[-1]
    lhs = xp[None].transpose(0, 3, 1, 2)
    kh = jnp.tile(vals.reshape(1, 1, -1, 1), (c, 1, 1, 1))
    kw = jnp.tile(vals.reshape(1, 1, 1, -1), (c, 1, 1, 1))
    low = jax.lax.conv_general_dilated(
        lhs, kh, window_strides=(1, 1), padding="VALID", feature_group_count=c
    )
    low = jax.lax.conv_general_dilated(
        low, kw, window_strides=(1, 1), padding="VALID", feature_group_count=c
    )
    low = low[0].transpose(1, 2, 0)
    return x - low, low


def batched_mix_scramble(key: Array, x: Array) -> Array:
    """Per-image random patch size from {1,2,4,8} over a batch [B, H, W, C].

    TPU-native: computes the (cheap, matmul-based) batched scramble at all
    four sizes and selects per image — still far cheaper than a vmapped
    gather-per-image switch.
    """
    k_size, *k_perms = jax.random.split(key, 1 + len(MIX_SIZES))
    idx = jax.random.randint(k_size, (x.shape[0],), 0, len(MIX_SIZES))
    candidates = jnp.stack(
        [batched_scramble(kp, x, s) for kp, s in zip(k_perms, MIX_SIZES)], axis=0)
    return jnp.take_along_axis(
        candidates, idx[None, :, None, None, None], axis=0)[0]


def augment_batch(key: Array, x: Array, kind: str, size: int = 1) -> Array:
    """Apply the named augmentation to a batch [B, H, W, C] on device.

    Returns concat([x, view(s)], channel), mirroring Augmentator.augment
    (augmentation.py:12-104). ``kind`` is a static Python string.
    """
    if kind == "no_op":
        return x
    if kind == "scramble":
        return jnp.concatenate([x, batched_scramble(key, x, size)], axis=-1)
    if kind == "mix_scramble":
        return jnp.concatenate([x, batched_mix_scramble(key, x)], axis=-1)
    if kind == "blur":
        keys = jax.random.split(key, x.shape[0])
        aug = jax.vmap(gaussian_blur)(keys, x)
        return jnp.concatenate([x, aug], axis=-1)
    if kind == "high_low_pass":
        high, low = jax.vmap(functools.partial(high_low_pass, size=size))(x)
        return jnp.concatenate([x, high, low], axis=-1)
    raise ValueError(f"Unknown augmentation kind: {kind!r}")


def augmented_channels(kind: str, base_channels: int = 3) -> int:
    """Channel count of the augmented input consumed by the models."""
    if kind == "no_op":
        return base_channels
    if kind == "high_low_pass":
        return 3 * base_channels
    return 2 * base_channels
