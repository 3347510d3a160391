"""Tests for on-device augmentation ops."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.ndimage

from split_vae_tpu.ops import patches


def test_scramble_preserves_multiset(key):
    x = jnp.arange(8 * 8 * 3, dtype=jnp.float32).reshape(8, 8, 3)
    out = patches.patch_scramble(key, x, size=2)
    assert out.shape == x.shape
    # Same pixels, different arrangement (patch-level permutation).
    np.testing.assert_allclose(np.sort(np.array(out).ravel()), np.sort(np.array(x).ravel()))


def test_scramble_moves_whole_patches(key):
    """Each 2x2 patch of the output must be some input patch, intact."""
    x = jnp.arange(8 * 8, dtype=jnp.float32).reshape(8, 8, 1)
    out = np.array(patches.patch_scramble(key, x, size=2))
    in_patches = {tuple(np.array(x)[i:i+2, j:j+2, 0].ravel()) for i in range(0, 8, 2) for j in range(0, 8, 2)}
    out_patches = {tuple(out[i:i+2, j:j+2, 0].ravel()) for i in range(0, 8, 2) for j in range(0, 8, 2)}
    assert in_patches == out_patches


def test_scramble_size1_is_full_pixel_shuffle(key):
    x = jnp.arange(16, dtype=jnp.float32).reshape(4, 4, 1)
    out = patches.patch_scramble(key, x, size=1)
    np.testing.assert_allclose(np.sort(np.array(out).ravel()), np.arange(16))


def test_batched_scramble_independent_per_image(key):
    x = jnp.tile(jnp.arange(64, dtype=jnp.float32).reshape(1, 8, 8, 1), (4, 1, 1, 1))
    out = np.array(patches.batched_scramble(key, x, size=2))
    # With overwhelming probability at least two images differ.
    assert any(not np.allclose(out[0], out[i]) for i in range(1, 4))


def test_mix_scramble_uses_valid_patch_size(key):
    x = jnp.arange(8 * 8 * 3, dtype=jnp.float32).reshape(8, 8, 3)
    out = patches.mix_scramble(key, x)
    np.testing.assert_allclose(np.sort(np.array(out).ravel()), np.sort(np.array(x).ravel()))


def test_gaussian_blur_matches_scipy(key):
    rng = np.random.RandomState(0)
    x = rng.rand(32, 32, 3).astype(np.float32)
    out = np.array(patches.gaussian_blur(key, jnp.array(x)))
    assert out.shape == x.shape
    # Blurred image must be smoother than the input.
    assert np.abs(np.diff(out, axis=0)).mean() < np.abs(np.diff(x, axis=0)).mean()
    # And close to SOME scipy gaussian blur with sigma in the sampled range.
    best = min(
        np.abs(
            out
            - np.stack(
                [scipy.ndimage.gaussian_filter(x[..., c], sigma, mode="reflect", truncate=t / sigma)
                 for c in range(3)], axis=-1)
        ).max()
        for sigma in np.linspace(5, 10, 21)
        for t in (3, 4, 5, 6)
    )
    assert best < 0.06


def test_high_low_pass_decomposition():
    rng = np.random.RandomState(0)
    x = jnp.array(rng.rand(16, 16, 3).astype(np.float32))
    high, low = patches.high_low_pass(x, size=3)
    np.testing.assert_allclose(np.array(high + low), np.array(x), atol=1e-6)


def test_augment_batch_channel_layout(key):
    x = jnp.zeros((2, 8, 8, 3))
    out = patches.augment_batch(key, x, "scramble", size=2)
    assert out.shape == (2, 8, 8, 6)
    np.testing.assert_allclose(np.array(out[..., :3]), np.array(x))
    out = patches.augment_batch(key, x, "high_low_pass", size=2)
    assert out.shape == (2, 8, 8, 9)
    out = patches.augment_batch(key, x, "no_op")
    assert out.shape == (2, 8, 8, 3)
    assert patches.augmented_channels("scramble") == 6
    assert patches.augmented_channels("high_low_pass") == 9
    assert patches.augmented_channels("no_op") == 3


def test_augment_batch_jits(key):
    x = jnp.zeros((2, 8, 8, 3))
    f = jax.jit(lambda k, v: patches.augment_batch(k, v, "mix_scramble"))
    out = f(key, x)
    assert out.shape == (2, 8, 8, 6)


def test_batched_mix_scramble_multiset_and_variety(key):
    x = jnp.tile(jnp.arange(8 * 8 * 3, dtype=jnp.float32).reshape(1, 8, 8, 3), (16, 1, 1, 1))
    out = np.array(patches.batched_mix_scramble(key, x))
    assert out.shape == x.shape
    for i in range(16):
        np.testing.assert_allclose(np.sort(out[i].ravel()), np.sort(np.array(x[0]).ravel()))
    # different images get different scrambles with overwhelming probability
    assert any(not np.allclose(out[0], out[i]) for i in range(1, 16))
