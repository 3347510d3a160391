"""Tests for the native C++ MultiCUB generator (builds with g++ at test time)."""

import numpy as np
import pytest

from split_vae_tpu.data import native
from split_vae_tpu.data.multicub import (
    SPRITE,
    TRAIN_COLORS,
    TRAIN_COLORS_TRIAD,
    synthetic_sprites,
)


@pytest.fixture(scope="module")
def sprites():
    return synthetic_sprites(32, 0)


def _palette(cols):
    return np.asarray(cols, np.float32) / 255.0


def test_native_builds_and_generates_solid(sprites):
    out = native.generate(sprites, 16, 48, "solid_fixed", _palette(TRAIN_COLORS), seed=1)
    assert out is not None, "native build failed"
    imgs, counts = out
    assert imgs.shape == (16, 48, 48, 3)
    assert imgs.min() >= 0.0 and imgs.max() <= 1.0
    assert counts.min() >= 0 and counts.max() <= 5
    # Backgrounds are palette colors: corner pixel of a 0-count image matches one.
    zero = np.where(counts == 0)[0]
    if len(zero):
        corner = imgs[zero[0], 0, 0]
        dists = np.abs(_palette(TRAIN_COLORS) - corner).sum(axis=1)
        assert dists.min() < 1e-5


def test_native_ckb_rot(sprites):
    out = native.generate(sprites, 4, 48, "ckb_rot_6", _palette(TRAIN_COLORS_TRIAD), seed=2)
    assert out is not None
    imgs, _ = out
    # Rotated checkerboard: many distinct colors from bilinear edges, bounded [0,1].
    assert imgs.min() >= 0.0 and imgs.max() <= 1.0
    assert len(np.unique(imgs[0].reshape(-1, 3), axis=0)) > 2


def test_native_deterministic(sprites):
    a = native.generate(sprites, 4, 48, "solid_fixed", _palette(TRAIN_COLORS), seed=7)
    b = native.generate(sprites, 4, 48, "solid_fixed", _palette(TRAIN_COLORS), seed=7)
    assert a is not None
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])


def test_native_sprite_count_matches_composited_objects(sprites):
    # Solid white bg: foreground pixels only come from sprites.
    out = native.generate(sprites, 8, 48, "white", np.ones((1, 3), np.float32), seed=3)
    assert out is not None
    imgs, counts = out
    for img, n in zip(imgs, counts):
        nonwhite = (np.abs(img - 1.0).max(axis=-1) > 1e-6).sum()
        if n == 0:
            assert nonwhite == 0
        else:
            assert nonwhite > 0


def test_cache_uses_native_or_fallback(tmp_path):
    from split_vae_tpu.data.multicub import create_multicub_cache

    path = create_multicub_cache("cub_ckb_rot_6", str(tmp_path), n_train=8,
                                 n_eval=4, synthetic=True)
    with np.load(path) as z:
        assert z["train"].shape == (8, 48, 48, 3)
        assert z["test_unseen"].shape == (4, 48, 48, 3)


def test_native_texture_mode():
    """Mode 5: texture backgrounds from a host-built bank (Kylberg when
    present, procedural fallback). Non-sprite pixels must be grayscale from
    the bank; counts valid."""
    from split_vae_tpu.data import native
    from split_vae_tpu.data.multicub import synthetic_sprites

    sprites = synthetic_sprites(8, seed=0)
    palette = np.zeros((1, 3), np.float32)
    result = native.generate(sprites, 16, 48, "texture", palette, seed=3)
    if result is None:
        pytest.skip("no native compiler")
    imgs, counts = result
    assert imgs.shape == (16, 48, 48, 3)
    assert counts.min() >= 0 and counts.max() <= 5
    assert np.isfinite(imgs).all() and imgs.min() >= 0 and imgs.max() <= 1
    # zero-count image: pure texture -> all three channels equal (grayscale)
    zeros = np.where(counts == 0)[0]
    if zeros.size:
        img = imgs[zeros[0]]
        np.testing.assert_allclose(img[..., 0], img[..., 1], atol=1e-6)
        np.testing.assert_allclose(img[..., 0], img[..., 2], atol=1e-6)
        assert img.std() > 0.01  # textured, not solid
