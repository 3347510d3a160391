"""Real-format ingestion tests: SVHN .mat files and the CelebA jpg cache."""

import os
import types

import numpy as np
import pytest
import scipy.io

from split_vae_tpu.data.celeba import build_celeba_cache, get_celeba
from split_vae_tpu.data.svhn import get_svhn


def _fake_svhn_mat(path, n, seed):
    rng = np.random.RandomState(seed)
    x = rng.randint(0, 255, (32, 32, 3, n), np.uint8)  # .mat layout: HWCN
    y = rng.randint(1, 11, (n, 1)).astype(np.uint8)  # classes 1..10
    scipy.io.savemat(path, {"X": x, "y": y})
    return x, y


def _cfg(tmp_path, **kw):
    base = dict(data_dir=str(tmp_path), synthetic_data=False, seed=0, label=True)
    base.update(kw)
    return types.SimpleNamespace(**base)


def test_get_svhn_from_mat_files(tmp_path):
    d = tmp_path / "SVHN"
    d.mkdir()
    x_train, y_train = _fake_svhn_mat(d / "train_32x32.mat", 20, 0)
    _fake_svhn_mat(d / "extra_32x32.mat", 10, 1)
    _fake_svhn_mat(d / "test_32x32.mat", 8, 2)

    train, test, shape = get_svhn(_cfg(tmp_path), extra=True)
    assert shape == [-1, 32, 32, 3]
    assert len(train) == 30  # train + extra concatenated (vae/data.py:60)
    assert len(test) == 8
    assert train.images.dtype == np.uint8
    # NHWC transpose correctness: first image matches the .mat slice
    np.testing.assert_array_equal(train.images[0], x_train[:, :, :, 0])
    # one-hot labels with the y-1 remap
    assert train.labels.shape == (30, 10)
    assert train.labels[0].argmax() == int(y_train[0, 0]) - 1

    train2, _, _ = get_svhn(_cfg(tmp_path), extra=False)
    assert len(train2) == 20


def test_get_svhn_unlabeled(tmp_path):
    d = tmp_path / "SVHN"
    d.mkdir()
    for name, seed in (("train_32x32.mat", 0), ("extra_32x32.mat", 1), ("test_32x32.mat", 2)):
        _fake_svhn_mat(d / name, 6, seed)
    train, test, _ = get_svhn(_cfg(tmp_path, label=False), extra=False)
    assert train.labels is None and test.labels is None


def test_celeba_cache_build_and_load(tmp_path):
    from PIL import Image

    raw = tmp_path / "celeba" / "img_align_celeba"
    raw.mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(12):
        img = Image.fromarray(rng.randint(0, 255, (218, 178, 3), np.uint8))
        img.save(raw / f"{i:06d}.jpg")

    cfg = _cfg(tmp_path, label=False)
    train, test, shape = get_celeba(cfg, size=64)
    assert shape == [-1, 64, 64, 3]
    # 10% (floor) test split by file order (vae/data.py:90-91)
    assert len(test) == 1 and len(train) == 11
    assert train.images.dtype == np.uint8
    assert train.images.shape[1:] == (64, 64, 3)
    # cache is reused (mtime unchanged)
    cache = tmp_path / "celeba" / "train_64x64.npy"
    mtime = os.path.getmtime(cache)
    get_celeba(cfg, size=64)
    assert os.path.getmtime(cache) == mtime
