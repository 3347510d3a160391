"""Tests for data loaders, MultiCUB generator, checkpointing, metrics, config."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from split_vae_tpu.core import checkpoint as ckpt
from split_vae_tpu.core.config import SpairConfig, VaeConfig, parse_spair_args, parse_vae_args
from split_vae_tpu.core.metrics import AccuracyMetric, MeanMetrics, linear_assignment
from split_vae_tpu.core.state import create_train_state
from split_vae_tpu.data.loader import ArrayDataset, device_prefetch, iterate_batches
from split_vae_tpu.data.multicub import MultiCUB, create_multicub_cache, synthetic_sprites
from split_vae_tpu.data.svhn import _one_hot_labels, synthetic_svhn


def test_iterate_batches_shapes_and_reshuffle():
    ds = ArrayDataset(np.arange(100).reshape(100, 1, 1, 1).astype(np.uint8))
    batches = list(iterate_batches(ds, 32, seed=0))
    assert len(batches) == 3  # drop remainder
    assert all(b.shape == (32, 1, 1, 1) for b in batches)
    it = iterate_batches(ds, 32, repeat=True, seed=0)
    e1 = np.concatenate([next(it).ravel() for _ in range(3)])
    e2 = np.concatenate([next(it).ravel() for _ in range(3)])
    assert not np.array_equal(e1, e2)  # reshuffled per epoch


def test_iterate_batches_with_labels():
    ds = ArrayDataset(np.zeros((10, 2, 2, 3), np.uint8), np.arange(10))
    imgs, labels = next(iterate_batches(ds, 5, shuffle=False))
    assert imgs.shape == (5, 2, 2, 3) and labels.shape == (5,)


def test_device_prefetch_preserves_order_and_content():
    ds = ArrayDataset(np.arange(64).reshape(64, 1, 1, 1).astype(np.uint8))
    plain = list(iterate_batches(ds, 16, shuffle=False))
    fetched = list(device_prefetch(iterate_batches(ds, 16, shuffle=False), size=2))
    assert len(plain) == len(fetched)
    for a, b in zip(plain, fetched):
        np.testing.assert_array_equal(a, np.asarray(b))


def test_svhn_label_remap():
    # digit 0 stored as class 10 -> one-hot at index 9 (vae/data.py:56)
    oh = _one_hot_labels(np.array([10, 1, 5]))
    assert oh.shape == (3, 10)
    assert oh[0].argmax() == 9 and oh[1].argmax() == 0 and oh[2].argmax() == 4


def test_synthetic_svhn_deterministic():
    a = synthetic_svhn(n_train=8, n_test=4, seed=1)
    b = synthetic_svhn(n_train=8, n_test=4, seed=1)
    np.testing.assert_array_equal(a[0], b[0])
    assert a[0].dtype == np.uint8 and a[0].shape == (8, 32, 32, 3)


def test_synthetic_svhn_digits_clusterable():
    """The 'digits' flavor (quality-run stand-in for real SVHN): SVHN
    shapes/label conventions, deterministic, and the 10 classes are visually
    distinct (per-class mean images well separated — the property the blobs
    flavor lacks, BASELINE.md §Quality)."""
    from split_vae_tpu.data.svhn import synthetic_svhn_digits

    a = synthetic_svhn_digits(n_train=200, n_test=40, seed=3)
    b = synthetic_svhn_digits(n_train=200, n_test=40, seed=3)
    np.testing.assert_array_equal(a[0], b[0])
    x, y = a[0], a[1]
    assert x.dtype == np.uint8 and x.shape == (200, 32, 32, 3)
    assert y.min() >= 1 and y.max() <= 10  # .mat-style 1..10
    means = np.stack([x[y == c].mean(axis=0) for c in range(1, 11)])
    gray = means.mean(axis=-1)  # color is random; shape carries the class
    dists = [np.abs(gray[i] - gray[j]).mean()
             for i in range(10) for j in range(i + 1, 10)]
    assert min(dists) > 2.0, min(dists)


def test_synthetic_sprites_contrast_knob():
    """sprite_min_color raises the sprite color floor (anti-collapse ablation
    knob); foreground pixels obey color >= min_color scaled by the 0.7..1.0
    vertical shading, and default 60 is unchanged."""
    hi = synthetic_sprites(16, 0, min_color=140.0)
    fg = hi[hi > 0]
    # each drawn channel value = color * shade, color >= 140, shade >= 0.7
    assert fg.min() >= 140.0 * 0.7 - 1e-3
    np.testing.assert_array_equal(synthetic_sprites(8, 1),
                                  synthetic_sprites(8, 1, min_color=60.0))


def test_multicub_sample_counts_and_range():
    cub = MultiCUB(synthetic_sprites(16, 0), seed=0)
    imgs, counts = cub.create_dataset(8, digits=(0, 5), size=48, bg="solid_fixed", test=True)
    assert imgs.shape == (8, 48, 48, 3)
    assert imgs.min() >= 0.0 and imgs.max() <= 1.0
    assert counts.min() >= 0 and counts.max() <= 5


def test_multicub_ckb_rot_background():
    cub = MultiCUB(synthetic_sprites(16, 0), seed=0)
    img = cub.create_sample(0, 48, 48, bg="ckb_rot_6")
    assert img.shape == (48, 48, 3)
    # checkerboard has at least 2 distinct colors
    assert len(np.unique(img.reshape(-1, 3), axis=0)) >= 2


def test_multicub_cache_roundtrip(tmp_path):
    path = create_multicub_cache("cub_solid_fixed", str(tmp_path), n_train=16,
                                 n_eval=8, synthetic=True)
    assert os.path.exists(path)
    with np.load(path) as z:
        assert z["train"].shape == (16, 48, 48, 3)
        assert z["count_test"].shape == (8,)
    # second call hits the cache (same path, no regen)
    assert create_multicub_cache("cub_solid_fixed", str(tmp_path), n_train=16,
                                 n_eval=8, synthetic=True) == path


def test_checkpoint_roundtrip(tmp_path):
    from split_vae_tpu.models.vae import LGVae

    model = LGVae(4, 4, (16, 16))
    state = create_train_state(model, jnp.zeros((2, 16, 16, 6)), optax.adam(1e-3))
    state = state.replace(step=jnp.asarray(42, jnp.int32))
    path = ckpt.save_checkpoint(str(tmp_path), state)
    assert "checkpoint_42" in path

    fresh = create_train_state(model, jnp.zeros((2, 16, 16, 6)), optax.adam(1e-3), seed=9)
    restored = ckpt.restore_checkpoint(str(tmp_path), fresh)
    assert int(restored.step) == 42
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_migrates_apply_if_finite_opt_state(tmp_path):
    """Checkpoints written before the nan_robust switch (round 2) serialized
    ``optax.ApplyIfFiniteState``; restore must map them onto the current
    ``SkipNonFiniteState`` layout instead of failing the treedef match."""
    from split_vae_tpu.models.vae import LGVae
    from split_vae_tpu.train import optim

    model = LGVae(4, 4, (16, 16))
    inner = optax.chain(optim.clip_by_per_tensor_norm(1.0), optim.adam(1e-3))
    old_state = create_train_state(
        model, jnp.zeros((2, 16, 16, 6)), optax.apply_if_finite(inner, 20))
    old_state = old_state.replace(step=jnp.asarray(7, jnp.int32))
    ckpt.save_checkpoint(str(tmp_path), old_state)

    fresh = create_train_state(
        model, jnp.zeros((2, 16, 16, 6)), optim.nan_robust(inner), seed=9)
    restored = ckpt.restore_checkpoint(str(tmp_path), fresh)
    assert int(restored.step) == 7
    assert int(restored.opt_state.total_notfinite) == 0
    for a, b in zip(jax.tree.leaves(old_state.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_mean_metrics_and_accuracy():
    mm = MeanMetrics()
    mm.update({"a": jnp.asarray(1.0)})
    mm.update({"a": jnp.asarray(3.0), "b": 5.0})
    r = mm.result()
    assert r["a"] == 2.0 and r["b"] == 5.0
    mm.reset()
    assert mm.result() == {}

    acc = AccuracyMetric()
    acc.update(np.eye(3), np.eye(3))
    assert acc.result() == 1.0


def test_linear_assignment_majority_vote():
    # 2 clusters, cluster 0 mostly class 1, cluster 1 mostly class 0
    labels = np.eye(2)[[1, 1, 1, 0, 0, 0]]
    pred = np.array([[9, 0], [9, 0], [9, 0], [0, 9], [0, 9], [9, 0]], float)
    out = linear_assignment(labels, pred)
    assert (out.argmax(1) == np.array([1, 1, 1, 0, 0, 1])).all()


def test_parse_vae_args_reference_flags():
    cfg = parse_vae_args(["--beta", "1", "--patch_size", "1"])
    assert cfg.beta == 1.0 and cfg.patch_size == 1
    assert cfg.model == "lgvae" and cfg.batch_size == 64 and cfg.y_size == 30
    assert cfg.tau == 0.4 and cfg.alpha == 40 and cfg.training_steps == 1_000_000
    cfg = parse_vae_args(["--model", "lggmvae", "-no_label", "-viz", "-allow_growth",
                          "--training_steps", "3000000"])
    assert cfg.no_label and not cfg.label and cfg.viz
    assert cfg.training_steps == 3_000_000


def test_parse_spair_args_reference_flags():
    cfg = parse_spair_args([
        "--dataset", "cub_ckb_rot_6", "--z_bg_beta", "1", "--patch_size", "8",
        "--latent_size", "64", "--bg_latent_size", "64", "--local_latent_size", "64",
        "--model", "lg_spair", "-split_z_l", "--z_what_beta", "0.5",
        "-concat_z_what", "-dense_local", "-dense_bg", "--training_steps", "200000"])
    assert cfg.model == "lg_spair" and cfg.split_z_l and cfg.concat_z_what
    assert cfg.dense_local and cfg.dense_bg and cfg.latent_size == 64
    assert cfg.z_what_beta == 0.5 and cfg.training_steps == 200_000
    assert cfg.image_size == (48, 48, 3)
    # phantom options default off like dotdict-None (spair/spair.py:58,63)
    assert not cfg.bg_model and not cfg.concat_z_bg


def test_checkpoint_retention(tmp_path):
    from split_vae_tpu.models.vae import LGVae

    model = LGVae(4, 4, (16, 16))
    state = create_train_state(model, jnp.zeros((2, 16, 16, 6)), optax.adam(1e-3))
    for step in (1, 2, 3, 4, 5):
        ckpt.save_checkpoint(str(tmp_path), state.replace(step=jnp.asarray(step)), keep=3)
    names = sorted(os.listdir(str(tmp_path)))
    assert names == ["checkpoint_3.msgpack", "checkpoint_4.msgpack", "checkpoint_5.msgpack"]
    assert ckpt.latest_checkpoint(str(tmp_path)).endswith("checkpoint_5.msgpack")


def test_opt_state_migration_scoped_to_opt_state_subtree():
    """A params (or batch_stats) dict whose key set coincidentally equals the
    legacy ``ApplyIfFiniteState`` field names must NOT be rewritten on
    restore — only the opt_state subtree is migrated (ADVICE round 3)."""
    decoy = {"notfinite_count": 1, "last_finite": 2,
             "total_notfinite": 3, "inner_state": {"x": 4}}
    raw = {
        "step": 0,
        "params": {"decoy_layer": dict(decoy)},
        "opt_state": {"0": dict(decoy)},
    }
    out = ckpt._migrate_raw(raw)
    # params untouched, byte-identical structure
    assert out["params"]["decoy_layer"] == decoy
    # opt_state migrated onto the SkipNonFiniteState layout
    assert out["opt_state"]["0"] == {
        "total_notfinite": 3, "inner_state": {"x": 4}}
