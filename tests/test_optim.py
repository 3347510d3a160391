"""Optimizer transforms + headline-metric semantics pinned to the reference."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from split_vae_tpu.train.optim import clip_by_per_tensor_norm


def test_clip_per_tensor_matches_keras_clipnorm():
    """Keras Adam(clipnorm=c) clips EACH tensor by its own L2 norm
    (spair/main.py:109): tensors under the threshold pass through unchanged,
    tensors over it are rescaled to norm c — independently per leaf."""
    tx = clip_by_per_tensor_norm(1.0)
    grads = {
        "small": jnp.asarray([0.3, 0.4]),          # norm 0.5 -> unchanged
        "big": jnp.asarray([[3.0, 4.0]]),          # norm 5.0 -> scaled to 1.0
    }
    state = tx.init(grads)
    out, _ = tx.update(grads, state)
    np.testing.assert_allclose(np.asarray(out["small"]), [0.3, 0.4], rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out["big"]), [[3.0 / 5.0, 4.0 / 5.0]], rtol=1e-6)
    assert abs(float(jnp.linalg.norm(out["big"])) - 1.0) < 1e-6


def test_clip_per_tensor_differs_from_global_norm():
    """The distinction that motivated the fix: one exploding tensor must not
    shrink another tensor that is already under the threshold."""
    grads = {"a": jnp.asarray([0.5, 0.0]), "b": jnp.asarray([100.0, 0.0])}
    per, _ = clip_by_per_tensor_norm(1.0).update(
        grads, clip_by_per_tensor_norm(1.0).init(grads))
    glob, _ = optax.clip_by_global_norm(1.0).update(
        grads, optax.clip_by_global_norm(1.0).init(grads))
    np.testing.assert_allclose(np.asarray(per["a"]), [0.5, 0.0], rtol=1e-6)
    assert float(glob["a"][0]) < 0.01  # global clipping crushes the small leaf


def test_clip_per_tensor_zero_grad_is_safe():
    grads = {"z": jnp.zeros((3,))}
    tx = clip_by_per_tensor_norm(1.0)
    out, _ = tx.update(grads, tx.init(grads))
    assert np.all(np.isfinite(np.asarray(out["z"])))
    np.testing.assert_array_equal(np.asarray(out["z"]), np.zeros(3))


def test_mape_matches_tf_keras_semantics():
    """spair/trainer.py:298 uses tf.keras mean_absolute_percentage_error:
    err / max(|y_true|, 1e-7) * 100 — zero-count labels contribute err*1e9."""
    from split_vae_tpu.core.config import SpairConfig
    from split_vae_tpu.train.steps import make_spair_eval_step
    from split_vae_tpu.models.spair import get_spair_model
    from split_vae_tpu.core.state import create_train_state

    config = SpairConfig(model="spair", batch_size=4, latent_size=8,
                         bg_latent_size=4, image_size=(48, 48, 3))
    model = get_spair_model(config)
    state = create_train_state(
        model, jnp.zeros((4, 48, 48, 3), jnp.float32), optax.adam(1e-4), seed=0)
    eval_step = make_spair_eval_step(config, model.apply)
    batch = jnp.zeros((4, 48, 48, 3), jnp.float32)
    labels = jnp.asarray([0.0, 1.0, 2.0, 3.0])
    out, metrics, _ = eval_step(state.params, jax.random.PRNGKey(0), batch, labels)

    pred = np.sum(np.round(jax.nn.sigmoid(np.asarray(out.z_pres_logits))),
                  axis=(1, 2, 3))
    err = np.abs(np.asarray(labels) - pred)
    expected = np.mean(err / np.maximum(np.abs(np.asarray(labels)), 1e-7) * 100.0)
    np.testing.assert_allclose(float(metrics["MAPE test"]), expected, rtol=1e-5)
    np.testing.assert_allclose(float(metrics["MAE test"]), err.mean(), rtol=1e-5)


def test_nan_robust_skips_nonfinite_updates():
    """nan_robust must leave params untouched on NaN/Inf grads and count the
    skip, then resume applying on the next finite gradient."""
    from split_vae_tpu.train.optim import nan_robust, notfinite_count

    tx = nan_robust(optax.sgd(1.0))
    params = {"w": jnp.asarray([1.0, 2.0])}
    state = tx.init(params)

    bad = {"w": jnp.asarray([jnp.nan, 1.0])}
    upd, state = tx.update(bad, state, params)
    params_after_bad = optax.apply_updates(params, upd)
    np.testing.assert_array_equal(np.asarray(params_after_bad["w"]), [1.0, 2.0])
    assert int(notfinite_count(state)) == 1

    good = {"w": jnp.asarray([0.5, 0.5])}
    upd, state = tx.update(good, state, params_after_bad)
    params_after_good = optax.apply_updates(params_after_bad, upd)
    np.testing.assert_allclose(np.asarray(params_after_good["w"]), [0.5, 1.5])
    assert int(notfinite_count(state)) == 1


def test_nan_robust_never_gives_up():
    """Regression: optax.apply_if_finite(tx, n) APPLIES the poisoned update
    after n consecutive bad steps (observed destroying a 30k-step LG-SPAIR
    run); nan_robust must skip indefinitely and keep Adam state clean."""
    from split_vae_tpu.train.optim import nan_robust, notfinite_count

    tx = nan_robust(optax.adam(0.1))
    params = {"w": jnp.asarray([1.0, 2.0])}
    state = tx.init(params)
    bad = {"w": jnp.asarray([jnp.nan, jnp.inf])}
    for _ in range(50):  # far past apply_if_finite's default threshold
        upd, state = tx.update(bad, state, params)
        params = optax.apply_updates(params, upd)
    np.testing.assert_array_equal(np.asarray(params["w"]), [1.0, 2.0])
    assert int(notfinite_count(state)) == 50

    good = {"w": jnp.asarray([1.0, 1.0])}
    upd, state = tx.update(good, state, params)
    params = optax.apply_updates(params, upd)
    assert np.all(np.isfinite(np.asarray(params["w"])))
    assert not np.array_equal(np.asarray(params["w"]), [1.0, 2.0])
