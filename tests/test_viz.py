"""Smoke tests for the viz layer (canvas math + artifact writers)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from split_vae_tpu.viz.canvases import (
    draw_bounding_boxes,
    grid_canvas,
    stack_rows,
    to_unit,
)


def test_grid_canvas_layout():
    imgs = np.arange(4 * 2 * 2 * 1).reshape(4, 2, 2, 1).astype(float)
    canvas = grid_canvas(imgs, 2, 2)
    assert canvas.shape == (4, 4, 1)
    np.testing.assert_array_equal(canvas[:2, :2], imgs[0])
    np.testing.assert_array_equal(canvas[2:, 2:], imgs[3])


def test_stack_rows_layout():
    a = np.ones((3, 2, 2, 1))
    b = np.zeros((3, 2, 2, 1))
    canvas = stack_rows(a, b)
    assert canvas.shape == (4, 6, 1)
    assert canvas[:2].all() and not canvas[2:].any()


def test_to_unit():
    np.testing.assert_allclose(to_unit(np.array([-1.0, 0.0, 1.0, 5.0])), [0, 0.5, 1, 1])


def test_draw_bounding_boxes():
    imgs = np.zeros((1, 10, 10, 3))
    boxes = np.array([[[0.2, 0.2, 0.8, 0.8]]])
    out = draw_bounding_boxes(imgs, boxes, color=(1, 1, 1))
    assert out[0, 2, 2:8].all()  # top edge painted
    assert out[0, 2:8, 2].all()  # left edge painted
    assert not out[0, 5, 5].any()  # interior untouched
    # zero boxes skipped
    out2 = draw_bounding_boxes(imgs, np.zeros((1, 2, 4)))
    assert not out2.any()


def test_vae_artifact_writers(tmp_path):
    from split_vae_tpu.models.vae import LGVae
    from split_vae_tpu.viz import artifacts as viz

    model = LGVae(8, 8, (16, 16))
    x = jnp.zeros((12, 16, 16, 6))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x)
    params = variables["params"]
    key = jax.random.PRNGKey(2)
    images = np.random.RandomState(0).uniform(-1, 1, (24, 16, 16, 6)).astype(np.float32)

    viz.generate(model, params, key, filename="gen", filepath=str(tmp_path))
    viz.reconstruction_test_lg_vae(model, params, images, key, filename="_t",
                                   filepath=str(tmp_path), n=4)
    viz.generate_varying_latent(model, params, key, vary="lower", filepath=str(tmp_path))
    viz.generate_varying_latent(model, params, key, vary="upper", filepath=str(tmp_path))
    viz.style_transfer_celeba(model, params, images, key, filename="_t",
                              filepath=str(tmp_path), n=4)
    viz.style_transfer_test(model, params, images[:, :, :, :3], key, filename="_t",
                            filepath=str(tmp_path), n=4)
    for f in ("gen.png", "x_reconstruction_test_t.png", "x_hat_reconstruction_test_t.png",
              "generate_varying_latent_lower.png", "x_hat_generate_varying_latent_lower.png",
              "generate_varying_latent_upper.png", "style_transfer_celeba_t.png",
              "style_transfer_t.png"):
        assert os.path.exists(os.path.join(str(tmp_path), f)), f


def test_gm_artifact_writers(tmp_path):
    from split_vae_tpu.models.vae import GMVae, LGGMVae
    from split_vae_tpu.viz import artifacts as viz

    model = LGGMVae(8, 8, (16, 16), y_size=5, tau=0.4)
    x = jnp.zeros((4, 16, 16, 6))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)}, x)
    params = variables["params"]
    key = jax.random.PRNGKey(3)
    images = np.random.RandomState(0).uniform(-1, 1, (16, 16, 16, 6)).astype(np.float32)

    for vary in ("zg", "zg_zl", "y_zg"):
        viz.generate_cluster(model, params, key, vary=vary, filepath=str(tmp_path))
        assert os.path.exists(os.path.join(str(tmp_path), f"generate_cluster_{vary}.png"))
    viz.unseen_cluster_lg(model, params, [images], key, filename="t", filepath=str(tmp_path))

    gm = GMVae(8, (16, 16), y_size=5, tau=0.4)
    gvars = gm.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)}, x)
    viz.unseen_cluster(gm, gvars["params"], images, key, filename="_t",
                       filepath=str(tmp_path), n=4)
    assert os.path.exists(os.path.join(str(tmp_path), "unseen_cluster_t.png"))
    viz.plot_latent_dims(gm, gvars["params"], [images[:8]], key, filepath=str(tmp_path))
    assert os.path.exists(os.path.join(str(tmp_path), "2d_latent_var.png"))
