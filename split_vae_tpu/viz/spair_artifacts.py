"""SPAIR-family PNG artifact generators.

Mirrors spair/visualizer.py's surface (and its filename typos, which are part
of the reference's output contract): reconstruction_test ->
``x_reconstrcution_test<suffix>.png`` [sic, spair/visualizer.py:79],
reconstruction_bbox -> ``x_reconstrcution_bbox<suffix>.png``,
glimpses_reconstruction_test -> ``glimpses<suffix>.png``,
x_hat_reconstruction_test -> ``x_hat_reconstrcution_test<suffix>.png``.
"""

from __future__ import annotations

import functools as _functools
import os

import matplotlib
import numpy as np

matplotlib.use("agg")
import matplotlib.pyplot as plt  # noqa: E402

from split_vae_tpu.viz.canvases import draw_bounding_boxes, stack_rows  # noqa: E402


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-np.asarray(x)))


@_functools.lru_cache(maxsize=None)
def _forward_jit(apply_fn):
    import jax

    def fwd(params, images, key):
        # fused=False: viz needs the materialized per-cell canvases.
        return apply_fn({"params": params}, images, True, fused=False,
                        rngs={"sample": key})

    return jax.jit(fwd)


def _forward(apply_fn, params, images, key):
    # Jitted (keyed by the bound apply_fn): the viz forwards used to run
    # eagerly, dispatching ~700 single-op programs per eval — this was the
    # dominant cost of the eval/viz cadence on CPU (and most of the
    # integration-test suite's wall time). One compile, shared by all five
    # generators at a given image shape.
    import jax.numpy as jnp

    return _forward_jit(apply_fn)(params, jnp.asarray(images), key)


def reconstruction_test(apply_fn, params, images, key, filename="", filepath=".", n=10):
    """3-panel per-cell decomposition (spair/visualizer.py:14-81)."""
    images = np.asarray(images[:n])
    n = images.shape[0]
    out = _forward(apply_fn, params, images, key)
    h, w = images.shape[1:3]
    channel = min(3, images.shape[3])
    num_cells = out.z_where.shape[1] * out.z_where.shape[2]

    obj_recon = np.asarray(out.obj_full_recon_unnorm[..., :channel])
    obj_alpha = np.asarray(out.obj_full_recon_unnorm[..., channel:])
    z_depth = np.asarray(out.z_depth).reshape(n, num_cells, 1, 1, 1)
    z_pres = np.round(_sigmoid(out.z_pres_logits)).reshape(n, num_cells, 1, 1, 1)
    x_recon = np.asarray(out.x_recon)

    canvas = np.empty((h * (num_cells + 2), w * n, channel))
    canvas_weighted = np.empty_like(canvas)
    canvas_weights = np.zeros_like(canvas)
    for i in range(n):
        cols = np.s_[i * w:(i + 1) * w]
        canvas[0:h, cols] = canvas_weighted[0:h, cols] = canvas_weights[0:h, cols] = (
            images[i, :, :, :3])
        canvas[h:2 * h, cols] = canvas_weighted[h:2 * h, cols] = (
            canvas_weights[h:2 * h, cols]) = x_recon[i]
        canvas[2 * h:, i * w:(i + 1) * w, :] = obj_recon[i].reshape(num_cells * h, w, channel)
        weighted = obj_recon[i] * obj_alpha[i] * z_pres[i] * _sigmoid(-z_depth[i])
        canvas_weighted[2 * h:, i * w:(i + 1) * w, :] = weighted.reshape(num_cells * h, w, channel)
        weights = (np.ones_like(obj_alpha[i]) * z_pres[i]).reshape(num_cells * h, w)
        canvas_weights[2 * h:, i * w:(i + 1) * w, 0] = weights

    f, ax = plt.subplots(1, 3, figsize=(12, 3 * (num_cells + 2) // 2))
    for a, (c, title, cmap) in zip(ax, [
        (canvas, "reconstruction", "gray"),
        (canvas_weighted, "reconstruction weighted", "gray"),
        (canvas_weights, "weights", "inferno"),
    ]):
        a.imshow(np.squeeze(np.clip(c, 0, 1)), cmap=cmap)
        a.set_title(title)
        a.tick_params(top=False, bottom=False, left=False, right=False,
                      labelleft=False, labelbottom=False)
    plt.savefig(os.path.join(filepath, f"x_reconstrcution_test{filename}.png"), dpi=150)
    plt.close(f)
    return canvas


def reconstruction_bbox(apply_fn, params, images, key, filename="", filepath=".", n=10):
    """bbox overlays gated by rounded z_pres (spair/visualizer.py:84-137)."""
    images = np.asarray(images[:n])
    n = images.shape[0]
    out = _forward(apply_fn, params, images, key)
    num_cells = out.z_where.shape[1] * out.z_where.shape[2]
    z_pres = np.round(_sigmoid(out.z_pres_logits)).reshape(n, num_cells, 1)
    boxes = np.asarray(out.obj_bbox_mask) * z_pres
    x_recon = np.asarray(out.x_recon)
    recon_w_bbox = draw_bounding_boxes(x_recon, boxes)
    img_w_bbox = draw_bounding_boxes(images[:, :, :, :3], boxes)
    canvas = stack_rows(images[:, :, :, :3], img_w_bbox, recon_w_bbox)
    plt.figure(figsize=(2 * n, 6))
    plt.imshow(np.clip(canvas, 0, 1))
    plt.axis("off")
    plt.savefig(os.path.join(filepath, f"x_reconstrcution_bbox{filename}.png"), dpi=150)
    plt.close()
    return canvas


def glimpses_reconstruction_test(apply_fn, params, images, key, filename="",
                                 filepath=".", n=10):
    """Glimpse vs glimpse-recon vs alpha grids (spair/visualizer.py:140-202)."""
    images = np.asarray(images[:n])
    n = images.shape[0]
    out = _forward(apply_fn, params, images, key)
    channel = min(3, images.shape[3])
    num_cells = out.z_where.shape[1] * out.z_where.shape[2]
    os_ = out.obj_recon_alpha.shape[2]
    glimpses = np.asarray(out.all_glimpses)[:n, :, :, :, :channel]
    recon = np.asarray(out.obj_recon_unnorm)[:n]
    alpha = np.asarray(out.obj_recon_alpha)[:n]

    cg = np.empty((os_ * num_cells, os_ * n, channel))
    cr = np.empty_like(cg)
    ca = np.zeros((os_ * num_cells, os_ * n))
    for i in range(n):
        cg[:, i * os_:(i + 1) * os_, :] = glimpses[i].reshape(num_cells * os_, os_, channel)
        cr[:, i * os_:(i + 1) * os_, :] = recon[i].reshape(num_cells * os_, os_, channel)
        ca[:, i * os_:(i + 1) * os_] = alpha[i].reshape(num_cells * os_, os_)

    f, ax = plt.subplots(1, 3, figsize=(12, 12))
    for a, (c, title, cmap) in zip(ax, [
        (cg, "Glimpses", "gray"),
        (cr, "Glimpses reconstruction", "gray"),
        (ca, "Glimpses alpha", "viridis"),
    ]):
        a.imshow(np.squeeze(np.clip(c, 0, 1)), cmap=cmap)
        a.set_title(title)
        a.tick_params(top=False, bottom=False, left=False, right=False,
                      labelleft=False, labelbottom=False)
    plt.savefig(os.path.join(filepath, f"glimpses{filename}.png"), dpi=150)
    plt.close(f)
    return cg


def glimpses_local_reconstruction_test(apply_fn, params, images, key, filename="",
                                       filepath=".", n=10):
    """Scrambled glimpse vs local-path recon grids (spair/visualizer.py:204-257).

    Only meaningful for lg_glimpse_spair (out.x_hat / out.x_hat_recon are
    per-glimpse [B, K, os, os, C]).
    """
    images = np.asarray(images[:n])
    n = images.shape[0]
    out = _forward(apply_fn, params, images, key)
    channel = min(3, images.shape[3])
    num_cells = out.z_where.shape[1] * out.z_where.shape[2]
    os_ = out.obj_recon_alpha.shape[2]
    x_hat = np.asarray(out.x_hat)[:n]
    x_hat_recon = np.asarray(out.x_hat_recon)[:n]

    cg = np.empty((os_ * num_cells, os_ * n, channel))
    cr = np.empty_like(cg)
    for i in range(n):
        cg[:, i * os_:(i + 1) * os_, :] = x_hat[i].reshape(num_cells * os_, os_, channel)
        cr[:, i * os_:(i + 1) * os_, :] = x_hat_recon[i].reshape(num_cells * os_, os_, channel)

    f, ax = plt.subplots(1, 2, figsize=(8, 12))
    for a, (c, title) in zip(ax, [(cg, "Glimpses"), (cr, "Glimpses reconstruction")]):
        a.imshow(np.squeeze(np.clip(c, 0, 1)), cmap="gray")
        a.set_title(title)
        a.tick_params(top=False, bottom=False, left=False, right=False,
                      labelleft=False, labelbottom=False)
    plt.savefig(os.path.join(filepath, f"glimpses_local{filename}.png"), dpi=150)
    plt.close(f)
    return cg


def x_hat_reconstruction_test(apply_fn, params, images, key, filename="",
                              filepath=".", n=10):
    """LG-SPAIR local-path recon strip (spair/visualizer.py:259-285)."""
    images = np.asarray(images[:n])
    n = images.shape[0]
    out = _forward(apply_fn, params, images, key)
    canvas = stack_rows(np.asarray(out.x_hat_recon)[:n], images[:, :, :, 3:6])
    plt.figure(figsize=(2 * n, 4))
    plt.imshow(np.clip(canvas, 0, 1))
    plt.axis("off")
    plt.savefig(os.path.join(filepath, f"x_hat_reconstrcution_test{filename}.png"), dpi=150)
    plt.close()
    return canvas


def train_decomposition_plot(images, out, filename="", filepath=".", n=10):
    """Inline 3-panel decomposition from a train step (spair/trainer.py:331-378)."""
    images = np.asarray(images)
    n = min(n, images.shape[0])
    num_cells = out.z_where.shape[1] * out.z_where.shape[2]
    h, w = images.shape[1:3]
    channel = min(3, images.shape[3])
    obj_recon = np.asarray(out.obj_full_recon_unnorm[..., :channel])
    obj_alpha = np.asarray(out.obj_full_recon_unnorm[..., channel:])
    b = images.shape[0]
    z_depth = np.asarray(out.z_depth).reshape(b, num_cells, 1, 1, 1)
    z_pres = np.asarray(out.z_pres).reshape(b, num_cells, 1, 1, 1)
    x_recon = np.asarray(out.x_recon)

    canvas = np.empty((h * (num_cells + 2), w * n, channel))
    canvas_weighted = np.empty_like(canvas)
    canvas_weights = np.zeros_like(canvas)
    for i in range(n):
        canvas[0:h, i * w:(i + 1) * w] = canvas_weighted[0:h, i * w:(i + 1) * w] = (
            canvas_weights[0:h, i * w:(i + 1) * w]) = images[i, :, :, :3]
        canvas[h:2 * h, i * w:(i + 1) * w] = canvas_weighted[h:2 * h, i * w:(i + 1) * w] = (
            canvas_weights[h:2 * h, i * w:(i + 1) * w]) = x_recon[i]
        canvas[2 * h:, i * w:(i + 1) * w] = obj_recon[i].reshape(num_cells * h, w, channel)
        weighted = obj_recon[i] * obj_alpha[i] * z_pres[i] * _sigmoid(-z_depth[i])
        canvas_weighted[2 * h:, i * w:(i + 1) * w] = weighted.reshape(num_cells * h, w, channel)
        canvas_weights[2 * h:, i * w:(i + 1) * w, 0] = (
            np.ones_like(obj_alpha[i]) * z_pres[i]).reshape(num_cells * h, w)

    f, ax = plt.subplots(1, 3, figsize=(12, 3 * (num_cells + 2) // 2))
    for a, (c, title, cmap) in zip(ax, [
        (canvas, "reconstruction", "gray"),
        (canvas_weighted, "reconstruction weighted", "gray"),
        (canvas_weights, "weights", "inferno"),
    ]):
        a.imshow(np.squeeze(np.clip(c, 0, 1)), cmap=cmap)
        a.set_title(title)
        a.tick_params(top=False, bottom=False, left=False, right=False,
                      labelleft=False, labelbottom=False)
    plt.savefig(os.path.join(filepath, f"train_recon_it_{filename}.png"), dpi=150)
    plt.close(f)
