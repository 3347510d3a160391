"""VAE-family PNG artifact generators.

Mirrors vae/visualizer.py's public surface and artifact filenames:
  generate / reconstruction_test_lg_vae / style_transfer_test /
  style_transfer_celeba / generate_varying_latent / generate_cluster /
  unseen_cluster_lg.

Each function takes (model, params, key, ...) and works on host numpy after a
single batched device call.
"""

from __future__ import annotations

import os
import functools
from collections import defaultdict
import jax
import jax.numpy as jnp
import matplotlib
import numpy as np

matplotlib.use("agg")
import matplotlib.pyplot as plt  # noqa: E402

from split_vae_tpu.models.vae import LGGMVae  # noqa: E402
from split_vae_tpu.viz.canvases import grid_canvas, stack_rows, to_unit  # noqa: E402

# Hand-picked SVHN test indices used for style transfer (vae/visualizer.py:59).
SVHN_STYLE_IDX = np.array(
    [26, 101, 3025, 3129, 3182, 3233, 3547, 3695, 10462, 10471, 10601, 10608,
     16171, 16289, 16593, 16801, 101, 326, 333, 798, 841, 1189, 6186, 2651,
     1437, 1826, 5536])


def _save(canvas: np.ndarray, path: str, figsize=None) -> None:
    plt.figure(figsize=figsize or (8, 8))
    plt.imshow(np.squeeze(canvas), cmap="gray")
    plt.axis("off")
    plt.savefig(path, dpi=150, bbox_inches="tight")
    plt.close()


# All viz forwards are jitted (cached per model/method): run eagerly they
# dispatch hundreds of single-op programs per artifact, which dominated the
# eval/viz cadence on CPU.


@functools.lru_cache(maxsize=None)
def _encode_jit(model):
    return jax.jit(lambda p, x, k: model.apply(
        {"params": p}, x, method="encode", rngs={"sample": k}))


def _encode(model, params, images, key):
    return _encode_jit(model)(params, jnp.asarray(images), key)


@functools.lru_cache(maxsize=None)
def _decode_jit(model, with_zl, rescale):
    if with_zl:
        return jax.jit(lambda p, zg, zl: model.apply(
            {"params": p}, zg, zl, rescale, method="decode"))
    return jax.jit(lambda p, zg: model.apply(
        {"params": p}, zg, rescale, method="decode"))


def _decode(model, params, z_g, z_l=None, rescale=True):
    if z_l is None:
        return _decode_jit(model, False, rescale)(params, jnp.asarray(z_g))
    return _decode_jit(model, True, rescale)(
        params, jnp.asarray(z_g), jnp.asarray(z_l))


@functools.lru_cache(maxsize=None)
def _prior_for_y_jit(model):
    return jax.jit(lambda p, y: model.apply({"params": p}, y, method="encode_y"))


def _prior_for_y(model, params, y):
    return _prior_for_y_jit(model)(params, jnp.asarray(y))


@functools.lru_cache(maxsize=None)
def _get_y_jit(model):
    return jax.jit(lambda p, x, k: model.apply(
        {"params": p}, x, method="get_y", rngs={"sample": k}))


def _get_y(model, params, images, key):
    return _get_y_jit(model)(params, jnp.asarray(images), key)


def reconstruction_test_lg_vae(model, params, images, key, filename="", filepath=".", n=10):
    """Paired recon/input strips (vae/visualizer.py:13-55). ``images`` is an
    augmented 6-channel batch in [-1, 1]."""
    x_test = np.asarray(images[:n])
    z_x, z_l = _encode(model, params, x_test, key)
    x_recon, x_hat_recon = _decode(model, params, z_x, z_l, True)
    canvas_x = stack_rows(np.asarray(x_recon), to_unit(x_test[..., :3]))
    _save(canvas_x, os.path.join(filepath, f"x_reconstruction_test{filename}.png"),
          figsize=(2 * n, 4))
    canvas_x_hat = stack_rows(np.asarray(x_hat_recon), to_unit(x_test[..., 3:6]))
    _save(canvas_x_hat, os.path.join(filepath, f"x_hat_reconstruction_test{filename}.png"),
          figsize=(2 * n, 4))
    return canvas_x, canvas_x_hat


def style_transfer_test(model, params, test_images, key, filename="", filepath=".", n=10):
    """SVHN content/style swap on hand-picked digits (vae/visualizer.py:57-85).

    ``test_images``: full SVHN test array in [-1, 1], [N, 32, 32, 3].
    """
    k1, k2, k3 = jax.random.split(key, 3)
    # Hand-picked indices assume the full 26k SVHN test set; wrap for smaller
    # (e.g. synthetic) sets.
    pick = SVHN_STYLE_IDX % len(test_images)
    idx_x = jax.random.permutation(k1, len(pick))[:n]
    idx_h = jax.random.permutation(k2, len(pick))[:n]
    x = test_images[pick[np.asarray(idx_x)]]
    x_hat = test_images[pick[np.asarray(idx_h)]]
    x_test = np.concatenate([x, x_hat], axis=-1)
    z_x, z_l = _encode(model, params, x_test, k3)
    x_recon, _ = _decode(model, params, z_x, z_l, True)
    canvas = stack_rows(to_unit(x), to_unit(x_hat), np.asarray(x_recon))
    _save(canvas, os.path.join(filepath, f"style_transfer{filename}.png"))
    return canvas


def style_transfer_celeba(model, params, images, key, filename="", filepath=".", n=10):
    """CelebA style transfer (vae/visualizer.py:88-125). ``images``: augmented
    6-channel batch in [-1, 1] with at least 2n samples."""
    x_test = np.asarray(images)
    x = x_test[:n, :, :, :3]
    x_hat = x_test[n:2 * n, :, :, :3]
    x_2 = np.concatenate([x, x_hat], axis=-1)
    x_aug = np.concatenate([x_test[:n], x_2], axis=0)
    z_x, z_l = _encode(model, params, x_aug, key)
    x_recon, _ = _decode(model, params, z_x, z_l, True)
    x_recon = np.asarray(x_recon)
    canvas = stack_rows(
        to_unit(x_aug[:n, :, :, :3]), to_unit(x_aug[n:, :, :, 3:6]),
        x_recon[:n], x_recon[n:2 * n])
    _save(canvas, os.path.join(filepath, f"style_transfer_celeba{filename}.png"))
    return canvas


def generate(model, params, key, filename="generated_image", filepath="."):
    """10x10 prior samples; GM-aware (vae/visualizer.py:155-181)."""
    k_y, k_g, k_l = jax.random.split(key, 3)
    if isinstance(model, LGGMVae):
        y = jax.nn.one_hot(jax.random.randint(k_y, (1,), 0, model.y_size), model.y_size)
        pm, ps = _prior_for_y(model, params, y)
        z_g = pm + ps * jax.random.normal(k_g, (100, model.global_latent_dims))
        z_l = jax.random.normal(k_l, (100, model.local_latent_dims))
    else:
        z_g = jax.random.normal(k_g, (100, model.global_latent_dims))
        z_l = jax.random.normal(k_l, (100, model.local_latent_dims))
    x_gen, _ = _decode(model, params, z_g, z_l, True)
    canvas = grid_canvas(np.asarray(x_gen), 10, 10)
    _save(canvas, os.path.join(filepath, f"{filename}.png"))
    return canvas


def generate_varying_latent(model, params, key, vary, filename=None, filepath="."):
    """Vary-local ('lower') / vary-global ('upper') grids (vae/visualizer.py:201-270)."""
    k_y, k1, k2 = jax.random.split(key, 3)
    if isinstance(model, LGGMVae):
        y = jax.nn.one_hot(jax.random.randint(k_y, (1,), 0, model.y_size), model.y_size)
        pm, ps = _prior_for_y(model, params, y)
    else:
        pm, ps = 0.0, 1.0
    if vary == "lower":
        z_l = jax.random.normal(k1, (100, model.local_latent_dims))
        z_g = pm + ps * jax.random.normal(k2, (1, model.global_latent_dims))
        z_g = jnp.tile(z_g, (100, 1))
    elif vary == "upper":
        z_l = jnp.tile(jax.random.normal(k1, (1, model.local_latent_dims)), (100, 1))
        z_g = pm + ps * jax.random.normal(k2, (100, model.global_latent_dims))
    else:
        raise ValueError(vary)
    x_gen, x_hat_gen = _decode(model, params, z_g, z_l, True)
    name = filename or f"generate_varying_latent_{vary}"
    canvas = grid_canvas(np.asarray(x_gen), 10, 10)
    _save(canvas, os.path.join(filepath, f"{name}.png"))
    if vary == "lower":
        canvas_hat = grid_canvas(np.asarray(x_hat_gen), 10, 10)
        _save(canvas_hat, os.path.join(filepath, f"x_hat_{name}.png"))
        return canvas, canvas_hat
    return canvas


def generate_cluster(model, params, key, vary, filename=None, filepath="."):
    """Cluster-conditional generation for LGGMVae (vae/visualizer.py:272-314)."""
    k_y, k_g, k_l = jax.random.split(key, 3)
    y = jax.nn.one_hot(jax.random.randint(k_y, (1,), 0, model.y_size), model.y_size)
    pm, ps = _prior_for_y(model, params, y)
    if vary == "zg_zl":
        z_g = pm + ps * jax.random.normal(k_g, (10, model.global_latent_dims))
        z_g = jnp.repeat(z_g, 10, axis=0)
        z_l = jnp.tile(jax.random.normal(k_l, (10, model.local_latent_dims)), (10, 1))
    elif vary == "zg":
        z_g = pm + ps * jax.random.normal(k_g, (100, model.global_latent_dims))
        z_l = jnp.tile(jax.random.normal(k_l, (1, model.local_latent_dims)), (100, 1))
    elif vary == "y_zg":
        m = min(10, model.y_size)  # reference assumes y_size >= 10
        ys = jax.nn.one_hot(
            jax.random.permutation(k_y, model.y_size)[:m], model.y_size)
        pm, ps = _prior_for_y(model, params, ys)  # [m, D]
        per = -(-100 // m)
        eps = jax.random.normal(k_g, (m, per, model.global_latent_dims))
        z_g = (pm[:, None, :] + ps[:, None, :] * eps).reshape(m * per, -1)[:100]
        z_l = jnp.tile(jax.random.normal(k_l, (1, model.local_latent_dims)), (100, 1))
    else:
        raise ValueError(vary)
    x_gen, _ = _decode(model, params, z_g, z_l)
    name = filename or f"generate_cluster_{vary}"
    canvas = grid_canvas(np.asarray(x_gen), 10, 10)
    _save(canvas, os.path.join(filepath, f"{name}.png"))
    return canvas


def generate_traverse(model, params, filepath=".", span=3.0, n=30):
    """2-D latent traversal grid (vae/visualizer.py:183-198; CLI-unreachable
    in the reference, kept for API parity). Requires a 2-latent GMVae-style
    single-path model with total latent dims == 2."""
    if model.global_latent_dims != 2:
        raise NotImplementedError("Implemented for 2D latent only")
    zs = np.linspace(-span, span, n)
    z = jnp.asarray([[z1, z2] for z1 in zs for z2 in zs], jnp.float32)
    imgs = np.asarray(_decode(model, params, z))
    canvas = grid_canvas(imgs, n, n)
    _save(canvas, os.path.join(filepath, "latent_space.png"))
    return canvas


def plot_latent_dims(model, params, batches, key, filepath=".", variational=True):
    """Per-dimension latent histograms + 2-D scatter (vae/visualizer.py:128-153;
    CLI-unreachable in the reference, kept for API parity)."""
    zs = []
    for images in batches:
        key, sub = jax.random.split(key)
        z = _encode(model, params, images, sub)
        if isinstance(z, tuple):
            z = z[0]
        zs.append(np.asarray(z))
    z = np.concatenate(zs)
    tag = "var" if variational else "det"
    plt.figure()
    plt.scatter(z[:, 0], z[:, 1], s=1)
    plt.savefig(os.path.join(filepath, f"2d_latent_{tag}.png"))
    plt.close()
    for i in range(min(z.shape[1], 16)):
        plt.figure()
        plt.hist(z[:, i])
        plt.savefig(os.path.join(filepath, f"latent_{tag}_{i}.png"))
        plt.close()
    return z


def unseen_cluster(model, params, images, key, filename="", filepath=".", n=10):
    """Per-input cluster-prior samples for GMVae (vae/visualizer.py:442-479;
    CLI-unreachable in the reference, kept for API parity)."""
    x_test = np.asarray(images[:n])
    h, w = x_test.shape[1:3]
    key, k1, k2 = jax.random.split(key, 3)
    _, y_logits = _get_y(model, params, x_test, k1)
    discrete_y = jax.nn.one_hot(jnp.argmax(y_logits, axis=1), model.y_size)
    pm, ps = _prior_for_y(model, params, discrete_y)
    eps = jax.random.normal(k2, (n, 10, model.global_latent_dims))
    z_x = (pm[:, None, :] + ps[:, None, :] * eps).reshape(10 * n, -1)
    x_recon = np.asarray(_decode(model, params, z_x))
    canvas = np.empty((h * 11, w * n, 3))
    for i in range(n):
        canvas[0:h, i * w:(i + 1) * w] = to_unit(x_test[i, :, :, :3])
        canvas[h:, i * w:(i + 1) * w] = x_recon[i * 10:(i + 1) * 10].reshape(h * 10, w, 3)
    _save(canvas, os.path.join(filepath, f"unseen_cluster{filename}.png"))
    return canvas


# Extended hand-picked SVHN index set (vae/visualizer.py:389-391).
SVHN_CLUSTER_IDX = np.array(
    [26, 101, 3025, 3129, 3182, 3233, 3547, 3695, 10462, 10471, 10601, 10608,
     16171, 16289, 16593, 16801, 101, 326, 333, 798, 841, 1189, 6186, 2651,
     1437, 1826, 5536, 0, 3040, 3065, 3106, 3292, 3762, 10427, 10814, 16338,
     16505, 16606, 16655, 16875, 16880])


def unseen_cluster_lg_svhn(model, params, test_images, key, filename="", filepath="."):
    """Hand-picked-digit cluster galleries for LGGMVae (vae/visualizer.py:385-413;
    CLI-unreachable in the reference, kept for API parity).

    ``test_images``: SVHN test array in [-1, 1], [N, 32, 32, 3].
    """
    idx = SVHN_CLUSTER_IDX % len(test_images)
    x = test_images[idx]
    x_test = np.concatenate([x, x], axis=-1)  # tile to 6 channels (ref :398)
    h, w = x.shape[1:3]
    _, y_logits = _get_y(model, params, x_test, key)
    cluster = np.asarray(jnp.argmax(y_logits, axis=1))
    canvas = None
    for c in range(model.y_size):
        members = x[cluster == c]
        if len(members):
            canvas = stack_rows(to_unit(members))
            _save(canvas, os.path.join(filepath, f"unseen_cluster_{filename}_{c}.png"),
                  figsize=(2 * len(members), 2))
    return canvas


def unseen_cluster_svhn(model, params, test_images, key, filename="", filepath=".", n=10):
    """GMVae variant on hand-picked digits (vae/visualizer.py:481-517;
    CLI-unreachable in the reference, kept for API parity)."""
    k1, k2, k3 = jax.random.split(key, 3)
    pick = SVHN_CLUSTER_IDX % len(test_images)
    sel = np.asarray(jax.random.permutation(k1, len(pick)))[:n]
    x_test = test_images[pick[sel]]
    return unseen_cluster(model, params, np.tile(x_test, (1, 1, 1, 2)), k3,
                          filename=filename, filepath=filepath, n=n)


def unseen_cluster_lg(model, params, batches, key, filename="", filepath=".", per_cluster=7):
    """Per-cluster galleries sorted by confidence (vae/visualizer.py:318-383).

    ``batches``: iterable of augmented 6-channel image batches in [-1, 1].
    """
    cluster_dict = defaultdict(list)
    for images in batches:
        images = np.asarray(images)
        key, sub = jax.random.split(key)
        y, y_logits = _get_y(model, params, images, sub)
        probs = np.asarray(jax.nn.softmax(y_logits, axis=1))
        cluster = probs.argmax(axis=1)
        for c in range(model.y_size):
            members = images[cluster == c][:, :, :, :3]
            scores = probs[cluster == c][:, c]
            for s, img in zip(scores, members):
                cluster_dict[c].append((float(s), img))
    canvas = None
    for c in range(model.y_size):
        if cluster_dict[c]:
            cluster_dict[c].sort(key=lambda p: p[0], reverse=True)
            samples = np.stack([p[1] for p in cluster_dict[c][:per_cluster]])
            canvas = stack_rows(to_unit(samples))
            _save(canvas, os.path.join(filepath, f"unseen_cluster_{filename}_{c}.png"),
                  figsize=(2 * len(samples), 2))
    return canvas
