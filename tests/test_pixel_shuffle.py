"""Exactness of the fused resize2x->conv (nn/pixel_shuffle.py) vs the
reference chain (half-pixel bilinear 2x upsample, then 3x3 SAME conv)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from split_vae_tpu.nn.pixel_shuffle import (resize2x_conv, resize2x_conv_any,
                                            resize2x_conv_any_mixed,
                                            resize2x_conv_mixed)


def _reference_chain(x, kernel, bias):
    n, s, _, _ = x.shape
    up = jax.image.resize(x, (n, 2 * s, 2 * s, x.shape[-1]), "bilinear")
    out = jax.lax.conv_general_dilated(
        up, kernel, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + bias


@pytest.mark.parametrize("s,cin,cout", [(8, 32, 64), (16, 64, 32), (4, 3, 4),
                                        (5, 2, 3)])
def test_resize2x_conv_exact(s, cin, cout):
    rng = np.random.RandomState(s * 100 + cin)
    x = jnp.asarray(rng.randn(3, s, s, cin).astype(np.float32))
    kernel = jnp.asarray(rng.randn(3, 3, cin, cout).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.randn(cout).astype(np.float32))
    with jax.default_matmul_precision("highest"):
        want = _reference_chain(x, kernel, bias)
        got = resize2x_conv(x, kernel, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_resize2x_conv_gradients_match():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32))
    kernel = jnp.asarray(rng.randn(3, 3, 4, 8).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.randn(8).astype(np.float32))
    cot = jnp.asarray(rng.randn(2, 16, 16, 8).astype(np.float32))

    def loss(f, *args):
        return jnp.sum(f(*args) * cot)

    with jax.default_matmul_precision("highest"):
        g_ref = jax.grad(lambda *a: loss(_reference_chain, *a),
                         argnums=(0, 1, 2))(x, kernel, bias)
        g_fused = jax.grad(lambda *a: loss(resize2x_conv, *a),
                           argnums=(0, 1, 2))(x, kernel, bias)
    for a, b in zip(g_ref, g_fused):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-4, rtol=1e-4)


# --- mixed-VJP variants: fused forward + materialized-chain backward -------
# (jax.custom_vjp pairing; exact because both forwards are the same map.
#  A/B'd on the TPU and NOT shipped — loses at every production site,
#  BASELINE.md "mixed-VJP" post-mortem — but kept correct and available.)


@pytest.mark.parametrize("k", [3, 4, 6])
def test_mixed_variant_forward_and_gradients_exact(k):
    mixed = resize2x_conv_mixed if k == 3 else resize2x_conv_any_mixed
    fused = resize2x_conv if k == 3 else resize2x_conv_any
    rng = np.random.RandomState(7 * k)
    x = jnp.asarray(rng.randn(2, 6, 6, 4).astype(np.float32))
    kernel = jnp.asarray(rng.randn(k, k, 4, 8).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.randn(8).astype(np.float32))
    cot = jnp.asarray(rng.randn(2, 12, 12, 8).astype(np.float32))

    def loss(f, *args):
        return jnp.sum(f(*args) * cot)

    with jax.default_matmul_precision("highest"):
        # Forward: bit-identical to the fused forward (same primal code).
        np.testing.assert_array_equal(
            np.asarray(mixed(x, kernel, bias)),
            np.asarray(fused(x, kernel, bias)))
        g_ref = jax.grad(lambda *a: loss(_reference_chain, *a),
                         argnums=(0, 1, 2))(x, kernel, bias)
        g_mixed = jax.grad(lambda *a: loss(mixed, *a),
                           argnums=(0, 1, 2))(x, kernel, bias)
    for a, b in zip(g_ref, g_mixed):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-4, rtol=1e-4)


def test_mixed_variant_under_jit_and_no_bias():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 5, 5, 3).astype(np.float32))
    kernel = jnp.asarray(rng.randn(3, 3, 3, 4).astype(np.float32) * 0.1)
    with jax.default_matmul_precision("highest"):
        got = jax.jit(lambda a, b: resize2x_conv_mixed(a, b))(x, kernel)
        want = resize2x_conv(x, kernel, None)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


# --- general kernel sizes (VAE conv decoder: 4x4 and 6x6, vae/model.py:145-169)


@pytest.mark.parametrize("k,s,cin,cout", [
    (3, 8, 4, 8),    # must agree with the dedicated 3x3 path's reference
    (4, 8, 8, 16),   # even kernel, asymmetric XLA SAME padding
    (4, 5, 3, 4),    # odd spatial size
    (6, 8, 8, 6),    # the decoder's output conv shape class
    (6, 4, 2, 3),    # kernel as large as the source side
])
def test_resize2x_conv_any_exact(k, s, cin, cout):
    rng = np.random.RandomState(1000 * k + 10 * s + cin)
    x = jnp.asarray(rng.randn(3, s, s, cin).astype(np.float32))
    kernel = jnp.asarray(rng.randn(k, k, cin, cout).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.randn(cout).astype(np.float32))
    with jax.default_matmul_precision("highest"):
        want = _reference_chain(x, kernel, bias)
        got = resize2x_conv_any(x, kernel, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("k", [4, 6])
def test_resize2x_conv_any_gradients_match(k):
    rng = np.random.RandomState(k)
    x = jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32))
    kernel = jnp.asarray(rng.randn(k, k, 4, 8).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.randn(8).astype(np.float32))
    cot = jnp.asarray(rng.randn(2, 16, 16, 8).astype(np.float32))

    def loss(f, *args):
        return jnp.sum(f(*args) * cot)

    with jax.default_matmul_precision("highest"):
        g_ref = jax.grad(lambda *a: loss(_reference_chain, *a),
                         argnums=(0, 1, 2))(x, kernel, bias)
        g_fused = jax.grad(lambda *a: loss(resize2x_conv_any, *a),
                           argnums=(0, 1, 2))(x, kernel, bias)
    for a, b in zip(g_ref, g_fused):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-4, rtol=1e-4)
