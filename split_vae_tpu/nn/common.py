"""Shared layer helpers with Keras-compatible defaults.

The reference uses Keras layers whose default kernel initializer is
glorot-uniform with zero biases; flax defaults to lecun-normal. To keep
training dynamics comparable we pin glorot-uniform everywhere.
"""

from __future__ import annotations

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp

# Process-wide activation dtype for Dense/Conv (flax `dtype=`): params stay
# f32 (`param_dtype` default), activations/compute run in this dtype.
# `--compute_dtype bfloat16` sets it via set_activation_dtype() before model
# construction — the conv stacks are HBM-bandwidth-bound on TPU (measured:
# ObjDecoder fwd+bwd 10.0 ms f32 -> 5.8 ms bf16 at B=256), so halving
# activation bytes is the single biggest step-time lever. Default f32
# preserves reference numerics.
_ACTIVATION_DTYPE = jnp.float32


def set_activation_dtype(name: str) -> None:
    global _ACTIVATION_DTYPE
    _ACTIVATION_DTYPE = jnp.bfloat16 if name == "bfloat16" else jnp.float32


def activation_dtype():
    return _ACTIVATION_DTYPE


def Dense(*args, **kwargs):
    kwargs.setdefault("kernel_init", nn.initializers.glorot_uniform())
    kwargs.setdefault("dtype", _ACTIVATION_DTYPE)
    return nn.Dense(*args, **kwargs)


def Conv(*args, **kwargs):
    kwargs.setdefault("kernel_init", nn.initializers.glorot_uniform())
    kwargs.setdefault("dtype", _ACTIVATION_DTYPE)
    return nn.Conv(*args, **kwargs)

ones_bias = nn.initializers.constant(1.0)


def resize_bilinear(x: jax.Array, h: int, w: int) -> jax.Array:
    """tf.image.resize(method='bilinear') equivalent (half-pixel centers)."""
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, h, w, c), method="bilinear")


def flatten(x: jax.Array) -> jax.Array:
    return x.reshape(x.shape[0], -1)
