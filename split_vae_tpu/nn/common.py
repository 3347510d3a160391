"""Shared layer helpers with Keras-compatible defaults.

The reference uses Keras layers whose default kernel initializer is
glorot-uniform with zero biases; flax defaults to lecun-normal. To keep
training dynamics comparable we pin glorot-uniform everywhere.
"""

from __future__ import annotations

import functools

import flax.linen as nn
import jax

Dense = functools.partial(nn.Dense, kernel_init=nn.initializers.glorot_uniform())
Conv = functools.partial(nn.Conv, kernel_init=nn.initializers.glorot_uniform())

ones_bias = nn.initializers.constant(1.0)


def resize_bilinear(x: jax.Array, h: int, w: int) -> jax.Array:
    """tf.image.resize(method='bilinear') equivalent (half-pixel centers)."""
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, h, w, c), method="bilinear")


def flatten(x: jax.Array) -> jax.Array:
    return x.reshape(x.shape[0], -1)
