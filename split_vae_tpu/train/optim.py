"""Optimizer building blocks.

The reference's SPAIR optimizer is Keras ``Adam(lr, clipnorm=1.0)``
(spair/main.py:109). Keras ``clipnorm`` clips EACH gradient tensor
independently by its own L2 norm (``tf.clip_by_norm`` per variable), which is
not the same as optax's global-norm clipping: with per-tensor clipping a
single exploding tensor does not shrink every other tensor's update.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def clip_by_per_tensor_norm(max_norm: float) -> optax.GradientTransformation:
    """Per-tensor L2-norm clipping, matching Keras ``Adam(clipnorm=...)``.

    Each leaf g becomes ``g * max_norm / max(||g||_2, max_norm)`` — identity
    when ``||g|| <= max_norm``, rescaled to norm ``max_norm`` otherwise
    (exactly ``tf.clip_by_norm`` semantics, applied leaf-wise).
    """

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params

        def clip(g):
            norm = jnp.sqrt(jnp.sum(jnp.square(g)))
            return g * (max_norm / jnp.maximum(norm, max_norm))

        return jax.tree.map(clip, updates), state

    return optax.GradientTransformation(init_fn, update_fn)
