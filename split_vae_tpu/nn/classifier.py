"""SVHN classifier probe used for disentanglement evaluation.

Reference: vae/model.py:325-352. The reference accidentally overwrites its
bn3/e3 attributes (vae/model.py:332-335), so the *effective* network has three
conv blocks (32 k6 s2, 64 k6 s2, 256 k4 s2), each preceded by BatchNorm, then
three dropout+Dense blocks (256 -> 64 -> 10). We implement the effective
architecture.
"""

from __future__ import annotations

import flax.linen as nn
import jax

from split_vae_tpu.nn.common import Conv, Dense, flatten

Array = jax.Array


class Classifier(nn.Module):
    latent_dims: int = 256
    target_shape: int = 10

    @nn.compact
    def __call__(self, x: Array, training: bool = False) -> Array:
        norm = lambda v: nn.BatchNorm(
            use_running_average=not training, momentum=0.99, epsilon=1e-3
        )(v)
        x = nn.relu(Conv(32, (6, 6), strides=2, padding="SAME")(norm(x)))
        x = nn.relu(Conv(64, (6, 6), strides=2, padding="SAME")(norm(x)))
        x = nn.relu(Conv(256, (4, 4), strides=2, padding="SAME")(norm(x)))
        x = flatten(x)
        x = nn.Dropout(0.25)(x, deterministic=not training)
        x = nn.relu(Dense(self.latent_dims)(x))
        x = nn.Dropout(0.25)(x, deterministic=not training)
        x = nn.relu(Dense(self.latent_dims // 4)(x))
        x = nn.Dropout(0.25)(x, deterministic=not training)
        return Dense(self.target_shape)(x)
