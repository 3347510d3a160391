"""VAE-family conv decoder (resize-then-conv upsampling).

Reference: vae/model.py:145-169. Upsampling is bilinear resize followed by a
stride-1 conv (NOT transposed conv). The final conv emits 2x the image
channels, split into (x_mean, x_log_scale) for the discretized-logistic
likelihood.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax

from split_vae_tpu.nn.common import Conv, Dense, resize_bilinear

Array = jax.Array


class ConvDecoder(nn.Module):
    """Dense -> [conv -> resize]x3 -> conv(2*C). Reference vae/model.py:145-169."""

    image_hw: Tuple[int, int]
    out_channels: int = 6  # x_mean (3) + x_log_scale (3)

    @nn.compact
    def __call__(self, z: Array) -> Tuple[Array, Array]:
        h, w = self.image_hw
        x = nn.relu(Dense(h // 8 * (w // 8) * 128)(z))
        x = x.reshape(-1, h // 8, w // 8, 128)
        x = nn.relu(Conv(128, (4, 4), padding="SAME")(x))
        x = resize_bilinear(x, h // 4, w // 4)
        x = nn.relu(Conv(64, (4, 4), padding="SAME")(x))
        x = resize_bilinear(x, h // 2, w // 2)
        x = nn.relu(Conv(32, (6, 6), padding="SAME")(x))
        x = resize_bilinear(x, h, w)
        x = Conv(self.out_channels, (6, 6), padding="SAME")(x)
        half = self.out_channels // 2
        return x[..., :half], x[..., half:]
