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

from split_vae_tpu.nn.common import Conv, Dense
from split_vae_tpu.nn.pixel_shuffle import Resize2xConvAny

Array = jax.Array


class ConvDecoder(nn.Module):
    """Dense -> [conv -> resize]x3 -> conv(2*C). Reference vae/model.py:145-169.

    Each resize2x -> conv pair is evaluated through the exact pixel-shuffle
    fusion (Resize2xConvAny): the 2x upsampled intermediates — the decoder's
    largest HBM tensors — are never materialized, and the 4x-wider output
    channel dim packs MXU lanes better at the small Cout tail. Param names
    match the plain Conv modules they replace (Conv_1..Conv_3), so
    checkpoints and TF2 golden layer maps are unaffected.
    """

    image_hw: Tuple[int, int]
    out_channels: int = 6  # x_mean (3) + x_log_scale (3)

    @nn.compact
    def __call__(self, z: Array) -> Tuple[Array, Array]:
        h, w = self.image_hw
        x = nn.relu(Dense(h // 8 * (w // 8) * 128)(z))
        x = x.reshape(-1, h // 8, w // 8, 128)
        x = nn.relu(Conv(128, (4, 4), padding="SAME")(x))
        x = nn.relu(
            Resize2xConvAny(64, (4, 4), (h // 4, w // 4), name="Conv_1")(x))
        x = nn.relu(
            Resize2xConvAny(32, (6, 6), (h // 2, w // 2), name="Conv_2")(x))
        x = Resize2xConvAny(
            self.out_channels, (6, 6), (h, w), name="Conv_3")(x)
        half = self.out_channels // 2
        return x[..., :half], x[..., half:]
