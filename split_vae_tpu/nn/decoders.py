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
from split_vae_tpu.nn.pixel_shuffle import Resize2xConvAny

Array = jax.Array


class ConvDecoder(nn.Module):
    """Dense -> [conv -> resize]x3 -> conv(2*C). Reference vae/model.py:145-169.

    Only the OUTPUT resize2x -> conv pair runs through the exact
    pixel-shuffle fusion (Resize2xConvAny): per-layer A/B at B=1024
    (tools/bench_vae_decoder_layers.py, BASELINE.md) shows the fusion wins
    decisively at the Cout=6 output layer (largest tensor, worst MXU lane
    occupancy: fwd+bwd 11.6->10.1 ms f32, 8.7->6.7 ms bf16) but LOSES at
    the 64/32-channel mid layers, where XLA's backward for the composed
    conv is ~1.5x the materialized chain's. Param names are preserved
    (Conv_3), so checkpoints and TF2 golden layer maps are unaffected.
    """

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
        x = Resize2xConvAny(
            self.out_channels, (6, 6), (h, w), name="Conv_3")(x)
        half = self.out_channels // 2
        return x[..., :half], x[..., half:]
