"""SPLIT-VAE model families: LGVae, LGGMVae, GMVae.

Behavioral contract: vae/model.py:174-320. Inputs are channel-stacked
[x | x_hat] views in [-1, 1]; every forward returns the full tuple of latents
and stats that the reference's trainers consume. ``decode(rescale=True)`` maps
decoder means from [-1, 1] to clipped [0, 1] (vae/model.py:211-218).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from split_vae_tpu.nn.decoders import ConvDecoder
from split_vae_tpu.nn.encoders import ConvEncoder, GMVaeEncoder

Array = jax.Array


class LGVaeOutput(NamedTuple):
    """Forward tuple of LGVae (vae/model.py:200)."""

    x_mean: Array
    x_log_scale: Array
    z_x: Array
    z_mean_x: Array
    z_sig_x: Array
    z_x_hat: Array
    x_hat_mean: Array
    x_hat_log_scale: Array
    z_mean_x_hat: Array
    z_sig_x_hat: Array


class LGGMVaeOutput(NamedTuple):
    """Forward tuple of LGGMVae (vae/model.py:248)."""

    x_mean: Array
    x_log_scale: Array
    z_x: Array
    z_mean_x: Array
    z_sig_x: Array
    z_x_hat: Array
    x_hat_mean: Array
    x_hat_log_scale: Array
    z_mean_x_hat: Array
    z_sig_x_hat: Array
    y: Array
    y_logits: Array
    z_prior_mean: Array
    z_prior_sig: Array


class GMVaeOutput(NamedTuple):
    """Forward tuple of GMVae (vae/model.py:297)."""

    x_mean: Array
    x_log_scale: Array
    z_x: Array
    z_mean_x: Array
    z_sig_x: Array
    y: Array
    y_logits: Array
    z_prior_mean: Array
    z_prior_sig: Array


def _rescale(x_mean: Array) -> Array:
    return jnp.clip((x_mean + 1.0) * 0.5, 0.0, 1.0)


class LGVae(nn.Module):
    """SPLIT-VAE: independent global (x) and local (scrambled x_hat) paths.

    Reference: vae/model.py:174-218. decoder_x consumes concat([z_g, z_l]);
    decoder_x_hat consumes z_l only.
    """

    global_latent_dims: int
    local_latent_dims: int
    image_hw: Tuple[int, int]

    def setup(self):
        self.encoder_x = ConvEncoder(self.global_latent_dims)
        self.encoder_x_hat = ConvEncoder(self.local_latent_dims)
        self.decoder_x = ConvDecoder(self.image_hw)
        self.decoder_x_hat = ConvDecoder(self.image_hw)

    def __call__(self, inputs: Array, training: bool = False) -> LGVaeOutput:
        x, x_hat = inputs[..., :3], inputs[..., 3:]
        z_x, z_mean_x, z_sig_x = self.encoder_x(x)
        z_x_hat, z_mean_x_hat, z_sig_x_hat = self.encoder_x_hat(x_hat)
        x_mean, x_log_scale = self.decoder_x(jnp.concatenate([z_x, z_x_hat], axis=1))
        x_hat_mean, x_hat_log_scale = self.decoder_x_hat(z_x_hat)
        return LGVaeOutput(
            x_mean, x_log_scale, z_x, z_mean_x, z_sig_x,
            z_x_hat, x_hat_mean, x_hat_log_scale, z_mean_x_hat, z_sig_x_hat,
        )

    def encode(self, inputs: Array) -> Tuple[Array, Array]:
        x, x_hat = inputs[..., :3], inputs[..., 3:]
        z_x, _, _ = self.encoder_x(x)
        z_x_hat, _, _ = self.encoder_x_hat(x_hat)
        return z_x, z_x_hat

    def decode(self, z_x: Array, z_x_hat: Array, rescale: bool = True):
        x_mean, _ = self.decoder_x(jnp.concatenate([z_x, z_x_hat], axis=1))
        x_hat_mean, _ = self.decoder_x_hat(z_x_hat)
        if rescale:
            return _rescale(x_mean), _rescale(x_hat_mean)
        return x_mean, x_hat_mean


class LGGMVae(nn.Module):
    """SPLIT-GMVAE: LGVae with a Gaussian-mixture global encoder.

    Reference: vae/model.py:221-275.
    """

    global_latent_dims: int
    local_latent_dims: int
    image_hw: Tuple[int, int]
    y_size: int
    tau: float

    def setup(self):
        self.encoder_x = GMVaeEncoder(self.global_latent_dims, self.y_size, self.tau)
        self.encoder_x_hat = ConvEncoder(self.local_latent_dims)
        self.decoder_x = ConvDecoder(self.image_hw)
        self.decoder_x_hat = ConvDecoder(self.image_hw)

    def __call__(self, inputs: Array, training: bool = False) -> LGGMVaeOutput:
        x, x_hat = inputs[..., :3], inputs[..., 3:]
        z_x, z_mean_x, z_sig_x, y, y_logits, z_prior_mean, z_prior_sig = self.encoder_x(
            x, training
        )
        z_x_hat, z_mean_x_hat, z_sig_x_hat = self.encoder_x_hat(x_hat)
        x_mean, x_log_scale = self.decoder_x(jnp.concatenate([z_x, z_x_hat], axis=1))
        x_hat_mean, x_hat_log_scale = self.decoder_x_hat(z_x_hat)
        return LGGMVaeOutput(
            x_mean, x_log_scale, z_x, z_mean_x, z_sig_x,
            z_x_hat, x_hat_mean, x_hat_log_scale, z_mean_x_hat, z_sig_x_hat,
            y, y_logits, z_prior_mean, z_prior_sig,
        )

    def encode(self, inputs: Array) -> Tuple[Array, Array]:
        x, x_hat = inputs[..., :3], inputs[..., 3:]
        z_x = self.encoder_x(x, False)[0]
        z_x_hat, _, _ = self.encoder_x_hat(x_hat)
        return z_x, z_x_hat

    def decode(self, z_x: Array, z_x_hat: Array, rescale: bool = True):
        x_mean, _ = self.decoder_x(jnp.concatenate([z_x, z_x_hat], axis=1))
        x_hat_mean, _ = self.decoder_x_hat(z_x_hat)
        if rescale:
            return _rescale(x_mean), _rescale(x_hat_mean)
        return x_mean, x_hat_mean

    def encode_y(self, y: Array) -> Tuple[Array, Array]:
        return self.encoder_x.encode_y(y)

    def get_y(self, x: Array) -> Tuple[Array, Array]:
        out = self.encoder_x(x[..., :3], False)
        return out[3], out[4]


class GMVae(nn.Module):
    """GMVAE baseline: single gm encoder + decoder, no local path.

    Reference: vae/model.py:277-320.
    """

    global_latent_dims: int
    image_hw: Tuple[int, int]
    y_size: int
    tau: float

    def setup(self):
        self.encoder_x = GMVaeEncoder(self.global_latent_dims, self.y_size, self.tau)
        self.decoder_x = ConvDecoder(self.image_hw)

    def __call__(self, inputs: Array, training: bool = False) -> GMVaeOutput:
        x = inputs[..., :3]
        z_x, z_mean_x, z_sig_x, y, y_logits, z_prior_mean, z_prior_sig = self.encoder_x(
            x, training
        )
        x_mean, x_log_scale = self.decoder_x(z_x)
        return GMVaeOutput(
            x_mean, x_log_scale, z_x, z_mean_x, z_sig_x, y, y_logits, z_prior_mean, z_prior_sig
        )

    def encode(self, inputs: Array) -> Array:
        return self.encoder_x(inputs[..., :3], False)[0]

    def decode(self, z_x: Array, rescale: bool = True):
        x_mean, _ = self.decoder_x(z_x)
        if rescale:
            return _rescale(x_mean)
        return x_mean

    def encode_y(self, y: Array) -> Tuple[Array, Array]:
        return self.encoder_x.encode_y(y)

    def get_y(self, x: Array) -> Tuple[Array, Array]:
        out = self.encoder_x(x[..., :3], False)
        return out[3], out[4]
