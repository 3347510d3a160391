"""VAE-family encoders (conv / fc / gmvae) as flax.linen modules.

Behavioral contract: vae/model.py:16-141. All randomness is drawn from the
'sample' PRNG stream; dropout from the 'dropout' stream. Sigma heads emit
standard deviations via softplus (NOT log-variance) exactly like the
reference (vae/model.py:42,68,76).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax

from split_vae_tpu.nn.common import Conv, Dense, flatten, ones_bias
from split_vae_tpu.ops.distributions import gumbel_softmax, reparameterize

Array = jax.Array


class ConvEncoder(nn.Module):
    """Conv VAE encoder: 3 convs (32/64/128, k=6/6/4, s=2) -> mu / softplus sigma.

    Reference: vae/model.py:34-45,100-114 (Encoder type='conv').
    """

    latent_dims: int = 32

    @nn.compact
    def __call__(self, x: Array) -> Tuple[Array, Array, Array]:
        x = nn.relu(Conv(32, (6, 6), strides=2, padding="SAME")(x))
        x = nn.relu(Conv(64, (6, 6), strides=2, padding="SAME")(x))
        x = nn.relu(Conv(128, (4, 4), strides=2, padding="SAME")(x))
        x = flatten(x)
        z_mean = Dense(self.latent_dims)(x)
        z_sig = nn.softplus(Dense(self.latent_dims)(x))
        z = reparameterize(self.make_rng("sample"), z_mean, z_sig)
        return z, z_mean, z_sig


class FCEncoder(nn.Module):
    """Fully-connected encoder (1024 -> 512 -> heads).

    Reference: vae/model.py:23-32,85-98. Unreachable from the reference CLI;
    kept for API parity. Reference quirk preserved: in the variational path the
    second head has no activation yet is consumed as a *sigma* multiplier by
    Sampling (vae/model.py:93-94).
    """

    latent_dims: int = 32
    variational: bool = True

    @nn.compact
    def __call__(self, x: Array):
        x = flatten(x)
        x = nn.relu(Dense(1024)(x))
        x = nn.relu(Dense(512)(x))
        if self.variational:
            z_mean = Dense(self.latent_dims)(x)
            z_sig = Dense(self.latent_dims)(x)  # raw head used as sigma (quirk)
            z = reparameterize(self.make_rng("sample"), z_mean, z_sig)
            return z, z_mean, z_sig
        return nn.relu(Dense(self.latent_dims)(x))


class GMVaeEncoder(nn.Module):
    """Gaussian-mixture VAE encoder with Gumbel-softmax cluster posterior.

    Reference: vae/model.py:48-79,116-140. Architecture: elu conv h-block ->
    y-block (Dense 1024 -> dropout 0.2 -> Dense 128) -> y logits ->
    Gumbel-softmax(tau) -> y-conditional z prior heads (softplus sigma with
    bias 1) and a residual encoder head h = Dense512(dropout(h)) + Dense512(y).
    Only the two dropouts that the reference actually *applies* are present
    (the other five are created but never called, vae/model.py:59-76 quirk).
    """

    latent_dims: int
    y_size: int
    tau: float

    def setup(self):
        self.h_conv1 = Conv(128, (6, 6), strides=2, padding="SAME")
        self.h_conv2 = Conv(128, (6, 6), strides=2, padding="SAME")
        self.h_conv3 = Conv(128, (4, 4), strides=2, padding="SAME")
        self.y_dense1 = Dense(1024)
        self.y_drop = nn.Dropout(rate=0.2)
        self.y_dense2 = Dense(128)
        self.y_head = Dense(self.y_size)
        self.h_top_dense = Dense(512)
        self.z_prior_mean_head = Dense(self.latent_dims)
        self.z_prior_sig_head = Dense(self.latent_dims, bias_init=ones_bias)
        self.do5 = nn.Dropout(rate=0.2)
        self.e1 = Dense(512)
        self.z_mean_head = Dense(self.latent_dims)
        self.z_sig_head = Dense(self.latent_dims, bias_init=ones_bias)

    def __call__(self, x: Array, training: bool = False):
        h = nn.elu(self.h_conv1(x))
        h = nn.elu(self.h_conv2(h))
        h = nn.elu(self.h_conv3(h))
        h = flatten(h)

        y_hidden = nn.elu(self.y_dense1(h))
        y_hidden = self.y_drop(y_hidden, deterministic=not training)
        y_hidden = nn.elu(self.y_dense2(y_hidden))
        y_logits = self.y_head(y_hidden)
        y = gumbel_softmax(self.make_rng("sample"), y_logits, self.tau)

        z_prior_mean, z_prior_sig = self.encode_y(y)

        h_top = nn.elu(self.h_top_dense(y))
        h = nn.elu(self.e1(self.do5(h, deterministic=not training)))
        h = h + h_top
        z_mean = self.z_mean_head(h)
        z_sig = nn.softplus(self.z_sig_head(h))
        z = reparameterize(self.make_rng("sample"), z_mean, z_sig)

        return z, z_mean, z_sig, y, y_logits, z_prior_mean, z_prior_sig

    def encode_y(self, y: Array) -> Tuple[Array, Array]:
        """y -> (z prior mean, z prior sigma). Reference: vae/model.py:137-140."""
        return self.z_prior_mean_head(y), nn.softplus(self.z_prior_sig_head(y))
