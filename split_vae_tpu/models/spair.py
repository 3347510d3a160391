"""SPAIR model family: SPAIR, BG-SPAIR, LG-SPAIR (SPLIT-SPAIR).

Behavioral contract: spair/spair.py:8-106 plus the sub-networks it wires
(backbone encoder :368-496, decoder :500-532, renderer :534-579, background
models :110-244). The reference's ``bg_spair`` is SPAIR with ``bg=True``;
``lg_spair`` adds the SPLIT local path and optional concat wiring.

Reference quirks handled deliberately:
  - ``lg_glimpse_spair`` references a class that does not exist in the
    reference (spair/spair.py:14-15 -> NameError); LGGlimpseSPAIR below is a
    working implementation assembled from the loss branch and visualizer the
    reference ships for it.
  - LGSPAIR reads ``config.bg_model`` / ``config.concat_z_bg`` which are not
    CLI flags and default to falsy via dotdict (spair/spair.py:58,63); here
    they are explicit boolean fields defaulting to False.

TPU-native option: ``fused_render=True`` routes the training forward through
the fused Pallas paste+composite kernel (ops/pallas/render_fused.py) so the
[B, K, H, W, C+1] per-cell canvases never materialize in HBM.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from split_vae_tpu.nn.spair_nets import (
    BackgroundModel,
    ImageDecoder,
    ImageDecoderDense,
    ImageEncoder,
    ImageEncoderDense,
    SpairDecoder,
    SpairEncoder,
    render,
)

Array = jax.Array


class SpairOutput(NamedTuple):
    """Superset of the reference's 18/21/25-tuples (spair/spair.py:42-49,104-106).

    Fields absent for a given variant are None (empty pytree leaves).
    """

    x_recon: Array
    z_what: Array
    z_what_mean: Array
    z_what_sigma: Array
    z_where: Array
    z_where_mean: Array
    z_where_sigma: Array
    z_depth: Array
    z_depth_mean: Array
    z_depth_sigma: Array
    z_pres: Array
    z_pres_logits: Array
    z_pres_pre_sigmoid: Array
    all_glimpses: Array
    obj_recon_unnorm: Array
    obj_recon_alpha: Array
    obj_full_recon_unnorm: Array
    obj_bbox_mask: Array
    z_bg: Optional[Array] = None
    z_bg_mean: Optional[Array] = None
    z_bg_sig: Optional[Array] = None
    x_hat_recon: Optional[Array] = None
    z_l: Optional[Array] = None
    z_l_mean: Optional[Array] = None
    z_l_sig: Optional[Array] = None
    x_hat: Optional[Array] = None  # lg_glimpse_spair: scrambled glimpse targets


class SPAIR(nn.Module):
    """SPAIR / BG-SPAIR (spair/spair.py:19-49)."""

    image_hw: Tuple[int, int]
    object_size: int
    latent_size: int
    tau: float
    num_channel: int = 3
    bg: bool = False
    bg_latent_size: int = 4
    fused_render: bool = False  # Pallas fused paste+composite on the train path
    use_pallas: bool = False  # backend compiles Pallas kernels (set by factory)
    interpret_fused: bool = False  # debug: fused path via interpret mode off-TPU

    def setup(self):
        self.encoder = SpairEncoder(self.object_size, self.latent_size, self.tau,
                                    use_pallas=self.use_pallas)
        self.decoder = SpairDecoder(
            self.image_hw, self.object_size, self.num_channel, self.latent_size
        )
        if self.bg:
            self.bg_model = BackgroundModel(self.image_hw, self.bg_latent_size, self.num_channel)

    def __call__(self, inputs: Array, training: bool = False,
                 fused: bool = None) -> SpairOutput:
        if fused is None:
            # Static default from module flags (plumbed by get_spair_model
            # from the resolved session backend): fused Pallas only where the
            # backend compiles it; callers can still force fused= explicitly.
            fused = self.fused_render and (self.use_pallas or self.interpret_fused)
        enc = self.encoder(inputs)
        (z_what, z_what_mean, z_what_sigma, z_where, z_where_mean, z_where_sigma,
         z_depth, z_depth_mean, z_depth_sigma, z_pres, z_pres_logits,
         z_pres_pre_sigmoid, all_glimpses) = enc

        if self.bg:
            bg_recon, z_bg, z_bg_mean, z_bg_sig = self.bg_model(inputs)
        else:
            bg_recon, z_bg, z_bg_mean, z_bg_sig = 0.0, None, None, None

        if training and fused:
            from split_vae_tpu.nn.spair_nets import fused_decode_render

            obj_recon_unnorm, obj_recon_alpha, obj_bbox, x_recon = fused_decode_render(
                self.decoder, self.make_rng("sample"), z_what, z_where, z_depth,
                z_pres, bg_recon, self.num_channel, self.image_hw,
                interpret=not self.use_pallas)
            obj_full = None
        else:
            obj_recon_unnorm, obj_recon_alpha, obj_full, obj_bbox = self.decoder(
                z_what, z_where)
            key = self.make_rng("sample") if training else None
            x_recon = render(
                obj_full, bg_recon, z_depth, z_pres, z_pres_logits, key, training,
                self.num_channel)
        return SpairOutput(
            x_recon, z_what, z_what_mean, z_what_sigma, z_where, z_where_mean,
            z_where_sigma, z_depth, z_depth_mean, z_depth_sigma, z_pres,
            z_pres_logits, z_pres_pre_sigmoid, all_glimpses, obj_recon_unnorm,
            obj_recon_alpha, obj_full, obj_bbox, z_bg, z_bg_mean, z_bg_sig,
        )


class LGSPAIR(nn.Module):
    """SPLIT-SPAIR: SPAIR + local (scrambled-view) path (spair/spair.py:52-106)."""

    image_hw: Tuple[int, int]
    object_size: int
    latent_size: int
    tau: float
    num_channel: int = 3
    bg_latent_size: int = 4
    local_latent_size: int = 64
    dense_bg: bool = False
    dense_local: bool = False
    concat_z_what: bool = False
    concat_backbone: bool = False
    concat_z_bg: bool = False
    fused_render: bool = False
    use_pallas: bool = False
    interpret_fused: bool = False  # debug: fused path via interpret mode off-TPU

    def setup(self):
        self.encoder = SpairEncoder(
            self.object_size, self.latent_size, self.tau,
            concat=self.concat_backbone, use_pallas=self.use_pallas,
        )
        self.decoder = SpairDecoder(
            self.image_hw, self.object_size, self.num_channel, self.latent_size
        )
        if self.dense_bg:
            self.bg_encoder = ImageEncoderDense(self.bg_latent_size)
            self.bg_decoder = ImageDecoderDense(self.image_hw, self.num_channel)
        else:
            self.bg_encoder = ImageEncoder(self.bg_latent_size)
            self.bg_decoder = ImageDecoder(self.image_hw, self.num_channel)
        if self.dense_local:
            self.x_hat_encoder = ImageEncoderDense(self.local_latent_size)
            self.x_hat_decoder = ImageDecoderDense(self.image_hw, self.num_channel)
        else:
            self.x_hat_encoder = ImageEncoder(self.local_latent_size)
            self.x_hat_decoder = ImageDecoder(self.image_hw, self.num_channel)

    def __call__(self, inputs: Array, training: bool = False,
                 fused: bool = None) -> SpairOutput:
        if fused is None:
            # Static default from module flags (plumbed by get_spair_model
            # from the resolved session backend): fused Pallas only where the
            # backend compiles it; callers can still force fused= explicitly.
            fused = self.fused_render and (self.use_pallas or self.interpret_fused)
        x, x_hat = inputs[..., :3], inputs[..., 3:]

        z_l, z_l_mean, z_l_sig = self.x_hat_encoder(x_hat)
        z_bg, z_bg_mean, z_bg_sig = self.bg_encoder(x)

        enc = self.encoder(x, z_l if self.concat_backbone else None)
        (z_what, z_what_mean, z_what_sigma, z_where, z_where_mean, z_where_sigma,
         z_depth, z_depth_mean, z_depth_sigma, z_pres, z_pres_logits,
         z_pres_pre_sigmoid, all_glimpses) = enc

        x_hat_recon = self.x_hat_decoder(z_l)
        z_bg_in = jnp.concatenate([z_bg, z_l], axis=-1) if self.concat_z_bg else z_bg
        bg_recon = self.bg_decoder(z_bg_in)

        if self.concat_z_what:
            gh, gw = z_what.shape[1], z_what.shape[2]
            tiled = jnp.tile(z_l[:, None, None, :], (1, gh, gw, 1))
            z_what = jnp.concatenate([z_what, tiled], axis=-1)

        if training and fused:
            from split_vae_tpu.nn.spair_nets import fused_decode_render

            obj_recon_unnorm, obj_recon_alpha, obj_bbox, x_recon = fused_decode_render(
                self.decoder, self.make_rng("sample"), z_what, z_where, z_depth,
                z_pres, bg_recon, self.num_channel, self.image_hw,
                interpret=not self.use_pallas)
            obj_full = None
        else:
            obj_recon_unnorm, obj_recon_alpha, obj_full, obj_bbox = self.decoder(
                z_what, z_where)
            key = self.make_rng("sample") if training else None
            x_recon = render(
                obj_full, bg_recon, z_depth, z_pres, z_pres_logits, key, training,
                self.num_channel)
        return SpairOutput(
            x_recon, z_what, z_what_mean, z_what_sigma, z_where, z_where_mean,
            z_where_sigma, z_depth, z_depth_mean, z_depth_sigma, z_pres,
            z_pres_logits, z_pres_pre_sigmoid, all_glimpses, obj_recon_unnorm,
            obj_recon_alpha, obj_full, obj_bbox, z_bg, z_bg_mean, z_bg_sig,
            x_hat_recon, z_l, z_l_mean, z_l_sig,
        )


class LGGlimpseSPAIR(nn.Module):
    """Glimpse-local SPLIT-SPAIR: per-cell local latents from patch-scrambled
    glimpses.

    The reference *names* this model (spair/spair.py:14-15) and ships its loss
    branch (spair/trainer.py:203-214) and visualizer
    (glimpses_local_reconstruction_test, spair/visualizer.py:204-257), but the
    class itself is missing — instantiating it raises NameError. This is the
    working implementation assembled from those three contracts: SPAIR with a
    background VAE plus an ObjEncoderScramble attr network emitting per-cell
    (z_what, z_l) and a per-glimpse decoder reconstructing the scrambled view.
    """

    image_hw: Tuple[int, int]
    object_size: int
    latent_size: int
    tau: float
    num_channel: int = 3
    bg_latent_size: int = 4
    local_latent_size: int = 64
    patch_size: int = 4
    dense_bg: bool = False
    fused_render: bool = False
    use_pallas: bool = False
    interpret_fused: bool = False  # debug: fused path via interpret mode off-TPU

    def setup(self):
        from split_vae_tpu.nn.spair_nets import GlimpseDecoder

        self.encoder = SpairEncoder(
            self.object_size, self.latent_size, self.tau, glimpse_local=True,
            patch_size=self.patch_size, local_latent_size=self.local_latent_size,
            use_pallas=self.use_pallas)
        self.decoder = SpairDecoder(
            self.image_hw, self.object_size, self.num_channel, self.latent_size)
        if self.dense_bg:
            self.bg_encoder = ImageEncoderDense(self.bg_latent_size)
            self.bg_decoder = ImageDecoderDense(self.image_hw, self.num_channel)
        else:
            self.bg_encoder = ImageEncoder(self.bg_latent_size)
            self.bg_decoder = ImageDecoder(self.image_hw, self.num_channel)
        self.x_hat_decoder = GlimpseDecoder(
            self.object_size, self.num_channel, self.local_latent_size)

    def __call__(self, inputs: Array, training: bool = False,
                 fused: bool = None) -> SpairOutput:
        if fused is None:
            # Static default from module flags (plumbed by get_spair_model
            # from the resolved session backend): fused Pallas only where the
            # backend compiles it; callers can still force fused= explicitly.
            fused = self.fused_render and (self.use_pallas or self.interpret_fused)
        x = inputs[..., : self.num_channel]
        z_bg, z_bg_mean, z_bg_sig = self.bg_encoder(x)
        enc = self.encoder(x)
        (z_what, z_what_mean, z_what_sigma, z_where, z_where_mean, z_where_sigma,
         z_depth, z_depth_mean, z_depth_sigma, z_pres, z_pres_logits,
         z_pres_pre_sigmoid, all_glimpses, z_l, z_l_mean, z_l_sig, x_hat) = enc

        bg_recon = self.bg_decoder(z_bg)
        b, gh, gw, d = z_l.shape
        x_hat_recon = self.x_hat_decoder(z_l.reshape(b * gh * gw, d))
        x_hat_recon = x_hat_recon.reshape(
            b, gh * gw, self.object_size, self.object_size, self.num_channel)

        if training and fused:
            from split_vae_tpu.nn.spair_nets import fused_decode_render

            obj_recon_unnorm, obj_recon_alpha, obj_bbox, x_recon = fused_decode_render(
                self.decoder, self.make_rng("sample"), z_what, z_where, z_depth,
                z_pres, bg_recon, self.num_channel, self.image_hw,
                interpret=not self.use_pallas)
            obj_full = None
        else:
            obj_recon_unnorm, obj_recon_alpha, obj_full, obj_bbox = self.decoder(
                z_what, z_where)
            key = self.make_rng("sample") if training else None
            x_recon = render(
                obj_full, bg_recon, z_depth, z_pres, z_pres_logits, key, training,
                self.num_channel)
        return SpairOutput(
            x_recon, z_what, z_what_mean, z_what_sigma, z_where, z_where_mean,
            z_where_sigma, z_depth, z_depth_mean, z_depth_sigma, z_pres,
            z_pres_logits, z_pres_pre_sigmoid, all_glimpses, obj_recon_unnorm,
            obj_recon_alpha, obj_full, obj_bbox, z_bg, z_bg_mean, z_bg_sig,
            x_hat_recon, z_l, z_l_mean, z_l_sig, x_hat)


def get_spair_model(config) -> nn.Module:
    """Model factory mirroring spair/spair.py:8-17 on config.model.

    Resolves the Pallas capability flag ONCE here from the session backend
    (after core.runtime.setup_runtime applied any --platform override) and
    bakes it into the modules as a static attribute — no jax.devices() calls
    inside any nn.Module (trace-time platform sniffing picks the wrong branch
    under jax.default_device / AOT lowering).
    """
    use_pallas = jax.default_backend() == "tpu"
    image_hw = (config.image_size[0], config.image_size[1])
    num_channel = config.image_size[2]
    if config.model == "lg_spair":
        return LGSPAIR(
            image_hw=image_hw,
            object_size=config.object_size,
            latent_size=config.latent_size,
            tau=config.tau,
            num_channel=num_channel,
            bg_latent_size=config.bg_latent_size,
            local_latent_size=config.local_latent_size,
            dense_bg=config.dense_bg,
            dense_local=config.dense_local,
            concat_z_what=config.concat_z_what,
            concat_backbone=config.concat_backbone,
            concat_z_bg=config.concat_z_bg,
            fused_render=config.fused_render,
            use_pallas=use_pallas,
            interpret_fused=getattr(config, "interpret_fused", False),
        )
    if config.model == "lg_glimpse_spair":
        return LGGlimpseSPAIR(
            image_hw=image_hw,
            object_size=config.object_size,
            latent_size=config.latent_size,
            tau=config.tau,
            num_channel=num_channel,
            bg_latent_size=config.bg_latent_size,
            local_latent_size=config.local_latent_size,
            patch_size=config.patch_size,
            dense_bg=config.dense_bg,
            fused_render=config.fused_render,
            use_pallas=use_pallas,
            interpret_fused=getattr(config, "interpret_fused", False),
        )
    if config.model in ("spair", "bg_spair"):
        return SPAIR(
            image_hw=image_hw,
            object_size=config.object_size,
            latent_size=config.latent_size,
            tau=config.tau,
            num_channel=num_channel,
            bg=config.model == "bg_spair",
            bg_latent_size=config.bg_latent_size,
            fused_render=config.fused_render,
            use_pallas=use_pallas,
            interpret_fused=getattr(config, "interpret_fused", False),
        )
    raise NotImplementedError(f"Model type not implemented: {config.model}")
