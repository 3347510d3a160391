"""SPAIR building blocks: backbone encoder, object nets, backgrounds, renderer.

Behavioral contract: spair/spair.py:110-579. TPU-native departures:
  - glimpse crop / object paste use the separable-matmul STN (ops/stn.py)
    instead of gather_nd bilinear sampling;
  - all per-cell work stays batched as [B*K, ...] tensors (as the reference
    does) so convs hit the MXU at full tile occupancy;
  - randomness is explicit ('sample' PRNG stream).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from split_vae_tpu.nn.common import Conv, Dense, flatten, resize_bilinear
from split_vae_tpu.nn.pixel_shuffle import Resize2xConv
from split_vae_tpu.ops.distributions import (
    concrete_binary_pre_sigmoid_sample,
    reparameterize,
)
from split_vae_tpu.ops.stn import stn_crop, stn_paste

Array = jax.Array


class ImageEncoder(nn.Module):
    """Conv VAE encoder for backgrounds / local path (spair/spair.py:110-133)."""

    latent_size: int

    @nn.compact
    def __call__(self, x: Array) -> Tuple[Array, Array, Array]:
        x = nn.relu(Conv(32, (3, 3), strides=2, padding="SAME")(x))
        x = nn.relu(Conv(64, (3, 3), strides=2, padding="SAME")(x))
        x = nn.relu(Conv(128, (3, 3), strides=2, padding="SAME")(x))
        x = flatten(x)
        z_mean = Dense(self.latent_size)(x)
        z_sig = nn.softplus(Dense(self.latent_size)(x))
        z = reparameterize(self.make_rng("sample"), z_mean, z_sig)
        return z, z_mean, z_sig


class ImageEncoderDense(nn.Module):
    """MLP VAE encoder 1024 -> 500 (spair/spair.py:135-154)."""

    latent_size: int

    @nn.compact
    def __call__(self, x: Array) -> Tuple[Array, Array, Array]:
        x = flatten(x)
        x = nn.relu(Dense(1024)(x))
        x = nn.relu(Dense(500)(x))
        z_mean = Dense(self.latent_size)(x)
        z_sig = nn.softplus(Dense(self.latent_size)(x))
        z = reparameterize(self.make_rng("sample"), z_mean, z_sig)
        return z, z_mean, z_sig


class ImageDecoder(nn.Module):
    """Conv decoder to a sigmoid image (spair/spair.py:157-182).

    Reference quirk preserved: the 32-filter conv before the final conv uses a
    sigmoid activation (spair/spair.py:168).
    """

    image_hw: Tuple[int, int]
    num_channel: int = 3

    @nn.compact
    def __call__(self, z: Array) -> Array:
        h, w = self.image_hw
        x = nn.relu(Dense(h // 8 * (w // 8) * 128)(z))
        x = x.reshape(-1, h // 8, w // 8, 128)
        x = nn.relu(Conv(128, (3, 3), padding="SAME")(x))
        x = nn.relu(Resize2xConv(64, (h // 4, w // 4), name="Conv_1")(x))
        x = nn.sigmoid(Resize2xConv(32, (h // 2, w // 2), name="Conv_2")(x))
        return nn.sigmoid(
            Resize2xConv(self.num_channel, (h, w), name="Conv_3")(x))


class ImageDecoderDense(nn.Module):
    """MLP decoder 500 -> 1024 -> H*W*C sigmoid (spair/spair.py:185-202)."""

    image_hw: Tuple[int, int]
    num_channel: int = 3

    @nn.compact
    def __call__(self, z: Array) -> Array:
        h, w = self.image_hw
        x = nn.relu(Dense(500)(z))
        x = nn.relu(Dense(1024)(x))
        x = nn.sigmoid(Dense(h * w * self.num_channel)(x))
        return x.reshape(-1, h, w, self.num_channel)


class BackgroundModel(nn.Module):
    """Single-module background VAE (spair/spair.py:205-244)."""

    image_hw: Tuple[int, int]
    bg_latent_size: int
    num_channel: int = 3

    @nn.compact
    def __call__(self, x: Array) -> Tuple[Array, Array, Array, Array]:
        h, w = self.image_hw
        v = nn.relu(Conv(32, (3, 3), strides=2, padding="SAME")(x))
        v = nn.relu(Conv(64, (3, 3), strides=2, padding="SAME")(v))
        v = nn.relu(Conv(128, (3, 3), strides=2, padding="SAME")(v))
        v = flatten(v)
        z_mean = Dense(self.bg_latent_size)(v)
        z_sig = nn.softplus(Dense(self.bg_latent_size)(v))
        z = reparameterize(self.make_rng("sample"), z_mean, z_sig)

        d = nn.relu(Dense(h // 8 * (w // 8) * 128)(z))
        d = d.reshape(-1, h // 8, w // 8, 128)
        d = nn.relu(Conv(128, (3, 3), padding="SAME")(d))
        d = nn.relu(Resize2xConv(64, (h // 4, w // 4), name="Conv_4")(d))
        d = nn.sigmoid(Resize2xConv(32, (h // 2, w // 2), name="Conv_5")(d))
        bg = nn.sigmoid(
            Resize2xConv(self.num_channel, (h, w), name="Conv_6")(d))
        return bg, z, z_mean, z_sig


class ObjEncoder(nn.Module):
    """Per-glimpse encoder -> z_what, operating on flattened [B*K, os, os, C].

    Reference: spair/spair.py:246-273.
    """

    latent_size: int

    @nn.compact
    def __call__(self, glimpses: Array) -> Tuple[Array, Array, Array]:
        b, k, gh, gw, c = glimpses.shape
        x = glimpses.reshape(b * k, gh, gw, c)
        x = nn.relu(Conv(32, (3, 3), strides=2, padding="SAME")(x))
        x = nn.relu(Conv(64, (3, 3), strides=2, padding="SAME")(x))
        x = flatten(x)
        hdn = nn.relu(Dense(self.latent_size * 2)(x))
        z_mean = Dense(self.latent_size)(hdn)
        z_sig = nn.softplus(Dense(self.latent_size)(hdn))
        z = reparameterize(self.make_rng("sample"), z_mean, z_sig)
        return z, z_mean, z_sig


class ObjEncoderScramble(nn.Module):
    """Per-glimpse encoder that also emits a per-glimpse local latent from a
    patch-scrambled view of each glimpse.

    Reference: spair/spair.py:275-338 (only reachable via the
    ``lg_glimpse_spair`` model, which the reference names but never defines —
    spair/spair.py:14-15 raises NameError). Design decisions where the dead
    reference code is incoherent:
      - the reference shares ONE patch permutation across all glimpses in the
        batch (tf.random.shuffle of indices, gathered on axis=1); we keep that
        (cheap, and the scramble only needs to destroy global structure);
      - the reference returns raw patch-major ``patches`` reshaped to image
        shape as the x_hat target (spair/spair.py:336); we return the properly
        reassembled scrambled glimpse instead, so the target is an image.
    """

    latent_size: int
    patch_size: int
    local_latent_size: int

    @nn.compact
    def __call__(self, glimpses: Array):
        b, k, gh, gw, c = glimpses.shape
        x = glimpses.reshape(b * k, gh, gw, c)

        # Patch-scramble every glimpse with one shared permutation.
        p = self.patch_size
        nh, nw = gh // p, gw // p
        n = nh * nw
        patches = x.reshape(b * k, nh, p, nw, p, c).transpose(0, 1, 3, 2, 4, 5)
        patches = patches.reshape(b * k, n, p, p, c)
        perm = jax.random.permutation(self.make_rng("sample"), n)
        patches = jnp.take(patches, perm, axis=1)
        x_hat = patches.reshape(b * k, nh, nw, p, p, c).transpose(0, 1, 3, 2, 4, 5)
        x_hat = x_hat.reshape(b * k, gh, gw, c)

        def vae_head(v, latent, prefix):
            v = nn.relu(Conv(32, (3, 3), strides=2, padding="SAME", name=f"{prefix}_c1")(v))
            v = nn.relu(Conv(64, (3, 3), strides=2, padding="SAME", name=f"{prefix}_c2")(v))
            v = flatten(v)
            v = nn.relu(Dense(self.latent_size * 2, name=f"{prefix}_d1")(v))
            mean = Dense(latent, name=f"{prefix}_mu")(v)
            sig = nn.softplus(Dense(latent, name=f"{prefix}_sigma")(v))
            return mean, sig

        z_what_mean, z_what_sigma = vae_head(x, self.latent_size, "what")
        z_what = reparameterize(self.make_rng("sample"), z_what_mean, z_what_sigma)

        z_l_mean, z_l_sig = vae_head(x_hat, self.local_latent_size, "local")
        z_l = reparameterize(self.make_rng("sample"), z_l_mean, z_l_sig)

        x_hat = x_hat.reshape(b, k, gh, gw, c)
        return z_what, z_what_mean, z_what_sigma, z_l, z_l_mean, z_l_sig, x_hat


class GlimpseDecoder(nn.Module):
    """z_l -> scrambled-glimpse reconstruction [B*K, os, os, C] (sigmoid).

    Companion to ObjEncoderScramble for the lg_glimpse_spair local path
    (the reference's per-image ImageDecoder counterpart, scoped to glimpses).
    """

    object_size: int
    num_channel: int
    latent_size: int

    @nn.compact
    def __call__(self, z_l: Array) -> Array:
        os_ = self.object_size
        x = nn.relu(Dense(self.latent_size * 2)(z_l))
        x = nn.relu(Dense(os_ // 4 * (os_ // 4) * 32)(x))
        x = x.reshape(-1, os_ // 4, os_ // 4, 32)
        x = nn.relu(Conv(64, (3, 3), padding="SAME")(x))
        x = nn.relu(Resize2xConv(32, (os_ // 2, os_ // 2), name="Conv_1")(x))
        return nn.sigmoid(
            Resize2xConv(self.num_channel, (os_, os_), name="Conv_2")(x))


class ObjDecoder(nn.Module):
    """z_what -> RGB object + alpha, both sigmoid (spair/spair.py:341-366)."""

    object_size: int
    num_channel: int
    latent_size: int

    @nn.compact
    def __call__(self, z_what: Array) -> Tuple[Array, Array]:
        os_ = self.object_size
        x = nn.relu(Dense(self.latent_size * 2)(z_what))
        x = nn.relu(Dense(os_ // 4 * (os_ // 4) * 32)(x))
        x = x.reshape(-1, os_ // 4, os_ // 4, 32)
        x = nn.relu(Conv(64, (3, 3), padding="SAME")(x))
        # resize->conv pairs fused (exact; nn/pixel_shuffle.py): the 2x
        # upsampled intermediates — the largest HBM tensors in the SPAIR step
        # (BASELINE.md ObjDecoder breakdown) — are never materialized.
        x = nn.relu(Resize2xConv(32, (os_ // 2, os_ // 2), name="Conv_1")(x))
        x = Resize2xConv(self.num_channel + 1, (os_, os_), name="Conv_2")(x)
        return nn.sigmoid(x[..., : self.num_channel]), nn.sigmoid(x[..., self.num_channel :])


class SpairEncoder(nn.Module):
    """SPAIR backbone + autoregressive-ish latent program.

    Reference: spair/spair.py:368-496. Backbone: 3 convs (128, k=4, strides
    2/2/3) to a gh x gw cell grid, 1x1 conv heads to 100 features per cell,
    then box net -> z_where (+8 passthrough), STN glimpse crop, object encoder
    -> z_what, depth net, presence net with Binary-Concrete sampling.
    """

    object_size: int
    latent_size: int
    tau: float
    concat: bool = False  # inject tiled z_l into per-cell features
    glimpse_local: bool = False  # per-glimpse local latents (lg_glimpse_spair)
    patch_size: int = 4
    local_latent_size: int = 64
    # Static capability flag plumbed from the model factory (which resolves it
    # from the session backend once) — never sniffed from jax.devices() at
    # trace time, so AOT lowering / jax.default_device can't bake in the wrong
    # branch.
    use_pallas: bool = False

    n_z_where: int = 4
    n_pass_through: int = 8

    def setup(self):
        self.conv1 = Conv(128, (4, 4), strides=2, padding="SAME")
        self.conv2 = Conv(128, (4, 4), strides=2, padding="SAME")
        self.conv3 = Conv(128, (4, 4), strides=3, padding="SAME")
        self.z1 = Conv(128, (1, 1), padding="VALID")
        self.z2 = Conv(128, (1, 1), padding="VALID")
        self.z3 = Conv(100, (1, 1), padding="VALID")
        self.where_d1 = Dense(128)
        self.where_d2 = Dense(64)
        self.where_d3 = Dense(self.n_z_where * 2 + self.n_pass_through)
        self.depth_d1 = Dense(64)
        self.depth_d2 = Dense(1 * 2 + self.n_pass_through)
        self.pres_d1 = Dense(64)
        self.pres_d2 = Dense(1)
        if self.glimpse_local:
            self.obj_encoder = ObjEncoderScramble(
                self.latent_size, self.patch_size, self.local_latent_size)
        else:
            self.obj_encoder = ObjEncoder(self.latent_size)
        if self.concat:
            self.zl_d1 = Dense(16)
            self.zl_d2 = Dense(16)

    def __call__(self, x: Array, z_l: Optional[Array] = None):
        b = x.shape[0]
        h = nn.relu(self.conv1(x))
        h = nn.relu(self.conv2(h))
        h = nn.relu(self.conv3(h))
        h = nn.relu(self.z1(h))
        h = nn.relu(self.z2(h))
        z = nn.relu(self.z3(h))  # [B, gh, gw, 100]
        gh, gw = z.shape[1], z.shape[2]
        k = gh * gw

        features = z.reshape(b * k, z.shape[-1])
        if self.concat:
            assert z_l is not None, "concat_backbone requires z_l"
            zl = nn.relu(self.zl_d2(nn.relu(self.zl_d1(z_l))))  # [B, 16]
            zl = jnp.tile(zl[:, None, :], (1, k, 1)).reshape(b * k, -1)
            features = jnp.concatenate([features, zl], axis=-1)

        # Box network (z_where) with passthrough features.
        wh = self.where_d3(nn.relu(self.where_d2(nn.relu(self.where_d1(features)))))
        z_where_mean = wh[:, : self.n_z_where]
        z_where_sigma = nn.softplus(wh[:, self.n_z_where : 2 * self.n_z_where] - 1.0)
        features_1 = nn.relu(wh[:, 2 * self.n_z_where :])
        z_where = reparameterize(self.make_rng("sample"), z_where_mean, z_where_sigma)

        partial_program = z_where
        z_where_grid = z_where.reshape(b, gh, gw, self.n_z_where)

        # Attr network: crop glimpses, encode objects. On TPU the crop runs as
        # the fused Pallas kernel (no [B,K,h,W,C] intermediate in HBM).
        # Crop stays on the XLA einsum path on every backend: measured on v5e
        # (B=256, K=16, C=6) the batched einsum runs fwd+bwd in 2.1 ms vs 4.9
        # (Pallas unpacked) / 3.3 (Pallas packed) — XLA pipelines the per-cell
        # matmuls across the whole [B*K] batch better than a per-item Pallas
        # grid, and the [B,K,h,W,C] intermediate it materializes is cheap at
        # these shapes. The Pallas crop kernels (tools/pallas_research/crop_fused.py,
        # crop_packed.py) are kept as tested alternatives for larger canvases
        # where the intermediate dominates.
        all_glimpses, _ = stn_crop(
            x, z_where_grid, (self.object_size, self.object_size))
        if self.glimpse_local:
            (z_what, z_what_mean, z_what_sigma, zl_g, zl_g_mean, zl_g_sig,
             x_hat_glimpses) = self.obj_encoder(all_glimpses)
        else:
            z_what, z_what_mean, z_what_sigma = self.obj_encoder(all_glimpses)

        partial_program = jnp.concatenate([partial_program, z_what], axis=1)
        layer_inp = jnp.concatenate([features, features_1, partial_program], axis=1)

        # Depth network.
        dh = self.depth_d2(nn.relu(self.depth_d1(layer_inp)))
        z_depth_mean = dh[:, :1]
        z_depth_sigma = nn.softplus(dh[:, 1:2])
        features_2 = nn.relu(dh[:, 2:])
        z_depth = reparameterize(self.make_rng("sample"), z_depth_mean, z_depth_sigma)
        partial_program = jnp.concatenate([partial_program, z_depth], axis=1)

        layer_inp = jnp.concatenate([features, features_2, partial_program], axis=1)

        # Presence network: Binary-Concrete.
        z_pres_logits = jnp.clip(self.pres_d2(nn.relu(self.pres_d1(layer_inp))), -10.0, 10.0)
        z_pres_pre_sigmoid = concrete_binary_pre_sigmoid_sample(
            self.make_rng("sample"), z_pres_logits, self.tau
        )
        z_pres = nn.sigmoid(z_pres_pre_sigmoid)

        grid = lambda v: v.reshape(b, gh, gw, -1)
        base = (
            grid(z_what), grid(z_what_mean), grid(z_what_sigma),
            z_where_grid, grid(z_where_mean), grid(z_where_sigma),
            grid(z_depth), grid(z_depth_mean), grid(z_depth_sigma),
            grid(z_pres), grid(z_pres_logits), grid(z_pres_pre_sigmoid),
            all_glimpses,
        )
        if self.glimpse_local:
            return base + (grid(zl_g), grid(zl_g_mean), grid(zl_g_sig), x_hat_glimpses)
        return base


class SpairDecoder(nn.Module):
    """Decode every cell's object and paste onto full-size canvases.

    Reference: spair/spair.py:500-532.
    """

    image_hw: Tuple[int, int]
    object_size: int
    num_channel: int
    latent_size: int

    @nn.compact
    def __call__(self, z_what: Array, z_where: Array, fused: bool = False):
        b, gh, gw, d = z_what.shape
        k = gh * gw
        obj_decoder = ObjDecoder(self.object_size, self.num_channel, self.latent_size)
        rgb, alpha = obj_decoder(z_what.reshape(b * k, d))
        os_ = self.object_size
        obj_recon_unnorm = rgb.reshape(b, k, os_, os_, self.num_channel)
        obj_recon_alpha = alpha.reshape(b, k, os_, os_, 1)
        concat = jnp.concatenate([obj_recon_unnorm, obj_recon_alpha], axis=-1)
        if fused:
            # Defer pasting to the fused Pallas paste+render kernel: return the
            # interp weights instead of materializing per-cell canvases.
            from split_vae_tpu.ops.stn import paste_interp_weights

            wy, wx, obj_bbox_mask = paste_interp_weights(
                z_where, self.image_hw, (os_, os_))
            return obj_recon_unnorm, obj_recon_alpha, (wy, wx), obj_bbox_mask
        obj_full_recon_unnorm, obj_bbox_mask = stn_paste(concat, z_where, self.image_hw)
        return obj_recon_unnorm, obj_recon_alpha, obj_full_recon_unnorm, obj_bbox_mask


def fused_decode_render(decoder, rng_key, z_what, z_where, z_depth, z_pres,
                        bg_recon, num_channel: int, image_hw: Tuple[int, int],
                        noise_scale: float = 0.01, interpret: bool = False):
    """Training-time decode + paste + composite via the fused Pallas kernel.

    Identical math to decoder(...) -> render(training=True) but the per-cell
    full canvases never hit HBM. Returns (obj_recon_unnorm, obj_recon_alpha,
    obj_bbox_mask, x_recon).
    """
    from split_vae_tpu.ops.pallas.render_fused import fused_paste_render
    from split_vae_tpu.ops.pallas.render_packed import (
        fused_paste_render_packed, packing_supported)

    obj_ru, obj_ra, (wy, wx), bbox = decoder(z_what, z_where, fused=True)
    # The Pallas kernels are f32-internal; cast bf16 activations up at the
    # boundary (the decoded objects [B,K,h,w,C1] are small next to the
    # full-canvas tensors the kernel avoids).
    concat = jnp.concatenate([obj_ru, obj_ra], axis=-1).astype(jnp.float32)
    b = concat.shape[0]
    zp = z_pres.reshape(b, -1).astype(jnp.float32)
    wd = (jax.nn.sigmoid(-z_depth.astype(jnp.float32)) + 0.5).reshape(b, -1)
    bg_img = jnp.broadcast_to(
        jnp.asarray(bg_recon, jnp.float32),
        (b, image_hw[0], image_hw[1], num_channel))
    seed = jax.random.randint(rng_key, (), 0, jnp.iinfo(jnp.int32).max, jnp.int32)
    # The in-kernel PRNG has no CPU interpreter rule; render noise (a train-time
    # regularizer, spair/spair.py:539) is dropped when interpreting on CPU.
    noise = 0.0 if interpret else noise_scale
    # Prefer the sublane-packed kernel (3 MXU passes/cell vs 8) when the
    # object/canvas sizes satisfy its 8-row block alignment.
    render_fn = (fused_paste_render_packed
                 if packing_supported(concat.shape[2], image_hw)
                 else fused_paste_render)
    x_recon = _call_render_spmd(render_fn, concat, wy, wx, zp, wd, bg_img,
                                seed, noise, interpret)
    return obj_ru, obj_ra, bbox, x_recon


def _call_render_spmd(render_fn, concat, wy, wx, zp, wd, bg_img, seed, noise,
                      interpret):
    """Invoke a fused render kernel, shard_mapped over the data axis when a
    multi-device mesh is ambient.

    ``pallas_call`` is an opaque custom call XLA's SPMD partitioner cannot
    split over a batch-sharded input, so under a >1-wide 'data' axis we enter
    manual mode per shard (the batch axis is embarrassingly parallel — the
    kernel's grid is (B,)). Seed semantics match the single-device program
    exactly: the kernel seeds its PRNG with ``seed + program_id``, so shard j
    (local batch b/n) seeds with ``seed + j*(b/n) + i`` = seed + global batch
    index.
    """
    from jax.sharding import PartitionSpec as P

    from split_vae_tpu.parallel.mesh import (
        DATA_AXIS, ambient_data_axis_size, ambient_mesh)

    b = concat.shape[0]
    n_data = ambient_data_axis_size()
    if n_data <= 1 or b % n_data != 0:
        return render_fn(concat, wy, wx, zp, wd, bg_img, seed, noise, interpret)
    local_b = b // n_data

    def per_shard(concat, wy, wx, zp, wd, bg_img, seed):
        shard_seed = seed + jax.lax.axis_index(DATA_AXIS) * local_b
        return render_fn(concat, wy, wx, zp, wd, bg_img, shard_seed, noise,
                         interpret)

    # check_vma=False: pallas_call's ShapeDtypeStruct out_shape carries no
    # varying-mesh-axes annotation (jax 0.9), which the vma checker rejects.
    # The partitioning is trivially correct here — every operand and the
    # output are batch-split along 'data' and the kernel is per-image.
    return jax.shard_map(
        per_shard,
        mesh=ambient_mesh(),
        in_specs=(P(DATA_AXIS),) * 6 + (P(),),
        out_specs=P(DATA_AXIS),
        check_vma=False,
    )(concat, wy, wx, zp, wd, bg_img, seed)


def render(
    obj_full_recon_unnorm: Array,
    background_img,
    z_depth: Array,
    z_pres: Array,
    z_pres_logits: Array,
    key: Optional[Array],
    training: bool,
    num_channel: int,
) -> Array:
    """Depth-aware differentiable alpha compositing (spair/spair.py:534-579).

    Train: uses the Concrete z_pres sample and adds N(0, 0.01) noise to object
    RGB before clipping. Test: uses round(sigmoid(z_pres_logits)) floored at
    1e-8 instead of the sample.
    """
    b = z_depth.shape[0]
    k = z_depth.shape[1] * z_depth.shape[2]
    # Compositing accumulates in f32 regardless of the activation dtype
    # (the 1e-8 normalizer and per-cell sums need the f32 mantissa).
    obj_full_recon_unnorm = obj_full_recon_unnorm.astype(jnp.float32)
    background_img = jnp.asarray(background_img, jnp.float32)
    z_depth = z_depth.astype(jnp.float32)
    z_pres = z_pres.astype(jnp.float32)
    if z_pres_logits is not None:  # unused when training=True
        z_pres_logits = z_pres_logits.astype(jnp.float32)
    z_depth = z_depth.reshape(b, k, 1, 1, 1)
    if training:
        z_pres = z_pres.reshape(b, k, 1, 1, 1)
    else:
        z_pres = jax.nn.sigmoid(z_pres_logits).reshape(b, k, 1, 1, 1)
        z_pres = jnp.maximum(jnp.round(z_pres), 1e-8)

    obj_rgb = obj_full_recon_unnorm[..., :num_channel]
    obj_alpha = jnp.clip(obj_full_recon_unnorm[..., num_channel:], 1e-8, 1.0)

    transparency_map = z_pres * obj_alpha
    importance_map = z_pres * obj_alpha * (jax.nn.sigmoid(-z_depth) + 0.5)

    if training:
        noise = 0.01 * jax.random.normal(key, obj_rgb.shape, dtype=obj_rgb.dtype)
        obj_rgb = obj_rgb + noise
    obj_rgb = jnp.clip(obj_rgb, 0.0, 1.0)

    unnorm_canvas = jnp.sum(importance_map * obj_rgb, axis=1)
    normalise_const = jnp.sum(importance_map, axis=1)
    normalised_canvas = unnorm_canvas / (normalise_const + 1e-8)
    normalised_alpha_canvas = jnp.sum(transparency_map * importance_map, axis=1) / (
        normalise_const + 1e-8
    )
    return normalised_alpha_canvas * normalised_canvas + (
        1.0 - normalised_alpha_canvas
    ) * background_img
