"""TF2 parity harness: golden export (runs here) + TF2-side verifier.

The 1%-ELBO parity target (BASELINE.json) was certified in rounds 1-2 against
numpy oracles written by the same hands as the framework — a shared
misreading of the reference would pass. This tool retires that risk by making
certification against the reference's OWN TF2 code a one-command affair on
any machine that has tensorflow (this environment has none and zero egress):

  Here (jax):     python tools/tf2_goldens.py export --out goldens
  TF2 machine:    python tools/tf2_goldens.py verify --goldens goldens \
                      --reference /root/reference

``export`` dumps, for one plain-VAE config (LGVae, the vae/main.py default),
the GMVAE family (LGGMVae + GMVae at the canonical clustering knobs), and one
SPAIR config (lg_spair, the canonical split_z_l run):
  - the exact float input batch,
  - every parameter under this framework's names (layouts already match
    Keras: Conv HWIO, Dense [in, out]),
  - this framework's forward tensors and per-term loss values.

``verify`` loads the reference's actual classes (vae/model.py:174-219,
spair/spair.py:52-106), injects the weights via an explicit name map, runs
the reference forward, recomputes the reference losses by composing the
reference's own loss helpers exactly as its train steps do
(vae/trainer.py:121-146, spair/trainer.py:137-234), and prints per-tensor
max-abs-diffs plus a PASS/FAIL verdict.

Determinism protocol (applied identically on both sides):
  - every standard-normal draw is 0            => z = mean everywhere,
    render noise off (reference Sampling layers, spair GaussianNoise(0.01));
  - every uniform draw is 0.5                  => the Binary-Concrete noise
    log(u+eps) - log(1-u+eps) cancels exactly (identical eps=1e-8 form on
    both sides: spair/utils.py:14-17 vs ops/distributions.py:154-163), so
    z_pres_pre_sigmoid = logits / tau on both sides.

Tolerances: forward tensors max|diff| <= 2e-3 (the reference STN resamples
via 4-corner gather_nd, this framework via separable interpolation matmuls —
identical math, different summation order), loss terms relative <= 1%
(the BASELINE.json ELBO target).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from contextlib import contextmanager

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FWD_ATOL = 2e-3
LOSS_RTOL = 0.01

# ---------------------------------------------------------------------------
# Export side (jax; runs in this environment)
# ---------------------------------------------------------------------------


@contextmanager
def _deterministic_jax():
    """Patch jax.random so normals are 0 and uniforms are 0.5 (see module
    docstring for why this cancels every stochastic term on both sides)."""
    import jax
    import jax.numpy as jnp

    real_normal, real_uniform = jax.random.normal, jax.random.uniform

    def zero_normal(key, shape=(), dtype=jnp.float32, **kw):
        return jnp.zeros(shape, dtype)

    def mid_uniform(key, shape=(), dtype=jnp.float32, minval=0.0, maxval=1.0, **kw):
        return jnp.full(shape, 0.5 * (minval + maxval), dtype)

    jax.random.normal = zero_normal
    jax.random.uniform = mid_uniform
    try:
        yield
    finally:
        jax.random.normal = real_normal
        jax.random.uniform = real_uniform


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k in sorted(tree):
            out.update(_flatten(tree[k], f"{prefix}/{k}"))
        return out
    out[prefix] = np.asarray(tree)
    return out


def export_vae(out_dir: str) -> None:
    import jax
    import jax.numpy as jnp

    from split_vae_tpu.models.vae import LGVae
    from split_vae_tpu.train.losses import lgvae_loss

    g = l = 128  # vae/main.py:17-18 defaults
    hw, beta = (32, 32), 1.0
    model = LGVae(g, l, hw)
    rng = np.random.RandomState(42)
    # 6-channel [x | x_hat] in [-1, 1], exactly what both models consume
    # (the augmentation producing x_hat happens upstream of the model).
    images = (rng.rand(8, hw[0], hw[1], 6).astype(np.float32) * 2.0) - 1.0

    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.asarray(images))
    with _deterministic_jax():
        out = model.apply(variables, jnp.asarray(images),
                          rngs={"sample": jax.random.PRNGKey(2)})
        total, metrics = lgvae_loss(out, jnp.asarray(images), beta)

    payload = {"input": images}
    payload.update({f"p:{k}": v for k, v in _flatten(variables["params"]).items()})
    for name in ("x_mean", "x_log_scale", "z_mean_x", "z_sig_x", "x_hat_mean",
                 "x_hat_log_scale", "z_mean_x_hat", "z_sig_x_hat"):
        payload[f"f:{name}"] = np.asarray(getattr(out, name))
    for k, v in metrics.items():
        payload[f"l:{k}"] = np.asarray(v)
    meta = {"model": "lgvae", "beta": beta, "global_latent_dims": g,
            "local_latent_dims": l, "image_hw": hw}
    np.savez_compressed(os.path.join(out_dir, "lgvae_goldens.npz"), **payload)
    with open(os.path.join(out_dir, "lgvae_meta.json"), "w") as f:
        json.dump(meta, f, indent=2)
    print(f"exported LGVae goldens: loss={float(total):.4f} "
          f"({len(payload)} arrays)")


def export_lggmvae(out_dir: str) -> None:
    """GMVAE-family goldens (LGGMVae + GMVae): the Gumbel-softmax cluster
    posterior and y-conditional z-prior path (vae/model.py:48-140,221-320).

    Determinism: training=False on both sides (the reference's seven declared
    dropouts reduce to identity), normals -> 0 (z = mean), uniforms -> 0.5
    (the Gumbel noise -log(-log U) becomes a constant vector, which cancels
    in the softmax on both sides)."""
    import jax
    import jax.numpy as jnp

    from split_vae_tpu.models.vae import GMVae, LGGMVae
    from split_vae_tpu.train.losses import gmvae_loss, lggmvae_loss

    g = l = 128                      # vae/main.py:17-18 defaults
    y_size, tau = 30, 0.4            # vae/main.py:28-29 defaults
    beta, alpha = 40.0, 40.0         # canonical config #3 (README.md:57-63)
    hw = (32, 32)
    rng = np.random.RandomState(11)
    images = (rng.rand(8, hw[0], hw[1], 6).astype(np.float32) * 2.0) - 1.0

    cases = (
        ("lggmvae", LGGMVae(g, l, hw, y_size=y_size, tau=tau),
         lambda out: lggmvae_loss(out, jnp.asarray(images), beta, alpha, y_size),
         ("x_mean", "x_log_scale", "z_mean_x", "z_sig_x", "x_hat_mean",
          "x_hat_log_scale", "z_mean_x_hat", "z_sig_x_hat", "y", "y_logits",
          "z_prior_mean", "z_prior_sig")),
        ("gmvae", GMVae(g, hw, y_size=y_size, tau=tau),
         lambda out: gmvae_loss(out, jnp.asarray(images), beta, alpha, y_size),
         ("x_mean", "x_log_scale", "z_mean_x", "z_sig_x", "y", "y_logits",
          "z_prior_mean", "z_prior_sig")),
    )
    for name, model, loss_fn, fwd_names in cases:
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
            jnp.asarray(images))
        with _deterministic_jax():
            out = model.apply(variables, jnp.asarray(images), False,
                              rngs={"sample": jax.random.PRNGKey(2)})
            total, metrics = loss_fn(out)

        payload = {"input": images}
        payload.update({f"p:{k}": v
                        for k, v in _flatten(variables["params"]).items()})
        for fname in fwd_names:
            payload[f"f:{fname}"] = np.asarray(getattr(out, fname))
        for k, v in metrics.items():
            payload[f"l:{k}"] = np.asarray(v)
        meta = {"model": name, "beta": beta, "alpha": alpha, "y_size": y_size,
                "tau": tau, "global_latent_dims": g, "local_latent_dims": l,
                "image_hw": hw}
        np.savez_compressed(os.path.join(out_dir, f"{name}_goldens.npz"),
                            **payload)
        with open(os.path.join(out_dir, f"{name}_meta.json"), "w") as f:
            json.dump(meta, f, indent=2)
        print(f"exported {name} goldens: loss={float(total):.4f} "
              f"({len(payload)} arrays)")


def export_spair(out_dir: str) -> None:
    import jax
    import jax.numpy as jnp

    from split_vae_tpu.core.config import SpairConfig
    from split_vae_tpu.models.spair import get_spair_model
    from split_vae_tpu.train.losses import spair_loss

    cfg = SpairConfig(model="lg_spair", split_z_l=True, concat_z_what=True,
                      dense_bg=True, dense_local=True, fused_render=False)
    cfg.image_size = (48, 48, 3)
    step = 1000.0
    model = get_spair_model(cfg)
    rng = np.random.RandomState(7)
    images = rng.rand(4, 48, 48, 6).astype(np.float32)  # [x | x_hat] in [0,1]

    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.asarray(images), True)
    with _deterministic_jax():
        out = model.apply(variables, jnp.asarray(images), True, fused=False,
                          rngs={"sample": jax.random.PRNGKey(2)})
        total, metrics = spair_loss(out, jnp.asarray(images), cfg,
                                    jnp.asarray(step), training=True)

    payload = {"input": images}
    payload.update({f"p:{k}": v for k, v in _flatten(variables["params"]).items()})
    for name in ("x_recon", "z_what", "z_what_mean", "z_what_sigma",
                 "z_where_mean", "z_where_sigma", "z_depth_mean",
                 "z_depth_sigma", "z_pres", "z_pres_logits",
                 "z_pres_pre_sigmoid", "all_glimpses", "obj_recon_unnorm",
                 "obj_recon_alpha", "obj_full_recon_unnorm", "z_bg_mean",
                 "z_bg_sig", "x_hat_recon", "z_l_mean", "z_l_sig"):
        val = getattr(out, name)
        if val is not None:
            payload[f"f:{name}"] = np.asarray(val)
    for k, v in metrics.items():
        payload[f"l:{k}"] = np.asarray(v)
    meta = {
        "model": cfg.model, "step": step,
        # every scalar the reference train_step reads (spair/trainer.py:137+)
        "config": {k: getattr(cfg, k) for k in (
            "latent_size", "bg_latent_size", "local_latent_size",
            "object_size", "tau", "beta", "z_what_beta", "z_bg_beta",
            "z_l_beta", "reconstruction_weight", "anneal_until",
            "z_pres_anneal_step", "prior_z_zoom", "prior_z_zoom_start",
            "split_z_l", "concat_z_what", "concat_backbone", "concat_z_bg",
            "dense_bg", "dense_local", "bg_model")},
        "image_size": list(cfg.image_size), "test_size": list(cfg.test_size),
    }
    np.savez_compressed(os.path.join(out_dir, "lg_spair_goldens.npz"), **payload)
    with open(os.path.join(out_dir, "lg_spair_meta.json"), "w") as f:
        json.dump(meta, f, indent=2)
    print(f"exported lg_spair goldens: loss={float(total):.4f} "
          f"({len(payload)} arrays)")


def run_export(out_dir: str) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    os.makedirs(out_dir, exist_ok=True)
    export_vae(out_dir)
    export_lggmvae(out_dir)
    export_spair(out_dir)
    print(f"goldens written to {out_dir}/ — on a TF2 machine run:\n"
          f"  python tools/tf2_goldens.py verify --goldens {out_dir} "
          f"--reference /path/to/51616-split-vae")


# ---------------------------------------------------------------------------
# Verify side (tensorflow 2.x; runs on any TF2-equipped machine)
# ---------------------------------------------------------------------------

# our param path -> reference layer attribute path (kernel/bias appended).
# Layouts match (Keras Conv HWIO / Dense [in,out]); no transposes needed.
_VAE_LAYER_MAP = {
    "encoder_x/Conv_0": "encoder_x.e1",
    "encoder_x/Conv_1": "encoder_x.e2",
    "encoder_x/Conv_2": "encoder_x.e3",
    "encoder_x/Dense_0": "encoder_x.e4_mean",
    "encoder_x/Dense_1": "encoder_x.e4_sd",
    "encoder_x_hat/Conv_0": "encoder_x_hat.e1",
    "encoder_x_hat/Conv_1": "encoder_x_hat.e2",
    "encoder_x_hat/Conv_2": "encoder_x_hat.e3",
    "encoder_x_hat/Dense_0": "encoder_x_hat.e4_mean",
    "encoder_x_hat/Dense_1": "encoder_x_hat.e4_sd",
    "decoder_x/Dense_0": "decoder_x.d1",
    "decoder_x/Conv_0": "decoder_x.d2",
    "decoder_x/Conv_1": "decoder_x.d3",
    "decoder_x/Conv_2": "decoder_x.d4",
    "decoder_x/Conv_3": "decoder_x.d5",
    "decoder_x_hat/Dense_0": "decoder_x_hat.d1",
    "decoder_x_hat/Conv_0": "decoder_x_hat.d2",
    "decoder_x_hat/Conv_1": "decoder_x_hat.d3",
    "decoder_x_hat/Conv_2": "decoder_x_hat.d4",
    "decoder_x_hat/Conv_3": "decoder_x_hat.d5",
}

# GMVAE encoder (vae/model.py:48-79): named attributes on our side, Keras
# Sequential sub-layers / named Dense layers on the reference side. Dropout
# layers carry no weights and are skipped.
_GM_ENCODER_MAP = {
    "encoder_x/h_conv1": "encoder_x.h_block.layers[0]",
    "encoder_x/h_conv2": "encoder_x.h_block.layers[1]",
    "encoder_x/h_conv3": "encoder_x.h_block.layers[2]",
    "encoder_x/y_dense1": "encoder_x.y_block.layers[0]",
    "encoder_x/y_dense2": "encoder_x.y_block.layers[2]",
    "encoder_x/y_head": "encoder_x.y_dense",
    "encoder_x/h_top_dense": "encoder_x.h_top_dense",
    "encoder_x/z_prior_mean_head": "encoder_x.z_prior_mean",
    "encoder_x/z_prior_sig_head": "encoder_x.z_prior_sig",
    "encoder_x/e1": "encoder_x.e1",
    "encoder_x/z_mean_head": "encoder_x.z_mean",
    "encoder_x/z_sig_head": "encoder_x.z_sig",
}

# LGGMVae = gm global encoder + LGVae's local encoder and both decoders
# (vae/model.py:221-234).
_LGGMVAE_LAYER_MAP = dict(_GM_ENCODER_MAP)
_LGGMVAE_LAYER_MAP.update({k: v for k, v in _VAE_LAYER_MAP.items()
                           if k.split("/")[0] != "encoder_x"})

# GMVae = gm encoder + single decoder (vae/model.py:277-286).
_GMVAE_LAYER_MAP = dict(_GM_ENCODER_MAP)
_GMVAE_LAYER_MAP.update({k: v for k, v in _VAE_LAYER_MAP.items()
                         if k.split("/")[0] == "decoder_x"})

# lg_spair with dense_bg/dense_local (spair/spair.py:52-106 attribute names)
_SPAIR_LAYER_MAP = {
    "encoder/conv1": "encoder.conv1",
    "encoder/conv2": "encoder.conv2",
    "encoder/conv3": "encoder.conv3",
    "encoder/z1": "encoder.z1",
    "encoder/z2": "encoder.z2",
    "encoder/z3": "encoder.z3",
    "encoder/where_d1": "encoder.dense_z_where.layers[0]",
    "encoder/where_d2": "encoder.dense_z_where.layers[1]",
    "encoder/where_d3": "encoder.dense_z_where.layers[2]",
    "encoder/depth_d1": "encoder.dense_z_depth.layers[0]",
    "encoder/depth_d2": "encoder.dense_z_depth.layers[1]",
    "encoder/pres_d1": "encoder.dense_z_pres.layers[0]",
    "encoder/pres_d2": "encoder.dense_z_pres.layers[1]",
    "encoder/obj_encoder/Conv_0": "encoder.obj_encoder.conv1",
    "encoder/obj_encoder/Conv_1": "encoder.obj_encoder.conv2",
    "encoder/obj_encoder/Dense_0": "encoder.obj_encoder.dense1",
    "encoder/obj_encoder/Dense_1": "encoder.obj_encoder.z_what_mu",
    "encoder/obj_encoder/Dense_2": "encoder.obj_encoder.z_what_sigma",
    "decoder/ObjDecoder_0/Dense_0": "decoder.obj_decoder.d0",
    "decoder/ObjDecoder_0/Dense_1": "decoder.obj_decoder.d1",
    "decoder/ObjDecoder_0/Conv_0": "decoder.obj_decoder.d2",
    "decoder/ObjDecoder_0/Conv_1": "decoder.obj_decoder.d3",
    "decoder/ObjDecoder_0/Conv_2": "decoder.obj_decoder.d5",
    # dense image encoder/decoder pairs (ImageEncoderDense /
    # ImageDecoderDense, spair/spair.py:135-203)
    "bg_encoder/Dense_0": "bg_encoder.e1",
    "bg_encoder/Dense_1": "bg_encoder.e2",
    "bg_encoder/Dense_2": "bg_encoder.z_mu",
    "bg_encoder/Dense_3": "bg_encoder.z_sigma",
    "bg_decoder/Dense_0": "bg_decoder.d1",
    "bg_decoder/Dense_1": "bg_decoder.d2",
    "bg_decoder/Dense_2": "bg_decoder.d3",
    "x_hat_encoder/Dense_0": "x_hat_encoder.e1",
    "x_hat_encoder/Dense_1": "x_hat_encoder.e2",
    "x_hat_encoder/Dense_2": "x_hat_encoder.z_mu",
    "x_hat_encoder/Dense_3": "x_hat_encoder.z_sigma",
    "x_hat_decoder/Dense_0": "x_hat_decoder.d1",
    "x_hat_decoder/Dense_1": "x_hat_decoder.d2",
    "x_hat_decoder/Dense_2": "x_hat_decoder.d3",
}


def _resolve(obj, path: str):
    """Resolve 'a.b.layers[0]'-style attribute paths."""
    for part in path.split("."):
        if "[" in part:
            name, idx = part[:-1].split("[")
            obj = getattr(obj, name)[int(idx)]
        else:
            obj = getattr(obj, part)
    return obj


def _patch_keras3_compat(tf):
    """The reference targets tensorflow 2.0's Keras; Keras 3 (bundled with
    modern TF) forbids passing non-tensors positionally into layer calls,
    which the reference does everywhere (`self.encoder(x, training)`,
    spair/spair.py:91). Keras keeps a per-layer escape hatch
    (`_allow_non_tensor_positional_args`), but Layer.__init__ pins it False
    as an INSTANCE attribute — shadow it with a class-level data descriptor
    (always-True getter, no-op setter) to restore the 2.0 convention."""
    try:
        from keras.src.layers.layer import Layer as _KLayer
    except ImportError:  # legacy tf.keras 2.x: the old convention already holds
        return
    _KLayer._allow_non_tensor_positional_args = property(
        lambda self: True, lambda self, value: None)

    # Keras 3 then re-injects `training` as a KEYWORD into the inner call
    # even when it was already supplied positionally -> "got multiple values
    # for argument 'training'". Detect the positional case (bound in
    # user_arguments_dict but absent from the pre-injection kwargs) and
    # drop the duplicate injection; context propagation is unaffected.
    orig_resolve = _KLayer._resolve_and_populate_arg

    def _resolve_no_dup(self, arg_name, call_spec, call_context, kwargs):
        passed_positionally = (arg_name in call_spec.user_arguments_dict
                               and arg_name not in kwargs)
        orig_resolve(self, arg_name, call_spec, call_context, kwargs)
        if passed_positionally:
            kwargs.pop(arg_name, None)

    _KLayer._resolve_and_populate_arg = _resolve_no_dup


def _patch_tf_determinism(tf):
    """normals -> 0, uniforms -> midpoint, GaussianNoise -> identity."""
    tf.random.normal = lambda shape, mean=0.0, stddev=1.0, dtype=tf.float32, **kw: (
        tf.zeros(shape, dtype) + mean)
    tf.random.uniform = lambda shape, minval=0, maxval=1, dtype=tf.float32, **kw: (
        tf.fill(shape, tf.cast((minval + (maxval if maxval is not None else 1))
                               / 2.0, dtype)))
    tf.keras.layers.GaussianNoise.call = lambda self, x, training=None: x


def _inject(model, flat, layer_map):
    """Assign our exported weights onto the reference model's variables."""
    missing = []
    for ours, theirs in layer_map.items():
        layer = _resolve(model, theirs)
        for leaf in ("kernel", "bias"):
            key = f"p:/{ours}/{leaf}"
            if key not in flat:
                missing.append(key)
                continue
            var = getattr(layer, leaf)
            assert tuple(var.shape) == flat[key].shape, (
                ours, leaf, tuple(var.shape), flat[key].shape)
            var.assign(flat[key])
    if missing:
        raise KeyError(f"goldens missing {missing[:5]}...")
    mapped = sum(1 for k in flat if k.startswith("p:")
                 if any(k == f"p:/{ours}/{leaf}" for ours in layer_map
                        for leaf in ("kernel", "bias")))
    unmapped = [k for k in flat if k.startswith("p:")
                and not any(k == f"p:/{ours}/{leaf}" for ours in layer_map
                            for leaf in ("kernel", "bias"))]
    if unmapped:
        raise KeyError(f"exported params with no mapping: {unmapped}")
    return mapped


class _Report:
    def __init__(self, tag):
        self.tag, self.fails, self.rows = tag, 0, []

    def tensor(self, name, ref, ours):
        ref, ours = np.asarray(ref, np.float64), np.asarray(ours, np.float64)
        if ref.shape != ours.shape:
            self.fails += 1
            self.rows.append((name, f"SHAPE {ref.shape} vs {ours.shape}", "FAIL"))
            return
        diff = float(np.max(np.abs(ref - ours))) if ref.size else 0.0
        ok = diff <= FWD_ATOL
        self.fails += (not ok)
        self.rows.append((name, f"max|diff|={diff:.3e}", "ok" if ok else "FAIL"))

    def loss(self, name, ref, ours):
        ref, ours = float(ref), float(ours)
        rel = abs(ref - ours) / max(1e-8, abs(ref))
        ok = rel <= LOSS_RTOL
        self.fails += (not ok)
        self.rows.append(
            (name, f"ref={ref:.6f} ours={ours:.6f} rel={rel:.2%}",
             "ok" if ok else "FAIL"))

    def dump(self):
        print(f"--- {self.tag} ---")
        for name, detail, verdict in self.rows:
            print(f"  [{verdict:>4}] {name:36s} {detail}")
        return self.fails


def _use_reference_subdir(reference, which):
    """Point bare-module imports at one reference subdir (vae/ or spair/).

    Both subdirs ship flat modules named utils/trainer/visualizer/data/
    model/classifier (each main.py runs from its own dir, vae/main.py:1-2):
    purge any previously-imported flat names so they re-resolve against the
    requested subdir, and insert that subdir on sys.path at most once even
    across repeated verifier calls.
    """
    for name in ("utils", "trainer", "visualizer", "data", "model",
                 "classifier", "spair"):
        sys.modules.pop(name, None)
    path = os.path.join(reference, which)
    while path in sys.path:
        sys.path.remove(path)
    other = os.path.join(reference, "spair" if which == "vae" else "vae")
    while other in sys.path:
        sys.path.remove(other)
    sys.path.insert(0, path)


def verify_vae(goldens_dir, reference):
    import tensorflow as tf

    _use_reference_subdir(reference, "vae")
    import model as ref_model  # noqa: the reference's vae/model.py

    flat = dict(np.load(os.path.join(goldens_dir, "lgvae_goldens.npz")))
    meta = json.load(open(os.path.join(goldens_dir, "lgvae_meta.json")))
    hw = meta["image_hw"]
    m = ref_model.LGVae(meta["global_latent_dims"], meta["local_latent_dims"],
                        image_shape=(None, hw[0], hw[1], 6))
    x = tf.constant(flat["input"])
    m(x)  # build variables
    _inject(m, flat, _VAE_LAYER_MAP)

    (x_mean, x_log_scale, z_x, z_mean_x, z_sig_x, z_x_hat, x_hat_mean,
     x_hat_log_scale, z_mean_x_hat, z_sig_x_hat) = m(x)

    rep = _Report("LGVae forward")
    for name, val in (("x_mean", x_mean), ("x_log_scale", x_log_scale),
                      ("z_mean_x", z_mean_x), ("z_sig_x", z_sig_x),
                      ("x_hat_mean", x_hat_mean),
                      ("x_hat_log_scale", x_hat_log_scale),
                      ("z_mean_x_hat", z_mean_x_hat),
                      ("z_sig_x_hat", z_sig_x_hat)):
        rep.tensor(name, val, flat[f"f:{name}"])

    # Losses exactly as vae/trainer.py:121-146 composes them.
    import trainer as ref_trainer

    xx, x_hat = x[:, :, :, :3], x[:, :, :, 3:]
    x_recon_loss = tf.reduce_mean(tf.reduce_sum(
        ref_trainer.discretised_logistic_loss(xx, x_mean, x_log_scale),
        axis=[1, 2, 3]))
    x_hat_recon_loss = tf.reduce_mean(tf.reduce_sum(
        ref_trainer.discretised_logistic_loss(x_hat, x_hat_mean, x_hat_log_scale),
        axis=[1, 2, 3]))
    total_kl = meta["beta"] * ref_trainer.kl_divergence(
        tf.concat([z_mean_x, z_mean_x_hat], axis=1),
        tf.concat([z_sig_x, z_sig_x_hat], axis=1))
    losses = {
        "x_recon_loss": x_recon_loss,
        "x_hat_recon_loss": x_hat_recon_loss,
        "total_kl_loss": total_kl,
        "x_kl_loss": ref_trainer.kl_divergence(z_mean_x, z_sig_x),
        "x_hat_kl_loss": ref_trainer.kl_divergence(z_mean_x_hat, z_sig_x_hat),
        "total_loss": x_recon_loss + x_hat_recon_loss + total_kl,
    }
    for name, val in losses.items():
        rep.loss(name, val, flat[f"l:{name}"])
    return rep.dump()


def verify_gm(goldens_dir, reference, which):
    """Executed-TF2 parity for the GMVAE family (``which`` in
    {"lggmvae", "gmvae"}): Gumbel-softmax cluster posterior, y-conditional
    z prior, and the alpha/beta loss branches (vae/model.py:221-320,
    vae/trainer.py:146-195)."""
    import tensorflow as tf

    _use_reference_subdir(reference, "vae")
    import model as ref_model
    import trainer as ref_trainer

    flat = dict(np.load(os.path.join(goldens_dir, f"{which}_goldens.npz")))
    meta = json.load(open(os.path.join(goldens_dir, f"{which}_meta.json")))
    hw = meta["image_hw"]
    x = tf.constant(flat["input"])
    if which == "lggmvae":
        m = ref_model.LGGMVae(
            meta["global_latent_dims"], meta["local_latent_dims"],
            image_shape=(None, hw[0], hw[1], 6),
            y_size=meta["y_size"], tau=meta["tau"])
        layer_map = _LGGMVAE_LAYER_MAP
    else:
        m = ref_model.GMVae(
            meta["global_latent_dims"], image_shape=(None, hw[0], hw[1], 6),
            y_size=meta["y_size"], tau=meta["tau"])
        layer_map = _GMVAE_LAYER_MAP
    m(x, training=False)  # build variables
    _inject(m, flat, layer_map)

    rep = _Report(f"{which} forward")
    if which == "lggmvae":
        (x_mean, x_log_scale, z_x, z_mean_x, z_sig_x, z_x_hat, x_hat_mean,
         x_hat_log_scale, z_mean_x_hat, z_sig_x_hat, y, y_logits,
         z_prior_mean, z_prior_sig) = m(x, training=False)
        fwd = (("y_logits", y_logits), ("y", y),
               ("z_prior_mean", z_prior_mean), ("z_prior_sig", z_prior_sig),
               ("z_mean_x", z_mean_x), ("z_sig_x", z_sig_x),
               ("z_mean_x_hat", z_mean_x_hat), ("z_sig_x_hat", z_sig_x_hat),
               ("x_mean", x_mean), ("x_log_scale", x_log_scale),
               ("x_hat_mean", x_hat_mean), ("x_hat_log_scale", x_hat_log_scale))
    else:
        (x_mean, x_log_scale, z_x, z_mean_x, z_sig_x, y, y_logits,
         z_prior_mean, z_prior_sig) = m(x, training=False)
        fwd = (("y_logits", y_logits), ("y", y),
               ("z_prior_mean", z_prior_mean), ("z_prior_sig", z_prior_sig),
               ("z_mean_x", z_mean_x), ("z_sig_x", z_sig_x),
               ("x_mean", x_mean), ("x_log_scale", x_log_scale))
    for name, val in fwd:
        rep.tensor(name, val, flat[f"f:{name}"])

    # Losses exactly as vae/trainer.py:146-164 / :175-188 compose them.
    beta, alpha, y_size = meta["beta"], meta["alpha"], meta["y_size"]
    xx = x[:, :, :, :3]
    x_recon_loss = tf.reduce_mean(tf.reduce_sum(
        ref_trainer.discretised_logistic_loss(xx, x_mean, x_log_scale),
        axis=[1, 2, 3]))
    x_kl_loss = ref_trainer.kl_divergence_two_gauss(
        z_mean_x, z_sig_x, z_prior_mean, z_prior_sig)
    py = tf.nn.softmax(y_logits, axis=1)
    y_kl_loss = tf.reduce_mean(tf.reduce_sum(
        py * (tf.math.log(py + 1e-8) - tf.math.log(1.0 / y_size)), axis=1))
    losses = {"x_recon_loss": x_recon_loss, "x_kl_loss": x_kl_loss,
              "y_kl_loss": y_kl_loss}
    if which == "lggmvae":
        x_hat = x[:, :, :, 3:]
        x_hat_recon_loss = tf.reduce_mean(tf.reduce_sum(
            ref_trainer.discretised_logistic_loss(
                x_hat, x_hat_mean, x_hat_log_scale), axis=[1, 2, 3]))
        x_hat_kl_loss = ref_trainer.kl_divergence_two_gauss(
            z_mean_x_hat, z_sig_x_hat, 0., 1.)
        losses["x_hat_recon_loss"] = x_hat_recon_loss
        losses["x_hat_kl_loss"] = x_hat_kl_loss
        losses["total_loss"] = (x_recon_loss + x_hat_recon_loss
                                + beta * (x_kl_loss + x_hat_kl_loss)
                                + alpha * y_kl_loss)
    else:
        losses["total_loss"] = (x_recon_loss + beta * x_kl_loss
                                + alpha * y_kl_loss)
    for name, val in losses.items():
        rep.loss(name, val, flat[f"l:{name}"])
    return rep.dump()


def verify_spair(goldens_dir, reference):
    import tensorflow as tf

    _use_reference_subdir(reference, "spair")
    import spair as ref_spair
    import trainer as ref_trainer
    import utils as ref_utils
    from utils import dotdict

    # STN.build precomputes its sampling grid as TF tensors
    # (spair/utils.py:99-116). Keras 3 builds layers inside a scratch
    # FuncGraph (compute_output_spec), so those tensors die with the scratch
    # graph and the real eager call can't capture them. Lift the build to
    # eager scope — the TF-2.0-era behavior the reference was written for.
    _orig_stn_build = ref_utils.STN.build

    def _eager_stn_build(self, input_shape):
        with tf.init_scope():
            return _orig_stn_build(self, input_shape)

    ref_utils.STN.build = _eager_stn_build

    flat = dict(np.load(os.path.join(goldens_dir, "lg_spair_goldens.npz")))
    meta = json.load(open(os.path.join(goldens_dir, "lg_spair_meta.json")))
    cfgd = dict(meta["config"])
    cfgd["model"] = meta["model"]
    cfgd["image_size"] = meta["image_size"]
    cfgd["test_size"] = meta["test_size"]
    config = dotdict(cfgd)
    m = ref_spair.LGSPAIR(config)
    x = tf.constant(flat["input"])
    m(x, training=True)  # build variables
    _inject(m, flat, _SPAIR_LAYER_MAP)

    (x_recon, z_what, z_what_mean, z_what_sigma, z_where, z_where_mean,
     z_where_sigma, z_depth, z_depth_mean, z_depth_sigma, z_pres,
     z_pres_logits, z_pres_pre_sigmoid, all_glimpses, obj_recon_unnorm,
     obj_recon_alpha, obj_full_recon_unnorm, obj_bbox_mask, z_bg, z_bg_mean,
     z_bg_sig, x_hat_recon, z_l, z_l_mean, z_l_sig) = m(x, training=True)

    rep = _Report("lg_spair forward")
    for name, val in (
            ("z_l_mean", z_l_mean), ("z_l_sig", z_l_sig),
            ("z_bg_mean", z_bg_mean), ("z_bg_sig", z_bg_sig),
            ("z_what_mean", z_what_mean), ("z_what_sigma", z_what_sigma),
            ("z_where_mean", z_where_mean), ("z_where_sigma", z_where_sigma),
            ("z_depth_mean", z_depth_mean), ("z_depth_sigma", z_depth_sigma),
            ("z_pres_logits", z_pres_logits),
            ("z_pres_pre_sigmoid", z_pres_pre_sigmoid), ("z_pres", z_pres),
            ("all_glimpses", all_glimpses), ("z_what", z_what),
            ("obj_recon_unnorm", obj_recon_unnorm),
            ("obj_recon_alpha", obj_recon_alpha),
            ("obj_full_recon_unnorm", obj_full_recon_unnorm),
            ("x_hat_recon", x_hat_recon), ("x_recon", x_recon)):
        key = f"f:{name}"
        if key in flat:
            ours = flat[key]
            if name == "all_glimpses" and ours.shape != tuple(val.shape):
                ours = ours.reshape(val.shape)
            rep.tensor(name, val, ours)

    # Losses exactly as spair/trainer.py:137-199 (split_z_l branch) composes
    # them from the reference's own helpers.
    step = tf.constant(meta["step"], tf.float32)
    xx, x_hat = x[:, :, :, :3], x[:, :, :, 3:]
    x_recon_loss = ref_trainer.tf_mean_sum(ref_trainer.xent_loss(xx, x_recon))
    prior_z_pres_prob = tf.constant(0.99) * tf.minimum(
        1.0, (step + 1) / config.z_pres_anneal_step)
    z_pres_kl_loss = ref_trainer.compute_z_pres_kl_yolo_air(
        z_pres, z_pres_logits, z_pres_pre_sigmoid, prior_z_pres_prob, config.tau)
    prior_z_zoom_mean = (
        tf.constant(config.prior_z_zoom, shape=z_where_mean[:, :, :, :2].shape)
        + config.prior_z_zoom_start
        * (1 - tf.minimum((step + 1) / config.z_pres_anneal_step, 1.0)))
    prior_z_zoom_sig = tf.constant(0.5, shape=z_where_sigma[:, :, :, :2].shape)
    z_where_zoom_kl_loss = ref_trainer.kl_divergence_two_gauss(
        z_where_mean[:, :, :, :2], z_where_sigma[:, :, :, :2],
        prior_z_zoom_mean, prior_z_zoom_sig)
    z_what_kl_loss = ref_trainer.kl_divergence(z_what_mean, z_what_sigma)
    z_where_kl_loss = ref_trainer.kl_divergence(
        z_where_mean[:, :, :, 2:], z_where_sigma[:, :, :, 2:])
    z_depth_kl_loss = ref_trainer.kl_divergence(z_depth_mean, z_depth_sigma)
    z_bg_kl_loss = ref_trainer.kl_divergence(z_bg_mean, z_bg_sig)
    z_l_kl_loss = ref_trainer.kl_divergence(z_l_mean, z_l_sig)
    x_hat_recon_loss = ref_trainer.tf_mean_sum(
        ref_trainer.xent_loss(x_hat, x_hat_recon))
    total = (config.z_bg_beta * z_bg_kl_loss
             + config.z_l_beta * z_l_kl_loss + x_hat_recon_loss
             + config.reconstruction_weight * x_recon_loss
             + config.beta * (config.z_what_beta * z_what_kl_loss
                              + z_depth_kl_loss + z_where_kl_loss
                              + z_where_zoom_kl_loss + z_pres_kl_loss))
    losses = {
        "x_recon_loss": x_recon_loss,
        "z_zoom_kl_loss": z_where_zoom_kl_loss,
        "z_what_kl_loss": z_what_kl_loss,
        "z_where_kl_loss": z_where_kl_loss,
        "z_depth_kl_loss": z_depth_kl_loss,
        "z_pres_kl_loss": z_pres_kl_loss,
        "z_bg_kl_loss": z_bg_kl_loss,
        "z_l_kl_loss": z_l_kl_loss,
        "x_hat_recon_loss": x_hat_recon_loss,
        "total_loss": total,
    }
    for name, val in losses.items():
        key = f"l:{name}"
        if key in flat:
            rep.loss(name, val, flat[key])
    return rep.dump()


def _stub_unused_reference_deps():
    """spair/trainer.py:2 imports tensorflow_probability but never uses it
    (tfp's only real use is augmentation.py:35, not exercised by the
    goldens). On TF2 machines without tfp, satisfy the import with a stub
    so the reference trainer's loss helpers can load unmodified."""
    import types

    # wget: vae/data.py:7 imports it for the one-time SVHN download
    # (vae/data.py:30-40), pulled in transitively by vae/trainer.py:9 ->
    # classifier -> data. The loss helpers never download anything.
    for mod in ("tensorflow_probability", "wget"):
        if mod in sys.modules:
            continue
        try:
            __import__(mod)
        except ImportError:
            sys.modules[mod] = types.ModuleType(mod)


def run_verify(goldens_dir: str, reference: str) -> int:
    import tensorflow as tf

    _stub_unused_reference_deps()
    _patch_keras3_compat(tf)
    _patch_tf_determinism(tf)
    fails = verify_vae(goldens_dir, reference)
    fails += verify_gm(goldens_dir, reference, "lggmvae")
    fails += verify_gm(goldens_dir, reference, "gmvae")
    fails += verify_spair(goldens_dir, reference)
    if fails:
        print(f"PARITY: FAIL ({fails} tensors/losses out of tolerance)")
        return 1
    print("PARITY: PASS (all forward tensors <= "
          f"{FWD_ATOL} abs, all losses <= {LOSS_RTOL:.0%} rel)")
    return 0


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    exp = sub.add_parser("export")
    exp.add_argument("--out", default="goldens")
    ver = sub.add_parser("verify")
    ver.add_argument("--goldens", default="goldens")
    ver.add_argument("--reference", default="/root/reference")
    args = ap.parse_args()
    if args.cmd == "export":
        run_export(args.out)
        return 0
    return run_verify(args.goldens, args.reference)


if __name__ == "__main__":
    raise SystemExit(main())
