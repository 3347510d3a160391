"""Component-level TPU timing for the two training steps.

Times each piece of the LG-SPAIR and LGVae training steps in isolation
(jitted, donated where the real step donates, honest host-sync timing) so
optimization effort goes where the milliseconds are. Run on an idle TPU:

  python tools/profile_components.py spair [--batch 256]
  python tools/profile_components.py vae   [--batch 1024]

Each line: <name> <ms/step>.
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax


def timeit(fn, args, n=50, warmup_s=120):
    """Median-of-runs timing with adaptive warmup (remote-relay TPU)."""
    deadline = time.time() + warmup_s
    while True:
        t0 = time.time()
        for _ in range(5):
            out = fn(*args)
        jax.block_until_ready(out)
        if time.time() > deadline or (time.time() - t0) / 5 < 0.05:
            break
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    # Materialize one value on host (block_until_ready can return early
    # through the relay).
    leaf = jax.tree.leaves(out)[0]
    _ = np.asarray(leaf).ravel()[0]
    return (time.time() - t0) / n * 1000.0


def report(name, ms):
    if callable(ms):
        # Lazy form: report(name, lambda: timeit(...)) — one tunnel flake
        # (the remote TPU backend intermittently errors) skips a line, not
        # the whole profile.
        try:
            ms = ms()
        except Exception as e:  # noqa: BLE001
            print(f"{name:34s}   FAILED: {type(e).__name__}", flush=True)
            return
    print(f"{name:34s} {ms:8.3f} ms", flush=True)


def profile_spair(batch):
    from split_vae_tpu.core.config import SpairConfig
    from split_vae_tpu.core.state import create_train_state
    from split_vae_tpu.models.spair import get_spair_model
    from split_vae_tpu.nn.spair_nets import SpairEncoder
    from split_vae_tpu.ops.count_prior import z_pres_count_kl
    from split_vae_tpu.ops.patches import augment_batch
    from split_vae_tpu.train.optim import clip_by_per_tensor_norm
    from split_vae_tpu.train.steps import make_spair_train_step

    size, os_, latent = 48, 32, 64
    config = SpairConfig(
        model="lg_spair", batch_size=batch, latent_size=latent,
        bg_latent_size=64, local_latent_size=64, z_bg_beta=1.0,
        z_what_beta=0.5, patch_size=8, split_z_l=True, concat_z_what=True,
        dense_local=True, dense_bg=True)
    rng = np.random.RandomState(0)
    x3 = jnp.asarray(rng.uniform(0, 1, (batch, size, size, 3)).astype(np.float32))
    x6 = jnp.concatenate([x3, x3], axis=-1)
    key = jax.random.PRNGKey(0)

    for fused in (True, False):
        cfg = config.replace(fused_render=fused)
        model = get_spair_model(cfg)
        tx = optax.chain(clip_by_per_tensor_norm(1.0), optax.adam(1e-4))
        state = create_train_state(model, jnp.zeros((batch, size, size, 6)), tx,
                                   training_kwargs={"training": True})
        step = make_spair_train_step(cfg)
        report(f"full train step (fused={fused})",
               lambda: timeit(lambda s, b: step(s, b)[1]["total_loss"], (state, x3)))
        # state was donated; rebuild for the next measurement
        del state

    model = get_spair_model(config)
    tx = optax.chain(clip_by_per_tensor_norm(1.0), optax.adam(1e-4))
    state = create_train_state(model, jnp.zeros((batch, size, size, 6)), tx,
                               training_kwargs={"training": True})
    params = state.params

    fwd = jax.jit(lambda p, x, k: model.apply(
        {"params": p}, x, True, rngs={"sample": k}).x_recon)
    report("forward only (fused)", lambda: timeit(fwd, (params, x6, key)))

    # augmentation
    aug = jax.jit(lambda k, x: augment_batch(k, x, "scramble", 8))
    report("augment scramble p8", lambda: timeit(aug, (key, x3)))

    # encoder alone (crop + obj encoder + heads)
    enc = SpairEncoder(os_, latent, 0.8, use_pallas=jax.default_backend() == "tpu")
    enc_vars = enc.init({"params": jax.random.PRNGKey(0), "sample": key}, x3)
    enc_fwd = jax.jit(lambda p, x, k: enc.apply(
        {"params": p}, x, rngs={"sample": k})[0])
    report("SpairEncoder fwd", lambda: timeit(enc_fwd, (enc_vars["params"], x3, key)))

    # count prior KL alone (fwd + grad)
    logits = jnp.asarray(rng.randn(batch, 4, 4, 1).astype(np.float32))
    pre = jnp.asarray(rng.randn(batch, 4, 4, 1).astype(np.float32))
    cp = jax.jit(lambda l, p: z_pres_count_kl(
        jax.nn.sigmoid(p), l, p, jnp.float32(0.9), 0.8))
    report("count-prior KL fwd", lambda: timeit(cp, (logits, pre)))
    cpg = jax.jit(jax.grad(lambda l, p: z_pres_count_kl(
        jax.nn.sigmoid(p), l, p, jnp.float32(0.9), 0.8)))
    report("count-prior KL grad", lambda: timeit(cpg, (logits, pre)))

    # fused paste+render alone: fwd and fwd+bwd
    from split_vae_tpu.ops.pallas.render_fused import fused_paste_render
    from split_vae_tpu.ops.stn import paste_interp_weights

    K = 16
    objs = jnp.asarray(rng.uniform(0, 1, (batch, K, os_, os_, 4)).astype(np.float32))
    zw = jnp.asarray(rng.randn(batch, 4, 4, 4).astype(np.float32))
    wy, wx, _ = paste_interp_weights(zw, (size, size), (os_, os_))
    zp = jnp.asarray(rng.uniform(0, 1, (batch, K)).astype(np.float32))
    wd = jnp.asarray(rng.uniform(0.5, 1.5, (batch, K)).astype(np.float32))
    bg = jnp.asarray(rng.uniform(0, 1, (batch, size, size, 3)).astype(np.float32))

    pr = jax.jit(lambda *a: fused_paste_render(*a, 0.01, False))
    report("fused paste+render fwd", lambda: timeit(pr, (objs, wy, wx, zp, wd, bg, 7)))

    def loss_pr(objs, wy, wx, zp, wd, bg):
        return jnp.sum(fused_paste_render(objs, wy, wx, zp, wd, bg, 7, 0.01, False))

    prg = jax.jit(jax.grad(loss_pr, argnums=(0, 1, 2, 3, 4, 5)))
    report("fused paste+render fwd+bwd", lambda: timeit(prg, (objs, wy, wx, zp, wd, bg)))

    # unfused paste+render (XLA einsum path), fwd+bwd
    from split_vae_tpu.nn.spair_nets import render
    from split_vae_tpu.ops.stn import stn_paste

    def loss_unf(objs, zw, zd, zp_grid, logits):
        full, _ = stn_paste(objs, zw, (size, size))
        out = render(full, bg, zd, zp_grid, logits, key, True, 3)
        return jnp.sum(out)

    zd = jnp.asarray(rng.randn(batch, 4, 4, 1).astype(np.float32))
    zp_grid = zp.reshape(batch, 4, 4, 1)
    unfg = jax.jit(jax.grad(loss_unf, argnums=(0, 1)))
    report("unfused paste+render fwd+bwd", lambda: timeit(unfg, (objs, zw, zd, zp_grid, logits)))

    # packed paste+render (sublane-stacked channels), fwd and fwd+bwd
    from split_vae_tpu.ops.pallas.render_packed import fused_paste_render_packed

    pp = jax.jit(lambda *a: fused_paste_render_packed(*a, 0.01, False))
    report("packed paste+render fwd", lambda: timeit(pp, (objs, wy, wx, zp, wd, bg, 7)))

    def loss_pp(objs, wy, wx, zp, wd, bg):
        return jnp.sum(fused_paste_render_packed(objs, wy, wx, zp, wd, bg, 7, 0.01, False))

    ppg = jax.jit(jax.grad(loss_pp, argnums=(0, 1, 2, 3, 4, 5)))
    report("packed paste+render fwd+bwd", lambda: timeit(ppg, (objs, wy, wx, zp, wd, bg)))

    # crop kernels: unpacked vs packed, fwd and fwd+bwd (6-channel LG input)
    from tools.pallas_research.crop_fused import fused_stn_crop_apply
    from tools.pallas_research.crop_packed import fused_stn_crop_packed
    from split_vae_tpu.ops import stn as stn_mod

    sx, sy, tx, ty = stn_mod.zwhere_to_params(zw)
    cwx = stn_mod._interp_matrix(stn_mod._sample_coords(sx, tx, os_, size), size)
    cwy = stn_mod._interp_matrix(stn_mod._sample_coords(sy, ty, os_, size), size)
    for name, fn in (("unpacked", fused_stn_crop_apply),
                     ("packed", fused_stn_crop_packed)):
        cf = jax.jit(lambda img, wy_, wx_, fn=fn: fn(img, wy_, wx_))
        report(f"crop {name} fwd", lambda: timeit(cf, (x6, cwy, cwx)))
        cg = jax.jit(jax.grad(
            lambda img, wy_, wx_, fn=fn: jnp.sum(fn(img, wy_, wx_)),
            argnums=(0, 1, 2)))
        report(f"crop {name} fwd+bwd", lambda: timeit(cg, (x6, cwy, cwx)))


def profile_vae(batch):
    from split_vae_tpu.core.config import VaeConfig
    from split_vae_tpu.core.state import create_train_state
    from split_vae_tpu.models.vae import LGVae
    from split_vae_tpu.nn.decoders import ConvDecoder
    from split_vae_tpu.nn.encoders import ConvEncoder
    from split_vae_tpu.ops.distributions import discretized_logistic_nll
    from split_vae_tpu.ops.patches import augment_batch
    from split_vae_tpu.train.steps import make_vae_train_step

    hw = (64, 64)
    config = VaeConfig(model="lgvae", dataset="celeba64", no_label=True,
                       beta=30.0, patch_size=8, batch_size=batch)
    rng = np.random.RandomState(0)
    raw = jnp.asarray(rng.randint(0, 255, (batch, 64, 64, 3), np.uint8))
    x3 = raw.astype(jnp.float32) / 255.0 * 2 - 1
    x6 = jnp.concatenate([x3, x3], axis=-1)
    key = jax.random.PRNGKey(0)

    model = LGVae(128, 128, hw)
    state = create_train_state(model, jnp.zeros((batch, 64, 64, 6)),
                               optax.adam(1e-4))
    step = make_vae_train_step(config)
    report("full train step", lambda: timeit(lambda s, b: step(s, b)[1]["total_loss"],
                                     (state, raw)))

    model = LGVae(128, 128, hw)
    state = create_train_state(model, jnp.zeros((batch, 64, 64, 6)),
                               optax.adam(1e-4))
    params = state.params
    fwd = jax.jit(lambda p, x, k: model.apply(
        {"params": p}, x, rngs={"sample": k}).x_mean)
    report("forward only", lambda: timeit(fwd, (params, x6, key)))

    aug = jax.jit(lambda k, x: augment_batch(k, x, "scramble", 8))
    report("augment scramble p8", lambda: timeit(aug, (key, x3)))

    enc = ConvEncoder(128)
    enc_vars = enc.init({"params": jax.random.PRNGKey(0), "sample": key}, x3)
    enc_f = jax.jit(lambda p, x, k: enc.apply({"params": p}, x,
                                              rngs={"sample": k})[0])
    report("ConvEncoder fwd", lambda: timeit(enc_f, (enc_vars["params"], x3, key)))

    def enc_loss(p, x, k):
        z, m, s = enc.apply({"params": p}, x, rngs={"sample": k})
        return jnp.sum(z) + jnp.sum(m * s)

    encg = jax.jit(jax.grad(enc_loss))
    report("ConvEncoder fwd+bwd", lambda: timeit(encg, (enc_vars["params"], x3, key)))

    dec = ConvDecoder(hw)
    z = jnp.asarray(rng.randn(batch, 256).astype(np.float32))
    dec_vars = dec.init(jax.random.PRNGKey(0), z)
    dec_f = jax.jit(lambda p, z: dec.apply({"params": p}, z)[0])
    report("ConvDecoder fwd", lambda: timeit(dec_f, (dec_vars["params"], z)))
    decg = jax.jit(jax.grad(lambda p, z: jnp.sum(dec.apply({"params": p}, z)[0])))
    report("ConvDecoder fwd+bwd", lambda: timeit(decg, (dec_vars["params"], z)))

    m = jnp.asarray(rng.randn(batch, 64, 64, 3).astype(np.float32))
    ls = jnp.asarray(rng.randn(batch, 64, 64, 3).astype(np.float32) * 0.3)
    dll = jax.jit(lambda x, m, ls: jnp.mean(
        jnp.sum(discretized_logistic_nll(x, m, ls), axis=(1, 2, 3))))
    report("discretized-logistic NLL fwd", lambda: timeit(dll, (x3, m, ls)))
    dllg = jax.jit(jax.grad(lambda m, ls: jnp.mean(jnp.sum(
        discretized_logistic_nll(x3, m, ls), axis=(1, 2, 3))), argnums=(0, 1)))
    report("discretized-logistic NLL grad", lambda: timeit(dllg, (m, ls)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workload", choices=["spair", "vae"])
    ap.add_argument("--batch", type=int, default=None)
    args = ap.parse_args()
    print(f"devices: {jax.devices()}")
    if args.workload == "spair":
        profile_spair(args.batch or 256)
    else:
        profile_vae(args.batch or 1024)


if __name__ == "__main__":
    main()
