"""LGVae B=1024 MFU experiments (BASELINE config #2 at the compute-bound batch).

Round-1 measured ~45 TF/s effective (~23% of v5e bf16 peak); the suspected
bound is MXU lane under-utilization from the model's small channel counts
(32/64/128 with 3->6-channel inputs, vae/model.py:34-45). This tool times
controlled variants to separate fundamental bounds from fixable ones:

  base      - the production train step (f32 params, TPU-default bf16 mults)
  bf16-act  - bf16 params + activations end-to-end (halves HBM traffic;
              tests a bandwidth bound)
  fwd       - forward pass only (isolates backward-pass cost)
  enc/dec   - encoder-only and decoder-only fwd+bwd (locates the slow half)
  pad-cout  - encoder conv channel counts padded x2 (64/128/256): SAME lane
              tiles if lanes were idle -> same time means lane-bound; slower
              means FLOP-bound (not lane-bound)

Run on an idle TPU: python tools/vae_mfu_experiments.py [--batch 1024]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax


def timeit(fn, args, n=30, warmup_s=120):
    deadline = time.time() + warmup_s
    while True:
        t0 = time.time()
        for _ in range(5):
            out = fn(*args)
        jax.block_until_ready(out)
        if time.time() > deadline or (time.time() - t0) / 5 < 0.08:
            break
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
    return (time.time() - t0) / n * 1000.0


def report(name, ms, batch, flops_per_img=None):
    if callable(ms):
        try:
            ms = ms()
        except Exception as e:  # tunnel flake -> skip line, keep going
            print(f"{name:28s}   FAILED: {type(e).__name__}", flush=True)
            return
    rate = batch / ms * 1000.0
    extra = ""
    if flops_per_img:
        extra = f"  eff={flops_per_img * rate / 1e12:6.1f} TF/s"
    print(f"{name:28s} {ms:8.2f} ms  {rate:9.0f} imgs/s{extra}")


# Analytic FLOP count for one LGVae image fwd+bwd (~3x fwd), f32 math.
# Encoder (per path): conv 7.1M + 37.7M + 16.8M + dense 4.2M = 65.8M
# Decoder (per path): 4.2M + 33.6M + 67.1M + 151.0M + 56.6M = 312.5M
LGVAE_TRAIN_FLOPS = 3 * 2 * (65.8e6 + 312.5e6)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    args = ap.parse_args()
    batch = args.batch
    print(f"devices: {jax.devices()}  batch={batch}")

    from split_vae_tpu.core.config import VaeConfig
    from split_vae_tpu.core.state import create_train_state
    from split_vae_tpu.models.vae import LGVae
    from split_vae_tpu.nn.common import Conv, Dense
    from split_vae_tpu.train.steps import make_vae_train_step

    hw = (64, 64)
    rng = np.random.RandomState(0)
    raw = jnp.asarray(rng.randint(0, 255, (batch, 64, 64, 3), np.uint8))
    x3 = raw.astype(jnp.float32) / 255.0 * 2 - 1
    x6 = jnp.concatenate([x3, x3], axis=-1)
    key = jax.random.PRNGKey(0)

    config = VaeConfig(model="lgvae", dataset="celeba64", no_label=True,
                       beta=30.0, patch_size=8, batch_size=batch)

    # --- base ---
    model = LGVae(128, 128, hw)
    state = create_train_state(model, jnp.zeros((batch, 64, 64, 6)), optax.adam(1e-4))
    step = make_vae_train_step(config)
    report("base train step", lambda: timeit(lambda s, b: step(s, b)[1]["total_loss"],
                                     (state, raw)), batch, LGVAE_TRAIN_FLOPS)

    # --- bf16 params + activations ---
    config_bf16 = config.replace(compute_dtype="bfloat16")
    model = LGVae(128, 128, hw)
    state = create_train_state(model, jnp.zeros((batch, 64, 64, 6)), optax.adam(1e-4))
    state = state.replace(params=jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        state.params))
    step16 = make_vae_train_step(config_bf16)
    try:
        report("bf16 params+acts", lambda: timeit(
            lambda s, b: step16(s, b)[1]["total_loss"], (state, raw)),
            batch, LGVAE_TRAIN_FLOPS)
    except Exception as e:
        print(f"bf16 variant failed: {type(e).__name__}: {e}")

    # --- forward only ---
    model = LGVae(128, 128, hw)
    state = create_train_state(model, jnp.zeros((batch, 64, 64, 6)), optax.adam(1e-4))
    params = state.params
    fwd = jax.jit(lambda p, x, k: model.apply(
        {"params": p}, x, rngs={"sample": k}).x_mean)
    report("forward only", lambda: timeit(fwd, (params, x6, key)), batch,
           LGVAE_TRAIN_FLOPS / 3)

    # --- encoder / decoder halves (fwd+bwd) ---
    from split_vae_tpu.nn.decoders import ConvDecoder
    from split_vae_tpu.nn.encoders import ConvEncoder

    enc = ConvEncoder(128)
    ev = enc.init({"params": jax.random.PRNGKey(0), "sample": key}, x3)
    encg = jax.jit(jax.grad(lambda p: jnp.sum(enc.apply(
        {"params": p}, x3, rngs={"sample": key})[0])))
    report("encoder fwd+bwd (x1)", lambda: timeit(encg, (ev["params"],)), batch,
           3 * 2 * 65.8e6)

    dec = ConvDecoder(hw)
    z = jnp.asarray(rng.randn(batch, 256).astype(np.float32))
    dv = dec.init(jax.random.PRNGKey(0), z)
    decg = jax.jit(jax.grad(lambda p: jnp.sum(dec.apply({"params": p}, z)[0])))
    report("decoder fwd+bwd (x1)", lambda: timeit(decg, (dv["params"],)), batch,
           3 * 2 * 312.5e6)

    # --- channel-padding probe: encoder with Cout x2 everywhere ---
    class PaddedEncoder(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.relu(Conv(64, (6, 6), strides=2, padding="SAME")(x))
            x = nn.relu(Conv(128, (6, 6), strides=2, padding="SAME")(x))
            x = nn.relu(Conv(256, (4, 4), strides=2, padding="SAME")(x))
            x = x.reshape(x.shape[0], -1)
            return Dense(128)(x)

    pe = PaddedEncoder()
    pv = pe.init(jax.random.PRNGKey(0), x3)
    peg = jax.jit(jax.grad(lambda p: jnp.sum(pe.apply({"params": p}, x3))))
    report("padded-enc x2 fwd+bwd", lambda: timeit(peg, (pv["params"],)), batch)


if __name__ == "__main__":
    main()
