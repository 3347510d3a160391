"""A/B bench: fused resize2x->conv (nn/pixel_shuffle.py) vs materialized
resize+conv at ObjDecoder's production shapes.

ObjDecoder is the measured #1 cost of the LG-SPAIR step (5.8 ms of 22.9 ms
bf16 at B=256 — BASELINE.md breakdown) and is HBM-bandwidth-bound; the fusion
removes its two largest intermediates. Run on the TPU with the host idle:

    python tools/bench_pixel_shuffle.py [--batch 256]

Times each stage (8->16 and 16->32) and the full two-stage tail, fwd and
fwd+bwd, f32 and bf16, using the in-jit fori_loop protocol (per-call relay
dispatch timing is garbage — CLAUDE.md).
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from split_vae_tpu.nn.pixel_shuffle import resize2x_conv, resize2x_conv_mixed

K_CELLS = 16


def chain_ref(x, k1, b1, k2, b2):
    """resize -> conv -> relu -> resize -> conv (the pre-fusion tail)."""
    n, s = x.shape[0], x.shape[1]
    up1 = jax.image.resize(x, (n, 2 * s, 2 * s, x.shape[-1]), "bilinear")
    h = jax.nn.relu(jax.lax.conv_general_dilated(
        up1, k1, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")) + b1)
    up2 = jax.image.resize(h, (n, 4 * s, 4 * s, h.shape[-1]), "bilinear")
    return jax.lax.conv_general_dilated(
        up2, k2, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")) + b2


def chain_fused(x, k1, b1, k2, b2):
    h = jax.nn.relu(resize2x_conv(x, k1, b1))
    return resize2x_conv(h, k2, b2)


def chain_mixed(x, k1, b1, k2, b2):
    """Fused forward + materialized-chain backward (VERDICT r3 #6)."""
    h = jax.nn.relu(resize2x_conv_mixed(x, k1, b1))
    return resize2x_conv_mixed(h, k2, b2)


def timeit_loop(fn, args, n_iter=50):
    """Time n_iter applications inside ONE jit (dependency-injected to stop
    loop-invariant hoisting), returning ms per application."""

    @jax.jit
    def run(*args):
        def body(_, carry):
            x, acc = carry
            out = fn(x + (acc * 1e-30).astype(x.dtype), *args[1:])
            return x, jnp.sum(out) * 1e-30 + acc * 0.5
        _, acc = jax.lax.fori_loop(0, n_iter, body, (args[0], jnp.float32(0)))
        return acc

    _ = float(run(*args))  # compile + warmup
    t0 = time.time()
    v = float(run(*args))
    dt = (time.time() - t0) / n_iter * 1e3
    assert np.isfinite(v)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()
    n = args.batch * K_CELLS
    rng = np.random.RandomState(0)

    for dtype_name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        x = jnp.asarray(rng.randn(n, 8, 8, 64), dt)
        k1 = jnp.asarray(rng.randn(3, 3, 64, 32) * 0.1, dt)
        b1 = jnp.asarray(rng.randn(32) * 0.1, dt)
        k2 = jnp.asarray(rng.randn(3, 3, 32, 4) * 0.1, dt)
        b2 = jnp.asarray(rng.randn(4) * 0.1, dt)
        for tag, chain in (("ref", chain_ref), ("fused", chain_fused),
                           ("mixed", chain_mixed)):
            ms = timeit_loop(lambda x_, *p: chain(x_, *p), (x, k1, b1, k2, b2),
                             args.iters)
            print(f"{dtype_name} {tag:5s} fwd      {ms:7.3f} ms")

            def loss(x_, k1_, b1_, k2_, b2_, chain=chain):
                return jnp.sum(chain(x_, k1_, b1_, k2_, b2_).astype(jnp.float32))

            g = jax.grad(loss, argnums=(0, 1, 2, 3, 4))
            ms = timeit_loop(
                lambda x_, *p: g(x_, *p)[0], (x, k1, b1, k2, b2), args.iters)
            print(f"{dtype_name} {tag:5s} fwd+bwd  {ms:7.3f} ms")


if __name__ == "__main__":
    main()
