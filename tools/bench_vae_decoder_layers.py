"""Per-layer A/B: fused resize2x->conv (any-kernel) vs materialized
resize+conv at the VAE ConvDecoder's production shapes (CelebA64, B=1024).

The step-level bench showed the fused VAE decoder REGRESSING f32 throughput
~18% (BASELINE.md); this isolates which of the three resize->conv pairs is
responsible. In-jit fori_loop timing protocol (CLAUDE.md).

    python tools/bench_vae_decoder_layers.py [--batch 1024]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from split_vae_tpu.nn.pixel_shuffle import (resize2x_conv_any,
                                            resize2x_conv_any_mixed)

LAYERS = [
    # (name, s_in, cin, cout, k)
    ("L1 8->16 128->64 k4", 8, 128, 64, 4),
    ("L2 16->32 64->32 k6", 16, 64, 32, 6),
    ("L3 32->64 32->6 k6", 32, 32, 6, 6),
]


def layer_ref(x, kernel, bias):
    n, s = x.shape[0], x.shape[1]
    up = jax.image.resize(x, (n, 2 * s, 2 * s, x.shape[-1]), "bilinear")
    return jax.lax.conv_general_dilated(
        up, kernel, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias


def timeit_loop(fn, args, n_iter=50):
    @jax.jit
    def run(*a):
        def body(_, carry):
            x, acc = carry
            out = fn(x + (acc * 1e-30).astype(x.dtype), *a[1:])
            return x, jnp.sum(out).astype(jnp.float32) * 1e-30 + acc * 0.5
        _, acc = jax.lax.fori_loop(0, n_iter, body, (a[0], jnp.float32(0)))
        return acc

    run(*args).block_until_ready()
    t0 = time.perf_counter()
    float(run(*args))
    return (time.perf_counter() - t0) / n_iter * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    args = ap.parse_args()
    rng = np.random.RandomState(0)
    for dtype in (jnp.float32, jnp.bfloat16):
        for name, s, cin, cout, k in LAYERS:
            x = jnp.asarray(rng.randn(args.batch, s, s, cin), dtype)
            kernel = jnp.asarray(rng.randn(k, k, cin, cout) * 0.1, dtype)
            bias = jnp.asarray(rng.randn(cout), dtype)

            def fwd_ref(x, k_, b_):
                return layer_ref(x, k_, b_)

            def fwd_fused(x, k_, b_):
                return resize2x_conv_any(x, k_, b_)

            def fwd_mixed(x, k_, b_):
                return resize2x_conv_any_mixed(x, k_, b_)

            def fb(f):
                def g(x, k_, b_):
                    def loss(xx, kk, bb):
                        return jnp.sum(f(xx, kk, bb) ** 2)
                    l, grads = jax.value_and_grad(loss, argnums=(0, 1))(x, k_, b_)
                    return l + jnp.sum(grads[0]) + jnp.sum(grads[1])
                return g

            r_f = timeit_loop(fwd_ref, (x, kernel, bias))
            u_f = timeit_loop(fwd_fused, (x, kernel, bias))
            m_f = timeit_loop(fwd_mixed, (x, kernel, bias))
            r_fb = timeit_loop(fb(fwd_ref), (x, kernel, bias))
            u_fb = timeit_loop(fb(fwd_fused), (x, kernel, bias))
            m_fb = timeit_loop(fb(fwd_mixed), (x, kernel, bias))
            print(f"{np.dtype(dtype).name:9s} {name:22s} "
                  f"fwd ref {r_f:6.3f} fused {u_f:6.3f} mixed {m_f:6.3f} ms | "
                  f"fwd+bwd ref {r_fb:6.3f} fused {u_fb:6.3f} "
                  f"mixed {m_fb:6.3f} ms", flush=True)


if __name__ == "__main__":
    main()
