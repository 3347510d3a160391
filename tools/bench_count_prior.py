"""A/B the count-prior KL scan's ``unroll`` factor on the TPU.

The z_pres count-prior KL (ops/count_prior.py) is a 16-iteration sequential
recurrence; the round-3 step breakdown attributes ~1.25 ms of the ~26 ms
LG-SPAIR B=256 f32 step to its gradient ("scan latency", BASELINE.md). The
reference unrolls all 16 iterations into the graph (spair/trainer.py:64-92);
``lax.scan(unroll=k)`` recovers that fusion opportunity without the Python
loop. This measures fwd-only and fwd+bwd at unroll 1/4/16.

Protocol (CLAUDE.md): in-jit fori_loop of N applications with a dependency
injection so the loop body cannot be hoisted; final float() forces the value
through the relay.

Usage: python tools/bench_count_prior.py [--batch 256] [--iters 200]
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

from split_vae_tpu.ops.count_prior import z_pres_count_kl


def make_timed(unroll: int, with_grad: bool, iters: int, batch: int):
    def one(args):
        z_pres, logits, pre = args
        return z_pres_count_kl(z_pres, logits, pre, jnp.float32(0.5), 0.8,
                               unroll=unroll)

    if with_grad:
        # Grad w.r.t. the logits/pre-sigmoid inputs like the train step does.
        def one_val(args):
            g = jax.grad(lambda a: one(a))((args[0], args[1], args[2]))
            return g[1].sum() + g[2].sum()
    else:
        one_val = one

    @jax.jit
    def timed(z_pres, logits, pre):
        def body(_, acc):
            # Dependency injection: perturb an input by acc*1e-30 so each
            # iteration depends on the previous (prevents hoisting).
            v = one_val((z_pres, logits + acc * 1e-30, pre))
            return acc + v

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    shape = (batch, 4, 4, 1)
    z_pres = jax.nn.sigmoid(jax.random.normal(k1, shape))
    logits = jax.random.normal(k2, shape)
    pre = jax.random.normal(k3, shape)
    return timed, (z_pres, logits, pre)


def run(unroll: int, with_grad: bool, iters: int, batch: int) -> float:
    timed, args = make_timed(unroll, with_grad, iters, batch)
    float(timed(*args))  # compile + warm
    t0 = time.perf_counter()
    v = float(timed(*args))
    dt = time.perf_counter() - t0
    assert v == v, "NaN"
    return dt / iters * 1e3  # ms per application


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=200)
    args = ap.parse_args()
    print(f"backend={jax.default_backend()} batch={args.batch}")
    for with_grad in (False, True):
        for unroll in (1, 4, 16):
            ms = run(unroll, with_grad, args.iters, args.batch)
            tag = "fwd+bwd" if with_grad else "fwd    "
            print(f"{tag} unroll={unroll:>2}: {ms:7.3f} ms")


if __name__ == "__main__":
    main()
