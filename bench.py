"""Headline benchmark: SPLIT-VAE (LGVae) CelebA64 training throughput.

Config mirrors BASELINE.json config #2 (``--beta 30 --patch_size 8 -no_label``,
batch 64). Prints ONE JSON line:
  {"metric": ..., "value": imgs/sec on the default device, "unit": "imgs/sec",
   "vs_baseline": value / (10 x CPU imgs/sec)}

The reference publishes no numbers (BASELINE.md), so the tracked baseline is
the BASELINE.json north star: ">= 10x TF2-CPU images/sec on one v5e chip".
TF2 cannot run in this image; the stand-in denominator is this same training
step measured on one host CPU device (cached in .bench_cpu_baseline.json).
vs_baseline > 1.0 means the north-star multiple is beaten.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

BATCH = 64
STEPS_WARMUP = 5
STEPS_TIMED = 100
HW = (64, 64)


def measure(steps_timed: int = STEPS_TIMED) -> float:
    import jax

    from split_vae_tpu.core.runtime import setup_runtime

    setup_runtime()
    import jax.numpy as jnp
    import numpy as np
    import optax

    from split_vae_tpu.core.config import VaeConfig
    from split_vae_tpu.core.state import create_train_state
    from split_vae_tpu.models.vae import LGVae
    from split_vae_tpu.train.steps import make_vae_train_step

    config = VaeConfig(model="lgvae", dataset="celeba64", no_label=True, beta=30.0,
                       patch_size=8, batch_size=BATCH)
    model = LGVae(config.global_latent_dims, config.local_latent_dims, HW)
    state = create_train_state(
        model, jnp.zeros((BATCH, HW[0], HW[1], 6)), optax.adam(config.learning_rate),
        seed=0)
    train_step = make_vae_train_step(config)

    rng = np.random.RandomState(0)
    batches = [jnp.asarray(rng.randint(0, 255, (BATCH, HW[0], HW[1], 3), np.uint8))
               for _ in range(4)]

    # Warm up until the step latency settles. Remote-relay TPU backends run the
    # first many dispatches of a fresh process orders of magnitude slower while
    # the data path spins up; timing too early under-reports by ~100x. On CPU a
    # single warmup pass suffices (and the 50 ms/step bar is unreachable).
    on_cpu = jax.devices()[0].platform == "cpu"
    deadline = time.time() + (0 if on_cpu else 300)
    while True:
        t0 = time.time()
        for i in range(STEPS_WARMUP):
            state, metrics = train_step(state, batches[i % len(batches)])
        _ = float(metrics["total_loss"])
        if time.time() > deadline or (time.time() - t0) / STEPS_WARMUP < 0.05:
            break

    t0 = time.time()
    for i in range(steps_timed):
        state, metrics = train_step(state, batches[i % len(batches)])
    # Force the full dependent chain AND materialize the value on host —
    # block_until_ready alone can return early through remote-relay backends.
    _ = float(metrics["total_loss"])
    dt = time.time() - t0
    return steps_timed * BATCH / dt


def _cpu_baseline() -> float:
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".bench_cpu_baseline.json")
    if os.path.exists(cache):
        with open(cache) as f:
            return json.load(f)["cpu_imgs_per_sec"]
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import bench; print('CPU_RATE', bench.measure(steps_timed=5))"
    )
    try:
        out = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True, timeout=1800,
            cwd=os.path.dirname(os.path.abspath(__file__)))
        rate = None
        for line in out.stdout.splitlines():
            if line.startswith("CPU_RATE"):
                rate = float(line.split()[1])
        if rate is None:
            raise RuntimeError(out.stderr[-2000:])
    except Exception as e:
        print(f"# cpu baseline measurement failed ({e}); using recorded default",
              file=sys.stderr)
        rate = 60.0  # conservative prior for a f32 conv VAE at batch 64 on host CPU
    with open(cache, "w") as f:
        json.dump({"cpu_imgs_per_sec": rate}, f)
    return rate


def main():
    value = measure()
    cpu = _cpu_baseline()
    result = {
        "metric": "splitvae_celeba64_train_throughput",
        "value": round(value, 2),
        "unit": "imgs/sec",
        "vs_baseline": round(value / (10.0 * cpu), 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
