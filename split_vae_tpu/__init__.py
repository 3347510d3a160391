"""SPLIT-TPU: a TPU-native JAX/XLA/Pallas re-implementation of the SPLIT framework.

SPLIT ("Separated Paths for Local and global informaTion") provides explicit
local/global representation disentanglement for deep clustering (LGVae /
LGGMVae / GMVae families) and unsupervised object detection (SPAIR / BG-SPAIR /
LG-SPAIR families), plus the shared patch-scramble augmentation engine.

This package is a ground-up TPU-first rebuild of the reference TF2 codebase
(``51616/split-vae``): the compute path is pure functional JAX compiled by XLA
(with Pallas kernels for hot ops), parallelism is expressed with
``jax.sharding.Mesh`` + ``NamedSharding`` (data-parallel batch axis, optional
model axis), randomness is explicit PRNG-key threading, and augmentation runs
on device inside the jitted train step so that only compact uint8 tensors cross
the host<->device boundary.

Layout:
  core/      typed configs, train state, checkpointing, metrics, logging
  parallel/  device mesh + sharding rules (DP first-class, model axis optional)
  ops/       numerical primitives: distributions, STN, patches, count prior
  nn/        flax.linen building blocks (encoders/decoders/backbones)
  models/    model families: LGVae, LGGMVae, GMVae, Classifier, SPAIR variants
  data/      dataset builders (SVHN, CelebA, MultiCUB) + host batcher/prefetch
  train/     jitted update/eval steps, schedules, probes, training loops
  viz/       PNG artifact generators matching the reference output surface
  cli/       flag-compatible entry points (vae_main, spair_main)
"""

__version__ = "0.1.0"
