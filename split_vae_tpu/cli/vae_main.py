"""SPLIT-VAE training CLI — flag-compatible with the reference vae/main.py.

Examples (matching README commands of the reference):
  python -m split_vae_tpu.cli.vae_main --beta 1 --patch_size 1
  python -m split_vae_tpu.cli.vae_main --beta 30 --patch_size 8 \
      --dataset celeba64 -no_label
  python -m split_vae_tpu.cli.vae_main --model lggmvae --beta 40 --alpha 40 \
      --y_size 30 --patch_size 4 --dataset svhn --training_steps 3000000
"""

from __future__ import annotations

import sys

from split_vae_tpu.core.config import parse_vae_args
from split_vae_tpu.train.loop import train_vae


def main(argv=None):
    config = parse_vae_args(argv)
    print("Config:", config)
    print("Training local-global autoencoder")
    train_vae(config)


if __name__ == "__main__":
    main(sys.argv[1:])
