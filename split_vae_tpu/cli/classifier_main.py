"""SVHN probe-classifier pretraining CLI (reference: vae/classifier.py)."""

from __future__ import annotations

import argparse
import sys

from split_vae_tpu.core.config import ClassifierConfig
from split_vae_tpu.train.probes import train_classifier


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=20)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--data_dir", type=str, default="data")
    parser.add_argument("-synthetic_data", action="store_true")
    args = parser.parse_args(argv)
    config = ClassifierConfig(
        seed=args.seed, data_dir=args.data_dir, synthetic_data=args.synthetic_data,
        epochs=args.epochs)
    print("Config:", config)
    print("Training a classifier")
    train_classifier(config, epochs=args.epochs)


if __name__ == "__main__":
    main(sys.argv[1:])
