"""Datasets (SVHN, CelebA, MultiCUB) + host batcher and device prefetch."""

from split_vae_tpu.data.loader import ArrayDataset, iterate_batches, device_prefetch
from split_vae_tpu.data.svhn import get_svhn
from split_vae_tpu.data.celeba import get_celeba
from split_vae_tpu.data.multicub import get_multicub


def get_vae_dataset(config):
    """Dispatch mirroring vae/data.py:11-21."""
    name = config.dataset.upper()
    if name == "SVHN":
        return get_svhn(config, extra=True)
    if name == "SVHN_NO_EXTRA":
        return get_svhn(config, extra=False)
    if name in ("CELEBA64", "CELEBA128"):
        return get_celeba(config, size=64 if name == "CELEBA64" else 128)
    raise NotImplementedError(f"Dataset doesn't exist: {config.dataset}")
