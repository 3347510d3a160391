"""Misc utilities (reference parity: vae/utils.py, spair/utils.py:7-11)."""

from split_vae_tpu.utils.dotdict import dotdict
from split_vae_tpu.utils.download import download_file_from_google_drive
