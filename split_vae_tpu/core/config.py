"""Typed configuration dataclasses + CLI builders.

The flag names and defaults are the compatibility surface with the reference
CLIs (vae/main.py:15-31, spair/main.py:19-50). The reference converts argparse
results into a ``dotdict`` whose missing keys silently read as None
(vae/utils.py:3-7 quirk); here every option — including the reference's two
"phantom" options ``bg_model`` and ``concat_z_bg`` (spair/spair.py:58,63) — is
an explicit typed field.

Framework-only additions (checkpointing, eval cadence, mesh shape, dtype,
data dir) are new flags with conservative defaults; they do not change the
reference-visible semantics.
"""

from __future__ import annotations

import argparse
import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple


@dataclass
class BaseConfig:
    # --- framework options (not in the reference CLI) ---
    seed: int = 0
    data_dir: str = "data"
    output_dir: str = "output"
    eval_interval: Optional[int] = None  # default differs per workload; 0 disables
    checkpoint_interval: int = 10000  # 0 = final checkpoint only
    resume: Optional[str] = None  # checkpoint dir to resume from
    num_data_shards: int = 0  # 0 => all local devices on the 'data' mesh axis
    num_model_shards: int = 1
    compute_dtype: str = "float32"  # or "bfloat16"
    profile_dir: Optional[str] = None  # enable jax.profiler traces when set
    debug_nans: bool = False
    log_every: int = 100
    synthetic_data: bool = False  # offline-friendly synthetic datasets
    synthetic_size: int = 0  # >0 overrides the synthetic train-set size
    # Synthetic SVHN flavor: "blobs" (smooth sinusoid stand-in, the shipped
    # default) or "digits" (rendered glyphs with cluster structure — used by
    # the GMVAE quality runs to demonstrate the clustering objective offline).
    synthetic_style: str = "blobs"
    platform: Optional[str] = None  # override jax platform (e.g. 'cpu')
    host_data: bool = False  # force host-streaming batches (default: HBM-resident)
    # Multi-host (pod) bring-up: passed to jax.distributed.initialize before
    # mesh creation. On TPU pods leave coordinator unset and pass
    # --num_processes > 1 (or nothing: the TPU runtime autodetects); explicit
    # coordinator host:port supports DCN clusters.
    coordinator: Optional[str] = None
    num_processes: Optional[int] = None
    process_id: Optional[int] = None

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


@dataclass
class VaeConfig(BaseConfig):
    """vae/main.py:15-31 flag set."""

    viz: bool = False
    global_latent_dims: int = 128
    local_latent_dims: int = 128
    learning_rate: float = 1e-4
    beta: float = 40.0
    dataset: str = "svhn"
    training_steps: int = 1_000_000
    batch_size: int = 64
    patch_size: int = 1
    augmentation: str = "scramble"
    no_label: bool = False
    model: str = "lgvae"
    y_size: int = 30
    tau: float = 0.4
    alpha: float = 40.0

    # derived (vae/main.py:49)
    @property
    def label(self) -> bool:
        return not self.no_label

    def __post_init__(self):
        if self.eval_interval is None:
            self.eval_interval = 10_000  # vae/trainer.py:313


@dataclass
class SpairConfig(BaseConfig):
    """spair/main.py:19-50 flag set (+ phantom options as explicit fields)."""

    learning_rate: float = 1e-4
    beta: float = 0.5
    dataset: str = "cub_solid_fixed"
    channel: int = 3
    training_steps: int = 100_000
    batch_size: int = 32
    runs: int = 1
    tau: float = 0.8
    object_size: int = 32
    latent_size: int = 128
    no_label: bool = False
    anneal_until: float = 1.0
    z_pres_anneal_step: float = 10_000.0
    prior_z_zoom: float = 0.0
    prior_z_zoom_start: float = 10.0
    reconstruction_weight: float = 1.0
    bg_latent_size: int = 4
    local_latent_size: int = 64
    z_bg_beta: float = 10.0
    z_l_beta: float = 0.1
    z_what_beta: float = 0.1
    model: str = "spair"
    patch_size: int = 4
    augmentation: str = "scramble"
    split_z_l: bool = False
    dense_bg: bool = False
    dense_local: bool = False
    concat_bg: bool = False
    concat_z_what: bool = False
    concat_backbone: bool = False
    # Phantom options: referenced by the model but absent from the reference
    # CLI; dotdict made them default-None/falsy (spair/spair.py:58,63).
    bg_model: bool = False
    concat_z_bg: bool = False
    # TPU-native option: fused Pallas paste+composite on the training path
    # (+12.5% step throughput, numerically equivalent; -no_fused_render to
    # disable). Interpret-mode on CPU.
    fused_render: bool = True
    no_fused_render: bool = False
    # Debug-only (no CLI flag): run the fused render in Pallas interpret mode
    # off-TPU so CPU sharding tests / the driver dryrun exercise the exact
    # shard_map-wrapped fused path the TPU program uses.
    interpret_fused: bool = False

    # derived (spair/main.py:72-73): [H, W, C]
    image_size: Tuple[int, int, int] = (48, 48, 3)
    test_size: Tuple[int, int, int] = (48, 48, 3)

    @property
    def label(self) -> bool:
        return not self.no_label

    def __post_init__(self):
        if self.eval_interval is None:
            self.eval_interval = 1_000  # spair/trainer.py:319


@dataclass
class ClassifierConfig(BaseConfig):
    """vae/classifier.py:30-31 hard-coded config."""

    learning_rate: float = 1e-4
    latent_dims: int = 256
    dataset: str = "svhn"
    epochs: int = 20
    batch_size: int = 32


_FLAG_STYLE = {
    # Flags spelled with a single dash + store_true in the reference.
    "viz", "no_label", "allow_growth", "split_z_l", "dense_bg", "dense_local",
    "concat_bg", "concat_z_what", "concat_backbone", "synthetic_data",
    "debug_nans", "bg_model", "concat_z_bg", "fused_render", "no_fused_render",
    "host_data",
}


def _add_fields(parser: argparse.ArgumentParser, cls) -> None:
    for f in dataclasses.fields(cls):
        if f.name in ("image_size", "test_size"):
            continue
        default = f.default if f.default is not dataclasses.MISSING else None
        if f.type in ("bool", bool) or isinstance(default, bool):
            prefix = "-" if f.name in _FLAG_STYLE else "--"
            parser.add_argument(f"{prefix}{f.name}", action="store_true", default=default)
        else:
            typ = {int: int, float: float, str: str}.get(type(default), str)
            if default is None:
                typ = str
            parser.add_argument(f"--{f.name}", type=typ, nargs="?", default=default)


def parse_vae_args(argv=None) -> VaeConfig:
    parser = argparse.ArgumentParser(description="SPLIT-VAE training (TPU-native)")
    _add_fields(parser, VaeConfig)
    parser.add_argument("-allow_growth", action="store_true")  # accepted, ignored (TF-ism)
    ns = vars(parser.parse_args(argv))
    ns.pop("allow_growth", None)
    ns = {k: v for k, v in ns.items() if k in {f.name for f in dataclasses.fields(VaeConfig)}}
    for k in ("training_steps", "eval_interval", "checkpoint_interval",
              "num_processes", "process_id"):
        if ns.get(k) is not None:
            ns[k] = int(float(ns[k]))
    return VaeConfig(**ns)


def parse_spair_args(argv=None) -> SpairConfig:
    parser = argparse.ArgumentParser(description="SPLIT-SPAIR training (TPU-native)")
    _add_fields(parser, SpairConfig)
    parser.add_argument("-allow_growth", action="store_true")
    ns = vars(parser.parse_args(argv))
    ns.pop("allow_growth", None)
    ns = {k: v for k, v in ns.items() if k in {f.name for f in dataclasses.fields(SpairConfig)}}
    for k in ("training_steps", "eval_interval", "checkpoint_interval",
              "num_processes", "process_id"):
        if ns.get(k) is not None:
            ns[k] = int(float(ns[k]))
    cfg = SpairConfig(**ns)
    if cfg.no_fused_render:
        cfg.fused_render = False
    size = 48  # MultiCUB canvas (spair/data.py:239-247)
    cfg.image_size = (size, size, cfg.channel)
    cfg.test_size = (size, size, cfg.channel)
    return cfg
