"""Checkpoint / resume for the full train state.

The reference only saves final weights (vae/trainer.py:421, spair/trainer.py:424)
— a crash loses the run. Here the full state (params + optimizer state + step
+ PRNG key [+ batch_stats]) is serialized periodically and training resumes
exactly (SURVEY.md aux-subsystems gap).

Format: flax msgpack of the state dict, one file per step, plus a LATEST
pointer. Atomic via write-to-tmp + rename.
"""

from __future__ import annotations

import os
import re
from typing import Optional

import flax.serialization
import jax

from split_vae_tpu.core.state import TrainState

_CKPT_RE = re.compile(r"checkpoint_(\d+)\.msgpack$")


def save_checkpoint(ckpt_dir: str, state: TrainState, keep: int = 3) -> str:
    """Serialize the full state; retain only the newest ``keep`` checkpoints."""
    os.makedirs(ckpt_dir, exist_ok=True)
    step = int(jax.device_get(state.step))
    target = {
        "step": state.step,
        "params": state.params,
        "opt_state": state.opt_state,
        "rng": state.rng,
        "batch_stats": state.batch_stats,
    }
    payload = flax.serialization.msgpack_serialize(
        flax.serialization.to_state_dict(jax.device_get(target))
    )
    path = os.path.join(ckpt_dir, f"checkpoint_{step}.msgpack")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(payload)
    os.replace(tmp, path)

    if keep > 0:
        found = sorted(
            ((int(m.group(1)), fname) for fname in os.listdir(ckpt_dir)
             if (m := _CKPT_RE.match(fname))),
            reverse=True)
        for _, fname in found[keep:]:
            os.remove(os.path.join(ckpt_dir, fname))
    return path


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    best = None
    best_step = -1
    for fname in os.listdir(ckpt_dir):
        m = _CKPT_RE.match(fname)
        if m and int(m.group(1)) > best_step:
            best_step = int(m.group(1))
            best = os.path.join(ckpt_dir, fname)
    return best


_APPLY_IF_FINITE_KEYS = frozenset(
    {"notfinite_count", "last_finite", "total_notfinite", "inner_state"})


def _migrate_opt_state(raw):
    """Map pre-round-2 ``optax.ApplyIfFiniteState`` serializations onto the
    current ``SkipNonFiniteState`` layout (same ``total_notfinite`` /
    ``inner_state`` fields, minus the give-up bookkeeping) so checkpoints
    written before the nan_robust switch keep restoring."""
    if isinstance(raw, dict):
        if set(raw.keys()) == _APPLY_IF_FINITE_KEYS:
            return {
                "total_notfinite": raw["total_notfinite"],
                "inner_state": _migrate_opt_state(raw["inner_state"]),
            }
        return {k: _migrate_opt_state(v) for k, v in raw.items()}
    return raw


def _migrate_raw(raw):
    """Migration is scoped to the ``opt_state`` subtree: a params/batch_stats
    dict with a coincidentally identical key set must never be rewritten."""
    if isinstance(raw, dict) and "opt_state" in raw:
        raw = dict(raw, opt_state=_migrate_opt_state(raw["opt_state"]))
    return raw


def restore_checkpoint(path: str, state: TrainState) -> TrainState:
    """Restore into a template state (shapes/treedef must match)."""
    if os.path.isdir(path):
        found = latest_checkpoint(path)
        if found is None:
            raise FileNotFoundError(f"No checkpoint under {path}")
        path = found
    with open(path, "rb") as f:
        raw = flax.serialization.msgpack_restore(f.read())
    raw = _migrate_raw(raw)
    target = {
        "step": state.step,
        "params": state.params,
        "opt_state": state.opt_state,
        "rng": state.rng,
        "batch_stats": state.batch_stats,
    }
    restored = flax.serialization.from_state_dict(target, raw)
    return state.replace(
        step=restored["step"],
        params=restored["params"],
        opt_state=restored["opt_state"],
        rng=restored["rng"],
        batch_stats=restored["batch_stats"],
    )


def save_weights(path: str, params) -> None:
    """Weights-only export (reference parity: model.save_weights .h5)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = flax.serialization.msgpack_serialize(
        flax.serialization.to_state_dict(jax.device_get(params))
    )
    with open(path, "wb") as f:
        f.write(payload)


def load_weights(path: str, params):
    with open(path, "rb") as f:
        raw = flax.serialization.msgpack_restore(f.read())
    return flax.serialization.from_state_dict(params, raw)
