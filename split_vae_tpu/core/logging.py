"""Run directories, console + JSONL logging, profiling hooks.

Observability upgrades over the reference (which only had formatted prints,
vae/trainer.py:354-382): every metrics interval also lands in
``<run_dir>/metrics.jsonl`` for machine consumption, and optional
``jax.profiler`` traces can be captured around training intervals.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from datetime import datetime
from typing import Dict, Optional


def make_run_dir(output_dir: str) -> str:
    """output/<YYYYmmdd-HHMMSS>/ like the reference (vae/trainer.py:73-80).

    Names have second resolution; back-to-back runs in one process (--runs,
    fast tests) can start within the same second, and sharing a run dir would
    interleave their metrics.jsonl and overwrite artifacts. A ``-N`` suffix
    dedupes; creation is exclusive so concurrent processes cannot collide.
    """
    base = datetime.now().strftime("%Y%m%d-%H%M%S")
    for i in range(1, 1000):
        run_name = base if i == 1 else f"{base}-{i}"
        run_dir = os.path.join(output_dir, run_name)
        try:
            os.makedirs(run_dir)
        except FileExistsError:
            continue
        return run_dir
    raise RuntimeError(f"could not allocate a run dir under {output_dir}")


class RunLogger:
    def __init__(self, run_dir: str):
        self.run_dir = run_dir
        self._jsonl = open(os.path.join(run_dir, "metrics.jsonl"), "a")

    def log(self, step: int, metrics: Dict[str, float], prefix: str = "") -> None:
        record = {"step": step, "time": time.time()}
        record.update({(prefix + k): float(v) for k, v in metrics.items()})
        self._jsonl.write(json.dumps(record) + "\n")
        self._jsonl.flush()
        shown = ", ".join(f"{k}: {v:.4f}" for k, v in metrics.items())
        print(f"[step {step}] {prefix}{shown}")

    def close(self) -> None:
        self._jsonl.close()


@contextlib.contextmanager
def maybe_profile(profile_dir: Optional[str], step: int):
    """Capture a jax.profiler trace for this block when profile_dir is set."""
    if profile_dir:
        import jax

        jax.profiler.start_trace(os.path.join(profile_dir, f"step_{step}"))
        try:
            yield
        finally:
            jax.profiler.stop_trace()
    else:
        yield


class StepTimer:
    """imgs/sec with honest device sync at interval ends."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.t0 = time.time()
        self.images = 0

    def add(self, n: int):
        self.images += n

    def rate(self, sync_value=None) -> float:
        if sync_value is not None:
            import jax

            jax.block_until_ready(sync_value)
        dt = time.time() - self.t0
        return self.images / dt if dt > 0 else 0.0
