"""Runtime setup: platform override + persistent XLA compilation cache.

Remote-compile TPU environments pay 20-100 s per fresh program; the persistent
cache makes re-runs of the same configs start in seconds.
"""

from __future__ import annotations

import os

import jax

_DONE = False


def setup_runtime(platform: str = None, cache_dir: str = None) -> None:
    global _DONE
    if platform:
        jax.config.update("jax_platforms", platform)
    if _DONE:
        return
    # MEASURED: the axon (remote-relay) PJRT plugin slows step execution ~50x
    # when the persistent compilation cache is enabled (6 ms -> 300 ms/step),
    # presumably re-loading serialized executables per dispatch. Only enable
    # the cache on standard backends.
    if "axon" in os.environ.get("JAX_PLATFORMS", "") and not platform:
        _DONE = True
        return
    cache_dir = cache_dir or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/split_vae_tpu_xla"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Overridable floor: the test suite sets 0 (cache even sub-second
        # eager-op compiles — measured to dominate e2e-test wall time on a
        # 1-core CPU host); production keeps 1.0 to avoid flooding the cache
        # with trivial entries.
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs",
            float(os.environ.get("SPLIT_TPU_CACHE_MIN_SECS", "1.0")))
    except Exception:
        pass  # older jax without the persistent cache knobs
    _DONE = True
