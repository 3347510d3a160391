"""Test configuration: run everything on an 8-device virtual CPU mesh.

Must set env vars before the first jax import so that sharding tests exercise
the real SPMD partitioner without TPU hardware.
"""

import os

# NOTE: this environment pre-imports jax via sitecustomize with
# JAX_PLATFORMS=axon (remote TPU), so plain env vars set here are too late for
# jax's config snapshot. XLA_FLAGS is still read lazily at backend init, and
# jax.config.update works post-import as long as no backend has initialized.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
assert jax.device_count() == 8, f"expected 8 virtual CPU devices, got {jax.device_count()}"

# Persistent compilation cache: the suite is dominated by XLA:CPU compiles of
# the full train steps (~20 min cold); cached re-runs skip them. Keyed by HLO
# hash, so code changes invalidate naturally. (Broken on the axon TPU backend,
# fine on CPU — see core/runtime.py.)
_cache_dir = os.environ.get(
    "SPLIT_TPU_TEST_CACHE", os.path.expanduser("~/.cache/split_vae_tpu_test_xla"))
try:
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # Subprocess-based tests (dryrun re-exec, multihost children) call
    # setup_runtime(), which honors this env var — same cache, no cold
    # recompiles in children.
    os.environ["JAX_COMPILATION_CACHE_DIR"] = _cache_dir
except Exception:
    pass

# Opt-in fast-compile mode for local iteration: trades XLA optimization
# effort for compile time (the suite's dominant cost). Off by default until
# measured safe for the numerics-pinning tests.
if os.environ.get("SPLIT_TPU_TEST_FAST_COMPILE") == "1":
    jax.config.update("jax_disable_most_optimizations", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
