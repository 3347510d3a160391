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
    # Cache EVERYTHING (threshold 0): profiling showed the e2e tests spend
    # more wall time on hundreds of 30-130 ms eager-op compiles (threefry,
    # convert_element_type, init chains) than on the big train-step programs;
    # a 1.0 s threshold left all of those permanently uncached.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    # Subprocess-based tests (dryrun re-exec, multihost children) call
    # setup_runtime(), which honors these env vars — same cache + same
    # cache-everything floor, no cold recompiles in children.
    os.environ["JAX_COMPILATION_CACHE_DIR"] = _cache_dir
    os.environ["SPLIT_TPU_CACHE_MIN_SECS"] = "0.0"
except Exception:
    pass

# Opt-in O0 mode (SPLIT_TPU_TEST_FAST_COMPILE=1): lower XLA optimization
# effort. MEASURED NET-SLOWER for the full suite (>37 min vs 27.5 min
# default): the e2e/sharding tests execute enough steps on the 8-device
# virtual mesh that unoptimized runtime swamps any compile savings. Kept
# only as a knob for single-test iteration on compile-dominated tests.
# The env var is exported so subprocess tests (dryrun re-exec, multihost
# children) inherit the mode; `xla_full_optimizations` restores defaults
# for tests asserting on optimized-HLO behavior (constant-folding
# regressions).
if os.environ.get("SPLIT_TPU_TEST_FAST_COMPILE") == "1":
    jax.config.update("jax_optimization_level", "O0")
    os.environ["JAX_OPTIMIZATION_LEVEL"] = "O0"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def xla_full_optimizations():
    """Temporarily restore full XLA optimizations (fast-compile mode disables
    them suite-wide). For tests asserting on optimized-HLO behavior, e.g. the
    safe_log constant-folding regression."""
    prev = jax.config.jax_optimization_level
    jax.config.update("jax_optimization_level", "UNKNOWN")  # compiler default
    try:
        yield
    finally:
        jax.config.update("jax_optimization_level", prev)


@pytest.fixture
def rng():
    return np.random.RandomState(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
