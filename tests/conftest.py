"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip hardware is unavailable in CI; all sharding/parallelism tests run
against `--xla_force_host_platform_device_count=8`, the standard JAX
substitute for a real mesh. Must be set before jax initialises.
"""

import os

# Force CPU even if the environment pre-selects a TPU platform; opt out by
# exporting VIET_TTS_TEST_PLATFORM (e.g. =tpu) to test against real hardware.
os.environ["JAX_PLATFORMS"] = os.environ.get("VIET_TTS_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The container's sitecustomize pre-registers the TPU PJRT plugin with
# JAX_PLATFORMS=axon; the config update reliably redirects to CPU as long as
# no arrays have been created yet.
jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

# Persistent compilation cache: the suite is dominated by CPU compiles of
# the tiny-model trainer smokes; repeat runs hit the cache instead.
_cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
except Exception:
    pass

import pathlib
import sys

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))
