"""Test harness: force CPU JAX with 8 virtual devices so multi-chip sharding
paths are exercised without TPU hardware (SURVEY.md §4)."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# the environment's sitecustomize force-registers the remote TPU backend and
# overrides JAX_PLATFORMS from the env; an explicit config update wins
jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: repeated pytest runs skip XLA recompiles.
# Also exported as BFF_COMPILE_CACHE_DIR: `import beyondff_tpu` re-points the
# cache to its own default otherwise (beyondff_tpu/__init__.py), which used to
# silently override this setting on the first package import.
_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
os.environ.setdefault("BFF_COMPILE_CACHE_DIR", _CACHE_DIR)
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", os.environ["BFF_COMPILE_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
