"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set XLA flags before jax is imported anywhere in the test process.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# FORCE (not setdefault): the sandbox exports JAX_PLATFORMS=axon, and
# root CLIs call utils.platform.ensure_platform_from_env(), which
# re-applies the ENV value to jax.config mid-test — with the TPU tunnel
# down that hangs every jax.devices() in an infinite claim-retry loop.
# Tests are CPU-hermetic by contract (CLAUDE.md).
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Host-fingerprinted: XLA:CPU AOT cache entries are machine-specific and a
# /tmp image that survives a host-generation change would otherwise feed
# foreign artifacts back ('machine type ... doesn't match' errors).
# utils.platform imports no jax at module level, so this import is safe
# AFTER the env setup above (which must precede any jax import).
from multimodal_hand_pose_enhancement_for_sign_language_tpu.utils.platform import (  # noqa: E402,E501
    host_fingerprint,
)

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache-" + host_fingerprint()
)

import jax  # noqa: E402

# The environment's sitecustomize (axon TPU tunnel) force-sets
# jax_platforms="axon,cpu" at interpreter start, overriding JAX_PLATFORMS.
# Tests must run on the in-process CPU backend (fast compiles, 8 virtual
# devices), so re-override after import, before any backend initializes.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)


@pytest.fixture(autouse=True)
def _no_clips_cache_leak():
    """article_replay.main() enables MHPE_LOAD_DATA_CACHE process-wide;
    keep both the flag and the cache contents from leaking across tests."""
    yield
    if os.environ.pop("MHPE_LOAD_DATA_CACHE", None) is not None:
        from multimodal_hand_pose_enhancement_for_sign_language_tpu.train import (
            data as _train_data,
        )

        _train_data._CLIPS_CACHE.clear()
