# Test configuration: force an 8-device virtual CPU platform BEFORE jax import
# so sharding/pjit paths are exercised without TPU hardware (standard JAX
# multi-device testing recipe; nothing equivalent exists in the reference).
import os

# Unconditional: the environment's sitecustomize force-sets JAX_PLATFORMS=axon
# (TPU) at interpreter startup and already imports jax, so the env var alone is
# not enough — jax.config captured "axon" at import.  Override both.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


REFERENCE_ROOT = "/root/reference"


def has_reference() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
