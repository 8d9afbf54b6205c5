"""Test config: run everything on a virtual 8-device CPU mesh.

Must set the env vars before the first jax import (standard JAX fake-backend
trick; the reference has no analogue — it has no tests at all, SURVEY.md §4).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax
import numpy as np
import pytest

# CPU oneDNN may run matmuls in reduced precision; golden tests need exact fp32.
jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture
def rng():
    return np.random.default_rng(0)
