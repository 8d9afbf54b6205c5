"""Test config: run everything on a virtual 8-device CPU mesh.

The driver environment boots every interpreter with the tunneled single-TPU
'axon' platform pre-registered via sitecustomize — which imports jax BEFORE
any test code runs and pins JAX_PLATFORMS=axon. Env vars are therefore
useless here; the runtime config update below is what actually forces the
cpu backend (tests must never claim the TPU tunnel: a second client hangs
while another process holds it, and remote compiles are slow).
"""

import os

# must happen before the first backend initialization (jax is already
# imported by sitecustomize, but no backend client exists yet)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
# CPU matmuls may run in reduced precision; golden tests need exact fp32.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np
import pytest

assert jax.default_backend() == "cpu", jax.default_backend()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
