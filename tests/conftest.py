"""Test harness: run everything on a virtual 8-device CPU mesh.

Mirrors SURVEY.md §4(d): distributed paths are validated with
``--xla_force_host_platform_device_count=8`` instead of real chips.
"""
import os

# neutralize the axon TPU tunnel (its sitecustomize force-registers the
# remote backend regardless of JAX_PLATFORMS)
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Parity tests compare against torch float32; force full-precision matmuls
# (production keeps the backend default: bf16 MXU passes on TPU).
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
