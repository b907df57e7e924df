"""Test configuration: force the CPU backend with 8 virtual devices so
multi-chip sharding (pjit/shard_map over a Mesh) is exercised without TPU
hardware — JAX's standard recipe for testing collectives.

Must run before jax initializes its backends, hence env vars at import time.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# parity tests compare against torch float32; JAX's "default" matmul
# precision is reduced (bf16-accumulate) even on CPU.
jax.config.update("jax_default_matmul_precision", "float32")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
