"""Test configuration: force the CPU backend with 8 virtual devices so
multi-chip sharding (pjit/shard_map over a Mesh) is exercised without TPU
hardware — JAX's standard recipe for testing collectives.

NOTE: this environment pre-imports jax at interpreter startup (an axon TPU
plugin registers via sitecustomize) with JAX_PLATFORMS=axon, so env vars set
here are too late — use jax.config.update, which takes effect because
backends aren't initialized until first use.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses tests spawn

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# parity tests compare against torch float32; JAX's "default" matmul
# precision is reduced (bf16-accumulate) even on CPU.
jax.config.update("jax_default_matmul_precision", "float32")
# persistent compile cache: the multichip train-step test compiles the full
# GSPMD program (~2 min cold on this 1-core host); cached reruns are seconds
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
