"""Honor JAX_PLATFORMS for CLI entry points.

This environment (and any axon-style TPU plugin that self-registers via
sitecustomize) can force a platform at interpreter start, making the
JAX_PLATFORMS environment variable silently ineffective.  CLI tools call
``apply_platform_env()`` before first backend use so ``JAX_PLATFORMS=cpu
python -m rcbevdet_tpu.tools.train ...`` behaves as documented.
"""

from __future__ import annotations

import os


def apply_platform_env(num_cpu_devices: int | None = None) -> None:
    plat = os.environ.get("JAX_PLATFORMS")
    if not plat:
        return
    import jax

    try:
        jax.config.update("jax_platforms", plat)
        if num_cpu_devices and plat == "cpu":
            jax.config.update("jax_num_cpu_devices", int(num_cpu_devices))
    except RuntimeError:
        pass  # backend already initialized; keep whatever is live
