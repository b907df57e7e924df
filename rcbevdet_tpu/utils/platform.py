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


def enable_compile_cache(cache_dir: str | None = None) -> None:
    """Persistent XLA compile cache for CLI entry points.

    The full train step / inference graphs take minutes to compile on a
    1-core host; the repo ships a pre-warmed ``.jax_cache`` so driver and
    CI runs don't pay that cost (reference analog: none — torch eager).
    """
    import jax

    if cache_dir is None:
        cache_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def tpu_compiler_options(scoped_vmem_kib: int = 65536) -> dict | None:
    """Compiler options for perf-critical jits on TPU; None elsewhere.

    XLA:TPU's default scoped-VMEM budget (~16 MiB) is far too small for this
    model's fused graphs: with many VMEM-hungry fusions competing, the
    scheduler assigns the deform-attn gathers and the RCS canvas scatters a
    few hundred KiB of scratch each and they fall off their fast
    (VMEM-resident-table) paths — measured 119 ms/frame vs 1.0 ms/frame for
    the identical graph with a 64 MiB budget on TPU v5e (128 MiB physical
    VMEM).  Scheduling-only: numerics are unaffected.

    The best budget is graph-dependent: 64 MiB for the inference graphs;
    the TRAIN step prefers 96 MiB (v5e sweep: 223.6 / 208.7 / 215.6
    ms/step at 64 / 96 / 112 MiB) — use :func:`tpu_train_compiler_options`
    there.  Override with RCBEVDET_SCOPED_VMEM_KIB (0 disables).
    """
    import jax

    if jax.default_backend() != "tpu":
        return None
    kib = os.environ.get("RCBEVDET_SCOPED_VMEM_KIB", str(scoped_vmem_kib))
    if not int(kib):
        return None
    return {"xla_tpu_scoped_vmem_limit_kib": kib}


def tpu_train_compiler_options() -> dict | None:
    """Compiler options for the TRAIN step (96 MiB scoped VMEM sweet spot)."""
    return tpu_compiler_options(scoped_vmem_kib=98304)
