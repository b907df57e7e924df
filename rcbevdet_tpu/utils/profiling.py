"""Profiling and cost-analysis utilities.

The reference measures wall-clock only (SURVEY.md §5: no profiler
integration; FLOPs via mmcv's counter).  Here:
- ``trace`` wraps ``jax.profiler`` to capture a Perfetto/TensorBoard trace
  of any callable on the active backend.
- ``flops_of`` returns XLA's own cost analysis of a jitted function — the
  TPU-native get_flops (tools/analysis_tools/get_flops.py counterpart).
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Any, Callable

import jax


@contextlib.contextmanager
def trace(log_dir="work_dirs/profile"):
    """Capture a profiler trace: view with TensorBoard or Perfetto."""
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def flops_of(fn: Callable, *args, **kwargs):
    """XLA cost analysis of ``fn(*args)``: dict with flops / bytes accessed."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return {
        "flops": cost.get("flops", float("nan")),
        "bytes_accessed": cost.get("bytes accessed", float("nan")),
        "transcendentals": cost.get("transcendentals", 0.0),
    }


def timeit(fn: Callable, *args, iters=20, warmup=3):
    """Median wall time of a jitted callable (blocks on the result)."""
    out = fn(*args)
    jax.block_until_ready(out)
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def traced_device_ms_per_step(run_n_steps, n) -> float:
    """True per-step device time: run ``run_n_steps(n)`` under the JAX
    profiler and sum device-op durations from the trace.

    Wall-clock loops lie on tunneled-TPU harnesses (``block_until_ready``
    can return at enqueue-ack); trace op sums are the reliable timing and
    match locally-attached hardware semantics (see bench.py docstring).

    Long traces (>~7 s of device work) overflow the TPU-side profiler
    buffer (RESOURCE_EXHAUSTED) and come back with no device events, so on
    an empty/zero result the window is halved and re-traced down to a
    single step.  Tracing also has device-side MEMORY overhead: a step
    that fits HBM bare can OOM under the profiler, and that OOM leaves
    the allocator exhausted for the rest of the process — for steps near
    HBM capacity use :func:`sync_ms_per_step` instead (the benchmark
    CLI's ``--timing sync``).
    """
    while True:
        ms = _traced_once(run_n_steps, n)
        if ms > 0 or n <= 1:
            return ms
        n = max(1, n // 2)


def sync_ms_per_step(run_n_steps, n) -> float:
    """Per-step wall-clock with the dispatch tunnel forced synchronous,
    minus the per-step RTT floor.

    On this harness the first device_get in a process flips dispatch into
    per-call synchronous mode; ``run_n_steps`` is expected to
    block_until_ready its last output, which in synchronous mode really
    waits for the device.  The RTT floor is measured on a trivial jitted
    add and subtracted per step.
    """
    import time

    import jax
    import jax.numpy as jnp

    # poison dispatch into synchronous mode (idempotent)
    tiny = jax.jit(lambda x: x + 1.0)
    jax.device_get(tiny(jnp.float32(0)))
    t0 = time.perf_counter()
    rtt_iters = 20
    for _ in range(rtt_iters):
        jax.block_until_ready(tiny(jnp.float32(0)))
    rtt_s = (time.perf_counter() - t0) / rtt_iters
    run_n_steps(1)  # re-warm under synchronous mode
    t0 = time.perf_counter()
    run_n_steps(n)
    dt = time.perf_counter() - t0
    return max(dt / n - rtt_s, 0.0) * 1e3


def _traced_once(run_n_steps, n) -> float:
    import glob
    import gzip
    import json
    import tempfile

    import jax

    tdir = tempfile.mkdtemp(prefix="bench_trace_")
    with jax.profiler.trace(tdir):
        run_n_steps(n)
    files = sorted(glob.glob(tdir + "/plugins/profile/*/*.trace.json.gz"))
    if not files:
        return float("nan")
    with gzip.open(files[-1]) as fh:
        d = json.load(fh)
    ev = d.get("traceEvents", [])
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in ev
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    devpids = {p for p, name in pids.items() if "TPU" in name}
    # the profiler's "Steps" lane emits one numeric-named marker spanning
    # each whole invocation — summing those double-counts every op
    step_tids = {
        (e["pid"], e["tid"])
        for e in ev
        if e.get("ph") == "M" and e.get("name") == "thread_name"
        and "step" in str(e["args"].get("name", "")).lower()
    }
    total_us = 0.0
    for e in ev:
        if (
            e.get("ph") == "X"
            and e.get("pid") in devpids
            and (e.get("pid"), e.get("tid")) not in step_tids
            and not e.get("name", "").startswith("jit_")
            and not e.get("name", "").isdigit()
        ):
            total_us += e.get("dur", 0)
    return total_us / n / 1e3
