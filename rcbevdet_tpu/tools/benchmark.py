"""Inference FPS benchmark CLI.

Counterpart of the reference's tools/analysis_tools/benchmark_sequential.py
(the deployment-style semantics: cached previous BEV + key-frame-only
compute, SURVEY.md §3.4) and benchmark.py (full forward).  ``bench.py`` at
the repo root is the driver-facing one-line-JSON wrapper around the same
measurement.

Usage:
  python -m rcbevdet_tpu.tools.benchmark <config.py> [--mode sequential|full]
      [--iters 100] [--flops]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument(
        "--mode", choices=["sequential", "full", "train"],
        default="sequential",
        help="train: full train-step throughput with synthetic targets "
             "(counterpart of the reference's per-iter time log, "
             "mmcv runner log_buffer 'time')",
    )
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--iters", type=int, default=100)
    p.add_argument("--warmup", type=int, default=5)
    p.add_argument("--flops", action="store_true", help="print XLA cost analysis")
    p.add_argument(
        "--accelerate", action="store_true",
        help="sequential mode: precompute LSS pooling metadata on host for "
             "the fixed rig (reference benchmark_sequential.py:57-59) and "
             "use the Pallas tile-matmul splat",
    )
    p.add_argument(
        "--camera-dtype", choices=["float32", "bfloat16"], default="float32",
        help="train mode: run the FROZEN camera branch's forward in this "
             "dtype (cfg.train_camera_dtype; f32 masters and trainable "
             "branches unaffected — ROADMAP r5 lever 2)",
    )
    p.add_argument(
        "--pool-meta", action=argparse.BooleanOptionalAction, default=True,
        help="train mode: loader-precomputed accelerate-mode LSS pooling "
             "tables (ROADMAP r5 lever 1 — the shipped train path); "
             "--no-pool-meta falls back to the dense segment-sum pool",
    )
    p.add_argument(
        "--timing", choices=["trace", "sync"], default="trace",
        help="sync: synchronous-dispatch wall-clock minus the measured "
             "tunnel RTT floor — for steps near HBM capacity, where the "
             "profiler's device-side memory overhead causes an OOM that "
             "poisons the allocator",
    )
    p.add_argument(
        "--dtype", choices=["float32", "bfloat16"], default="float32",
        help="bfloat16: cast params + image inputs to bf16 and set the "
             "model's compute_dtype (same casting rules as bench.py; BN "
             "stats and LSS geometry stay f32)",
    )
    p.add_argument("--cfg-options", nargs="*", default=[])
    args = p.parse_args(argv)

    from ..utils.platform import apply_platform_env, enable_compile_cache

    apply_platform_env()
    enable_compile_cache()

    import functools

    import jax
    import jax.numpy as jnp

    from ..builder import build_model
    from ..config import Config
    from ..inference import decode_predictions
    from ..models.detectors import RCBEVDet
    from ..utils.platform import tpu_compiler_options
    from ..utils.profiling import flops_of

    sys.path.insert(0, ".")
    from __graft_entry__ import _example_batch

    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_options(dict(kv.split("=", 1) for kv in args.cfg_options))
    if args.camera_dtype == "bfloat16" and args.mode == "train":
        cfg.model["train_camera_dtype"] = "bfloat16"
    if args.dtype == "bfloat16":
        if args.mode == "train":
            p.error("--dtype bfloat16 is inference-only (training keeps "
                    "f32 master params)")
        cfg.model["compute_dtype"] = "bfloat16"
    model, mcfg = build_model(cfg)
    rng = np.random.default_rng(0)
    if mcfg is None:  # RCBEVDetPlusPlus: (imgs, lidar2img) interface
        if args.mode != "full":
            p.error("RCBEVDetPlusPlus supports --mode full only")
        b = args.batch_size
        h, w = tuple(cfg.data_config["input_size"])
        n_cams = len(cfg.data_config["cams"])
        imgs = jnp.asarray(
            rng.standard_normal((b, n_cams, h, w, 3)), jnp.float32
        )
        l2i = np.tile(np.eye(4, dtype=np.float32), (b, n_cams, 1, 1))
        l2i[..., 0, 0] = l2i[..., 1, 1] = 500.0
        l2i[..., 0, 2] = w / 2
        l2i[..., 1, 2] = h / 2
        l2i = jnp.asarray(l2i)
        variables = model.init(
            jax.random.PRNGKey(0), imgs[:1], l2i[:1], (h, w)
        )
        if args.dtype == "bfloat16":
            variables = {
                "params": jax.tree_util.tree_map(
                    lambda x: x.astype(jnp.bfloat16)
                    if x.dtype == jnp.float32 else x,
                    variables["params"],
                ),
                "batch_stats": variables["batch_stats"],
            }
            imgs = imgs.astype(jnp.bfloat16)

        @functools.partial(
            jax.jit, compiler_options=tpu_compiler_options()
        )
        def step_pp(variables, imgs, l2i):
            outs = model.apply(variables, imgs, l2i, (h, w), train=False)
            return outs[-1]  # final decoder layer (logits, boxes)

        fn = lambda: step_pp(variables, imgs, l2i)
        mode_fn = fn
    else:
        mode_fn = None
        full = _example_batch(mcfg, b=args.batch_size, rng=rng)
        variables = model.init(
            jax.random.PRNGKey(0),
            jax.tree_util.tree_map(lambda x: x[:1], full), train=False,
        )
    if args.dtype == "bfloat16" and mode_fn is None:
        # bench.py casting rules: bf16 params (f32 masters are a training
        # concern) + bf16 image inputs; BN stats stay f32
        variables = {
            "params": jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if x.dtype == jnp.float32 else x,
                variables["params"],
            ),
            "batch_stats": variables["batch_stats"],
        }
        full = dict(full, imgs=full["imgs"].astype(jnp.bfloat16))

    if mode_fn is not None:
        fn = mode_fn
    elif args.mode == "train":
        from ..training.train_step import (
            create_train_state, make_optimizer, make_train_step,
        )

        b = args.batch_size
        hf, wf = mcfg.input_size
        ny = nx = mcfg.bev_size
        full["heatmap_t"] = (
            jnp.zeros((b, mcfg.num_classes, ny, nx)).at[:, 0, ny // 2,
                                                        nx // 2].set(1.0)
        )
        full["anno_box_t"] = jnp.zeros((b, 100, 10))
        full["inds_t"] = jnp.zeros((b, 100), jnp.int32)
        full["mask_t"] = jnp.zeros((b, 100)).at[:, 0].set(1.0)
        full["gt_depth"] = (
            jnp.zeros((b, 6, hf, wf)).at[:, :, ::7, ::11].set(3.0)
        )
        if args.pool_meta:
            from ..models.view_transformer import make_lss_pool_transform

            tfm = make_lss_pool_transform(mcfg)
            full_np = tfm({k: np.asarray(v) for k, v in full.items()})
            full["lss_pool"] = jax.tree_util.tree_map(
                jnp.asarray, full_np["lss_pool"]
            )
        tx = make_optimizer(
            total_steps=1000, freeze_img=mcfg.freeze_img,
            params=variables["params"],
        )
        from ..utils.platform import tpu_train_compiler_options

        state = create_train_state(model, variables, tx)
        # donate the state exactly like the runner does: without aliasing,
        # old+new state coexist and B=4 peaks at 16.7 GB (> v5e HBM)
        step = jax.jit(
            make_train_step(model, tx, mcfg),
            donate_argnums=(0,),
            compiler_options=tpu_train_compiler_options(),
        )
        holder = {"state": state}

        def fn():
            new_state, metrics = step(holder["state"], full)
            holder["state"] = new_state
            return metrics["loss"]

    elif args.mode == "full":
        @functools.partial(
            jax.jit, compiler_options=tpu_compiler_options()
        )
        def step(variables, batch):
            preds, _ = model.apply(variables, batch, train=False)
            return decode_predictions(preds)

        fn = lambda: step(variables, full)
    else:
        key_batch = {
            k: (v[:, 0:1] if k in ("imgs", "sensor2keyegos", "intrins",
                                   "post_rots", "post_trans") else v)
            for k, v in full.items()
        }
        ny = nx = mcfg.bev_size
        # --batch-size > 1 = that many INDEPENDENT camera streams served
        # per step (multi-vehicle serving): amortizes the radar small-op
        # tail and the decode over the batch
        prev_bev = jnp.zeros(
            (args.batch_size, mcfg.num_adj, ny, nx, mcfg.num_trans_channels),
            jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32,
        )
        prev_s2k = jnp.asarray(full["sensor2keyegos"][:, 1:])

        pool_meta = None
        if args.accelerate:
            from ..models.view_transformer import precompute_lss_pool_meta

            pool_meta = precompute_lss_pool_meta(
                mcfg.grid_config, mcfg.input_size, mcfg.downsample,
                full["sensor2keyegos"][0, 0], full["intrins"][0, 0],
                full["post_rots"][0, 0], full["post_trans"][0, 0],
                full["bda"][0],
            )

        @functools.partial(
            jax.jit, compiler_options=tpu_compiler_options()
        )
        def step(variables, batch, prev_bev, prev_s2k, pool_meta=None):
            preds, key_bev = model.apply(
                variables, batch, prev_bev, prev_s2k, pool_meta,
                method=RCBEVDet.forward_cached,
            )
            return decode_predictions(preds), key_bev

        fn = lambda: step(variables, key_batch, prev_bev, prev_s2k, pool_meta)

    out = fn()
    jax.block_until_ready(out)
    for _ in range(args.warmup):
        out = fn()
    jax.block_until_ready(out)
    if jax.default_backend() == "tpu":
        # wall-clock loops lie on tunneled-TPU harnesses; use profiler
        # trace op sums (bench.py docstring), or --timing sync for steps
        # near HBM capacity (tracing has device-side memory overhead and
        # an OOM under the profiler poisons the allocator)
        from ..utils.profiling import (
            sync_ms_per_step, traced_device_ms_per_step,
        )

        def run_n(n):
            o = None
            for _ in range(n):
                o = fn()
            jax.block_until_ready(o)

        if args.timing == "sync":
            ms = sync_ms_per_step(run_n, min(args.iters, 10))
            timing = "sync_wallclock_minus_rtt"
        else:
            # cap the traced window: long traces (>~7 s) overflow the
            # profiler's event buffer and silently UNDERCOUNT op durations
            # (observed: a 30-iter 244 ms/step trace reporting 171 ms/step)
            ms = traced_device_ms_per_step(run_n, min(args.iters, 10))
            timing = "device_trace"
        dt = ms * args.iters / 1000.0
    else:
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn()
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        timing = "wallclock"
    result = dict(
        mode=args.mode,
        fps=round(args.iters / dt, 2),
        ms_per_frame=round(1000 * dt / args.iters, 3),
        backend=jax.default_backend(),
        timing=timing,
    )
    if args.mode == "train":
        result["samples_per_s"] = round(
            args.iters * args.batch_size / dt, 2
        )
        result["ms_per_step"] = result.pop("ms_per_frame")
        result["batch_size"] = args.batch_size
    elif args.batch_size > 1:
        # batched independent streams: fps counts FRAMES (one per stream
        # per step); ms_per_frame is the per-stream amortized device time
        result["fps"] = round(args.iters * args.batch_size / dt, 2)
        result["ms_per_frame"] = round(
            1000 * dt / (args.iters * args.batch_size), 3
        )
        result["ms_per_step"] = round(1000 * dt / args.iters, 3)
        result["batch_size"] = args.batch_size
    if args.flops and args.mode != "train" and mode_fn is None:
        if args.mode == "full":
            cost = flops_of(
                lambda v, b: model.apply(v, b, train=False), variables, full
            )
        else:
            cost = flops_of(
                lambda v, b, pb, ps: model.apply(
                    v, b, pb, ps, method=RCBEVDet.forward_cached
                ),
                variables, key_batch, prev_bev, prev_s2k,
            )
        result["gflops"] = round(cost["flops"] / 1e9, 2)
        result["gbytes"] = round(cost["bytes_accessed"] / 1e9, 3)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
