"""Per-op device-time profile of the inference or train step.

Runs the jitted step under ``jax.profiler.trace`` and prints the top HLO
ops by summed device time, with source-line and module-path attribution
pulled from the trace metadata.  This is the tool the round-2 perf work
was driven by (it found the 45 ms batched deform-attn gather cliff and
the 14 ms vmapped-scatter relayout loops).

Counterpart of the reference's profiling workflow (it has none — SURVEY
§5 "no profiler integration"; closest analog is
tools/analysis_tools/benchmark_view_transformer.py's manual timing).

Usage:
  python -m rcbevdet_tpu.tools.profile_step <config.py>
      [--mode sequential|train] [--batch-size N] [--dtype bfloat16]
      [--accelerate] [--top 40] [--steps 5]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import sys
import tempfile


def _op_table(trace_dir, n_steps):
    files = sorted(
        glob.glob(trace_dir + "/plugins/profile/*/*.trace.json.gz")
    )
    if not files:
        return 0.0, [], {}
    with gzip.open(files[-1]) as fh:
        d = json.load(fh)
    ev = d.get("traceEvents", [])
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in ev
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    devpids = {p for p, name in pids.items() if "TPU" in name}
    if not devpids:  # CPU backend: fall back to the host-CPU op lanes
        devpids = {p for p, name in pids.items() if "CPU" in name}
    step_tids = {
        (e["pid"], e["tid"])
        for e in ev
        if e.get("ph") == "M" and e.get("name") == "thread_name"
        and "step" in str(e["args"].get("name", "")).lower()
    }
    agg = collections.Counter()
    src = {}
    total = 0.0
    for e in ev:
        if (
            e.get("ph") == "X"
            and e.get("pid") in devpids
            and (e.get("pid"), e.get("tid")) not in step_tids
            and not e.get("name", "").startswith("jit_")
            and not e.get("name", "").isdigit()
        ):
            agg[e["name"]] += e.get("dur", 0)
            total += e.get("dur", 0)
            a = e.get("args", {})
            if e["name"] not in src and (a.get("source") or a.get("tf_op")):
                src[e["name"]] = (
                    a.get("source", ""), a.get("tf_op", "")
                )
    return total / n_steps / 1e3, agg, src


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--mode", choices=["sequential", "train"],
                   default="sequential")
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--dtype", choices=["float32", "bfloat16"],
                   default="float32")
    p.add_argument("--accelerate", action="store_true")
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--group", type=int, default=0,
                   help="aggregate device time by the first N module-path "
                        "segments of each op's tf_op annotation")
    p.add_argument("--steps", type=int, default=5,
                   help="steps per trace (keep total device time < ~7 s "
                        "or the profiler buffer overflows)")
    p.add_argument("--cfg-options", nargs="*", default=[])
    args = p.parse_args(argv)

    from ..utils.platform import apply_platform_env, enable_compile_cache

    apply_platform_env()
    enable_compile_cache()

    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..builder import build_model
    from ..config import Config
    from ..inference import decode_predictions
    from ..models.detectors import RCBEVDet
    from ..utils.platform import (
        tpu_compiler_options, tpu_train_compiler_options,
    )

    sys.path.insert(0, ".")
    from __graft_entry__ import _example_batch

    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_options(
            dict(kv.split("=", 1) for kv in args.cfg_options)
        )
    if args.dtype == "bfloat16":
        if args.mode == "train":
            p.error("--dtype bfloat16 is inference-only")
        cfg.model["compute_dtype"] = "bfloat16"
    model, mcfg = build_model(cfg)
    rng = np.random.default_rng(0)
    b = args.batch_size
    full = _example_batch(mcfg, b=b, rng=rng)
    variables = model.init(
        jax.random.PRNGKey(0),
        jax.tree_util.tree_map(lambda x: x[:1], full), train=False,
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
        full = dict(full, imgs=full["imgs"].astype(jnp.bfloat16))

    if args.mode == "train":
        from ..training.train_step import (
            create_train_state, make_optimizer, make_train_step,
        )

        hf, wf = mcfg.input_size
        ny = nx = mcfg.bev_size
        full["heatmap_t"] = (
            jnp.zeros((b, mcfg.num_classes, ny, nx))
            .at[:, 0, ny // 2, nx // 2].set(1.0)
        )
        full["anno_box_t"] = jnp.zeros((b, 100, 10))
        full["inds_t"] = jnp.zeros((b, 100), jnp.int32)
        full["mask_t"] = jnp.zeros((b, 100)).at[:, 0].set(1.0)
        full["gt_depth"] = (
            jnp.zeros((b, 6, hf, wf)).at[:, :, ::7, ::11].set(3.0)
        )
        # the shipped train pooling path: loader-precomputed tables
        from ..models.view_transformer import make_lss_pool_transform

        tfm = make_lss_pool_transform(mcfg)
        full_np = tfm({k: np.asarray(v) for k, v in full.items()})
        full["lss_pool"] = jax.tree_util.tree_map(
            jnp.asarray, full_np["lss_pool"]
        )
        tx = make_optimizer(
            params=variables["params"], freeze_img=mcfg.freeze_img,
        )
        state = create_train_state(model, variables, tx)
        step = jax.jit(
            make_train_step(model, tx, mcfg), donate_argnums=(0,),
            compiler_options=tpu_train_compiler_options(),
        )
        holder = {"state": state}

        def fn():
            new_state, metrics = step(holder["state"], full)
            holder["state"] = new_state
            return metrics["loss"]

    else:
        key_batch = {
            k: (v[:, 0:1] if k in ("imgs", "sensor2keyegos", "intrins",
                                   "post_rots", "post_trans") else v)
            for k, v in full.items()
        }
        ny = nx = mcfg.bev_size
        prev_bev = jnp.zeros(
            (b, mcfg.num_adj, ny, nx, mcfg.num_trans_channels),
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

        fn = lambda: step(variables, key_batch, prev_bev, prev_s2k,
                          pool_meta)

    out = fn()
    jax.block_until_ready(out)
    for _ in range(3):
        out = fn()
    jax.block_until_ready(out)

    tdir = tempfile.mkdtemp(prefix="profile_step_")
    with jax.profiler.trace(tdir):
        o = None
        for _ in range(args.steps):
            o = fn()
        jax.block_until_ready(o)

    total_ms, agg, src = _op_table(tdir, args.steps)
    print(f"mode={args.mode} B={b} dtype={args.dtype}: "
          f"{total_ms:.2f} ms/step device "
          f"({total_ms / max(b, 1):.2f} ms/frame)")
    if args.group:
        # aggregate by the module-path prefix of the tf_op annotation
        # (first `--group` path segments after the jit wrapper), so the
        # long tail of per-layer convs rolls up into per-module totals
        grouped = collections.Counter()
        for name, us in agg.items():
            t_ = src.get(name, ("", ""))[1]
            parts = [s for s in t_.split("/") if s][1:]  # drop jit(step)
            key = "/".join(parts[: args.group]) if parts else "(unattributed)"
            grouped[key] += us
        for key, us in grouped.most_common(args.top):
            print(f"{us / args.steps / 1e3:9.3f} ms  {key[:100]}")
        return 0
    for name, us in agg.most_common(args.top):
        s_, t_ = src.get(name, ("", ""))
        s_short = s_.split("/")[-1][:30]
        print(f"{us / args.steps / 1e3:9.3f} ms  {name[:44]:44s} "
              f"{s_short:30s} {t_[:80]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
