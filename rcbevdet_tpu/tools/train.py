"""Training CLI — counterpart of the reference's tools/train.py:127-283.

Usage:
  python -m rcbevdet_tpu.tools.train <config.py> [--work-dir D]
      [--cfg-options k=v ...] [--synthetic] [--dry-run] [--resume-from P]

``--synthetic`` swaps the nuScenes dataset for the synthetic pipeline
(shapes and calibration structure identical) so the full trainer can run in
environments without data.  ``--dry-run`` runs two steps and exits, printing
one JSON line of metrics.
"""

from __future__ import annotations

import argparse
import json
import logging
import sys

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Train an RCBEVDet-TPU model")
    p.add_argument("config")
    p.add_argument("--work-dir", default=None)
    p.add_argument("--resume-from", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument(
        "--num-synthetic", type=int, default=None,
        help="synthetic dataset size (default: num_adj + 2)",
    )
    p.add_argument(
        "--correlated-radar", action="store_true",
        help="synthetic radar clusters at GT centers (learnable task)",
    )
    p.add_argument("--dry-run", action="store_true")
    p.add_argument(
        "--no-eval", action="store_true",
        help="skip the every-N-epochs validation loop",
    )
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument(
        "--cfg-options", nargs="*", default=[],
        help="override config entries: key.sub=value",
    )
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")

    import os

    from ..utils.platform import apply_platform_env, enable_compile_cache

    apply_platform_env(num_cpu_devices=int(
        os.environ.get("RCBEV_NUM_CPU_DEVICES", 0)) or None)
    enable_compile_cache()

    from ..builder import build_dataset, build_model
    from ..config import Config
    from ..training.runner import Runner
    from ..training.checkpoint import restore_checkpoint

    # multi-host launch (replaces tools/dist_train.sh NNODES/NODE_RANK):
    # initialize the JAX multi-controller runtime when the env asks for it
    if os.environ.get("JAX_NUM_PROCESSES") or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    ):
        from ..parallel.multihost import initialize

        initialize()

    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_options(dict(kv.split("=", 1) for kv in args.cfg_options))

    model, mcfg = build_model(cfg)

    eval_dataset = None
    if args.synthetic:
        from ..builder import build_image_aug_config
        from ..data.synthetic import synthetic_sample

        tcfg = cfg.get("train_cfg", {})
        common = dict(
            num_adj=mcfg.num_adj,
            img_config=build_image_aug_config(cfg),
            point_cloud_range=mcfg.point_cloud_range,
            radar_max_num=cfg.data.get("radar_max_num", 1200),
            grid_size=tuple(tcfg.get("grid_size", (1024, 1024))[:2]),
            voxel_size=tuple(tcfg.get("voxel_size", (0.1, 0.1))[:2]),
            stereo=mcfg.stereo,
            correlated_radar=args.correlated_radar,
        )
        _, dataset = synthetic_sample(
            num_samples=args.num_synthetic,
            with_hop_targets=mcfg.with_hop,
            hop_aux_task_groups=(
                mcfg.hop_aux_task_groups if mcfg.with_hop else None
            ),
            **common,
        )
        if not args.no_eval:
            # held-out split: a different seed and no train-time augmentation
            _, eval_dataset = synthetic_sample(
                rng=np.random.default_rng(10_000 + args.seed),
                num_samples=max((args.num_synthetic or 8) // 4, 4),
                is_train=False, **common,
            )
    else:
        dataset = build_dataset(cfg, "train")
        if not args.no_eval:
            try:
                eval_dataset = build_dataset(cfg, "val")
            except Exception:
                eval_dataset = None

    batch_size = args.batch_size or cfg.data.get("samples_per_gpu", 8)
    max_epochs = 1 if args.dry_run else cfg.runner["max_epochs"]
    eval_fn = None
    if eval_dataset is not None and not args.dry_run:
        from ..builder import build_test_cfg
        from ..evaluation.loop import make_eval_fn

        # eval_use_ema=False is right for from-scratch short runs: the EMA
        # ramp starts at init_updates=10560 (a fine-tuning recipe), so EMA
        # params barely move over a few hundred steps
        eval_fn = make_eval_fn(model, eval_dataset,
                               test_cfg=build_test_cfg(cfg),
                               use_ema=cfg.get("eval_use_ema", True))
    runner = Runner(
        model, mcfg, dataset,
        batch_size=batch_size,
        max_epochs=max_epochs,
        base_lr=cfg.optimizer["lr"],
        weight_decay=cfg.optimizer["weight_decay"],
        grad_clip=cfg.optimizer_config["grad_clip"]["max_norm"],
        use_cbgs=cfg.data.get("cbgs", True) and not args.synthetic,
        work_dir=args.work_dir or f"work_dirs/{cfg.filename.split('/')[-1][:-3]}",
        log_interval=cfg.get("log_interval", 50),
        checkpoint_interval=cfg.get("checkpoint_interval", 1),
        temporal_start_epoch=cfg.get("sequential_control", {}).get(
            "temporal_start_epoch", -1
        ),
        eval_fn=eval_fn,
        eval_interval=cfg.get("eval_interval", 4),
        seed=args.seed,
        fade_epoch=cfg.get("fade_epoch", -1),
        # reference: GradientCumulativeOptimizerHook when cumulative_iters
        # is present in optimizer_config (apis/train.py:270-272)
        cumulative_iters=cfg.optimizer_config.get("cumulative_iters", 1),
        # loader-precomputed accelerate-mode train pooling (cfg key or
        # --cfg-options lss_pool_meta=True)
        lss_pool_meta=bool(cfg.get("lss_pool_meta", False)),
    )
    if args.resume_from:
        runner.state = restore_checkpoint(args.resume_from, runner.state)
        # Resume the epoch loop too (else max_epochs EXTRA epochs run, the
        # with_prev toggle sees the wrong epoch, and checkpoint numbering
        # restarts): derive it from the restored optimizer step, like the
        # auto-resume path derives it from the checkpoint dir name.
        import jax as _jax

        runner.start_epoch = int(
            _jax.device_get(runner.state.step)
        ) // runner.steps_per_epoch

    if args.dry_run:
        import jax
        from ..data.dataset import collate_samples
        from ..parallel.mesh import shard_batch

        step_fn = runner._get_step(True)
        batch = collate_samples([dataset[0]] * batch_size)
        batch.pop("token", None)
        batch.pop("gt_attrs", None)  # host-side eval metadata, not jax-able
        batch = shard_batch(runner.mesh, batch)
        for _ in range(2):
            runner.state, metrics = step_fn(runner.state, batch)
        out = {k: float(v) for k, v in jax.device_get(metrics).items()}
        print(json.dumps({"dry_run": True, **{k: round(v, 5) for k, v in out.items()}}))
        return 0

    runner.run()
    return 0


if __name__ == "__main__":
    sys.exit(main())
