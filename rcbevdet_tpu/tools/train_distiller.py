"""Distillation trainer CLI — counterpart of the reference's
tools/distill_tools/train_distiller.py (+ mmdet3d.apis.train_distill_model).

Distills a radar-camera teacher (the config's model) into a camera-only
student: detection + depth losses plus PKD feature imitation on the fused
pre-head BEV and spatial-KL response distillation
(models/losses/pkd_loss.py, unidistill_loss.py).

Usage:
  python -m rcbevdet_tpu.tools.train_distiller <config.py> --synthetic
      [--teacher-checkpoint DIR] [--epochs N] [--dry-run]

Without --teacher-checkpoint the teacher runs from random init (useful only
for smoke tests; pass the trained RC checkpoint for real distillation).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import logging
import sys

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Distill RCBEVDet -> camera-only")
    p.add_argument("config")
    p.add_argument("--work-dir", default="work_dirs/distill")
    p.add_argument("--teacher-checkpoint", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--num-synthetic", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--dry-run", action="store_true")
    p.add_argument("--pkd-weight", type=float, default=1.0)
    p.add_argument("--kd-weight", type=float, default=1.0)
    p.add_argument("--kd-tau", type=float, default=1.0)
    p.add_argument("--cfg-options", nargs="*", default=[])
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")

    import os

    from ..utils.platform import apply_platform_env, enable_compile_cache

    apply_platform_env(num_cpu_devices=int(
        os.environ.get("RCBEV_NUM_CPU_DEVICES", 0)) or None)
    enable_compile_cache()

    import jax

    from ..builder import build_dataset, build_image_aug_config, build_model
    from ..config import Config
    from ..data.dataset import collate_samples
    from ..models import RCBEVDet
    from ..training.checkpoint import restore_checkpoint, save_checkpoint
    from ..training.distill import Distiller, make_distill_train_step
    from ..training.train_step import create_train_state, make_optimizer

    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_options(dict(kv.split("=", 1) for kv in args.cfg_options))

    teacher, tcfg_model = build_model(cfg)
    # student: same camera branch, no radar, everything trainable
    scfg = dataclasses.replace(
        tcfg_model, use_radar=False, freeze_img=False
    )
    student = RCBEVDet(scfg)

    if args.synthetic:
        from ..data.synthetic import synthetic_sample

        tcfg = cfg.get("train_cfg", {})
        _, dataset = synthetic_sample(
            num_samples=args.num_synthetic,
            num_adj=tcfg_model.num_adj,
            img_config=build_image_aug_config(cfg),
            point_cloud_range=tcfg_model.point_cloud_range,
            radar_max_num=cfg.data.get("radar_max_num", 1200),
            grid_size=tuple(tcfg.get("grid_size", (1024, 1024))[:2]),
            voxel_size=tuple(tcfg.get("voxel_size", (0.1, 0.1))[:2]),
            correlated_radar=True,
        )
    else:
        dataset = build_dataset(cfg, "train")

    batch_size = args.batch_size or cfg.data.get("samples_per_gpu", 8)
    max_epochs = args.epochs or cfg.runner["max_epochs"]

    sample0 = dict(dataset[0])
    sample0.pop("token", None)
    init_batch = collate_samples([sample0])
    init_batch = {k: np.asarray(v) for k, v in init_batch.items()}

    rng = jax.random.PRNGKey(args.seed)
    teacher_variables = teacher.init(rng, init_batch, train=False)
    if args.teacher_checkpoint:
        from ..training.checkpoint import restore_variables

        teacher_variables = restore_variables(
            args.teacher_checkpoint, teacher_variables
        )

    distiller = Distiller(
        student=student, pkd_weight=args.pkd_weight,
        kd_weight=args.kd_weight, kd_tau=args.kd_tau,
    )

    def init_distiller():
        preds_t, _, feats_t = teacher.apply(
            teacher_variables, init_batch, train=False, return_feats=True
        )
        return distiller.init(
            rng, init_batch, feats_t, preds_t, train=False
        )

    variables = init_distiller()
    steps_per_epoch = max(len(dataset) // batch_size, 1)
    tx = make_optimizer(
        base_lr=cfg.optimizer["lr"],
        weight_decay=cfg.optimizer["weight_decay"],
        total_steps=max_epochs * steps_per_epoch,
        grad_clip=cfg.optimizer_config["grad_clip"]["max_norm"],
        freeze_img=False,
    )
    state = create_train_state(distiller, variables, tx)
    from ..utils.platform import tpu_train_compiler_options

    step_fn = jax.jit(
        make_distill_train_step(distiller, teacher, teacher_variables, tx,
                                scfg),
        compiler_options=tpu_train_compiler_options(),
    )

    os.makedirs(args.work_dir, exist_ok=True)
    n_steps = 2 if args.dry_run else max_epochs * steps_per_epoch
    order = np.arange(len(dataset))
    rng_np = np.random.default_rng(args.seed)
    log = logging.getLogger("distill")
    for it in range(n_steps):
        if it % steps_per_epoch == 0:
            rng_np.shuffle(order)
        sel = [
            int(order[(it * batch_size + j) % len(dataset)])
            for j in range(batch_size)
        ]
        samples = []
        for i in sel:
            s = dict(dataset[i])
            s.pop("token", None)
            samples.append(s)
        batch = collate_samples(samples)
        state, metrics = step_fn(state, batch)
        if it % 10 == 0 or args.dry_run:
            m = {k: round(float(v), 5)
                 for k, v in jax.device_get(metrics).items()}
            log.info(json.dumps({"iter": it, **m}))
    if args.dry_run:
        m = {k: round(float(v), 5) for k, v in jax.device_get(metrics).items()}
        print(json.dumps({"dry_run": True, **m}))
        return 0
    save_checkpoint(os.path.join(args.work_dir, "student_final"), state)
    return 0


if __name__ == "__main__":
    sys.exit(main())
