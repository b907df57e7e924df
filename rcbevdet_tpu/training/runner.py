"""Epoch-based training runner with hooks.

The thin Python shell around the jitted train step — the counterpart of
mmcv's ``EpochBasedRunner`` + hook registrations (reference
apis/train.py:181-326): epoch loop, CBGS index resampling, cyclic schedules
(inside the optimizer), EMA (inside the train step), checkpointing (orbax),
periodic logging, SequentialControl (with_prev toggle at a given epoch),
eval every N epochs.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Callable, Dict, Optional

import jax
import numpy as np

from ..data.dataset import cbgs_indices
from ..data.loader import PrefetchLoader
from ..parallel.mesh import create_mesh, replicate, shard_host_local_batch
from ..parallel.multihost import host_local_slice
from .checkpoint import save_checkpoint
from .train_step import TrainState, create_train_state, make_optimizer, make_train_step

log = logging.getLogger("rcbevdet_tpu")


class Runner:
    def __init__(
        self,
        model,
        model_cfg,
        dataset,
        batch_size=8,
        max_epochs=12,
        base_lr=1e-4,
        weight_decay=1e-2,
        grad_clip=5.0,
        use_cbgs=True,
        work_dir="work_dirs/default",
        log_interval=50,
        checkpoint_interval=1,
        temporal_start_epoch=-1,
        fade_epoch=-1,
        eval_fn: Optional[Callable] = None,
        eval_interval=4,
        seed=0,
        mesh=None,
        init_variables=None,
        auto_resume=True,
        cumulative_iters=1,
        sampler="shuffle",
        lss_pool_meta=False,
    ):
        self.model = model
        self.model_cfg = model_cfg
        self.dataset = dataset
        self.batch_size = batch_size
        self.max_epochs = max_epochs
        self.work_dir = work_dir
        self.log_interval = log_interval
        self.checkpoint_interval = checkpoint_interval
        self.temporal_start_epoch = temporal_start_epoch
        # FadeOjectSampleHook counterpart (core/hook/fade_hook.py): disable
        # GT-paste augmentation from this epoch on (-1 = never fade)
        self.fade_epoch = fade_epoch
        self.eval_fn = eval_fn
        self.eval_interval = eval_interval
        os.makedirs(work_dir, exist_ok=True)

        self.mesh = mesh or create_mesh()
        rng = np.random.default_rng(seed)
        # 'group_stream' = per-slot continuous scene streaming (reference
        # InfiniteGroupEachSampleInBatchSampler, group_sampler.py:154);
        # mutually exclusive with CBGS resampling like the reference
        self.sampler_kind = sampler
        self.group_sampler = None
        if sampler == "group_stream":
            from ..data.samplers import (
                InfiniteGroupStreamSampler,
                scene_flags,
            )

            self.group_sampler = InfiniteGroupStreamSampler(
                scene_flags(dataset), batch_size, seed=seed
            )
            self.indices = list(range(len(dataset)))
        else:
            self.indices = (
                cbgs_indices(dataset, rng) if use_cbgs
                else list(range(len(dataset)))
            )
        self.steps_per_epoch = max(len(self.indices) // batch_size, 1)
        # schedules advance once per optimizer APPLY (make_optimizer docs)
        total_steps = max(
            self.steps_per_epoch * max_epochs // max(cumulative_iters, 1), 1
        )

        # each host collates only its slice of every global batch (the
        # schedule itself is seed-identical across hosts); single-process
        # runs get the full batch
        self.local_slice = host_local_slice(batch_size)
        # lss_pool_meta: precompute the fixed-capacity LSS pooling tables
        # in the prefetch workers (ROADMAP r5 lever 1) — the train step
        # then runs the accelerate-mode gather+splat instead of the
        # 42 ms/step dense scatter
        transform = None
        if lss_pool_meta:
            from ..models.view_transformer import make_lss_pool_transform

            transform = make_lss_pool_transform(model_cfg)
        self.loader = PrefetchLoader(
            dataset, batch_size, indices=self.indices, seed=seed,
            local_slice=self.local_slice, transform=transform,
        )
        self.is_main = jax.process_index() == 0

        if init_variables is None:
            sample = dataset[0]
            from ..data.dataset import collate_samples

            batch = collate_samples([sample] * batch_size)
            batch.pop("token", None)
            batch.pop("gt_attrs", None)
            init_variables = model.init(
                jax.random.PRNGKey(seed),
                jax.tree_util.tree_map(lambda x: x[:1], batch),
                train=False,
            )
        self.tx = make_optimizer(
            base_lr=base_lr, weight_decay=weight_decay, total_steps=total_steps,
            grad_clip=grad_clip, freeze_img=model_cfg.freeze_img,
            params=init_variables["params"],
            cumulative_iters=cumulative_iters,
        )
        state = create_train_state(model, init_variables, self.tx)
        self.start_epoch = 0
        if auto_resume:
            # crash recovery: resume from the newest epoch checkpoint in the
            # work dir (the reference's auto_resume / find_latest_checkpoint,
            # apis/train.py:315-320)
            from .checkpoint import find_latest_checkpoint, restore_checkpoint

            latest = find_latest_checkpoint(work_dir)
            if latest is not None:
                try:
                    state = restore_checkpoint(latest, state)
                    self.start_epoch = int(latest.rsplit("_", 1)[1])
                    log.info("auto-resumed from %s", latest)
                except Exception as e:  # incompatible/corrupt checkpoint
                    log.warning("auto-resume from %s failed (%s); "
                                "starting fresh", latest, e)
        self.state = replicate(self.mesh, state)

        self._steps = {}  # with_prev -> jitted step

        # TensorBoard scalars mirroring the reference's TensorboardLoggerHook
        # (configs/_base_/default_runtime.py:6-11, every log_interval iters);
        # degrades to JSONL-only when tensorboard isn't importable
        self.tb = None
        if self.is_main:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.tb = SummaryWriter(
                    log_dir=os.path.join(self.work_dir, "tf_logs")
                )
            except Exception:
                pass

    def _get_step(self, with_prev: bool):
        if with_prev not in self._steps:
            fn = make_train_step(
                self.model, self.tx, self.model_cfg, with_prev=with_prev
            )
            from ..utils.platform import tpu_train_compiler_options

            self._steps[with_prev] = jax.jit(
                fn, donate_argnums=(0,),
                compiler_options=tpu_train_compiler_options(),
            )
        return self._steps[with_prev]

    def run(self):
        global_step = self.start_epoch * self.steps_per_epoch
        for epoch in range(self.start_epoch, self.max_epochs):
            with_prev = epoch >= self.temporal_start_epoch
            if self.fade_epoch >= 0 and epoch >= self.fade_epoch and getattr(
                self.dataset, "object_sample_enabled", False
            ):
                self.dataset.object_sample_enabled = False
                log.info("epoch %d: object-sample augmentation faded out",
                         epoch)
            step_fn = self._get_step(with_prev)
            if self.group_sampler is not None:
                # scene streams persist ACROSS epochs: each epoch takes the
                # next steps_per_epoch batches of the infinite schedule
                self.loader.batch_schedule = self.group_sampler.take(
                    self.steps_per_epoch
                )
            t0 = time.time()
            for it, batch in enumerate(self.loader):
                batch.pop("token", None)
                batch.pop("gt_attrs", None)
                batch = shard_host_local_batch(self.mesh, batch)
                self.state, metrics = step_fn(self.state, batch)
                global_step += 1
                if self.is_main and global_step % self.log_interval == 0:
                    m = {k: float(v) for k, v in jax.device_get(metrics).items()}
                    dt = (time.time() - t0) / self.log_interval
                    t0 = time.time()
                    log.info(
                        "epoch %d iter %d/%d %.2fs/it %s",
                        epoch, it, self.steps_per_epoch, dt,
                        json.dumps({k: round(v, 4) for k, v in m.items()}),
                    )
                    if self.tb is not None:
                        for k, v in m.items():
                            self.tb.add_scalar(
                                f"train/{k}", v, global_step
                            )
                        self.tb.add_scalar("train/s_per_it", dt, global_step)
            if self.is_main and (epoch + 1) % self.checkpoint_interval == 0:
                # params/opt state are replicated, so process 0's copy is the
                # global state; other hosts must not race on the same path
                save_checkpoint(
                    os.path.join(self.work_dir, f"epoch_{epoch + 1}"),
                    jax.device_get(self.state),
                )
            if self.eval_fn and (epoch + 1) % self.eval_interval == 0:
                metrics = self.eval_fn(self.state)
                if self.is_main:
                    log.info("eval epoch %d: %s", epoch + 1, json.dumps(metrics))
                    with open(
                        os.path.join(self.work_dir, "eval_metrics.jsonl"), "a"
                    ) as f:
                        f.write(json.dumps(
                            {"epoch": epoch + 1, **metrics}
                        ) + "\n")
                    if self.tb is not None:
                        for k, v in metrics.items():
                            if isinstance(v, (int, float)):
                                self.tb.add_scalar(f"val/{k}", v, epoch + 1)
        if self.tb is not None:
            self.tb.close()
        return self.state
