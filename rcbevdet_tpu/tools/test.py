"""Evaluation CLI — counterpart of the reference's tools/test.py.

Runs inference over the val split, formats nuScenes JSON, and computes
NDS/mAP via the built-in evaluator (or nuscenes-devkit when installed).

Usage:
  python -m rcbevdet_tpu.tools.test <config.py> <checkpoint> [--synthetic]
      [--out results.json] [--eval]
"""

from __future__ import annotations

import argparse
import json
import logging
import sys

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Evaluate an RCBEVDet-TPU model")
    p.add_argument("config")
    p.add_argument("checkpoint", nargs="?", default=None)
    p.add_argument("--out", default=None, help="write results_nusc.json here")
    p.add_argument("--eval", action="store_true", help="compute NDS/mAP")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--max-samples", type=int, default=None)
    p.add_argument("--use-ema", action="store_true", default=True)
    p.add_argument("--cfg-options", nargs="*", default=[])
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")

    from ..utils.platform import apply_platform_env, enable_compile_cache

    apply_platform_env()
    enable_compile_cache()

    import jax

    from ..builder import build_dataset, build_model, build_test_cfg
    from ..config import Config
    from ..data.dataset import collate_samples
    from ..evaluation.format import format_nuscenes_results
    from ..evaluation.nuscenes_metrics import evaluate_detections
    from ..inference import decode_predictions, postprocess_sample
    from ..training.checkpoint import restore_checkpoint

    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_options(dict(kv.split("=", 1) for kv in args.cfg_options))
    model, mcfg = build_model(cfg)
    test_cfg = build_test_cfg(cfg)

    if args.synthetic:
        from ..builder import build_image_aug_config
        from ..data.synthetic import synthetic_sample

        tcfg = cfg.get("train_cfg", {})
        _, dataset = synthetic_sample(
            num_adj=mcfg.num_adj, is_train=False,
            img_config=build_image_aug_config(cfg),
            point_cloud_range=mcfg.point_cloud_range,
            radar_max_num=cfg.data.get("radar_max_num", 1200),
            grid_size=tuple(tcfg.get("grid_size", (1024, 1024))[:2]),
            voxel_size=tuple(tcfg.get("voxel_size", (0.1, 0.1))[:2]),
            stereo=mcfg.stereo,
        )
    else:
        dataset = build_dataset(cfg, "test")

    # init / load weights
    sample = dataset[0]
    batch0 = collate_samples([sample])
    batch0.pop("token", None)
    batch0.pop("gt_attrs", None)
    variables = model.init(jax.random.PRNGKey(0), batch0, train=False)
    if args.checkpoint:
        from ..training.train_step import TrainState, create_train_state, make_optimizer

        tx = make_optimizer(params=variables["params"], freeze_img=mcfg.freeze_img)
        state = create_train_state(model, variables, tx)
        state = restore_checkpoint(args.checkpoint, state)
        if args.use_ema:
            # EMA weights pair with EMA-averaged BN stats (reference ModelEMA
            # averages running_mean/var too, core/hook/ema.py:56-59)
            variables = {
                "params": state.ema_params,
                "batch_stats": state.ema_batch_stats,
            }
        else:
            variables = {
                "params": state.params, "batch_stats": state.batch_stats
            }

    @jax.jit
    def forward(variables, batch):
        preds, _ = model.apply(variables, batch, train=False)
        return decode_predictions(preds, test_cfg)

    predictions = {}
    gts = {}
    n = len(dataset) if args.max_samples is None else min(
        args.max_samples, len(dataset)
    )
    for start in range(0, n, args.batch_size):
        idxs = list(range(start, min(start + args.batch_size, n)))
        samples = [dataset[i] for i in idxs]
        batch = collate_samples(samples)
        tokens = batch.pop("token")
        batch.pop("gt_attrs", None)  # host-side metadata, not jittable
        dec = jax.device_get(forward(variables, batch))
        for bi, tok in enumerate(tokens):
            predictions[tok] = postprocess_sample(
                dec.bboxes[bi], dec.scores[bi], dec.labels[bi], dec.valid[bi],
                test_cfg,
            )
            gb, gl = samples[bi]["gt_boxes"], samples[bi]["gt_labels"]
            ga = samples[bi].get(
                "gt_attrs", np.asarray([""] * len(gl), object))
            keep = gl >= 0
            gts[tok] = (gb[keep], gl[keep], list(ga[keep]))
        logging.info("evaluated %d/%d", min(start + args.batch_size, n), n)

    if args.out:
        infos_by_token = {i["token"]: i for i in dataset.data_infos}
        format_nuscenes_results(
            predictions, infos_by_token, dataset.classes, out_path=args.out
        )
        logging.info("wrote %s", args.out)

    if args.eval or args.synthetic:
        metrics = evaluate_detections(predictions, gts)
        print(json.dumps({k: round(float(v), 4) for k, v in metrics.items()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
