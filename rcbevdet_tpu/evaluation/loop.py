"""Validation loop hooked into the Runner.

Counterpart of the reference's DistEvalHook-every-N-epochs
(apis/train.py:276-326 + nuscenes_dataset_rc.py:481-538): run inference
over a held-out dataset, decode + NMS, and score with the built-in
nuScenes-protocol evaluator.  The returned callable plugs into
``Runner(eval_fn=...)`` and is called with the live TrainState.
"""

from __future__ import annotations

from typing import Optional

import functools

import jax
import numpy as np

from ..data.dataset import collate_samples
from ..inference import RC_TEST_CFG, decode_predictions, postprocess_sample
from .nuscenes_metrics import evaluate_detections


def make_eval_fn(
    model,
    dataset,
    test_cfg=RC_TEST_CFG,
    batch_size: int = 1,
    max_samples: Optional[int] = None,
    use_ema: bool = True,
):
    """Build an eval callable: TrainState -> metrics dict (mAP/NDS/...).

    EMA weights (+ EMA batch stats) are evaluated by default, matching the
    reference which validates/releases the EMA checkpoint.
    """

    from ..utils.platform import tpu_compiler_options

    @functools.partial(jax.jit, compiler_options=tpu_compiler_options())
    def forward(variables, batch):
        preds, _ = model.apply(variables, batch, train=False)
        return decode_predictions(preds, test_cfg)

    n = len(dataset) if max_samples is None else min(max_samples, len(dataset))

    def eval_fn(state):
        if use_ema:
            variables = {"params": state.ema_params,
                         "batch_stats": state.ema_batch_stats}
        else:
            variables = {"params": state.params,
                         "batch_stats": state.batch_stats}
        variables = jax.device_get(variables)
        predictions, gts = {}, {}
        for start in range(0, n, batch_size):
            idxs = list(range(start, min(start + batch_size, n)))
            samples = [dataset[i] for i in idxs]
            batch = collate_samples(samples)
            tokens = batch.pop("token")
            batch.pop("gt_attrs", None)  # host-side metadata, not jittable
            dec = jax.device_get(forward(variables, batch))
            for bi, tok in enumerate(tokens):
                predictions[tok] = postprocess_sample(
                    dec.bboxes[bi], dec.scores[bi], dec.labels[bi],
                    dec.valid[bi], test_cfg,
                )
                gb = samples[bi]["gt_boxes"]
                gl = samples[bi]["gt_labels"]
                ga = samples[bi].get(
                    "gt_attrs", np.asarray([""] * len(gl), object))
                keep = gl >= 0
                gts[tok] = (gb[keep], gl[keep], list(ga[keep]))
        metrics = evaluate_detections(predictions, gts)
        return {k: float(v) for k, v in metrics.items()}

    return eval_fn
