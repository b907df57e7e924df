"""Inference post-processing: decode + Scale-NMS, host-side.

Equivalent of the reference's ``simple_test_pts`` -> ``get_bboxes`` ->
``get_task_detections`` chain (centerpoint.py:85, centerpoint_head.py:685,
:815-886): the device emits dense head maps; decoding to top-K boxes happens
jitted (core/coders.py); rotated Scale-NMS runs on host over <=500 masked
candidates per sample.
"""

from __future__ import annotations

from typing import Dict, Sequence

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .core.coders import centerpoint_decode
from .core.nms import circle_nms_np, scale_nms_np

RC_TEST_CFG = dict(
    pc_range=(-51.2, -51.2),
    voxel_size=(0.1, 0.1),
    out_size_factor=8,
    post_center_range=(-61.2, -61.2, -10.0, 61.2, 61.2, 10.0),
    max_num=500,
    score_threshold=0.1,
    nms_type="rotate",
    nms_thr=0.2,
    nms_rescale_factor=(1.0, 0.7, 0.7, 0.4, 0.55, 1.1, 1.0, 1.0, 1.5, 3.5),
    pre_max_size=1000,
    post_max_size=500,
    min_radius=(4, 12, 10, 1, 0.85, 0.175),
)


def decode_predictions(preds, test_cfg=RC_TEST_CFG):
    """Jittable part: head maps -> top-K candidate boxes."""
    heat = jax.nn.sigmoid(preds["heatmap"])
    dim = jnp.exp(preds["dim"])  # norm_bbox=True
    rot_sine = preds["rot"][..., 0:1]
    rot_cosine = preds["rot"][..., 1:2]
    return centerpoint_decode(
        heat, rot_sine, rot_cosine, preds["height"], dim, preds["vel"],
        preds["reg"],
        pc_range=test_cfg["pc_range"],
        voxel_size=test_cfg["voxel_size"],
        out_size_factor=test_cfg["out_size_factor"],
        post_center_range=test_cfg["post_center_range"],
        max_num=test_cfg["max_num"],
        score_threshold=test_cfg["score_threshold"],
    )


def decode_predictions_multi(task_preds, task_groups, test_cfg=RC_TEST_CFG):
    """Decode a MultiTaskCenterHead's per-task outputs and merge with global
    class ids (reference get_bboxes merges task results with label offsets,
    centerpoint_head.py:768-786)."""
    from .core.coders import DecodedBoxes

    parts = []
    for preds, group in zip(task_preds, task_groups):
        dec = decode_predictions(preds, test_cfg)
        glob = jnp.asarray(group, jnp.int32)[dec.labels]
        parts.append(dec._replace(labels=glob))
    return DecodedBoxes(
        bboxes=jnp.concatenate([p.bboxes for p in parts], axis=1),
        scores=jnp.concatenate([p.scores for p in parts], axis=1),
        labels=jnp.concatenate([p.labels for p in parts], axis=1),
        valid=jnp.concatenate([p.valid for p in parts], axis=1),
    )


def postprocess_sample(boxes, scores, labels, valid, test_cfg=RC_TEST_CFG):
    """Host-side NMS for one sample; returns filtered numpy arrays."""
    boxes = np.asarray(boxes)[np.asarray(valid)]
    scores = np.asarray(scores)[np.asarray(valid)]
    labels = np.asarray(labels)[np.asarray(valid)]
    if len(boxes) == 0:
        return boxes.reshape(0, 9), scores, labels
    if test_cfg["nms_type"] == "rotate":
        keep = scale_nms_np(
            boxes, scores, labels, test_cfg["nms_thr"],
            test_cfg["nms_rescale_factor"],
            pre_max_size=test_cfg["pre_max_size"],
            post_max_size=test_cfg["post_max_size"],
        )
    else:  # circle NMS on centers, applied per task like the reference
        # (centerpoint_head.py:730-744: min_radius is indexed by task_id and
        # is a SQUARED-distance threshold).  task_groups lists the global
        # class ids of each task; the default single-task head uses
        # min_radius[0] over all classes, exactly like the reference's
        # single-task camera configs.
        min_radius = test_cfg["min_radius"]
        groups = test_cfg.get("task_groups")
        if groups is None:
            groups = [list(range(int(labels.max()) + 1 if len(labels) else 1))]
        if not isinstance(min_radius, (list, tuple)):
            min_radius = [min_radius] * len(groups)
        keep_parts = []
        for task_id, group in enumerate(groups):
            sel = np.flatnonzero(np.isin(labels, group))
            if len(sel) == 0:
                continue
            cand = np.concatenate([boxes[sel, :2], scores[sel, None]], 1)
            kept = circle_nms_np(
                cand, min_radius[task_id],
                post_max_size=test_cfg["post_max_size"],
            )
            keep_parts.append(sel[kept])
        keep = (
            np.concatenate(keep_parts)
            if keep_parts else np.zeros((0,), np.int64)
        )
    return boxes[keep], scores[keep], labels[keep]


def predict(model, variables, batch, tokens=None, test_cfg=RC_TEST_CFG,
            apply_fn=None):
    """Full inference for one batch: forward -> decode (jitted) -> NMS (host).

    Returns {token or index: (boxes, scores, labels)}.
    """
    if apply_fn is None:
        from .utils.platform import tpu_compiler_options

        @functools.partial(jax.jit, compiler_options=tpu_compiler_options())
        def apply_fn(variables, batch):
            preds, _ = model.apply(variables, batch, train=False)
            return decode_predictions(preds, test_cfg)

    dec = apply_fn(variables, batch)
    # one batched transfer: per-slice np.asarray would round-trip the
    # device once per sample (and this harness's tunneled TPU pays ~100 ms
    # latency per fetch)
    bboxes, scores, labels, valid = jax.device_get(
        (dec.bboxes, dec.scores, dec.labels, dec.valid)
    )
    out = {}
    for i in range(bboxes.shape[0]):
        key = tokens[i] if tokens is not None else i
        out[key] = postprocess_sample(
            bboxes[i], scores[i], labels[i], valid[i], test_cfg
        )
    return out
