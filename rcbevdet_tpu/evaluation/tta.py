"""Test-time augmentation: BEV-flip ensemble + NMS merge.

Counterpart of the reference's MultiScaleFlipAug3D wrapper
(datasets/pipelines/test_time_aug.py:1) + ``merge_aug_bboxes_3d``
(core/post_processing/merge_augs.py): run inference under horizontal /
vertical BEV flips, transform the decoded boxes back into the original
frame, and merge all candidates with one Scale-NMS pass.

The flips enter the model exactly the way training BDA does: pre-multiply
``bda`` (camera geometry flows through the LSS frustum transform) and
transform the radar points/velocities with the same matrix
(core/boxes.transform_radar_points_bda semantics, on-device here).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..inference import RC_TEST_CFG, decode_predictions, postprocess_sample

FLIPS = {
    "none": (False, False),
    "x": (True, False),
    "y": (False, True),
    "xy": (True, True),
}


def _flip_mat(flip_dx: bool, flip_dy: bool) -> jnp.ndarray:
    m = jnp.eye(3)
    if flip_dx:
        m = m.at[0, 0].set(-1.0)
    if flip_dy:
        m = m.at[1, 1].set(-1.0)
    return m


def flip_batch(batch: Dict, flip_dx: bool, flip_dy: bool) -> Dict:
    """Apply a BEV flip to a model input batch (bda + radar points)."""
    if not (flip_dx or flip_dy):
        return batch
    m = _flip_mat(flip_dx, flip_dy)
    out = dict(batch)
    out["bda"] = jnp.einsum("ij,bjk->bik", m, batch["bda"])
    if "radar_points" in batch:
        pts = batch["radar_points"]
        xyz = jnp.einsum("ij,bnj->bni", m, pts[..., :3])
        vel = jnp.einsum("ij,bnj->bni", m[:2, :2], pts[..., 3:5])
        out["radar_points"] = jnp.concatenate(
            [xyz, vel, pts[..., 5:]], axis=-1
        )
    return out


def unflip_boxes(boxes, flip_dx: bool, flip_dy: bool):
    """Map decoded boxes [N, 9] from the flipped frame back (a BEV flip is
    its own inverse; yaw per LoadAnnotationsBEVDepth.bev_transform,
    loading.py:2152-2183)."""
    boxes = np.array(boxes, copy=True)
    if len(boxes) == 0:
        return boxes
    if flip_dx:
        boxes[:, 0] = -boxes[:, 0]
        boxes[:, 6] = np.pi - boxes[:, 6]
        boxes[:, 7] = -boxes[:, 7]
    if flip_dy:
        boxes[:, 1] = -boxes[:, 1]
        boxes[:, 6] = -boxes[:, 6]
        boxes[:, 8] = -boxes[:, 8]
    return boxes


def predict_tta(
    model, variables, batch, test_cfg=RC_TEST_CFG,
    flips: Sequence[str] = ("none", "x", "y", "xy"),
):
    """Flip-ensemble inference for one batch.

    Returns {sample index: (boxes, scores, labels)} after the merged NMS.
    """
    from ..utils.platform import tpu_compiler_options

    @functools.partial(jax.jit, compiler_options=tpu_compiler_options())
    def forward(variables, batch):
        preds = model.apply(variables, batch, train=False)[0]
        return decode_predictions(preds, test_cfg)

    per_flip = []
    for name in flips:
        fdx, fdy = FLIPS[name]
        dec = forward(variables, flip_batch(batch, fdx, fdy))
        per_flip.append((jax.device_get(dec), fdx, fdy))

    b = per_flip[0][0].bboxes.shape[0]
    out = {}
    for i in range(b):
        boxes_all, scores_all, labels_all = [], [], []
        for dec, fdx, fdy in per_flip:
            valid = np.asarray(dec.valid[i])
            boxes = unflip_boxes(np.asarray(dec.bboxes[i])[valid], fdx, fdy)
            boxes_all.append(boxes)
            scores_all.append(np.asarray(dec.scores[i])[valid])
            labels_all.append(np.asarray(dec.labels[i])[valid])
        boxes = np.concatenate(boxes_all, axis=0)
        scores = np.concatenate(scores_all, axis=0)
        labels = np.concatenate(labels_all, axis=0)
        out[i] = postprocess_sample(
            boxes, scores, labels, np.ones(len(boxes), bool), test_cfg
        )
    return out
