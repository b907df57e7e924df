"""KITTI-protocol AP (R40) for View-of-Delft-style evaluation.

Counterpart of the reference's
core/evaluation/vod_utils/kitti_official_evaluate.py (OpenPCDet/KITTI
official algorithm, numba): BEV and 3D AP at class-specific IoU
thresholds with the official two-pass matching —

1. thresholds pass: per ground truth, the highest-score unassigned
   detection with IoU > min_overlap contributes its score
   (compute_statistics_jit:227-255, compute_fp=False); 41 recall-spaced
   score thresholds are then drawn from the pooled TP scores
   (get_thresholds:9-29).
2. PR pass per threshold: detections below the threshold are ignored;
   per ground truth, the max-overlap unassigned detection with
   IoU > min_overlap is a TP, otherwise the GT is a FN; remaining
   detections are FPs (:257-300, compute_fp=True).
3. right-running-max precision smoothing, AP_R40 = mean of precisions at
   sample points 1..40 (eval_class:596-601, get_m_ap_r40:620-625).

Differences from the reference, by construction of this BEV pipeline:
- no image-plane 2D-bbox metric and no truncation/occlusion difficulty
  filtering (KITTI camera annotations don't exist here);
- VoD's 'driving corridor' ROI variant (custom_method=3) is exposed as an
  explicit ``roi`` box filter over (x, y) instead of camera coordinates;
- AOS is computed from yaw instead of KITTI's alpha when requested.

Rotated IoU comes from the same polygon-clipping core as NMS
(core/nms.rotated_iou_matrix_np — the TPU-repo replacement for
vod_utils/rotate_iou_cpu.py's numba kernels).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from ..core.nms import rotated_iou_matrix_np

VOD_CLASSES = ("Car", "Pedestrian", "Cyclist")
# VoD evaluates at the overlap_0_5 row (kitti_official_evaluate.py:696-698)
VOD_IOU_THRESHOLDS = {"Car": 0.5, "Pedestrian": 0.25, "Cyclist": 0.25}
# VoD driving corridor (entire annotated area vs corridor): +/-4 m lateral,
# 0-25 m ahead in the sensor frame
VOD_CORRIDOR = (-4.0, 0.0, 4.0, 25.0)  # (x_min, y_min, x_max, y_max)

N_SAMPLE_PTS = 41


def _bev5(boxes):
    """[N, >=7] (x, y, z, dx, dy, dz, yaw, ...) -> [N, 5] BEV."""
    return boxes[:, (0, 1, 3, 4, 6)].astype(np.float32)


def _iou_bev(dt, gt):
    if len(dt) == 0 or len(gt) == 0:
        return np.zeros((len(dt), len(gt)), np.float32)
    return rotated_iou_matrix_np(_bev5(dt), _bev5(gt))


def _iou_3d(dt, gt):
    """Rotated 3D IoU: BEV polygon intersection x vertical overlap."""
    if len(dt) == 0 or len(gt) == 0:
        return np.zeros((len(dt), len(gt)), np.float32)
    bev = rotated_iou_matrix_np(_bev5(dt), _bev5(gt))
    # recover intersection areas from IoU: inter = iou*(a+b)/(1+iou)
    area_d = (dt[:, 3] * dt[:, 4])[:, None]
    area_g = (gt[:, 3] * gt[:, 4])[None, :]
    inter_bev = bev * (area_d + area_g) / (1.0 + bev + 1e-12)
    d_lo = dt[:, 2][:, None] - dt[:, 5][:, None] / 2
    d_hi = dt[:, 2][:, None] + dt[:, 5][:, None] / 2
    g_lo = gt[:, 2][None, :] - gt[:, 5][None, :] / 2
    g_hi = gt[:, 2][None, :] + gt[:, 5][None, :] / 2
    zi = np.maximum(
        0.0, np.minimum(d_hi, g_hi) - np.maximum(d_lo, g_lo)
    )
    inter = inter_bev * zi
    vol_d = (dt[:, 3] * dt[:, 4] * dt[:, 5])[:, None]
    vol_g = (gt[:, 3] * gt[:, 4] * gt[:, 5])[None, :]
    union = vol_d + vol_g - inter
    return np.where(union > 0, inter / union, 0.0).astype(np.float32)


def get_thresholds(scores, num_gt, num_sample_pts=N_SAMPLE_PTS):
    """Transcription of get_thresholds (kitti_official_evaluate.py:9-29)."""
    scores = np.sort(np.asarray(scores, float))[::-1]
    current_recall = 0.0
    thresholds = []
    for i, score in enumerate(scores):
        l_recall = (i + 1) / num_gt
        r_recall = (i + 2) / num_gt if i < len(scores) - 1 else l_recall
        if ((r_recall - current_recall) < (current_recall - l_recall)) and (
            i < len(scores) - 1
        ):
            continue
        thresholds.append(score)
        current_recall += 1.0 / (num_sample_pts - 1.0)
    return thresholds


def _match_for_thresholds(iou, dt_scores, min_overlap):
    """Thresholds pass: per gt, highest-score dt with IoU > min_overlap."""
    tp_scores = []
    assigned = np.zeros(iou.shape[0], bool)
    for gi in range(iou.shape[1]):
        best, best_score = -1, -np.inf
        for dj in range(iou.shape[0]):
            if assigned[dj] or iou[dj, gi] <= min_overlap:
                continue
            if dt_scores[dj] > best_score:
                best, best_score = dj, dt_scores[dj]
        if best >= 0:
            assigned[best] = True
            tp_scores.append(best_score)
    return tp_scores


def _match_for_pr(iou, dt_scores, min_overlap, thresh, dt_yaw=None,
                  gt_yaw=None):
    """PR pass at one threshold: (tp, fp, fn, aos_similarity_sum)."""
    ignored = dt_scores < thresh
    assigned = np.zeros(iou.shape[0], bool)
    tp = fn = 0
    sim = 0.0
    for gi in range(iou.shape[1]):
        best, best_ov = -1, min_overlap
        for dj in range(iou.shape[0]):
            if assigned[dj] or ignored[dj] or iou[dj, gi] <= min_overlap:
                continue
            if iou[dj, gi] > best_ov:
                best, best_ov = dj, iou[dj, gi]
        if best >= 0:
            assigned[best] = True
            tp += 1
            if dt_yaw is not None:
                d = dt_yaw[best] - gt_yaw[gi]
                sim += (1.0 + np.cos(d)) / 2.0
        else:
            fn += 1
    fp = int(np.sum(~assigned & ~ignored))
    return tp, fp, fn, sim


def _filter_roi(boxes, roi):
    if roi is None:
        return np.ones(len(boxes), bool)
    x_min, y_min, x_max, y_max = roi
    return (
        (boxes[:, 0] >= x_min) & (boxes[:, 0] <= x_max)
        & (boxes[:, 1] >= y_min) & (boxes[:, 1] <= y_max)
    )


def eval_class(
    predictions, ground_truths, class_id, min_overlap, metric="bev",
    roi=None, compute_aos=False,
):
    """AP_R40 for one class.

    predictions: {token: (boxes [N, >=7], scores [N], labels [N])}
    ground_truths: {token: (boxes [M, >=7], labels [M])}
    metric: 'bev' | '3d'
    """
    iou_fn = _iou_bev if metric == "bev" else _iou_3d
    per_sample = []
    num_gt = 0
    for tok, (gboxes, glabels) in ground_truths.items():
        gboxes = np.asarray(gboxes, float).reshape(-1, gboxes.shape[-1] if len(gboxes) else 9)
        gsel = (np.asarray(glabels) == class_id) & _filter_roi(gboxes, roi)
        g = gboxes[gsel]
        num_gt += len(g)
        dboxes, dscores, dlabels = predictions.get(
            tok, (np.zeros((0, 9)), np.zeros(0), np.zeros(0, int))
        )
        dboxes = np.asarray(dboxes, float).reshape(-1, dboxes.shape[-1] if len(dboxes) else 9)
        dsel = (np.asarray(dlabels) == class_id) & _filter_roi(dboxes, roi)
        d, s = dboxes[dsel], np.asarray(dscores, float)[dsel]
        per_sample.append((iou_fn(d, g), s, d, g))
    if num_gt == 0:
        return None

    tp_scores = []
    for iou, s, _, _ in per_sample:
        tp_scores += _match_for_thresholds(iou, s, min_overlap)
    thresholds = get_thresholds(tp_scores, num_gt)
    if not thresholds:
        return dict(ap_r40=0.0, aos_r40=0.0 if compute_aos else None)

    prec = np.zeros(len(thresholds))
    orient = np.zeros(len(thresholds))
    for ti, t in enumerate(thresholds):
        tp = fp = fn = 0
        sim = 0.0
        for iou, s, d, g in per_sample:
            a, b, c, ss = _match_for_pr(
                iou, s, min_overlap, t,
                dt_yaw=d[:, 6] if compute_aos and len(d) else None,
                gt_yaw=g[:, 6] if compute_aos and len(g) else None,
            )
            tp += a
            fp += b
            fn += c
            sim += ss
        if tp + fp > 0:
            prec[ti] = tp / (tp + fp)
            orient[ti] = sim / (tp + fp)
    # right-running-max smoothing (eval_class:600-601)
    for i in range(len(prec)):
        prec[i] = prec[i:].max()
        orient[i] = orient[i:].max()
    # pad to the full 41 sample points (missing high-recall points = 0)
    full = np.zeros(N_SAMPLE_PTS)
    full[: len(prec)] = prec
    full_o = np.zeros(N_SAMPLE_PTS)
    full_o[: len(orient)] = orient
    ap = float(np.sum(full[1:]) / 40.0 * 100.0)
    aos = float(np.sum(full_o[1:]) / 40.0 * 100.0) if compute_aos else None
    return dict(ap_r40=ap, aos_r40=aos)


def evaluate_kitti(
    predictions,
    ground_truths,
    classes: Sequence[str] = VOD_CLASSES,
    iou_thresholds: Dict[str, float] = VOD_IOU_THRESHOLDS,
    roi: Optional[Tuple[float, float, float, float]] = None,
    compute_aos: bool = False,
):
    """Full VoD-style evaluation.

    Returns per-class AP_BEV_R40 / AP_3D_R40 plus their means — the
    reference reports the same table for 'entire annotated area'
    (roi=None) and 'driving corridor' (roi=VOD_CORRIDOR)
    (vod_utils/evaluate.py:58-59).
    """
    out = {}
    bev_aps, aps_3d = [], []
    for ci, name in enumerate(classes):
        th = iou_thresholds[name]
        r_bev = eval_class(
            predictions, ground_truths, ci, th, metric="bev", roi=roi,
            compute_aos=compute_aos,
        )
        r_3d = eval_class(
            predictions, ground_truths, ci, th, metric="3d", roi=roi,
        )
        if r_bev is not None:
            out[f"AP_BEV_R40_{name}"] = r_bev["ap_r40"]
            bev_aps.append(r_bev["ap_r40"])
            if compute_aos:
                out[f"AOS_R40_{name}"] = r_bev["aos_r40"]
        if r_3d is not None:
            out[f"AP_3D_R40_{name}"] = r_3d["ap_r40"]
            aps_3d.append(r_3d["ap_r40"])
    out["mAP_BEV_R40"] = float(np.mean(bev_aps)) if bev_aps else 0.0
    out["mAP_3D_R40"] = float(np.mean(aps_3d)) if aps_3d else 0.0
    return out
