"""Self-contained nuScenes detection metrics (mAP / NDS).

The reference evaluates through nuscenes-devkit's ``NuScenesEval``
(datasets/nuscenes_dataset_rc.py:481-538).  The devkit is not a baked-in
dependency here, so this module implements the official detection protocol
(center-distance matching at {0.5, 1, 2, 4} m, 101-point interpolated AP over
recall/precision > 10%, TP errors at 2 m, NDS = (5*mAP + sum(1 - min(1,
err))) / 10) directly over in-memory predictions — usable both standalone
and as a cross-check against the devkit when it is installed.

Matching runs per sample in the detection frame; center distances,
orientation differences and velocity-difference norms are invariant to the
per-sample rigid transform into the global frame, so results match the
devkit's global-frame evaluation.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence, Tuple

import numpy as np

CLASS_RANGES = {
    "car": 50.0, "truck": 50.0, "bus": 50.0, "trailer": 50.0,
    "construction_vehicle": 50.0, "pedestrian": 40.0, "motorcycle": 40.0,
    "bicycle": 40.0, "traffic_cone": 30.0, "barrier": 30.0,
}
TP_METRICS = ("trans_err", "scale_err", "orient_err", "vel_err", "attr_err")

# canonical label-id order used across the framework (dataset CLASSES)
CANONICAL_CLASSES = (
    "car", "truck", "construction_vehicle", "bus", "trailer", "barrier",
    "motorcycle", "bicycle", "pedestrian", "traffic_cone",
)


@dataclasses.dataclass
class DetectionEvalConfig:
    class_names: Sequence[str] = CANONICAL_CLASSES
    dist_ths: Sequence[float] = (0.5, 1.0, 2.0, 4.0)
    dist_th_tp: float = 2.0
    min_recall: float = 0.1
    min_precision: float = 0.1
    max_boxes_per_sample: int = 500


def _angle_diff(a, b, period):
    d = (a - b + period / 2) % period - period / 2
    return abs(d)


def _scale_iou(dims_a, dims_b):
    """IoU of translation/orientation-aligned boxes (devkit scale_iou)."""
    inter = np.prod(np.minimum(dims_a, dims_b))
    union = np.prod(dims_a) + np.prod(dims_b) - inter
    return inter / union if union > 0 else 0.0


def _cummean(x):
    """Cumulative mean treating NaNs as absent (devkit util)."""
    if len(x) == 0:
        return np.array([])
    ok = ~np.isnan(x)
    cnt = np.cumsum(ok)
    s = np.cumsum(np.where(ok, x, 0.0))
    with np.errstate(invalid="ignore", divide="ignore"):
        return np.where(cnt > 0, s / np.maximum(cnt, 1), np.nan)


def _accumulate(gt_by_sample, pred_list, class_name, dist_th, cfg):
    """Devkit ``accumulate``: greedy score-ordered matching.

    gt_by_sample: {token: list of (box9, gt_attr)} for this class
      (gt_attr '' = GT carries no attribute, excluded from mAAE like the
      devkit's attr_acc returning NaN).
    pred_list: list of (score, token, box9, pred_attr) for this class.
    Returns dict of 101-point interpolated curves or None if no GT.
    """
    npos = sum(len(v) for v in gt_by_sample.values())
    if npos == 0:
        return None
    pred_list = sorted(pred_list, key=lambda x: -x[0])[: None]
    taken = {tok: np.zeros(len(v), bool) for tok, v in gt_by_sample.items()}

    tp, fp, conf = [], [], []
    match_err = {m: [] for m in TP_METRICS}
    period = np.pi if class_name == "barrier" else 2 * np.pi

    for score, tok, box, pred_attr in pred_list:
        gts = gt_by_sample.get(tok, [])
        best, best_dist = -1, np.inf
        for gi, (gt, _ga) in enumerate(gts):
            if taken[tok][gi]:
                continue
            d = np.hypot(box[0] - gt[0], box[1] - gt[1])
            if d < best_dist:
                best, best_dist = gi, d
        is_match = best_dist < dist_th
        conf.append(score)
        tp.append(1.0 if is_match else 0.0)
        fp.append(0.0 if is_match else 1.0)
        if is_match:
            taken[tok][best] = True
            gt, gt_attr = gts[best]
            match_err["trans_err"].append(best_dist)
            match_err["scale_err"].append(1.0 - _scale_iou(box[3:6], gt[3:6]))
            if class_name == "traffic_cone":
                match_err["orient_err"].append(np.nan)
            else:
                match_err["orient_err"].append(
                    _angle_diff(box[6], gt[6], period)
                )
            if class_name in ("barrier", "traffic_cone"):
                match_err["vel_err"].append(np.nan)
                match_err["attr_err"].append(np.nan)
            else:
                match_err["vel_err"].append(
                    np.hypot(box[7] - gt[7], box[8] - gt[8])
                )
                # devkit attr_acc: NaN when the GT has no attribute, else
                # exact-match accuracy; attr_err = 1 - acc
                # (nuscenes/eval/common/utils.py attr_acc, scored by
                # NuScenesEval which the reference delegates to at
                # nuscenes_dataset_rc.py:481-538)
                if not gt_attr:
                    match_err["attr_err"].append(np.nan)
                else:
                    match_err["attr_err"].append(
                        0.0 if pred_attr == gt_attr else 1.0
                    )

    if len(conf) == 0 or sum(tp) == 0:
        return dict(
            recall=np.linspace(0, 1, 101),
            precision=np.zeros(101),
            confidence=np.zeros(101),
            **{m: np.ones(101) for m in TP_METRICS},
        )

    tp_c = np.cumsum(tp)
    fp_c = np.cumsum(fp)
    prec = tp_c / (tp_c + fp_c)
    rec = tp_c / npos

    rec_interp = np.linspace(0, 1, 101)
    prec_i = np.interp(rec_interp, rec, prec, right=0)
    conf_i = np.interp(rec_interp, rec, conf, right=0)

    out = dict(recall=rec_interp, precision=prec_i, confidence=conf_i)
    match_conf = [c for c, t in zip(conf, tp) if t > 0]
    for m in TP_METRICS:
        errs = np.asarray(match_err[m], float)
        if len(errs) == 0 or np.all(np.isnan(errs)):
            out[m] = np.ones(101)
            continue
        tmp = _cummean(errs)
        # interp over descending confidence of matches (devkit accumulate)
        out[m] = np.interp(conf_i, np.asarray(match_conf)[::-1], tmp[::-1])
    return out


def _calc_ap(md, min_recall, min_precision):
    prec = np.copy(md["precision"])
    prec = prec[round(100 * min_recall) + 1 :]
    prec -= min_precision
    prec[prec < 0] = 0
    return float(np.mean(prec)) / (1.0 - min_precision)


def _calc_tp(md, min_recall, metric):
    first = round(100 * min_recall) + 1
    nonzero = np.nonzero(md["confidence"])[0]
    last = nonzero[-1] if len(nonzero) else 0
    if last < first:
        return 1.0
    return float(np.mean(md[metric][first : last + 1]))


def evaluate_detections(
    predictions: Dict[str, Tuple[np.ndarray, np.ndarray, np.ndarray]],
    ground_truths: Dict[str, Tuple[np.ndarray, np.ndarray]],
    cfg: DetectionEvalConfig = DetectionEvalConfig(),
):
    """Compute nuScenes detection metrics.

    Args:
      predictions: {sample_token: (boxes [N, 9], scores [N], labels [N])}
        boxes = (x, y, z, dx, dy, dz, yaw, vx, vy), detection frame.
        An optional 4th element gives per-box attribute-name strings;
        when absent, the reference's speed-based default-attribute rule is
        applied (nuscenes_dataset_rc.py:433-453 — what _format_bbox writes
        into the submission JSON the devkit scores).
      ground_truths: {sample_token: (boxes [M, 9], labels [M])}.  An
        optional 3rd element gives per-box GT attribute names ('' = none;
        such GTs are excluded from mAAE like the devkit).  Without GT
        attributes every attr match is NaN and mAAE folds into NDS as the
        worst case 1.0.

    Returns:
      dict with 'mAP', 'NDS', per-class APs ('AP_<cls>'), mean TP errors
      ('mATE', 'mASE', 'mAOE', 'mAVE', 'mAAE').
    """
    from .format import _attribute_for

    class_names = list(cfg.class_names)

    # ---- range-filter + bucket by class ----
    gt_cls = {c: {} for c in class_names}
    for tok, entry in ground_truths.items():
        boxes, labels = entry[0], entry[1]
        attrs = entry[2] if len(entry) > 2 else [""] * len(labels)
        for b, l, a in zip(np.asarray(boxes), np.asarray(labels), attrs):
            if l < 0 or l >= len(class_names):
                continue
            name = class_names[int(l)]
            if np.hypot(b[0], b[1]) > CLASS_RANGES.get(name, 50.0):
                continue
            gt_cls[name].setdefault(tok, []).append((b, a))

    pred_cls = {c: [] for c in class_names}
    for tok, entry in predictions.items():
        boxes, scores, labels = entry[0], entry[1], entry[2]
        attrs = entry[3] if len(entry) > 3 else None
        order = np.argsort(-np.asarray(scores))[: cfg.max_boxes_per_sample]
        for i in order:
            l = int(labels[i])
            if l < 0 or l >= len(class_names):
                continue
            name = class_names[l]
            b = np.asarray(boxes[i])
            if np.hypot(b[0], b[1]) > CLASS_RANGES.get(name, 50.0):
                continue
            a = attrs[i] if attrs is not None else _attribute_for(name, b[7:9])
            pred_cls[name].append((float(scores[i]), tok, b, a))

    metrics = {}
    aps = {}
    tp_errs = {m: [] for m in TP_METRICS}
    for name in class_names:
        class_aps = []
        md_tp = None
        for dist_th in cfg.dist_ths:
            md = _accumulate(gt_cls[name], pred_cls[name], name, dist_th, cfg)
            if md is None:
                continue
            class_aps.append(_calc_ap(md, cfg.min_recall, cfg.min_precision))
            if dist_th == cfg.dist_th_tp:
                md_tp = md
        if class_aps:
            aps[name] = float(np.mean(class_aps))
            metrics[f"AP_{name}"] = aps[name]
        if md_tp is not None:
            for m in TP_METRICS:
                skip = (
                    (m in ("vel_err", "attr_err") and name in ("barrier", "traffic_cone"))
                    or (m == "orient_err" and name == "traffic_cone")
                )
                if not skip:
                    tp_errs[m].append(_calc_tp(md_tp, cfg.min_recall, m))

    mean_ap = float(np.mean(list(aps.values()))) if aps else 0.0
    tp_means = {}
    for m in TP_METRICS:
        tp_means[m] = float(np.mean(tp_errs[m])) if tp_errs[m] else 1.0
    metrics.update(
        mAP=mean_ap,
        mATE=tp_means["trans_err"],
        mASE=tp_means["scale_err"],
        mAOE=tp_means["orient_err"],
        mAVE=tp_means["vel_err"],
        mAAE=tp_means["attr_err"],
    )
    nds = (
        5.0 * mean_ap
        + sum(max(0.0, 1.0 - min(1.0, tp_means[m])) for m in TP_METRICS)
    ) / 10.0
    metrics["NDS"] = float(nds)
    return metrics
