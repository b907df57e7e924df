"""Cross-check of evaluation/nuscenes_metrics.py against the official
nuScenes detection protocol.

nuscenes-devkit cannot be installed in this environment (no package, zero
egress), so the cross-check has two independent legs:

1. ``test_hand_computed_*`` — a tiny scenario whose 101-point interpolated
   AP / TP-error curves are derived BY HAND in the comments (following
   nuscenes-devkit eval/detection/algo.py: accumulate -> calc_ap/calc_tp),
   asserted as closed-form literals.  This anchors the protocol itself.
2. ``DevkitTranscription`` — a from-scratch, structurally different
   transcription of the devkit's published algorithm (greedy score-ordered
   matching per class, np.interp onto 101 recall points, the devkit's
   double-reversed confidence interpolation of TP errors, nanmean over the
   class/metric exclusion table).  A randomized many-sample scenario must
   produce identical numbers from both implementations.

Reference eval flow: nuscenes_dataset_rc.py:481-538 (NuScenesEval).
"""

import numpy as np
import pytest

from rcbevdet_tpu.evaluation.nuscenes_metrics import (
    CANONICAL_CLASSES,
    CLASS_RANGES,
    DetectionEvalConfig,
    evaluate_detections,
)

# ---------------------------------------------------------------------------
# Leg 2: independent transcription of nuscenes-devkit algo.py
# ---------------------------------------------------------------------------

DIST_THS = (0.5, 1.0, 2.0, 4.0)
DIST_TH_TP = 2.0
MIN_RECALL, MIN_PRECISION = 0.1, 0.1
NELEM = 101
TP_METRICS = ("trans_err", "scale_err", "orient_err", "vel_err", "attr_err")
# devkit DetectionConfig exclusion table (eval/detection/data_classes.py)
_EXCLUDE = {
    ("traffic_cone", "attr_err"), ("traffic_cone", "vel_err"),
    ("traffic_cone", "orient_err"),
    ("barrier", "attr_err"), ("barrier", "vel_err"),
}


def _devkit_cummean(x):
    x = np.asarray(x, float)
    ok = ~np.isnan(x)
    if not ok.any():
        return np.full(len(x), np.nan)
    s = np.cumsum(np.where(ok, x, 0.0))
    n = np.cumsum(ok)
    with np.errstate(invalid="ignore"):
        return np.where(n > 0, s / np.maximum(n, 1), np.nan)


def _devkit_accumulate(gt_all, pred_all, class_name, dist_th):
    """gt_all/pred_all: lists of dicts with keys sample_token, translation
    (x, y), size, yaw, velocity, detection_name, (pred only) score."""
    npos = sum(1 for g in gt_all if g["detection_name"] == class_name)
    if npos == 0:
        return None
    preds = [p for p in pred_all if p["detection_name"] == class_name]
    order = sorted(range(len(preds)), key=lambda i: -preds[i]["score"])
    taken = set()
    tp, fp, conf = [], [], []
    md = {m: [] for m in TP_METRICS}
    md["conf"] = []
    period = np.pi if class_name == "barrier" else 2 * np.pi
    gt_by_tok = {}
    for gi, g in enumerate(gt_all):
        gt_by_tok.setdefault(g["sample_token"], []).append((gi, g))
    for ind in order:
        p = preds[ind]
        min_dist, match = np.inf, None
        for gi, g in gt_by_tok.get(p["sample_token"], []):
            if g["detection_name"] != class_name or gi in taken:
                continue
            d = np.hypot(
                p["translation"][0] - g["translation"][0],
                p["translation"][1] - g["translation"][1],
            )
            if d < min_dist:
                min_dist, match = d, (gi, g)
        if min_dist < dist_th:
            gi, g = match
            taken.add(gi)
            tp.append(1)
            fp.append(0)
            conf.append(p["score"])
            md["trans_err"].append(min_dist)
            mins = np.minimum(p["size"], g["size"])
            inter = np.prod(mins)
            union = np.prod(p["size"]) + np.prod(g["size"]) - inter
            md["scale_err"].append(1.0 - inter / union)
            yd = (p["yaw"] - g["yaw"] + period / 2) % period - period / 2
            md["orient_err"].append(
                np.nan if class_name == "traffic_cone" else abs(yd)
            )
            if class_name in ("barrier", "traffic_cone"):
                md["vel_err"].append(np.nan)
            else:
                md["vel_err"].append(
                    np.hypot(
                        p["velocity"][0] - g["velocity"][0],
                        p["velocity"][1] - g["velocity"][1],
                    )
                )
            md["attr_err"].append(np.nan)  # no GT attributes stored
            md["conf"].append(p["score"])
        else:
            tp.append(0)
            fp.append(1)
            conf.append(p["score"])
    if len(md["trans_err"]) == 0:  # devkit DetectionMetricData.no_predictions
        return dict(
            recall=np.linspace(0, 1, NELEM),
            precision=np.zeros(NELEM),
            confidence=np.zeros(NELEM),
            **{m: np.ones(NELEM) for m in TP_METRICS},
        )
    tpc = np.cumsum(tp).astype(float)
    fpc = np.cumsum(fp).astype(float)
    prec = tpc / (tpc + fpc)
    rec = tpc / float(npos)
    rec_interp = np.linspace(0, 1, NELEM)
    prec_i = np.interp(rec_interp, rec, prec, right=0)
    conf_i = np.interp(rec_interp, rec, np.asarray(conf), right=0)
    out = dict(recall=rec_interp, precision=prec_i, confidence=conf_i)
    for m in TP_METRICS:
        tmp = _devkit_cummean(md[m])
        if np.all(np.isnan(tmp)):
            out[m] = np.ones(NELEM)
        else:
            # the devkit's exact double-reversed interpolation
            out[m] = np.interp(
                conf_i[::-1], np.asarray(md["conf"])[::-1], tmp[::-1]
            )[::-1]
    return out


def _devkit_calc_ap(md):
    prec = np.copy(md["precision"])
    prec = prec[round(100 * MIN_RECALL) + 1:]
    prec -= MIN_PRECISION
    prec[prec < 0] = 0
    return float(np.mean(prec)) / (1.0 - MIN_PRECISION)


def _devkit_calc_tp(md, metric):
    first = round(100 * MIN_RECALL) + 1
    nz = np.nonzero(md["confidence"])[0]
    last = nz[-1] if len(nz) else 0
    if last < first:
        return 1.0
    return float(np.mean(md[metric][first: last + 1]))


def devkit_transcription_evaluate(predictions, ground_truths):
    """Full protocol over the same I/O surface as evaluate_detections."""
    classes = list(CANONICAL_CLASSES)
    gt_all, pred_all = [], []
    for tok, (boxes, labels) in ground_truths.items():
        for b, l in zip(np.asarray(boxes), np.asarray(labels)):
            name = classes[int(l)]
            if np.hypot(b[0], b[1]) > CLASS_RANGES[name]:
                continue
            gt_all.append(
                dict(sample_token=tok, translation=b[:2], size=b[3:6],
                     yaw=b[6], velocity=b[7:9], detection_name=name)
            )
    for tok, (boxes, scores, labels) in predictions.items():
        order = np.argsort(-np.asarray(scores))[:500]
        for i in order:
            b = np.asarray(boxes[i])
            name = classes[int(labels[i])]
            if np.hypot(b[0], b[1]) > CLASS_RANGES[name]:
                continue
            pred_all.append(
                dict(sample_token=tok, translation=b[:2], size=b[3:6],
                     yaw=b[6], velocity=b[7:9], detection_name=name,
                     score=float(scores[i]))
            )

    aps, label_tp = {}, {}
    for name in classes:
        mds = {
            th: _devkit_accumulate(gt_all, pred_all, name, th)
            for th in DIST_THS
        }
        if all(v is None for v in mds.values()):
            continue
        aps[name] = float(
            np.mean([_devkit_calc_ap(md) for md in mds.values()])
        )
        for m in TP_METRICS:
            if (name, m) in _EXCLUDE:
                label_tp[(name, m)] = np.nan
            else:
                label_tp[(name, m)] = _devkit_calc_tp(mds[DIST_TH_TP], m)
    mean_ap = float(np.mean(list(aps.values()))) if aps else 0.0
    tp_errors = {}
    for m in TP_METRICS:
        vals = [label_tp[(n, m)] for n in aps if (n, m) in label_tp]
        tp_errors[m] = float(np.nanmean(vals)) if vals else 1.0
    nds = (
        5 * mean_ap
        + sum(max(0.0, 1 - min(1.0, tp_errors[m])) for m in TP_METRICS)
    ) / 10.0
    return dict(mAP=mean_ap, NDS=nds, aps=aps, tp_errors=tp_errors)


# ---------------------------------------------------------------------------
# Leg 1: hand-derived literals
# ---------------------------------------------------------------------------


def _hand_scenario():
    """1 sample, class car: GT at (0,0) and (10,0); preds P1 (0.3,0) s=0.9
    [match d=0.3], P2 (20,0) s=0.8 [FP], P3 (10,1.5) s=0.7 [match d=1.5]."""
    dims = np.array([4.0, 2.0, 1.5])
    z = np.zeros(1)

    def box(x, y):
        return np.concatenate([[x, y, 0.0], dims, [0.0, 0.0, 0.0]])

    gt = {"s0": (np.stack([box(0, 0), box(10, 0)]), np.array([0, 0]))}
    preds = {
        "s0": (
            np.stack([box(0.3, 0), box(20, 0), box(10, 1.5)]),
            np.array([0.9, 0.8, 0.7]),
            np.array([0, 0, 0]),
        )
    }
    return preds, gt


def test_hand_computed_ap_and_nds():
    """Closed-form protocol walk-through (devkit accumulate/calc_ap):

    th in {0.5, 1.0}: only P1 matches. tp=[1,0,0], prec=[1,1/2,1/3],
      rec=[.5,.5,.5]. 101-pt interp (right=0, ties -> last value):
      r<0.5 -> 1.0, r=0.5 -> 1/3, r>0.5 -> 0.
      AP = [39*(1-.1) + (1/3-.1)] / 90 / 0.9 = (35.1 + 7/30)/81.
    th in {2, 4}: P1+P3 match. prec=[1,1/2,2/3], rec=[.5,.5,1]:
      r<0.5 -> 1, r=0.5 -> 1/2, r in (0.5,1] -> 1/2+(r-1/2)/3.
      AP = [39*.9 + .4 + sum_{k=1..50}(.4+k/300)] / 90 / .9 = 59.75/81.
    mAP = (35.1 + 7/30 + 59.75) / 2 / 81.

    TP errors at th=2: matched trans errs in conf order = [0.3, 1.5],
      cummean=[0.3, 0.9] at confs [0.9, 0.7]; conf_i: r<=0.5 -> {0.9 then
      0.8 at r=.5}, r in (.5,1] linear 0.8 -> 0.7.
      mATE = [39*0.3 + 0.6 + sum_{k=1..50}(0.6+0.006k)] / 90 = 49.95/90.
    Identical dims/yaw/vel -> mASE=mAOE=mAVE=0; no attributes -> mAAE=1.
    NDS = (5*mAP + (1-0.555) + 1 + 1 + 1 + 0) / 10.
    """
    preds, gt = _hand_scenario()
    m = evaluate_detections(preds, gt)

    ap_low = (35.1 + 7.0 / 30.0) / 81.0
    ap_high = 59.75 / 81.0
    map_expected = (ap_low + ap_high) / 2.0
    assert m["AP_car"] == pytest.approx(map_expected, abs=1e-12)
    assert m["mAP"] == pytest.approx(map_expected, abs=1e-12)
    assert m["mATE"] == pytest.approx(49.95 / 90.0, abs=1e-12)
    assert m["mASE"] == pytest.approx(0.0, abs=1e-12)
    assert m["mAOE"] == pytest.approx(0.0, abs=1e-12)
    assert m["mAVE"] == pytest.approx(0.0, abs=1e-12)
    assert m["mAAE"] == 1.0
    nds_expected = (5 * map_expected + (1 - 49.95 / 90.0) + 3.0) / 10.0
    assert m["NDS"] == pytest.approx(nds_expected, abs=1e-12)


def test_hand_scenario_matches_transcription():
    preds, gt = _hand_scenario()
    ours = evaluate_detections(preds, gt)
    oracle = devkit_transcription_evaluate(preds, gt)
    assert ours["mAP"] == pytest.approx(oracle["mAP"], abs=1e-12)
    assert ours["NDS"] == pytest.approx(oracle["NDS"], abs=1e-12)


# ---------------------------------------------------------------------------
# Randomized cross-check
# ---------------------------------------------------------------------------


def _random_scenario(seed, n_samples=25):
    rng = np.random.default_rng(seed)
    gt, preds = {}, {}
    for s in range(n_samples):
        tok = f"tok{s}"
        ngt = rng.integers(0, 12)
        gboxes = np.zeros((ngt, 9))
        gboxes[:, :2] = rng.uniform(-55, 55, (ngt, 2))
        gboxes[:, 2] = rng.uniform(-2, 1, ngt)
        gboxes[:, 3:6] = rng.uniform(0.5, 6.0, (ngt, 3))
        gboxes[:, 6] = rng.uniform(-np.pi, np.pi, ngt)
        gboxes[:, 7:9] = rng.normal(0, 3, (ngt, 2))
        glabels = rng.integers(0, 10, ngt)
        gt[tok] = (gboxes, glabels)

        # predictions: noisy copies of GT + clutter
        rows, scores, labels = [], [], []
        for b, l in zip(gboxes, glabels):
            if rng.random() < 0.85:
                nb = b.copy()
                nb[:2] += rng.normal(0, 1.2, 2)
                nb[3:6] *= rng.uniform(0.7, 1.4, 3)
                nb[6] += rng.normal(0, 0.4)
                nb[7:9] += rng.normal(0, 1.0, 2)
                rows.append(nb)
                scores.append(rng.random())
                labels.append(l)
        nfp = rng.integers(0, 8)
        for _ in range(nfp):
            nb = np.zeros(9)
            nb[:2] = rng.uniform(-55, 55, 2)
            nb[3:6] = rng.uniform(0.5, 6.0, 3)
            nb[6] = rng.uniform(-np.pi, np.pi)
            nb[7:9] = rng.normal(0, 3, 2)
            rows.append(nb)
            scores.append(rng.random())
            labels.append(rng.integers(0, 10))
        preds[tok] = (
            np.asarray(rows).reshape(-1, 9),
            np.asarray(scores, float),
            np.asarray(labels, int),
        )
    return preds, gt


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_randomized_matches_devkit_transcription(seed):
    preds, gt = _random_scenario(seed)
    ours = evaluate_detections(preds, gt)
    oracle = devkit_transcription_evaluate(preds, gt)
    assert ours["mAP"] == pytest.approx(oracle["mAP"], abs=1e-10)
    assert ours["NDS"] == pytest.approx(oracle["NDS"], abs=1e-10)
    for name, ap in oracle["aps"].items():
        assert ours[f"AP_{name}"] == pytest.approx(ap, abs=1e-10), name
    assert ours["mATE"] == pytest.approx(
        oracle["tp_errors"]["trans_err"], abs=1e-10
    )
    assert ours["mAVE"] == pytest.approx(
        oracle["tp_errors"]["vel_err"], abs=1e-10
    )
    assert ours["mAOE"] == pytest.approx(
        oracle["tp_errors"]["orient_err"], abs=1e-10
    )
