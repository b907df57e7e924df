"""3D multi-object tracking: velocity-propagated greedy tracker + AMOTA.

RCBEVDet++ reports nuScenes tracking (README tracking table: AMOTA 59.6 /
AMOTP 0.713 with ViT-L) using the standard CenterPoint
tracking-by-detection recipe: no learned tracker — detections are linked
greedily by center distance after propagating previous tracks with their
predicted velocities.  The reference repo contains no tracking code (it
post-processes detection JSONs with the nuscenes-devkit tracking eval);
this module provides both halves TPU-repo-natively:

- ``greedy_track``: the CenterPoint tracker (class-aware greedy
  center-distance association of velocity-propagated tracks, max-age
  track life, confidence inheritance).
- ``evaluate_tracking``: the nuScenes AMOTA/AMOTP protocol (Weng & Kitani
  MOTA averaged over n=40 recall points with the nuScenes MOTAR
  rescaling; MOTP = mean matched center distance), self-contained like
  evaluation/nuscenes_metrics.py and matching-frame-invariant for the
  same reason.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

# per-class association gates in meters (CenterPoint nuScenes defaults)
TRACK_DIST_TH = {
    "car": 4.0, "truck": 4.0, "bus": 5.5, "trailer": 3.0,
    "pedestrian": 1.0, "motorcycle": 1.3, "bicycle": 1.6,
    "construction_vehicle": 4.0, "barrier": 1.0, "traffic_cone": 1.0,
}
TRACKING_CLASSES = (
    "car", "truck", "bus", "trailer", "motorcycle", "bicycle", "pedestrian",
)


@dataclasses.dataclass
class _Track:
    track_id: int
    box: np.ndarray  # [9]
    label: int
    score: float
    age: int = 0  # frames since last match


def greedy_track(
    frames: Sequence[Tuple[float, np.ndarray, np.ndarray, np.ndarray]],
    class_names: Sequence[str],
    dist_th: Dict[str, float] = TRACK_DIST_TH,
    max_age: int = 3,
):
    """Link per-frame detections into tracks.

    Args:
      frames: time-ordered [(timestamp_s, boxes [N, 9], scores, labels)].
      class_names: label id -> name (for per-class gates).

    Returns:
      list (per frame) of (boxes, scores, labels, track_ids).
    """
    next_id = 0
    tracks: List[_Track] = []
    out = []
    prev_t = None
    for t, boxes, scores, labels in frames:
        boxes = np.asarray(boxes, float).reshape(-1, 9)
        scores = np.asarray(scores, float).reshape(-1)
        labels = np.asarray(labels, int).reshape(-1)
        dt = 0.0 if prev_t is None else max(t - prev_t, 0.0)
        prev_t = t

        # propagate surviving tracks with their velocities
        for tr in tracks:
            tr.box = tr.box.copy()
            tr.box[0] += tr.box[7] * dt
            tr.box[1] += tr.box[8] * dt

        ids = np.full(len(boxes), -1, int)
        n_prev = len(tracks)  # tracks spawned this frame can't be matched
        used = [False] * n_prev
        # greedy: highest-score detection first
        for di in np.argsort(-scores):
            name = class_names[labels[di]]
            gate = dist_th.get(name, 2.0)
            best, best_d = -1, gate
            for ti in range(n_prev):
                tr = tracks[ti]
                if used[ti] or tr.label != labels[di]:
                    continue
                d = np.hypot(
                    boxes[di, 0] - tr.box[0], boxes[di, 1] - tr.box[1]
                )
                if d < best_d:
                    best, best_d = ti, d
            if best >= 0:
                used[best] = True
                tr = tracks[best]
                tr.box = boxes[di].copy()
                tr.score = scores[di]
                tr.age = 0
                ids[di] = tr.track_id
            else:
                tracks.append(
                    _Track(next_id, boxes[di].copy(), int(labels[di]),
                           float(scores[di]))
                )
                ids[di] = next_id
                next_id += 1
        # age out unmatched pre-existing tracks; fresh spawns stay at age 0
        survivors = []
        for ti, tr in enumerate(tracks):
            if ti >= n_prev or used[ti]:
                survivors.append(tr)
            else:
                tr.age += 1
                if tr.age <= max_age:
                    survivors.append(tr)
        tracks = survivors
        out.append((boxes, scores, labels, ids))
    return out


def _match_frame(gts, gt_ids, dts, dt_scores, dt_ids, gate):
    """Greedy score-ordered center-distance matching for one frame/class.
    Returns list of (gt_id, dt_id, dist) + unmatched counts."""
    taken = np.zeros(len(gts), bool)
    matches = []
    for di in np.argsort(-dt_scores):
        best, best_d = -1, gate
        for gi in range(len(gts)):
            if taken[gi]:
                continue
            d = np.hypot(dts[di, 0] - gts[gi, 0], dts[di, 1] - gts[gi, 1])
            if d < best_d:
                best, best_d = gi, d
        if best >= 0:
            taken[best] = True
            matches.append((gt_ids[best], dt_ids[di], best_d))
    fp = len(dts) - len(matches)
    fn = len(gts) - len(matches)
    return matches, fp, fn


def evaluate_tracking(
    tracked: Dict[str, Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]],
    gt: Dict[str, Tuple[np.ndarray, np.ndarray, np.ndarray]],
    class_names: Sequence[str],
    classes: Sequence[str] = TRACKING_CLASSES,
    dist_th: float = 2.0,
    n_recall: int = 40,
):
    """nuScenes AMOTA/AMOTP.

    Args:
      tracked: {token: (boxes, scores, labels, track_ids)} per sample,
        tokens iterated in scene/time order.
      gt: {token: (boxes, labels, instance_ids)}.

    Returns dict with AMOTA/AMOTP per class + means.
    """
    results = {}
    amotas, amotps = [], []
    for cname in classes:
        cls = list(class_names).index(cname)
        # collect per-frame class-filtered data
        per_frame = []
        num_gt = 0
        all_scores = []
        for tok, (gboxes, glabels, gids) in gt.items():
            gsel = np.asarray(glabels) == cls
            g = np.asarray(gboxes, float).reshape(-1, 9)[gsel]
            gid = np.asarray(gids)[gsel]
            num_gt += len(g)
            dboxes, dscores, dlabels, dids = tracked.get(
                tok,
                (np.zeros((0, 9)), np.zeros(0), np.zeros(0, int),
                 np.zeros(0, int)),
            )
            dsel = np.asarray(dlabels) == cls
            d = np.asarray(dboxes, float).reshape(-1, 9)[dsel]
            ds = np.asarray(dscores, float)[dsel]
            di = np.asarray(dids)[dsel]
            all_scores.extend(ds.tolist())
            per_frame.append((g, gid, d, ds, di))
        if num_gt == 0:
            continue

        # recall sweep over score thresholds
        thresholds = np.unique(np.asarray(all_scores))[::-1] if all_scores \
            else np.zeros(0)
        motars, motps, recalls = [], [], []
        for th in thresholds:
            tp = fp = fn = ids = 0
            dsum = 0.0
            prev_match: Dict[int, int] = {}  # gt instance -> track id
            for g, gid, d, ds, di in per_frame:
                sel = ds >= th
                matches, f_p, f_n = _match_frame(
                    g, gid, d[sel], ds[sel], di[sel], dist_th
                )
                tp += len(matches)
                fp += f_p
                fn += f_n
                for g_id, t_id, dist in matches:
                    dsum += dist
                    if g_id in prev_match and prev_match[g_id] != t_id:
                        ids += 1
                    prev_match[g_id] = t_id
            r = tp / num_gt
            if r <= 0:
                continue
            # nuScenes MOTAR (Weng & Kitani / nuScenes devkit render)
            motar = max(
                0.0, 1.0 - (ids + fp + fn - (1.0 - r) * num_gt) / (r * num_gt)
            )
            motars.append(motar)
            motps.append(dsum / max(tp, 1))
            recalls.append(r)
        if not recalls:
            results[f"AMOTA_{cname}"] = 0.0
            results[f"AMOTP_{cname}"] = dist_th
            amotas.append(0.0)
            amotps.append(dist_th)
            continue
        # integrate over the n_recall-point grid (nuScenes: 0.025..1)
        grid = np.linspace(1.0 / n_recall, 1.0, n_recall)
        motar_i = np.zeros(n_recall)
        motp_i = np.full(n_recall, dist_th)
        recalls = np.asarray(recalls)
        for k, r in enumerate(grid):
            ok = recalls >= r
            if ok.any():
                motar_i[k] = np.max(np.asarray(motars)[ok])
                motp_i[k] = np.min(np.asarray(motps)[ok])
        amota = float(np.mean(motar_i))
        amotp = float(np.mean(motp_i))
        results[f"AMOTA_{cname}"] = amota
        results[f"AMOTP_{cname}"] = amotp
        amotas.append(amota)
        amotps.append(amotp)
    results["AMOTA"] = float(np.mean(amotas)) if amotas else 0.0
    results["AMOTP"] = float(np.mean(amotps)) if amotps else 0.0
    return results
