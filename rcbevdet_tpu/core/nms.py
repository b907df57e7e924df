"""Post-processing NMS suite (NumPy, host-side).

Replaces the reference's numba ``circle_nms`` (core/post_processing/
box3d_nms.py:237) and the mmcv CUDA ``nms_rotated`` used via ``nms_bev``
(box3d_nms.py:286).  Candidate counts are <= 500 post-topK, so an O(N^2)
vectorized NumPy formulation is ample; rotated IoU uses exact convex polygon
clipping (Sutherland–Hodgman on the 4-corner quads), matching the CUDA
kernel's polygon-intersection-area semantics (iou3d_kernel.cu:253-268).
"""

from __future__ import annotations

import numpy as np

from .boxes import box_corners_bev


def circle_nms_np(boxes, min_radius, post_max_size=83):
    """Center-distance NMS.

    Matches the reference numba ``circle_nms`` (box3d_nms.py:243-286):
    ``min_radius`` is compared DIRECTLY against the squared center distance
    (i.e. it is already in squared-distance units — the config value 4 means
    radius 2 m), suppression uses ``<=``, and candidates are score-sorted
    internally.

    Args:
      boxes: [N, 3] (x, y, score) in any order.
      min_radius: squared-distance suppression threshold (scalar — the
        reference indexes its per-task list before calling,
        centerpoint_head.py:738-744).

    Returns:
      kept indices into the ORIGINAL array (np.ndarray int64), at most
      ``post_max_size``.
    """
    n = boxes.shape[0]
    if n == 0:
        return np.zeros((0,), np.int64)
    order = np.argsort(-boxes[:, 2], kind="stable")
    xy = boxes[order, :2]
    d2 = ((xy[:, None, :] - xy[None, :, :]) ** 2).sum(-1)
    thresh = float(min_radius)
    suppressed = np.zeros(n, bool)
    keep = []
    for i in range(n):
        if suppressed[i]:
            continue
        keep.append(order[i])
        suppressed |= d2[i] <= thresh
        suppressed[i] = True
    return np.array(keep[:post_max_size], np.int64)


def oval_nms_np(dets, thresh_scale, post_max_size=83):
    """Oval (extent-aware center-distance) NMS (box3d_nms.py:182-233).

    dets: [N, 6] (x, y, dx, dy, yaw, score).  A box is suppressed when its
    center lies within the yaw-projected combined half-extents of a
    higher-scoring box, scaled by ``thresh_scale``.
    """
    n = len(dets)
    if n == 0:
        return np.zeros((0,), np.int64)
    x, y, dx, dy, yaw = (dets[:, i] for i in range(5))
    scores = dets[:, -1]
    order = np.argsort(-scores, kind="stable")
    ax_c = np.abs(dx * np.cos(yaw))
    ax_s = np.abs(dx * np.sin(yaw))
    ay_c = np.abs(dy * np.cos(yaw))
    ay_s = np.abs(dy * np.sin(yaw))
    suppressed = np.zeros(n, bool)
    keep = []
    for oi in order:
        if suppressed[oi]:
            continue
        keep.append(oi)
        dist_x = np.abs(x[oi] - x)
        dist_y = np.abs(y[oi] - y)
        th_x = (ax_c[oi] + ax_c + ay_s[oi] + ay_s) * thresh_scale / 2
        th_y = (ax_s[oi] + ax_s + ay_c[oi] + ay_c) * thresh_scale / 2
        suppressed |= (dist_x <= th_x) & (dist_y <= th_y)
        suppressed[oi] = True
    return np.array(keep[:post_max_size], np.int64)


def points_in_rotated_boxes(points_xy, bev_boxes):
    """Boolean [N, M] mask of points inside rotated BEV boxes.

    Pure-array replacement for the reference's points_in_boxes CUDA op
    (ops/roiaware_pool3d, used by GT-paste augmentation): rotate each point
    into the box frame and bounds-check.  Works with NumPy or jax.numpy
    inputs.
    """
    xp = np
    d = points_xy[:, None, :] - bev_boxes[None, :, :2]  # [N, M, 2]
    c, s = xp.cos(bev_boxes[:, 4]), xp.sin(bev_boxes[:, 4])
    local_x = d[..., 0] * c + d[..., 1] * s
    local_y = -d[..., 0] * s + d[..., 1] * c
    return (xp.abs(local_x) <= bev_boxes[:, 2] / 2) & (
        xp.abs(local_y) <= bev_boxes[:, 3] / 2
    )


def _polygon_clip(subject, cx, cy, nx_, ny_):
    """Clip polygon ``subject`` [M, 2] by half-plane n.(p - c) <= 0."""
    out = []
    m = len(subject)
    for i in range(m):
        cur = subject[i]
        prev = subject[i - 1]
        cur_in = (cur[0] - cx) * nx_ + (cur[1] - cy) * ny_ <= 0
        prev_in = (prev[0] - cx) * nx_ + (prev[1] - cy) * ny_ <= 0
        if cur_in:
            if not prev_in:
                out.append(_intersect(prev, cur, cx, cy, nx_, ny_))
            out.append(cur)
        elif prev_in:
            out.append(_intersect(prev, cur, cx, cy, nx_, ny_))
    return out


def _intersect(p, q, cx, cy, nx_, ny_):
    dp = (p[0] - cx) * nx_ + (p[1] - cy) * ny_
    dq = (q[0] - cx) * nx_ + (q[1] - cy) * ny_
    t = dp / (dp - dq)
    return (p[0] + t * (q[0] - p[0]), p[1] + t * (q[1] - p[1]))


def _poly_area(poly):
    if len(poly) < 3:
        return 0.0
    a = 0.0
    for i in range(len(poly)):
        x1, y1 = poly[i - 1]
        x2, y2 = poly[i]
        a += x1 * y2 - x2 * y1
    return abs(a) * 0.5


def rotated_box_intersection_area(corners_a, corners_b):
    """Exact intersection area of two convex quads given as [4, 2] corners."""
    poly = [tuple(p) for p in corners_a]
    for i in range(4):
        cx, cy = corners_b[i]
        qx, qy = corners_b[(i + 1) % 4]
        ex, ey = qx - cx, qy - cy
        # CCW polygon: interior is to the left of each edge; half-plane
        # normal pointing right of the edge keeps the interior (n.(p-c)<=0).
        nx_, ny_ = ey, -ex
        poly = _polygon_clip(poly, cx, cy, nx_, ny_)
        if not poly:
            return 0.0
    return _poly_area(poly)


def rotated_iou_matrix_np(bev_boxes_a, bev_boxes_b):
    """Pairwise rotated BEV IoU; boxes are [N, 5] (x, y, dx, dy, yaw)."""
    ca = box_corners_bev(bev_boxes_a)
    cb = box_corners_bev(bev_boxes_b)
    area_a = bev_boxes_a[:, 2] * bev_boxes_a[:, 3]
    area_b = bev_boxes_b[:, 2] * bev_boxes_b[:, 3]
    n, m = len(bev_boxes_a), len(bev_boxes_b)
    iou = np.zeros((n, m), np.float32)
    for i in range(n):
        for j in range(m):
            inter = rotated_box_intersection_area(ca[i], cb[j])
            union = area_a[i] + area_b[j] - inter
            if union > 0:
                iou[i, j] = inter / union
    return iou


def rotated_nms_np(bev_boxes, scores, thresh, pre_max_size=1000, post_max_size=500):
    """Greedy rotated NMS over BEV boxes [N, 5]; returns kept indices into
    the ORIGINAL array (score-sorted processing, like box3d_nms.py:286-344)."""
    order = np.argsort(-scores, kind="stable")
    if pre_max_size is not None:
        order = order[:pre_max_size]
    boxes_s = bev_boxes[order]
    n = len(order)
    if n == 0:
        return np.zeros((0,), np.int64)
    iou = rotated_iou_matrix_np(boxes_s, boxes_s)
    suppressed = np.zeros(n, bool)
    keep = []
    for i in range(n):
        if suppressed[i]:
            continue
        keep.append(order[i])
        suppressed |= iou[i] > thresh
        suppressed[i] = True
    return np.array(keep[:post_max_size], np.int64)


def scale_nms_np(
    boxes9,
    scores,
    labels,
    nms_thresh,
    nms_rescale_factor,
    pre_max_size=1000,
    post_max_size=500,
):
    """Scale-NMS: per-class rescale of box dims before rotated NMS, then
    unscale (reference centerpoint_head.py:841-886).

    Args:
      boxes9: [N, 9]; scores: [N]; labels: [N] int.
      nms_rescale_factor: list of per-class factors.

    Returns:
      kept indices into the input arrays.
    """
    boxes = boxes9.copy()
    factor = np.asarray(nms_rescale_factor, np.float32)[labels]
    boxes[:, 3:6] *= factor[:, None]
    bev = boxes[:, [0, 1, 3, 4, 6]]
    from . import nms_native

    nms_fn = rotated_nms_np
    if nms_native.available():
        nms_fn = nms_native.rotated_nms
    return nms_fn(
        bev, scores, nms_thresh, pre_max_size=pre_max_size, post_max_size=post_max_size
    )
