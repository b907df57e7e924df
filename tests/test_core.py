"""Core primitives: gaussians, targets, decode, NMS."""

import jax.numpy as jnp
import numpy as np

from rcbevdet_tpu.core.boxes import box_corners_bev, transform_boxes_bda
from rcbevdet_tpu.core.coders import centerpoint_decode
from rcbevdet_tpu.core.gaussian import (
    draw_heatmap_gaussian_np,
    gaussian_radius_np,
    render_rcs_maps,
)
from rcbevdet_tpu.core.nms import (
    circle_nms_np,
    rotated_iou_matrix_np,
    rotated_nms_np,
    scale_nms_np,
)
from rcbevdet_tpu.core.targets import centerpoint_targets_single


def test_gaussian_radius_known_value():
    # CornerNet radius for a square box with overlap 0.1 is positive & finite
    r = gaussian_radius_np((10.0, 10.0), min_overlap=0.1)
    assert 0 < r < 10


def test_draw_gaussian_peak_and_symmetry():
    hm = np.zeros((9, 9), np.float32)
    draw_heatmap_gaussian_np(hm, (4, 4), 2)
    assert hm[4, 4] == 1.0
    np.testing.assert_allclose(hm[4, 3], hm[4, 5])
    np.testing.assert_allclose(hm[3, 4], hm[5, 4])
    # Edge clipping must not crash and must keep the visible part
    hm2 = np.zeros((9, 9), np.float32)
    draw_heatmap_gaussian_np(hm2, (0, 0), 3)
    assert hm2[0, 0] == 1.0


def test_targets_single_basic():
    boxes = np.array([[10.0, -5.0, 1.0, 4.0, 2.0, 1.5, 0.3, 1.0, -1.0]], np.float32)
    labels = np.array([2])
    t = centerpoint_targets_single(
        boxes, labels, num_classes=10, grid_size=(1024, 1024),
        point_cloud_range=(-51.2, -51.2, -5.0, 51.2, 51.2, 3.0),
        voxel_size=(0.1, 0.1), out_size_factor=8,
    )
    assert t.heatmap.shape == (10, 128, 128)
    cx = int((10.0 + 51.2) / 0.8)
    cy = int((-5.0 + 51.2) / 0.8)
    assert t.heatmap[2, cy, cx] == 1.0
    assert t.mask[0] == 1.0
    assert t.inds[0] == cy * 128 + cx
    np.testing.assert_allclose(t.anno_box[0, 2], 1.0)  # z
    np.testing.assert_allclose(t.anno_box[0, 3:6], np.log([4.0, 2.0, 1.5]), rtol=1e-6)
    np.testing.assert_allclose(t.anno_box[0, 6], np.sin(0.3), rtol=1e-6)
    np.testing.assert_allclose(t.anno_box[0, 8:], [1.0, -1.0])


def test_decode_roundtrip():
    """A delta heatmap at a known cell must decode to the cell's metric pos."""
    b, h, w, ncls = 1, 16, 16, 3
    heat = np.full((b, h, w, ncls), 1e-4, np.float32)
    heat[0, 5, 7, 1] = 0.9
    reg = np.full((b, h, w, 2), 0.25, np.float32)
    hei = np.full((b, h, w, 1), 1.5, np.float32)
    dim = np.ones((b, h, w, 3), np.float32) * 2.0
    rot_s = np.full((b, h, w, 1), np.sin(0.5), np.float32)
    rot_c = np.full((b, h, w, 1), np.cos(0.5), np.float32)
    vel = np.zeros((b, h, w, 2), np.float32)

    out = centerpoint_decode(
        jnp.asarray(heat), jnp.asarray(rot_s), jnp.asarray(rot_c),
        jnp.asarray(hei), jnp.asarray(dim), jnp.asarray(vel), jnp.asarray(reg),
        pc_range=(-6.4, -6.4), voxel_size=(0.1, 0.1), out_size_factor=8,
        post_center_range=(-10, -10, -10, 10, 10, 10), max_num=5,
        score_threshold=0.1,
    )
    assert bool(out.valid[0, 0])
    assert int(out.labels[0, 0]) == 1
    np.testing.assert_allclose(float(out.scores[0, 0]), 0.9, rtol=1e-6)
    np.testing.assert_allclose(float(out.bboxes[0, 0, 0]), (7.25) * 0.8 - 6.4, rtol=1e-5)
    np.testing.assert_allclose(float(out.bboxes[0, 0, 1]), (5.25) * 0.8 - 6.4, rtol=1e-5)
    np.testing.assert_allclose(float(out.bboxes[0, 0, 6]), 0.5, rtol=1e-5)
    # all other slots fail the score threshold
    assert not bool(out.valid[0, 1])


def test_rotated_iou_axis_aligned():
    a = np.array([[0.0, 0.0, 2.0, 2.0, 0.0]])
    b = np.array([[1.0, 0.0, 2.0, 2.0, 0.0]])
    iou = rotated_iou_matrix_np(a, b)
    np.testing.assert_allclose(iou[0, 0], 2.0 / 6.0, rtol=1e-6)


def test_rotated_iou_45deg():
    # unit square vs itself rotated 45deg: intersection is a regular octagon
    a = np.array([[0.0, 0.0, 1.0, 1.0, 0.0]])
    b = np.array([[0.0, 0.0, 1.0, 1.0, np.pi / 4]])
    iou = rotated_iou_matrix_np(a, b)
    inter = 2 * (np.sqrt(2) - 1)  # octagon area
    np.testing.assert_allclose(iou[0, 0], inter / (2 - inter), rtol=1e-5)


def test_rotated_nms_suppresses_overlap():
    boxes = np.array(
        [
            [0.0, 0.0, 2.0, 2.0, 0.0],
            [0.1, 0.0, 2.0, 2.0, 0.0],  # heavy overlap with 0
            [5.0, 5.0, 2.0, 2.0, 0.3],
        ]
    )
    scores = np.array([0.9, 0.8, 0.7])
    keep = rotated_nms_np(boxes, scores, thresh=0.2)
    np.testing.assert_array_equal(sorted(keep), [0, 2])


def test_scale_nms_unscales():
    boxes = np.zeros((2, 9), np.float32)
    boxes[:, 3:6] = 1.0
    boxes[1, 0] = 0.2
    scores = np.array([0.9, 0.8], np.float32)
    labels = np.array([0, 0])
    keep = scale_nms_np(boxes, scores, labels, 0.2, [3.0] * 10)
    assert list(keep) == [0]
    # input boxes must be untouched (reference unscales after NMS)
    np.testing.assert_allclose(boxes[:, 3:6], 1.0)


def test_circle_nms():
    boxes = np.array([[0, 0, 0.9], [0.5, 0, 0.8], [3, 3, 0.7]], np.float32)
    keep = circle_nms_np(boxes, min_radius=1.0)
    np.testing.assert_array_equal(keep, [0, 2])


def test_bda_flip_yaw():
    boxes = np.array([[1.0, 2.0, 0.0, 4.0, 2.0, 1.5, 0.3, 1.0, 0.5]], np.float32)
    out, bda = transform_boxes_bda(boxes, 0.0, 1.0, True, False)
    np.testing.assert_allclose(out[0, 0], -1.0, atol=1e-6)
    np.testing.assert_allclose(out[0, 6], np.pi - 0.3, rtol=1e-6)
    np.testing.assert_allclose(out[0, 7], -1.0, atol=1e-6)
    np.testing.assert_allclose(bda, np.diag([-1.0, 1.0, 1.0]), atol=1e-7)


def test_render_rcs_maps_shapes():
    centers = jnp.asarray([[10, 12], [100, 100]], jnp.int32)
    radius = jnp.asarray([2.7, 0.0])
    rcs = jnp.asarray([5.0, -3.0])
    mask = jnp.asarray([True, True])
    heat, feat = render_rcs_maps(centers, radius, rcs, mask, 128, 128, r_max=8)
    assert heat.shape == (128, 128)
    assert float(heat[12, 10]) == 1.0  # gaussian peak at center (y, x)
    assert float(feat[12, 10]) == 5.0
    assert float(feat[100, 100]) == -3.0
    assert float(heat[100, 100]) == 1.0
    # far away stays zero
    assert float(heat[60, 60]) == 0.0


def test_box_corners_bev():
    c = box_corners_bev(np.array([[1.0, 2.0, 2.0, 4.0, 0.0]]))
    assert c.shape == (1, 4, 2)
    np.testing.assert_allclose(sorted(c[0, :, 0]), [0, 0, 2, 2])
    np.testing.assert_allclose(sorted(c[0, :, 1]), [0, 0, 4, 4])


def test_oval_nms():
    from rcbevdet_tpu.core.nms import oval_nms_np

    dets = np.array(
        [
            [0, 0, 2, 2, 0, 0.9],
            [0.5, 0, 2, 2, 0, 0.8],   # inside box 0's extent -> suppressed
            [10, 10, 2, 2, 0.3, 0.7],
        ],
        np.float32,
    )
    keep = oval_nms_np(dets, thresh_scale=1.0)
    np.testing.assert_array_equal(sorted(keep), [0, 2])


def test_points_in_rotated_boxes():
    from rcbevdet_tpu.core.nms import points_in_rotated_boxes

    boxes = np.array([[0, 0, 4, 2, np.pi / 2]], np.float32)  # rotated 90deg
    pts = np.array([[0, 1.9], [1.9, 0], [0.9, 0]], np.float32)
    mask = points_in_rotated_boxes(pts, boxes)
    # after rotation the long axis is along y
    np.testing.assert_array_equal(mask[:, 0], [True, False, True])


def test_render_rcs_maps_matches_scatter_oracle():
    """The shift/reduce fast path must reproduce the direct window
    max-scatter renderer exactly (unique centers, like voxelized pillars)."""
    from rcbevdet_tpu.core.gaussian import render_rcs_maps_scatter

    rng = np.random.default_rng(3)
    ny = nx = 64
    p = 120
    # unique integer centers (voxelization guarantees this in the model)
    cells = rng.choice(ny * nx, size=p, replace=False)
    centers = np.stack([cells % nx, cells // nx], axis=-1).astype(np.int32)
    # push some centers near/over borders via offsets
    radius = rng.uniform(0, 12, p).astype(np.float32)
    rcs = rng.uniform(-2, 5, p).astype(np.float32)
    mask = rng.uniform(size=p) > 0.2
    args = (jnp.asarray(centers), jnp.asarray(radius), jnp.asarray(rcs),
            jnp.asarray(mask), ny, nx, 8)
    heat_f, feat_f = render_rcs_maps(*args)
    heat_s, feat_s = render_rcs_maps_scatter(*args)
    np.testing.assert_allclose(
        np.asarray(heat_f), np.asarray(heat_s), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(feat_f), np.asarray(feat_s), atol=1e-6
    )
