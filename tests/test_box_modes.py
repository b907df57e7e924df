"""Box-mode conversions vs the actual reference Box3DMode (torch oracle)."""

import numpy as np
import pytest

from rcbevdet_tpu.core.box_modes import (
    CAM,
    DEPTH,
    LIDAR,
    cam_box_corners,
    convert_boxes,
    project_cam_corners,
)


def _load_reference_mode():
    import sys
    import types

    import refshim

    refshim.install()
    # extra deps of the box-structure zoo not covered by the shared shim
    ops = refshim._module("mmcv.ops")
    for stub in ("box_iou_rotated", "points_in_boxes_all",
                 "points_in_boxes_part"):
        if not hasattr(ops, stub):
            setattr(ops, stub, lambda *a, **k: None)
    sys.modules["mmcv"].ops = ops
    coreutils = refshim._module("mmdet3d.core.utils")
    if not hasattr(coreutils, "array_converter"):
        ac = refshim._load_by_path("mmdet3d/core/utils/array_converter.py",
                                   "_ref_array_converter")
        coreutils.array_converter = ac.array_converter
    pts = refshim._module("mmdet3d.core.points")
    if not hasattr(pts, "BasePoints"):
        pts.BasePoints = type("BasePoints", (), {})
    sys.modules["mmdet3d.core"].points = pts
    base = "mmdet3d/core/bbox/structures/"
    for f in ("utils", "base_box3d", "cam_box3d", "depth_box3d",
              "lidar_box3d"):
        refshim._load_by_path(base + f + ".py")
    mod = refshim._load_by_path(base + "box_3d_mode.py")
    return mod


@pytest.mark.parametrize(
    "src,dst",
    [(LIDAR, CAM), (CAM, LIDAR), (DEPTH, CAM), (CAM, DEPTH),
     (LIDAR, DEPTH), (DEPTH, LIDAR)],
)
def test_convert_matches_reference(rng, src, dst):
    import torch

    ref_mod = _load_reference_mode()
    name = {LIDAR: "LIDAR", CAM: "CAM", DEPTH: "DEPTH"}
    boxes = rng.uniform(-10, 10, (6, 7)).astype(np.float64)
    boxes[:, 3:6] = np.abs(boxes[:, 3:6]) + 0.5
    ref = ref_mod.Box3DMode.convert(
        torch.from_numpy(boxes.copy()),
        getattr(ref_mod.Box3DMode, name[src]),
        getattr(ref_mod.Box3DMode, name[dst]),
    ).numpy()
    got = convert_boxes(boxes, src, dst)
    np.testing.assert_allclose(got, ref, atol=1e-9)


def test_convert_roundtrip_with_extrinsic(rng):
    boxes = rng.uniform(-10, 10, (4, 9))
    boxes[:, 3:6] = np.abs(boxes[:, 3:6]) + 0.5
    # a real lidar2cam extrinsic: rotation + translation
    th = 0.3
    rt = np.eye(3)
    rt = np.array(
        [[0, -1, 0], [0, 0, -1], [1, 0, 0]], np.float64
    ) @ np.array(
        [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0],
         [0, 0, 1]]
    )
    cam = convert_boxes(boxes, LIDAR, CAM, rt_mat=rt)
    back = convert_boxes(cam, CAM, LIDAR, rt_mat=rt.T)
    np.testing.assert_allclose(back[:, :6], boxes[:, :6], atol=1e-9)
    np.testing.assert_allclose(back[:, 7:], boxes[:, 7:], atol=1e-9)


def test_cam_corners_and_projection():
    # axis-aligned cam box at z=10: bottom-center storage
    box = np.array([[0.0, 1.0, 10.0, 2.0, 2.0, 4.0, 0.0]])
    corners = cam_box_corners(box)
    assert corners.shape == (1, 8, 3)
    # y spans [center-h, center] (bottom-center, y down)
    np.testing.assert_allclose(corners[0, :, 1].min(), -1.0)
    np.testing.assert_allclose(corners[0, :, 1].max(), 1.0)
    np.testing.assert_allclose(corners[0, :, 0].min(), -1.0)
    np.testing.assert_allclose(corners[0, :, 2].max(), 12.0)
    k = np.array([[100.0, 0, 50], [0, 100.0, 50], [0, 0, 1]])
    uv, depth = project_cam_corners(corners, k)
    assert uv.shape == (1, 8, 2)
    assert (depth > 0).all()
    # center projects near the principal point
    assert abs(uv.mean(axis=(0, 1))[0] - 50.0) < 15.0
