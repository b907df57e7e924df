"""Native (C++) rotated NMS vs the NumPy reference implementation."""

import numpy as np
import pytest

from rcbevdet_tpu.core import nms_native
from rcbevdet_tpu.core.nms import rotated_iou_matrix_np, rotated_nms_np

pytestmark = pytest.mark.skipif(
    not nms_native.available(), reason="no C++ toolchain"
)


def test_native_iou_matches_numpy(rng):
    n = 40
    boxes = np.zeros((n, 5), np.float32)
    boxes[:, :2] = rng.uniform(-10, 10, (n, 2))
    boxes[:, 2:4] = rng.uniform(0.5, 5, (n, 2))
    boxes[:, 4] = rng.uniform(-np.pi, np.pi, n)
    ref = rotated_iou_matrix_np(boxes, boxes)
    got = nms_native.rotated_iou_matrix(boxes, boxes)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_native_nms_matches_numpy(rng):
    n = 120
    boxes = np.zeros((n, 5), np.float32)
    boxes[:, :2] = rng.uniform(-20, 20, (n, 2))
    boxes[:, 2:4] = rng.uniform(1, 6, (n, 2))
    boxes[:, 4] = rng.uniform(-np.pi, np.pi, n)
    scores = rng.random(n).astype(np.float32)
    ref = rotated_nms_np(boxes, scores, 0.3)
    got = nms_native.rotated_nms(boxes, scores, 0.3)
    np.testing.assert_array_equal(sorted(got), sorted(ref))
