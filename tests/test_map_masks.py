"""Map-layer BEV mask rasterization tests (data/map_masks.py) and the
full map-seg target path through build_seg_masks (reference
LoadBEVSegmentation, pipelines/loading.py:2494-2622)."""

import numpy as np
import pytest

from rcbevdet_tpu.data.map_masks import (
    polygon_map_mask_fn,
    rasterize_polygons_in_patch,
)
from rcbevdet_tpu.data.seg_targets import build_seg_masks


def _square(cx, cy, half):
    return np.array([
        [cx - half, cy - half], [cx + half, cy - half],
        [cx + half, cy + half], [cx - half, cy + half],
    ])


def test_axis_aligned_patch_rasterization():
    # 20x20 m patch centered at origin, 10x10 canvas (2 m cells);
    # a 4x4 m square at the center covers the middle 2x2 cells
    mask = rasterize_polygons_in_patch(
        [_square(0.0, 0.0, 2.0)], (0.0, 0.0, 20.0, 20.0), 0.0, (10, 10)
    )
    assert mask.sum() == 4
    assert mask[4:6, 4:6].all()


def test_patch_center_offset_moves_mask():
    mask = rasterize_polygons_in_patch(
        [_square(6.0, 0.0, 2.0)], (0.0, 0.0, 20.0, 20.0), 0.0, (10, 10)
    )
    # square at +x -> columns shift right, rows stay centered
    assert mask[4:6, 7:9].all() and mask.sum() == 4


def test_patch_rotation_rotates_sampling():
    # rotating the PATCH by 90 deg maps patch +x onto global +y; a square
    # sitting at global +y lands at patch +x (right columns)
    mask = rasterize_polygons_in_patch(
        [_square(0.0, 6.0, 2.0)], (0.0, 0.0, 20.0, 20.0), 90.0, (10, 10)
    )
    assert mask[4:6, 7:9].all() and mask.sum() == 4


def test_rotated_square_area_preserved():
    # 45-deg rotated patch over a large square: covered area is invariant
    big = [_square(0.0, 0.0, 6.0)]
    m0 = rasterize_polygons_in_patch(big, (0.0, 0.0, 20.0, 20.0), 0.0,
                                     (40, 40))
    m45 = rasterize_polygons_in_patch(big, (0.0, 0.0, 20.0, 20.0), 45.0,
                                      (40, 40))
    # cell-center sampling loses corner cells under rotation: allow ~6%
    assert abs(int(m0.sum()) - int(m45.sum())) <= 0.08 * m0.sum()


def test_build_seg_masks_with_polygon_provider():
    """End-to-end seg-target path: ego pose + LAYER_MAPPINGS union +
    devkit transpose convention, driven by the polygon provider."""
    layers = {
        "loc0": {
            "road_segment": [_square(10.0, 0.0, 4.0)],
            "lane": [_square(-10.0, 0.0, 4.0)],
            "road_divider": [_square(0.0, 10.0, 2.0)],
            "lane_divider": [],
        }
    }
    fn = polygon_map_mask_fn(layers)
    ego2global = np.eye(4)
    out = build_seg_masks(
        classes=["drivable_area*", "divider"],
        gt_boxes=np.zeros((0, 9), np.float32),
        gt_labels=np.zeros((0,), np.int64),
        class_names=["car"],
        xbound=(-16.0, 16.0, 2.0),
        ybound=(-16.0, 16.0, 2.0),
        location="loc0",
        ego2global=ego2global,
        map_mask_fn=fn,
    )
    assert out.shape == (16, 16, 2)
    drivable, divider = out[..., 0], out[..., 1]
    # drivable = union of the two 8x8 m squares -> 4x4 cells each
    assert drivable.sum() == 2 * 16
    assert divider.sum() == 4  # one 4x4 m square -> 2x2 cells
    # the devkit mask is transposed into [y, x] rows by build_seg_masks
    # (reference loading.py:2575): the +x drivable square must land in
    # right-half COLUMNS, the -x one in the left half
    assert drivable[:, 8:].sum() == 16 and drivable[:, :8].sum() == 16


def test_unknown_location_gives_empty_masks():
    fn = polygon_map_mask_fn({})
    m = fn("nowhere", (0, 0, 10, 10), 0.0, ["lane"], (4, 4))
    assert m.shape == (1, 4, 4) and not m.any()
