"""Map-layer BEV mask rasterization (the ``map_mask_fn`` implementations).

The reference's LoadBEVSegmentation queries the nuScenes map expansion via
``NuScenesMap.get_map_mask`` per sample (pipelines/loading.py:2518-2575).
Two providers with that exact call signature
``(location, patch_box, patch_angle_deg, layer_names, canvas_size) ->
[L, H, W]``:

- ``nuscenes_map_mask_fn(dataset_root)``: the devkit-backed provider,
  caching one NuScenesMap per location (reference loading.py:2518-2520)
  — use when the nuScenes map expansion is on disk.
- ``polygon_map_mask_fn(layers_by_location)``: a self-contained rasterizer
  over in-memory layer polygons in GLOBAL coordinates — the same
  patch-frame geometry (rotate the patch by patch_angle about its center,
  rasterize into canvas rows=y/cols=x) without the devkit; serves custom
  maps and makes the seg-target path testable hermetically.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

LOCATIONS = (
    "boston-seaport",
    "singapore-hollandvillage",
    "singapore-onenorth",
    "singapore-queenstown",
)


def nuscenes_map_mask_fn(dataset_root: str):
    """Devkit-backed provider (requires the nuScenes map expansion)."""
    from nuscenes.map_expansion.map_api import NuScenesMap

    maps = {}

    def fn(location, patch_box, patch_angle, layer_names, canvas_size):
        if location not in maps:
            maps[location] = NuScenesMap(dataset_root, location)
        return maps[location].get_map_mask(
            patch_box, patch_angle, layer_names, canvas_size
        )

    return fn


def _points_in_polygon(px, py, poly):
    """Ray-casting point-in-polygon for flat point arrays."""
    inside = np.zeros(px.shape, bool)
    n = len(poly)
    j = n - 1
    for i in range(n):
        xi, yi = poly[i]
        xj, yj = poly[j]
        crosses = ((yi > py) != (yj > py)) & (
            px < (xj - xi) * (py - yi) / (yj - yi + 1e-12) + xi
        )
        inside ^= crosses
        j = i
    return inside


def rasterize_polygons_in_patch(polygons: Sequence[np.ndarray], patch_box,
                                patch_angle_deg: float, canvas_size):
    """[H, W] bool mask of a layer's polygons inside a rotated patch.

    Mirrors the devkit's patch geometry: patch_box = (cx, cy, patch_h,
    patch_w) in global coordinates; the patch is rotated by
    ``patch_angle_deg`` about its center; canvas rows index patch-frame y,
    columns index patch-frame x.  A cell is set when its CENTER lies
    inside a polygon (the devkit rasterizes with cv2.fillPoly; edge
    semantics differ by at most half a cell).
    """
    cx, cy, ph, pw = patch_box
    h, w = canvas_size
    a = np.deg2rad(patch_angle_deg)
    cos_a, sin_a = np.cos(a), np.sin(a)
    # patch-frame cell centers -> global
    xs = (np.arange(w) + 0.5) / w * pw - pw / 2
    ys = (np.arange(h) + 0.5) / h * ph - ph / 2
    xx, yy = np.meshgrid(xs, ys, indexing="xy")
    gx = cx + cos_a * xx - sin_a * yy
    gy = cy + sin_a * xx + cos_a * yy
    out = np.zeros((h, w), bool)
    for poly in polygons:
        poly = np.asarray(poly, np.float64)
        # cheap bbox rejection before the ray casting
        if (
            poly[:, 0].max() < gx.min() or poly[:, 0].min() > gx.max()
            or poly[:, 1].max() < gy.min() or poly[:, 1].min() > gy.max()
        ):
            continue
        out |= _points_in_polygon(gx, gy, poly)
    return out


def polygon_map_mask_fn(
    layers_by_location: Dict[str, Dict[str, List[np.ndarray]]]
):
    """Self-contained provider over in-memory global-frame polygons."""

    def fn(location, patch_box, patch_angle, layer_names, canvas_size):
        layers = layers_by_location.get(location, {})
        return np.stack([
            rasterize_polygons_in_patch(
                layers.get(name, ()), patch_box, patch_angle, canvas_size
            )
            for name in layer_names
        ])

    return fn
