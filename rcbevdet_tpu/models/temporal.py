"""Temporal BEV feature alignment (grid-sample warp).

Re-design of ``BEVDet4D.gen_grid``/``shift_feature`` (reference
bevdet_rc.py:585-657 and bevdet.py:596-670): warp an adjacent frame's BEV
feature into the key ego frame via the homography

  feat2bev^-1 @ (bda @ c02l0) @ inv(bda_adj @ c12l0) @ feat2bev

sampled bilinearly with align_corners=True.  Used by the
``align_after_view_transfromation`` mode and the cached-BEV sequential
inference path (the FPS-benchmark semantics, SURVEY.md §3.4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.linalg import inv_affine4
from ..ops.warp import grid_sample_2d_packed


def _embed4(bda):
    """[B, 3, 3] -> [B, 4, 4] with 1 at (3, 3)."""
    b = bda.shape[0]
    out = jnp.zeros((b, 4, 4), bda.dtype)
    out = out.at[:, :3, :3].set(bda)
    out = out.at[:, 3, 3].set(1.0)
    return out


def shift_bev(feat, sensor2keyego_key, sensor2keyego_adj, bda,
              grid_lower_bound, grid_interval, bda_adj=None,
              fast_inference=False, flat_channels=False, prepacked=False,
              flat_groups=1, frame_order=None):
    """Warp adjacent-frame BEV features into the key frame.

    Args:
      feat: [B, H, W, C] adjacent-frame BEV feature (H=y rows, W=x cols).
      sensor2keyego_key/adj: [B, N, 4, 4]; camera 0 is used (bevdet_rc.py
        :604-607 picks sensor 0 of each frame).
      bda: [B, 3, 3]; bda_adj optional.
      grid_lower_bound/interval: (x, y) of the BEV grid.
      flat_channels: return [H, W, B*C] (batch stacked into channel groups,
        written in that layout directly by the combine kernel) — the
        cached-BEV path's concat feed.

    Returns:
      [B, H, W, C] warped feature ([H, W, B*C] with ``flat_channels``).
    """
    b, h, w, c = feat.shape  # prepacked: c = 4 * true channels
    c02l0 = sensor2keyego_key[:, 0]  # [B, 4, 4]
    c12l0 = sensor2keyego_adj[:, 0]
    bda4 = _embed4(bda)
    c02l0 = bda4 @ c02l0
    c12l0 = (_embed4(bda_adj) if bda_adj is not None else bda4) @ c12l0
    l02l1 = c02l0 @ inv_affine4(c12l0)  # key ego -> adj ego
    # drop the z row/col (pure BEV homography), keep x, y, w
    keep = jnp.asarray([0, 1, 3])
    l02l1 = l02l1[:, keep][:, :, keep]  # [B, 3, 3]

    # homography math stays f32 even under bf16 activations: TPU LU
    # decomposition supports f32 only, and bf16 grid coords would misplace
    # the warp by whole cells
    import numpy as _np

    feat2bev = _np.array(
        [
            [grid_interval[0], 0.0, grid_lower_bound[0]],
            [0.0, grid_interval[1], grid_lower_bound[1]],
            [0.0, 0.0, 1.0],
        ],
        _np.float32,
    )
    l02l1 = l02l1.astype(jnp.float32)
    # constant 3x3 inverted on host (np), not via a device LU solve
    tf = (
        jnp.asarray(_np.linalg.inv(feat2bev))[None]
        @ l02l1 @ jnp.asarray(feat2bev)[None]
    )  # [B, 3, 3]

    xs = jnp.arange(w, dtype=jnp.float32)
    ys = jnp.arange(h, dtype=jnp.float32)
    xx, yy = jnp.meshgrid(xs, ys, indexing="xy")  # [H, W]
    grid = jnp.stack([xx, yy, jnp.ones_like(xx)], -1)  # [H, W, 3]
    warped = jnp.einsum("bij,hwj->bhwi", tf, grid)
    gx = warped[..., 0] / (w - 1.0) * 2.0 - 1.0
    gy = warped[..., 1] / (h - 1.0) * 2.0 - 1.0
    g = jnp.stack([gx, gy], -1)  # [B, H, W, 2]
    # split_batch_gather A/B (r5, 8-stream serving): the per-frame
    # VMEM-table gathers pay ~10.5 MB of staging copies per frame (2.1 ms
    # of 'squeeze' copies over 64 frames) BUT one global-row HBM gather
    # measured 13.4 ms vs split's 4.0+2.1 — wide 640-byte rows from HBM
    # run ~13 ns/row vs ~0.9 from a VMEM-resident table.  Split stays.
    warp = jax.checkpoint(
        lambda f, gg: grid_sample_2d_packed(
            f, gg, align_corners=True, split_batch_gather=fast_inference,
            pallas_combine=fast_inference, flat_channels=flat_channels,
            prepacked=prepacked, flat_groups=flat_groups,
            frame_order=frame_order,
        )
    )
    out = warp(feat, g)
    return out.astype(feat.dtype)
