"""Fixed-capacity hard voxelization (pillar binning) in pure JAX.

TPU-native replacement for mmcv.ops.Voxelization as used by the reference's
radar branch (bevdet_rc.py:106,168-194: max_num_points=10, voxel_size
[0.2, 0.2, 8], max_voxels 90k/120k).  The CUDA voxelizer emits a variable
number of voxels; here everything is static: ``max_pillars`` pillar slots of
``max_points_per_pillar`` points each, with validity masks.  Points are
assigned to pillars by a stable sort over their voxel id, which preserves the
reference's first-come-first-kept semantics for overflowing pillars.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class PillarData(NamedTuple):
    """Static-shape pillarized point cloud for one sample.

    Attributes:
      features: [P, K, D] per-point features, zero-padded.
      num_points: [P] int32 number of valid points in each pillar (<= K).
      coors: [P, 3] int32 (z, y, x) voxel coordinates; (-1,-1,-1) for padding.
      pillar_mask: [P] bool validity of each pillar slot.
    """

    features: jnp.ndarray
    num_points: jnp.ndarray
    coors: jnp.ndarray
    pillar_mask: jnp.ndarray


def voxelize_pillars(
    points,
    point_mask,
    point_cloud_range,
    voxel_size,
    max_pillars,
    max_points_per_pillar,
):
    """Bin padded points into fixed-capacity pillars.

    Args:
      points: [N, D] points, first 3 dims are x, y, z.
      point_mask: [N] bool validity mask of the padded point array.
      point_cloud_range: (x0, y0, z0, x1, y1, z1).
      voxel_size: (vx, vy, vz).
      max_pillars: static pillar capacity P.
      max_points_per_pillar: static per-pillar point capacity K.

    Returns:
      PillarData with static shapes.
    """
    n, d = points.shape
    x0, y0, z0, x1, y1, z1 = point_cloud_range
    vx, vy, vz = voxel_size
    nx = int(round((x1 - x0) / vx))
    ny = int(round((y1 - y0) / vy))

    ix = jnp.floor((points[:, 0] - x0) / vx).astype(jnp.int32)
    iy = jnp.floor((points[:, 1] - y0) / vy).astype(jnp.int32)
    iz_ok = (points[:, 2] >= z0) & (points[:, 2] < z1)
    valid = (
        point_mask
        & (ix >= 0)
        & (ix < nx)
        & (iy >= 0)
        & (iy < ny)
        & iz_ok
    )
    big = nx * ny  # sentinel id sorting after every real voxel
    vox_id = jnp.where(valid, iy * nx + ix, big)

    # Stable sort keeps original point order within a voxel (first-come kept).
    order = jnp.argsort(vox_id, stable=True)
    vox_sorted = vox_id[order]
    pts_sorted = points[order]
    valid_sorted = valid[order]

    # Run-length structure over the sorted voxel ids.
    newseg = jnp.concatenate(
        [jnp.array([True]), vox_sorted[1:] != vox_sorted[:-1]]
    )
    newseg = newseg & valid_sorted
    pillar_of_point = jnp.cumsum(newseg.astype(jnp.int32)) - 1  # [N]
    # Slot of each point inside its pillar = index - start index of its run.
    idx = jnp.arange(n, dtype=jnp.int32)
    # log-depth cumulative max: jnp.maximum.accumulate lowers to a
    # sequential 1200-iteration while loop on TPU (~2 ms/step measured)
    run_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(newseg, idx, -1)
    )
    slot = idx - run_start

    keep = valid_sorted & (slot < max_points_per_pillar) & (
        pillar_of_point < max_pillars
    ) & (pillar_of_point >= 0)

    p_idx = jnp.where(keep, pillar_of_point, max_pillars)
    s_idx = jnp.where(keep, slot, 0)

    features = jnp.zeros((max_pillars + 1, max_points_per_pillar, d), points.dtype)
    features = features.at[p_idx, s_idx].set(
        jnp.where(keep[:, None], pts_sorted, 0.0), mode="drop"
    )
    features = features[:max_pillars]

    counts = jnp.zeros((max_pillars + 1,), jnp.int32)
    counts = counts.at[p_idx].add(keep.astype(jnp.int32), mode="drop")
    num_points = counts[:max_pillars]

    # Voxel coordinates of each pillar from the id of its first point.
    pillar_vox_id = jnp.full((max_pillars + 1,), big, jnp.int32)
    first = newseg & keep
    pillar_vox_id = pillar_vox_id.at[
        jnp.where(first, pillar_of_point, max_pillars)
    ].set(jnp.where(first, vox_sorted, big), mode="drop")
    pillar_vox_id = pillar_vox_id[:max_pillars]
    pillar_mask = (pillar_vox_id < big) & (num_points > 0)
    cy = jnp.where(pillar_mask, pillar_vox_id // nx, -1)
    cx = jnp.where(pillar_mask, pillar_vox_id % nx, -1)
    cz = jnp.where(pillar_mask, 0, -1)
    coors = jnp.stack([cz, cy, cx], axis=-1).astype(jnp.int32)

    return PillarData(features, num_points, coors, pillar_mask)
