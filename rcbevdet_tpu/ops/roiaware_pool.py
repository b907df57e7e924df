"""RoI-aware 3D pooling and points-in-boxes-3D, pure JAX.

TPU-native equivalents of the reference's ``roiaware_pool3d`` CUDA stack
(mmdet3d/ops/roiaware_pool3d/src/roiaware_pool3d_kernel.cu:1-366,
points_in_boxes_cuda.cu): per RoI box, points are transformed into the
box-local frame, binned onto a fixed (out_x, out_y, out_z) grid, and
pooled by max or mean.  The CUDA kernels parallelize over
(box, voxel, channel) with atomics; here the whole thing is a masked
one-hot bin assignment + segment reduction — static shapes, no atomics.

Used by second-stage RoI heads (PartA2/PointRCNN style) and the GT-paste
database tooling; not on the RCBEVDet forward path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def points_in_boxes_3d(points, boxes):
    """Boolean [N, M]: point inside rotated 3D box (gravity-centered).

    Args:
      points: [N, 3] xyz.
      boxes: [M, 7] (cx, cy, cz, dx, dy, dz, yaw), gravity-centered z.
    """
    d = points[:, None, :] - boxes[None, :, :3]  # [N, M, 3]
    c, s = jnp.cos(boxes[:, 6]), jnp.sin(boxes[:, 6])
    lx = d[..., 0] * c + d[..., 1] * s
    ly = -d[..., 0] * s + d[..., 1] * c
    lz = d[..., 2]
    return (
        (jnp.abs(lx) <= boxes[:, 3] / 2)
        & (jnp.abs(ly) <= boxes[:, 4] / 2)
        & (jnp.abs(lz) <= boxes[:, 5] / 2)
    )


def roiaware_pool3d(points, features, boxes, out_size, mode="max"):
    """Pool point features onto a per-RoI local voxel grid.

    Args:
      points: [N, 3] xyz.
      features: [N, C] per-point features.
      boxes: [M, 7] gravity-centered rotated boxes.
      out_size: (ox, oy, oz) static ints — the RoI-local grid.
      mode: "max" (empty voxels -> 0, like the CUDA maxpool) or "avg".

    Returns:
      [M, ox, oy, oz, C]
    """
    ox, oy, oz = out_size
    n, c = features.shape
    m = boxes.shape[0]

    d = points[:, None, :] - boxes[None, :, :3]
    cos, sin = jnp.cos(boxes[:, 6]), jnp.sin(boxes[:, 6])
    lx = d[..., 0] * cos + d[..., 1] * sin
    ly = -d[..., 0] * sin + d[..., 1] * cos
    lz = d[..., 2]

    dx, dy, dz = boxes[:, 3], boxes[:, 4], boxes[:, 5]
    inside = (
        (jnp.abs(lx) <= dx / 2) & (jnp.abs(ly) <= dy / 2)
        & (jnp.abs(lz) <= dz / 2)
    )  # [N, M]

    # local voxel index (CUDA kernel: floor((l + d/2) / d * out), clamped)
    ix = jnp.clip(
        jnp.floor((lx + dx / 2) / jnp.maximum(dx, 1e-6) * ox), 0, ox - 1
    ).astype(jnp.int32)
    iy = jnp.clip(
        jnp.floor((ly + dy / 2) / jnp.maximum(dy, 1e-6) * oy), 0, oy - 1
    ).astype(jnp.int32)
    iz = jnp.clip(
        jnp.floor((lz + dz / 2) / jnp.maximum(dz, 1e-6) * oz), 0, oz - 1
    ).astype(jnp.int32)

    nvox = ox * oy * oz
    # flat segment id per (point, box): box * nvox + voxel; invalid -> trash
    seg = jnp.where(
        inside, jnp.arange(m)[None, :] * nvox + (ix * oy + iy) * oz + iz,
        m * nvox,
    ).astype(jnp.int32)  # [N, M]

    feats_rep = jnp.broadcast_to(features[:, None, :], (n, m, c))
    seg_flat = seg.reshape(-1)
    feats_flat = feats_rep.reshape(-1, c)

    if mode == "max":
        out = jnp.full((m * nvox + 1, c), -jnp.inf, features.dtype)
        out = out.at[seg_flat].max(
            jnp.where(inside.reshape(-1, 1), feats_flat, -jnp.inf),
            mode="drop",
        )
        out = jnp.where(jnp.isfinite(out), out, 0.0)
    elif mode == "avg":
        summed = jax.ops.segment_sum(
            jnp.where(inside.reshape(-1, 1), feats_flat, 0.0), seg_flat,
            num_segments=m * nvox + 1,
        )
        counts = jax.ops.segment_sum(
            inside.reshape(-1).astype(features.dtype), seg_flat,
            num_segments=m * nvox + 1,
        )
        out = summed / jnp.maximum(counts, 1.0)[:, None]
    else:
        raise ValueError(f"unknown mode {mode!r}")
    return out[: m * nvox].reshape(m, ox, oy, oz, c)
