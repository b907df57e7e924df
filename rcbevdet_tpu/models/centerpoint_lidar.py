"""CenterPoint-lidar (PointPillars variant), assembled from shared parts.

The reference carries the full mmdet3d CenterPoint lidar detector
(mmdet3d/models/detectors/centerpoint.py, voxel_encoders/pillar_encoder.py:
PillarFeatureNet, middle_encoders/pillar_scatter.py:PointPillarsScatter) as
the parent family of RCBEVDet's radar branch.  This is the TPU-native
equivalent: fixed-capacity voxelization (ops/voxelize.py), a masked
PillarFeatureNet, the shared pillar->canvas scatter, SECOND(+FPN) and the
CenterPoint head — everything static-shape.

Reference: pillar_encoder.py:9-140 (PFN decoration: cluster-center and
voxel-center offsets, optional distance), centerpoint.py:28-96.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.voxelize import voxelize_pillars
from .centerpoint_head import CenterHead
from .fpn import SECOND, SECONDFPN
from .layers import BatchNorm
from .pillar_scatter import scatter_pillars


class PillarFeatureNet(nn.Module):
    """Masked PFN: decorate points, Dense-BN-ReLU stack, per-pillar max.

    Matches the reference PillarFeatureNet semantics
    (pillar_encoder.py:64-140): features = [raw, cluster-offset xyz,
    center-offset xy], linear+BN1d+ReLU per PFNLayer, final max over the
    points of each pillar.
    """

    feat_channels: Tuple[int, ...] = (64,)
    voxel_size: Tuple[float, float, float] = (0.2, 0.2, 8.0)
    point_cloud_range: Tuple[float, ...] = (
        -51.2, -51.2, -5.0, 51.2, 51.2, 3.0
    )
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, features, num_points, coors, pillar_mask,
                 train=False, update_stats=True):
        b, p, k, d = features.shape
        pc = self.point_cloud_range
        vx, vy = self.voxel_size[:2]

        point_mask = (
            jnp.arange(k)[None, None, :] < num_points[..., None]
        ).astype(features.dtype)
        pm = point_mask[..., None]
        denom = jnp.maximum(num_points[..., None, None], 1).astype(
            features.dtype
        )

        mean_xyz = jnp.sum(features[..., :3] * pm, axis=2, keepdims=True) / denom
        f_cluster = features[..., :3] - mean_xyz

        cx = coors[..., 2].astype(features.dtype)[..., None]
        cy = coors[..., 1].astype(features.dtype)[..., None]
        f_center = jnp.stack(
            [
                features[..., 0] - (cx * vx + vx / 2 + pc[0]),
                features[..., 1] - (cy * vy + vy / 2 + pc[1]),
            ],
            axis=-1,
        )

        x = jnp.concatenate([features, f_cluster, f_center], axis=-1) * pm
        if self.compute_dtype is not None:
            x = x.astype(self.compute_dtype)
        stats_mask = jnp.broadcast_to(pillar_mask[..., None], (b, p, k))
        for i, ch in enumerate(self.feat_channels):
            x = nn.Dense(ch, use_bias=False, name=f"pfn{i}_linear")(x)
            x = BatchNorm(momentum=0.01, epsilon=1e-3, name=f"pfn{i}_bn")(
                x, use_running_average=not train, update_stats=update_stats,
                mask=stats_mask,
            )
            x = nn.relu(x)
        # final per-pillar max over points (masked: padded slots -> -inf)
        neg = jnp.asarray(-1e9, x.dtype)
        x = jnp.where(pm > 0, x, neg)
        x = jnp.max(x, axis=2)
        return jnp.where(pillar_mask[..., None], x, 0.0)


class CenterPointPillars(nn.Module):
    """Lidar-only CenterPoint with a PointPillars encoder."""

    num_classes: int = 10
    max_pillars: int = 12000
    max_points_per_pillar: int = 20
    pfn_channels: Tuple[int, ...] = (64,)
    voxel_size: Tuple[float, float, float] = (0.2, 0.2, 8.0)
    point_cloud_range: Tuple[float, ...] = (
        -51.2, -51.2, -5.0, 51.2, 51.2, 3.0
    )
    second_channels: Tuple[int, ...] = (64, 128, 256)
    second_strides: Tuple[int, ...] = (2, 2, 2)
    fpn_out_channels: Tuple[int, ...] = (128, 128, 128)
    compute_dtype: Any = None

    def setup(self):
        self.pfn = PillarFeatureNet(
            feat_channels=self.pfn_channels,
            voxel_size=self.voxel_size,
            point_cloud_range=self.point_cloud_range,
            compute_dtype=self.compute_dtype,
            name="pts_voxel_encoder",
        )
        self.backbone = SECOND(
            out_channels=tuple(self.second_channels),
            layer_strides=tuple(self.second_strides),
            name="pts_backbone",
        )
        self.neck = SECONDFPN(
            out_channels=tuple(self.fpn_out_channels),
            upsample_strides=(1, 2, 4),
            name="pts_neck",
        )
        self.head = CenterHead(
            in_channels=sum(self.fpn_out_channels),
            num_classes=self.num_classes,
            name="pts_bbox_head",
        )

    def __call__(self, points, point_mask, train=False):
        """points [B, N, D] (first 3 dims x,y,z); point_mask [B, N]."""
        pc = self.point_cloud_range
        nx = int(round((pc[3] - pc[0]) / self.voxel_size[0]))
        ny = int(round((pc[4] - pc[1]) / self.voxel_size[1]))

        pd = jax.vmap(
            lambda pts, m: voxelize_pillars(
                pts, m, self.point_cloud_range, self.voxel_size,
                self.max_pillars, self.max_points_per_pillar,
            )
        )(points, point_mask)

        pillar_feats = self.pfn(
            pd.features, pd.num_points, pd.coors, pd.pillar_mask, train=train
        )
        # unrolled over B: XLA's batched-scatter lowering serializes
        # through layout-hostile while loops (see pillar_scatter.py)
        canvas = jnp.stack(
            [
                scatter_pillars(pillar_feats[i], pd.coors[i],
                                pd.pillar_mask[i], ny, nx)
                for i in range(pillar_feats.shape[0])
            ]
        )
        feats = self.backbone(canvas, train=train)
        x = self.neck(feats, train=train)
        return self.head(x, train=train)
