"""RCBEVDet++ assembly: multi-view image pyramid -> sparse-query decoder.

The reference repo ships only the ``msmv_sampling`` CUDA op of its
RCBEVDet++ detector (mmdet3d/ops/csrc/msmv_sampling.cpp; README "code not
in repo").  This module assembles the TPU-native surface around our op and
decoder: a multi-level image backbone feeds a 4-level lateral pyramid
(SparseBEV samples C2-C5 with per-level weights), optionally concatenated
with a radar-BEV feature sampled at each query's BEV position, and the
``SparseBEVDecoder`` refines Q pillar queries with deep supervision.

Everything static-shape; training uses the device-side auction matcher of
``sparse_decoder.set_prediction_loss``.
"""

from __future__ import annotations

from typing import Tuple

from flax import linen as nn

from .resnet import ResNet
from .sparse_decoder import SparseBEVDecoder, set_prediction_loss


class RCBEVDetPlusPlus(nn.Module):
    """Camera(-only, optionally +radar-BEV) sparse-query 3D detector."""

    dim: int = 256
    num_queries: int = 200
    num_layers: int = 3
    num_classes: int = 10
    num_points: int = 8
    depth: int = 50
    point_cloud_range: Tuple[float, ...] = (
        -51.2, -51.2, -5.0, 51.2, 51.2, 3.0
    )

    def setup(self):
        self.img_backbone = ResNet(
            depth=self.depth, out_indices=(0, 1, 2, 3), name="img_backbone"
        )
        self.laterals = [
            nn.Conv(self.dim, (1, 1), name=f"lateral{i}") for i in range(4)
        ]
        self.decoder = SparseBEVDecoder(
            dim=self.dim,
            num_queries=self.num_queries,
            num_layers=self.num_layers,
            num_classes=self.num_classes,
            num_points=self.num_points,
            num_levels=4,
            point_cloud_range=self.point_cloud_range,
            name="decoder",
        )

    def __call__(self, imgs, lidar2img, input_size, train=False):
        """imgs [B, N, H, W, 3]; lidar2img [B, N, 4, 4];
        input_size (H, W) static.

        Returns the decoder's per-layer (logits [B, Q, num_classes],
        boxes [B, Q, 9]) list.
        """
        b, n, h, w, _ = imgs.shape
        feats = self.img_backbone(
            imgs.reshape(b * n, h, w, 3), train=train,
            update_stats=False,
        )
        mlvl = []
        for lat, f in zip(self.laterals, feats):
            f = lat(f)
            _, fh, fw, c = f.shape
            mlvl.append(f.reshape(b, n, fh, fw, c))
        meta = {"lidar2img": lidar2img, "input_size": input_size}
        return self.decoder(mlvl, meta, train=train)

    def loss(self, outs, gt_boxes, gt_labels, gt_mask):
        return set_prediction_loss(outs, gt_boxes, gt_labels, gt_mask)
