"""Image backbone (ResNet) and BEV encoder (CustomResNet) in flax/NHWC.

- ``ResNet`` is the torchvision-compatible 'pytorch'-style ResNet used as the
  reference's image backbone (config rcbevdet-...py:58-68: depth 50,
  out_indices (2, 3) -> C4 @ 1/16 and C5 @ 1/32).
- ``CustomResNet`` is the BEV encoder backbone (reference
  models/backbones/resnet.py:12): stages of BasicBlocks whose downsample
  shortcut is a bare 3x3 conv (no BN), emitting the per-stage features
  selected by ``backbone_output_ids``.
"""

from __future__ import annotations

from typing import Sequence, Tuple

from flax import linen as nn

from .layers import BasicBlock, BatchNorm, Bottleneck
RESNET_LAYERS = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3),
                 101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}


class ResNet(nn.Module):
    depth: int = 50
    out_indices: Tuple[int, ...] = (2, 3)
    stem_channels: int = 64

    @nn.compact
    def __call__(self, x, train=False, update_stats=True):
        blocks = RESNET_LAYERS[self.depth]
        bottleneck = self.depth >= 50

        x = nn.Conv(
            self.stem_channels, (7, 7), strides=(2, 2),
            padding=((3, 3), (3, 3)), use_bias=False, name="conv1",
        )(x)
        x = BatchNorm(name="bn1")(
            x, use_running_average=not train, update_stats=update_stats
        )
        x = nn.relu(x)
        # reduce_window costs 0.44 ms here (4x its memory floor), but BOTH
        # replacements measured WORSE in-graph: the r4 9-strided-slice XLA
        # max (+1.4 ms) AND the r5 Pallas phase-split kernel
        # (ops/conv_pallas.py::maxpool3x3_s2; backbone 2.22 -> 3.52 ms +
        # 0.55 ms of new phase-slice copies — the stem's producer/consumer
        # convs lose their fused layouts).  Keep the native lowering; the
        # kernel stays available (tested) for standalone use.
        x = nn.max_pool(
            x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
        )

        outs = []
        width = 64
        for stage in range(4):
            stride = 1 if stage == 0 else 2
            for i in range(blocks[stage]):
                name = f"layer{stage + 1}_{i}"
                if bottleneck:
                    x = Bottleneck(
                        features=width * 2**stage,
                        stride=stride if i == 0 else 1,
                        downsample=(i == 0),
                        name=name,
                    )(x, train=train, update_stats=update_stats)
                else:
                    x = BasicBlock(
                        features=width * 2**stage,
                        stride=stride if i == 0 else 1,
                        downsample=(i == 0 and (stage > 0)),
                        name=name,
                    )(x, train=train, update_stats=update_stats)
            if stage in self.out_indices:
                outs.append(x)
        return outs


class CustomResNet(nn.Module):
    """BEV-space residual encoder (reference models/backbones/resnet.py:12)."""

    num_layer: Sequence[int] = (2, 2, 2)
    num_channels: Sequence[int] = (160, 320, 640)
    stride: Sequence[int] = (2, 2, 2)
    backbone_output_ids: Sequence[int] | None = None

    @nn.compact
    def __call__(self, x, train=False, update_stats=True, fast=False):
        out_ids = (
            tuple(range(len(self.num_layer)))
            if self.backbone_output_ids is None
            else tuple(self.backbone_output_ids)
        )
        feats = []
        for i in range(len(self.num_layer)):
            for j in range(self.num_layer[i]):
                x = BasicBlock(
                    features=self.num_channels[i],
                    stride=self.stride[i] if j == 0 else 1,
                    downsample=(j == 0),
                    downsample_conv_only=True,  # bare-conv shortcut (resnet.py:55-60)
                    name=f"layer{i}_{j}",
                )(x, train=train, update_stats=update_stats, fast=fast)
            if i in out_ids:
                feats.append(x)
        return feats
