"""Necks: CustomFPN (image), FPN_LSS (BEV), SECONDFPN (radar BEV), in NHWC.

- CustomFPN (reference models/necks/fpn.py:11): lateral 1x1 convs, top-down
  nearest-upsample adds, 3x3 output conv only for the levels in ``out_ids``.
  The RCBEVDet config uses in_channels [1024, 2048] -> one 512-ch output at
  1/16 (config rcbevdet-...py:69-75).
- FPN_LSS (reference models/necks/lss_fpn.py:11): concat stride-1 feature
  with x4-upsampled stride-4 feature, two 3x3 conv-BN-ReLU, then x2 upsample
  + 3x3 conv-BN-ReLU + 1x1 conv.
- SECONDFPN (reference models/necks/second_fpn.py:12): per-scale deconv (or
  conv for downscale) + BN + ReLU, concatenated.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..ops.warp import bilinear_resize, nearest_resize
from .layers import BatchNorm, ConvKernel, conv_bn_relu_3x3


class CustomFPN(nn.Module):
    out_channels: int = 512
    num_ins: int = 2
    out_ids: Sequence[int] = (0,)

    @nn.compact
    def __call__(self, feats, train=False, update_stats=True):
        laterals = [
            nn.Conv(self.out_channels, (1, 1), name=f"lateral_{i}")(feats[i])
            for i in range(self.num_ins)
        ]
        for i in range(self.num_ins - 1, 0, -1):
            h, w = laterals[i - 1].shape[1:3]
            laterals[i - 1] = laterals[i - 1] + nearest_resize(laterals[i], h, w)
        return [
            nn.Conv(
                self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                name=f"fpn_conv_{i}",
            )(laterals[i])
            for i in self.out_ids
        ]


class FPN_LSS(nn.Module):
    out_channels: int = 256
    scale_factor: int = 4
    extra_upsample: int = 2
    input_feature_index: Sequence[int] = (0, 2)

    @nn.compact
    def __call__(self, feats, train=False, update_stats=True, fast=False):
        x2 = feats[self.input_feature_index[0]]
        x1 = feats[self.input_feature_index[1]]
        h, w = x2.shape[1:3]
        x1 = bilinear_resize(x1, h, w, align_corners=True)
        x = jnp.concatenate([x2, x1], axis=-1)

        cf = 2 if self.extra_upsample else 1
        k1 = ConvKernel((3, 3, x.shape[-1], self.out_channels * cf),
                        name="conv1")()
        x = conv_bn_relu_3x3(x, k1, BatchNorm(name="bn1"),
                             train, update_stats, fast)
        k2 = ConvKernel((3, 3, x.shape[-1], self.out_channels * cf),
                        name="conv2")()
        x = conv_bn_relu_3x3(x, k2, BatchNorm(name="bn2"),
                             train, update_stats, fast)
        if self.extra_upsample:
            x = bilinear_resize(
                x, h * self.extra_upsample, w * self.extra_upsample,
                align_corners=True,
            )
            k3 = ConvKernel((3, 3, x.shape[-1], self.out_channels),
                            name="up2_conv")()
            x = conv_bn_relu_3x3(x, k3, BatchNorm(name="up2_bn"),
                                 train, update_stats, fast)
            x = nn.Conv(self.out_channels, (1, 1), name="up2_out")(x)
        return x


class SECONDFPN(nn.Module):
    out_channels: Sequence[int] = (128, 128, 128)
    upsample_strides: Sequence[float] = (0.5, 1, 2)
    use_conv_for_no_stride: bool = True
    bn_momentum: float = 0.01
    bn_eps: float = 1e-3

    @nn.compact
    def __call__(self, feats, train=False, update_stats=True):
        ups = []
        for i, (oc, stride) in enumerate(
            zip(self.out_channels, self.upsample_strides)
        ):
            x = feats[i]
            if stride > 1:
                s = int(stride)
                x = nn.ConvTranspose(
                    oc, (s, s), strides=(s, s), use_bias=False,
                    transpose_kernel=True, name=f"deblock_{i}_deconv",
                )(x)
            elif stride == 1 and not self.use_conv_for_no_stride:
                x = nn.ConvTranspose(
                    oc, (1, 1), strides=(1, 1), use_bias=False,
                    transpose_kernel=True, name=f"deblock_{i}_deconv",
                )(x)
            else:
                s = int(round(1 / stride))
                x = nn.Conv(
                    oc, (s, s), strides=(s, s), use_bias=False,
                    name=f"deblock_{i}_conv",
                )(x)
            x = BatchNorm(
                momentum=self.bn_momentum, epsilon=self.bn_eps,
                name=f"deblock_{i}_bn",
            )(x, use_running_average=not train, update_stats=update_stats)
            ups.append(nn.relu(x))
        return jnp.concatenate(ups, axis=-1) if len(ups) > 1 else ups[0]


class SECOND(nn.Module):
    """SECOND conv backbone on the radar BEV canvas (reference
    models/backbones/second.py:12; config: out [64, 128, 256],
    layers [3, 5, 5], strides [2, 2, 2])."""

    out_channels: Sequence[int] = (64, 128, 256)
    layer_nums: Sequence[int] = (3, 5, 5)
    layer_strides: Sequence[int] = (2, 2, 2)
    bn_momentum: float = 0.01
    bn_eps: float = 1e-3

    @nn.compact
    def __call__(self, x, train=False, update_stats=True):
        outs = []
        for i, n_layers in enumerate(self.layer_nums):
            for j in range(n_layers + 1):  # first conv (strided) + n layers
                x = nn.Conv(
                    self.out_channels[i], (3, 3),
                    strides=(self.layer_strides[i] if j == 0 else 1,) * 2,
                    padding=((1, 1), (1, 1)), use_bias=False,
                    name=f"block{i}_conv{j}",
                )(x)
                x = BatchNorm(
                    momentum=self.bn_momentum, epsilon=self.bn_eps,
                    name=f"block{i}_bn{j}",
                )(x, use_running_average=not train, update_stats=update_stats)
                x = nn.relu(x)
            outs.append(x)
        return outs
