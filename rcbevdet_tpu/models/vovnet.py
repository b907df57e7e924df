"""VoVNetV2 (V2-99) image backbone in flax/NHWC.

The reference carries ``vovnet.py`` (CenterMask's VoVNetCP) for its V2-99
configs (RCBEVDet C+R V2-99: nuScenes test NDS 63.9, reference README test
table; the module is commented out of the default registry,
backbones/__init__.py:14).  This is the standard architecture: a 3-conv
stem, then four stages of OSA modules — 5 sequential 3x3 convs whose outputs
(plus the input) concatenate into a 1x1 projection, gated by an eSE channel
attention, with identity residuals inside a stage.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import BatchNorm

VOVNET_SPECS = {
    # name: (stem_ch, stage_conv_ch, stage_out_ch, blocks_per_stage, layers_per_block)
    "V-39": ((64, 64, 128), (128, 160, 192, 224), (256, 512, 768, 1024),
             (1, 1, 2, 2), 5),
    "V-57": ((64, 64, 128), (128, 160, 192, 224), (256, 512, 768, 1024),
             (1, 1, 4, 3), 5),
    "V-99": ((64, 64, 128), (128, 160, 192, 224), (256, 512, 768, 1024),
             (1, 3, 9, 3), 5),
}


def _hsigmoid(x):
    return jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


class ConvBN(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x, train=False, update_stats=True):
        p = self.kernel // 2
        x = nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride), padding=((p, p), (p, p)),
            use_bias=False, name="conv",
        )(x)
        x = BatchNorm(name="bn")(
            x, use_running_average=not train, update_stats=update_stats
        )
        return nn.relu(x)


class eSE(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x):
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = nn.Conv(self.channels, (1, 1), name="fc")(g)
        return x * _hsigmoid(g)


class OSAModule(nn.Module):
    stage_ch: int
    concat_ch: int
    layers_per_block: int = 5
    identity: bool = False

    @nn.compact
    def __call__(self, x, train=False, update_stats=True):
        identity = x
        outs = [x]
        for i in range(self.layers_per_block):
            x = ConvBN(self.stage_ch, name=f"layer{i}")(
                x, train=train, update_stats=update_stats
            )
            outs.append(x)
        x = jnp.concatenate(outs, axis=-1)
        x = ConvBN(self.concat_ch, kernel=1, name="concat")(
            x, train=train, update_stats=update_stats
        )
        x = eSE(self.concat_ch, name="ese")(x)
        if self.identity:
            x = x + identity
        return x


class VoVNetV2(nn.Module):
    spec: str = "V-99"
    out_indices: Tuple[int, ...] = (2, 3)  # stage4 (1/16), stage5 (1/32)

    @nn.compact
    def __call__(self, x, train=False, update_stats=True):
        stem_ch, conv_ch, out_ch, blocks, layers = VOVNET_SPECS[self.spec]
        x = ConvBN(stem_ch[0], stride=2, name="stem0")(
            x, train=train, update_stats=update_stats
        )
        x = ConvBN(stem_ch[1], stride=1, name="stem1")(
            x, train=train, update_stats=update_stats
        )
        x = ConvBN(stem_ch[2], stride=2, name="stem2")(
            x, train=train, update_stats=update_stats
        )
        outs = []
        for s in range(4):
            if s > 0:
                # torch MaxPool2d(3, stride=2, ceil_mode=True) semantics
                # (vovnet.py:248): windows START at 0 (no left padding) and
                # ceil_mode appends a final clipped window; a symmetric
                # pad=1 pool shifts every window by one and changes values
                h, w = x.shape[1:3]
                oh = -(-(h - 1) // 2)  # ceil((h-3)/2)+1
                ow = -(-(w - 1) // 2)
                pad_h = max(0, 2 * (oh - 1) + 3 - h)
                pad_w = max(0, 2 * (ow - 1) + 3 - w)
                x = nn.max_pool(
                    jnp.pad(
                        x,
                        ((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
                        constant_values=-jnp.inf,
                    ),
                    (3, 3), strides=(2, 2),
                )
            for b in range(blocks[s]):
                x = OSAModule(
                    stage_ch=conv_ch[s], concat_ch=out_ch[s],
                    layers_per_block=layers,
                    identity=(b > 0),
                    name=f"stage{s + 2}_block{b}",
                )(x, train=train, update_stats=update_stats)
            if s in self.out_indices:
                outs.append(x)
        return outs
