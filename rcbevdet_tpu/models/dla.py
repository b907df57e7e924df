"""DLA (Deep Layer Aggregation) image backbone in flax/NHWC.

TPU re-design of the reference DLANet
(/root/reference/mmdet3d/models/backbones/dla.py:283): a stride-1 7x7
base layer, two plain conv levels, then four recursive aggregation Trees
(dla.py:163-282).  Only structural differences from a textbook ResNet:

- each Tree downsamples its input with stride-N max-pool (``downsample``)
  and projects it with conv1x1+BN when channels change (dla.py:252-264) —
  that projected tensor is the residual identity of the FIRST block
  (``tree1``), while ``tree2``'s identity is its own input (dla.py:271-276);
- a ``Root`` node 1x1-convs the concatenation [tree2, tree1, *children]
  and (optionally) adds ``tree2``'s output back in before the ReLU
  (dla.py:145-160);
- levels>=2 trees thread a ``children`` list downward so the innermost
  root aggregates every sibling scale (dla.py:277-281).

Arch table: DLA-34 = BasicBlock, levels (1,1,1,2,2,1), channels
(16,32,64,128,256,512) (dla.py:306-308).  NHWC layout; BatchNorm carries
batch_stats like every other backbone here.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import BatchNorm

DLA_ARCH = {34: ((1, 1, 1, 2, 2, 1), (16, 32, 64, 128, 256, 512))}


class DLABasicBlock(nn.Module):
    """conv3x3(s)-BN-ReLU-conv3x3-BN + external identity (dla.py:38-103)."""

    features: int
    stride: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x, identity=None, *, train=False, update_stats=True):
        if identity is None:
            identity = x
        d = self.dilation
        y = nn.Conv(
            self.features, (3, 3), strides=(self.stride, self.stride),
            padding=((d, d), (d, d)), kernel_dilation=(d, d),
            use_bias=False, name="conv1",
        )(x)
        y = BatchNorm(name="bn1")(
            y, use_running_average=not train, update_stats=update_stats
        )
        y = nn.relu(y)
        y = nn.Conv(
            self.features, (3, 3), padding=((d, d), (d, d)),
            kernel_dilation=(d, d), use_bias=False, name="conv2",
        )(y)
        y = BatchNorm(name="bn2")(
            y, use_running_average=not train, update_stats=update_stats
        )
        return nn.relu(y + identity)


class DLARoot(nn.Module):
    """Aggregate sibling features: conv1x1(concat)-BN(+id)-ReLU (dla.py:105-160)."""

    features: int
    add_identity: bool = False

    @nn.compact
    def __call__(self, feats, *, train=False, update_stats=True):
        x = nn.Conv(
            self.features, (1, 1), use_bias=False, name="conv"
        )(jnp.concatenate(feats, axis=-1))
        x = BatchNorm(name="bn")(
            x, use_running_average=not train, update_stats=update_stats
        )
        if self.add_identity:
            x = x + feats[0]
        return nn.relu(x)


class DLATree(nn.Module):
    """Recursive aggregation node (dla.py:163-282).

    ``levels == 1``: two blocks + a root over [block2, block1, *children].
    ``levels >= 2``: two child trees; the outer tree appends its first
    child's output to ``children`` so the inner root sees every scale.
    """

    levels: int
    in_channels: int
    out_channels: int
    stride: int = 1
    level_root: bool = False
    add_identity: bool = False

    @nn.compact
    def __call__(self, x, children=None, *, train=False, update_stats=True):
        children = [] if children is None else list(children)
        s = self.stride
        bottom = (
            nn.max_pool(x, (s, s), strides=(s, s)) if s > 1 else x
        )
        if self.in_channels != self.out_channels:
            identity = nn.Conv(
                self.out_channels, (1, 1), use_bias=False,
                name="project_conv",
            )(bottom)
            identity = BatchNorm(name="project_bn")(
                identity, use_running_average=not train,
                update_stats=update_stats,
            )
        else:
            identity = bottom
        if self.level_root:
            children.append(bottom)
        if self.levels == 1:
            x1 = DLABasicBlock(
                self.out_channels, stride=s, name="tree1"
            )(x, identity, train=train, update_stats=update_stats)
            x2 = DLABasicBlock(self.out_channels, name="tree2")(
                x1, train=train, update_stats=update_stats
            )
            return DLARoot(
                self.out_channels, add_identity=self.add_identity,
                name="root",
            )([x2, x1] + children, train=train, update_stats=update_stats)
        x1 = DLATree(
            self.levels - 1, self.in_channels, self.out_channels,
            stride=s, add_identity=self.add_identity, name="tree1",
        )(x, train=train, update_stats=update_stats)
        children.append(x1)
        return DLATree(
            self.levels - 1, self.out_channels, self.out_channels,
            add_identity=self.add_identity, name="tree2",
        )(x1, children=children, train=train, update_stats=update_stats)


class DLANet(nn.Module):
    """DLA image backbone (dla.py:283-452).

    ``out_indices`` select among the 6 levels (strides 1,2,4,8,16,32); the
    detector uses (4, 5) as the C4/C5 analog of ResNet out_indices (2, 3).
    """

    depth: int = 34
    out_indices: Sequence[int] = (4, 5)
    layer_with_level_root: Sequence[bool] = (False, True, True, True)
    with_identity_root: bool = False

    @nn.compact
    def __call__(self, x, train=False, update_stats=True):
        levels, channels = DLA_ARCH[self.depth]
        x = nn.Conv(
            channels[0], (7, 7), padding=((3, 3), (3, 3)), use_bias=False,
            name="base_conv",
        )(x)
        x = BatchNorm(name="base_bn")(
            x, use_running_average=not train, update_stats=update_stats
        )
        x = nn.relu(x)

        outs = []
        for i in range(2):  # plain conv levels (dla.py:365-374)
            for j in range(levels[i]):
                x = nn.Conv(
                    channels[i], (3, 3),
                    strides=(i + 1, i + 1) if j == 0 else (1, 1),
                    padding=((1, 1), (1, 1)), use_bias=False,
                    name=f"level{i}_conv{j}",
                )(x)
                x = BatchNorm(name=f"level{i}_bn{j}")(
                    x, use_running_average=not train,
                    update_stats=update_stats,
                )
                x = nn.relu(x)
            if i in self.out_indices:
                outs.append(x)
        for i in range(2, len(levels)):
            x = DLATree(
                levels[i], channels[i - 1], channels[i], stride=2,
                level_root=self.layer_with_level_root[i - 2],
                add_identity=self.with_identity_root,
                name=f"level{i}",
            )(x, train=train, update_stats=update_stats)
            if i in self.out_indices:
                outs.append(x)
        return outs
