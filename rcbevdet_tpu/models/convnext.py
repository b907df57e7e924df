"""ConvNeXt image backbone, NHWC flax.

Counterpart of the reference's mmdet3d/models/backbones/convnext.py (the
FAIR ConvNeXt adapted for BEVDet-style multi-stage output + stereo tap).
The reference's Block permutes NCHW->NHWC internally to run LayerNorm +
Linear channels-last (convnext.py:41-54) — on TPU everything is already
channels-last, so the block is a straight dwconv -> LN -> dense -> gelu ->
dense -> layer-scale residual with no transposes.

Parity notes:
- LayerNorm eps 1e-6 everywhere (convnext.py:33,86,91).
- gamma layer-scale initialized to 1e-6 (convnext.py:38).
- per-out-index LayerNorm before emitting a stage feature
  (convnext.py:108-117,166-169).
- ``return_stereo_feat`` emits the raw stage-0 output (stride 4) first,
  pre-norm (convnext.py:161-164), for the BEVStereo cost volume.
- stochastic depth (timm DropPath) ramps linearly over blocks
  (convnext.py:97-105); identity at inference.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class ConvNeXtBlock(nn.Module):
    dim: int
    drop_path: float = 0.0
    layer_scale_init_value: float = 1e-6

    @nn.compact
    def __call__(self, x, train=False):
        inp = x
        x = nn.Conv(
            self.dim, (7, 7), padding=((3, 3), (3, 3)),
            feature_group_count=self.dim, name="dwconv",
        )(x)
        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        x = nn.Dense(4 * self.dim, name="pwconv1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.dim, name="pwconv2")(x)
        if self.layer_scale_init_value > 0:
            gamma = self.param(
                "gamma",
                nn.initializers.constant(self.layer_scale_init_value),
                (self.dim,),
            )
            x = gamma * x
        if train and self.drop_path > 0.0:
            keep = 1.0 - self.drop_path
            rng = self.make_rng("dropout")
            mask = jax.random.bernoulli(rng, keep, (x.shape[0], 1, 1, 1))
            x = jnp.where(mask, x / keep, 0.0)
        return inp + x


class ConvNeXt(nn.Module):
    depths: Tuple[int, ...] = (3, 3, 9, 3)
    dims: Tuple[int, ...] = (96, 192, 384, 768)
    out_indices: Tuple[int, ...] = (2, 3)
    drop_path_rate: float = 0.0
    layer_scale_init_value: float = 1e-6
    return_stereo_feat: bool = False

    @nn.compact
    def __call__(self, x, train=False, update_stats=True):
        """x: [B, H, W, 3] -> tuple of NHWC stage features (strides
        4/8/16/32 for stages 0-3).  ``update_stats`` accepted for backbone
        interface uniformity (no BN here)."""
        del update_stats
        dp_rates = [
            float(r) for r in jnp.linspace(
                0.0, self.drop_path_rate, sum(self.depths)
            )
        ]
        outs = []
        cur = 0
        for i in range(4):
            if i == 0:
                x = nn.Conv(
                    self.dims[0], (4, 4), strides=(4, 4), padding="VALID",
                    name="stem_conv",
                )(x)
                x = nn.LayerNorm(epsilon=1e-6, name="stem_norm")(x)
            else:
                x = nn.LayerNorm(epsilon=1e-6, name=f"down{i}_norm")(x)
                x = nn.Conv(
                    self.dims[i], (2, 2), strides=(2, 2), padding="VALID",
                    name=f"down{i}_conv",
                )(x)
            for j in range(self.depths[i]):
                x = ConvNeXtBlock(
                    dim=self.dims[i],
                    drop_path=dp_rates[cur + j],
                    layer_scale_init_value=self.layer_scale_init_value,
                    name=f"stage{i}_block{j}",
                )(x, train=train)
            cur += self.depths[i]
            if i == 0 and self.return_stereo_feat:
                outs.append(x)
            # named out_norm{i} to share the converter rule with Swin (both
            # reference backbones call these norm{i}).  The reference
            # creates all four norms regardless of out_indices
            # (convnext.py:109-112) — mirror that for checkpoint bijection;
            # XLA dead-code-eliminates the unused ones.
            normed = nn.LayerNorm(epsilon=1e-6, name=f"out_norm{i}")(x)
            if i in self.out_indices:
                outs.append(normed)
        return tuple(outs)


def convnext_config(variant: str):
    """tiny/small/base/large/xlarge parameter sets (official family)."""
    return {
        "tiny": dict(depths=(3, 3, 9, 3), dims=(96, 192, 384, 768)),
        "small": dict(depths=(3, 3, 27, 3), dims=(96, 192, 384, 768)),
        "base": dict(depths=(3, 3, 27, 3), dims=(128, 256, 512, 1024)),
        "large": dict(depths=(3, 3, 27, 3), dims=(192, 384, 768, 1536)),
        "xlarge": dict(depths=(3, 3, 27, 3), dims=(256, 512, 1024, 2048)),
    }[variant]
