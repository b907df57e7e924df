"""EVA-02-style ViTDet image backbone + SimpleFeaturePyramid, NHWC flax.

Counterpart of the reference's mmdet3d/models/backbones/vit.py (ViT +
SimpleFeaturePyramidForViT, the RCBEVDet++ ViT-L backbone).  The reference
forward is runnable only on CUDA (its Attention asserts q.is_cuda and
calls flash_attn, vit.py:118-124), and its VisionRotaryEmbeddingFast /
window helpers come from a patched detectron2 (EVA) — so this module
implements the same architecture from the EVA-02 formulation directly:

- patch embed 16x16 conv, absolute pos-embed bicubically interpolated
  from the pretrain grid with the class token dropped (get_abs_pos).
- 2D axial rotary embeddings on q/k (VisionRotaryEmbeddingFast: per-axis
  interleaved sin/cos at theta=10000, fine-tune grid rescaled onto the
  pretrain sequence length).
- every block window-partitions (global blocks just use the larger
  ``global_window_size`` — vit.py:455, Block.forward:305-309), attends
  with separate q/k/v projections (k un-biased, no output projection —
  vit.py:100-112), SwiGLU MLP with sub-LN (vit.py:52-76), optional
  ResBottleneckBlock conv propagation (vit.py:176-228).
- SimpleFeaturePyramid: per-scale deconv/pool stages + 1x1/3x3 LN convs
  over the final ViT feature, LastLevelMaxPool top block
  (vit.py:555-751).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def rope_freqs(dim: int, pt_seq_len: int, ft_seq_len: int):
    """[ft*ft, 2*dim] cos/sin tables of the 2D axial rotary embedding.

    dim = half the head dim; per-axis frequencies are repeated
    interleaved (EVA VisionRotaryEmbeddingFast).
    """
    freqs = 1.0 / (
        10000 ** (jnp.arange(0, dim, 2)[: dim // 2] / dim)
    )  # [dim//2]
    t = jnp.arange(ft_seq_len) / ft_seq_len * pt_seq_len  # [ft]
    f = jnp.einsum("i,j->ij", t, freqs)  # [ft, dim//2]
    f = jnp.repeat(f, 2, axis=-1)  # [ft, dim] interleaved pairs
    # broadcast h-axis and w-axis tables and concat the feature dim
    fh = jnp.broadcast_to(f[:, None, :], (ft_seq_len, ft_seq_len, f.shape[-1]))
    fw = jnp.broadcast_to(f[None, :, :], (ft_seq_len, ft_seq_len, f.shape[-1]))
    full = jnp.concatenate([fh, fw], axis=-1).reshape(-1, 2 * dim)
    return jnp.cos(full), jnp.sin(full)


def _torch_bicubic_matrix(src: int, dst: int, a: float = -0.75):
    """[dst, src] torch-style bicubic interpolation matrix
    (F.interpolate mode='bicubic', align_corners=False): 4-tap cubic
    convolution with coefficient a=-0.75, border indices clamped, no
    anti-aliasing.  Built with numpy at trace time (static shapes)."""
    import numpy as np

    w = np.zeros((dst, src), np.float32)
    scale = src / dst

    def kern(d):
        d = abs(d)
        if d <= 1:
            return (a + 2) * d**3 - (a + 3) * d**2 + 1
        if d < 2:
            return a * d**3 - 5 * a * d**2 + 8 * a * d - 4 * a
        return 0.0

    for o in range(dst):
        c = (o + 0.5) * scale - 0.5
        f = math.floor(c)
        t = c - f
        for m in range(-1, 3):
            idx = min(max(f + m, 0), src - 1)
            w[o, idx] += kern(t - m)
    return w


def _rotate_half(x):
    """Interleaved pair rotation: (x1, x2) -> (-x2, x1)."""
    x = x.reshape(*x.shape[:-1], -1, 2)
    x1, x2 = x[..., 0], x[..., 1]
    return jnp.stack([-x2, x1], axis=-1).reshape(*x.shape[:-2], -1)


def apply_rope(t, cos, sin):
    """t: [..., N, D]; cos/sin [N, D]."""
    return t * cos + _rotate_half(t) * sin


def window_partition(x, window_size):
    """[B, H, W, C] -> [B*nw, ws, ws, C] with zero padding (detectron2)."""
    b, h, w, c = x.shape
    pad_h = (-h) % window_size
    pad_w = (-w) % window_size
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = h + pad_h, w + pad_w
    x = x.reshape(
        b, hp // window_size, window_size, wp // window_size, window_size, c
    )
    wins = x.transpose(0, 1, 3, 2, 4, 5).reshape(
        -1, window_size, window_size, c
    )
    return wins, (hp, wp)


def window_unpartition(wins, window_size, pad_hw, hw):
    hp, wp = pad_hw
    h, w = hw
    b = wins.shape[0] // ((hp // window_size) * (wp // window_size))
    x = wins.reshape(
        b, hp // window_size, wp // window_size, window_size, window_size, -1
    )
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


class SwiGLU(nn.Module):
    """w3(ffn_ln(silu(w1 x) * w2 x)) (vit.py:52-76, subln=True)."""

    hidden: int
    out: int

    @nn.compact
    def __call__(self, x):
        x1 = nn.Dense(self.hidden, name="w1")(x)
        x2 = nn.Dense(self.hidden, name="w2")(x)
        h = nn.silu(x1) * x2
        h = nn.LayerNorm(epsilon=1e-6, name="ffn_ln")(h)
        return nn.Dense(self.out, name="w3")(h)


class ResBottleneckBlock(nn.Module):
    """1x1 -> 3x3 -> 1x1 conv residual, LN norms, zero-init final norm
    (vit.py:176-228; detectron2 get_norm('LN') normalizes the channel
    axis per position == standard last-axis LN in NHWC)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.dim // 2, (1, 1), use_bias=False, name="conv1")(x)
        h = nn.LayerNorm(name="norm1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Conv(
            self.dim // 2, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
            name="conv2",
        )(h)
        h = nn.LayerNorm(name="norm2")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Conv(self.dim, (1, 1), use_bias=False, name="conv3")(h)
        h = nn.LayerNorm(
            name="norm3",
            scale_init=nn.initializers.zeros,  # zero-init last norm
        )(h)
        return x + h


class ViTBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float
    window_size: int  # every block partitions; global blocks use a larger one
    pt_hw_seq_len: int
    use_residual_block: bool = False
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x, train=False):
        shortcut = x
        h = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        ori_hw = h.shape[1:3]
        h, pad_hw = window_partition(h, self.window_size)

        b, wh, ww, c = h.shape
        n = wh * ww
        hd = self.dim // self.num_heads
        tokens = h.reshape(b, n, c)
        # separate projections; k carries no bias (vit.py:100-112)
        q = nn.Dense(self.dim, name="q_proj")(tokens)
        k = nn.Dense(self.dim, use_bias=False, name="k_proj")(tokens)
        v = nn.Dense(self.dim, name="v_proj")(tokens)

        def heads(t):
            return t.reshape(b, n, self.num_heads, hd).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        cos, sin = rope_freqs(hd // 2, self.pt_hw_seq_len, self.window_size)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(hd)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, wh, ww, c)

        out = window_unpartition(out, self.window_size, pad_hw, ori_hw)
        x = shortcut + out
        m = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        x = x + SwiGLU(
            hidden=int(self.dim * self.mlp_ratio), out=self.dim, name="mlp"
        )(m)
        if self.use_residual_block:
            x = ResBottleneckBlock(dim=self.dim, name="residual")(x)
        return x


class ViT(nn.Module):
    """Plain ViT trunk emitting one stride-16 feature (vitdet)."""

    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4 * 2 / 3
    window_size: int = 16
    global_window_size: int = 32
    window_block_indexes: Tuple[int, ...] = ()
    residual_block_indexes: Tuple[int, ...] = ()
    pt_hw_seq_len: int = 16
    pretrain_img_size: int = 224
    pretrain_use_cls_token: bool = True
    use_abs_pos: bool = True
    remat: bool = False

    @nn.compact
    def __call__(self, x, train=False, update_stats=True):
        del update_stats
        b = x.shape[0]
        x = nn.Conv(
            self.embed_dim, (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size), padding="VALID",
            name="patch_embed",
        )(x)
        h, w = x.shape[1:3]
        if self.use_abs_pos:
            pre = self.pretrain_img_size // self.patch_size
            npos = pre * pre + (1 if self.pretrain_use_cls_token else 0)
            pos = self.param(
                "pos_embed",
                nn.initializers.truncated_normal(0.02),
                (1, npos, self.embed_dim),
            )
            if self.pretrain_use_cls_token:
                pos = pos[:, 1:]
            pos = pos.reshape(1, pre, pre, self.embed_dim)
            # bicubic interp onto the fine-tune grid (get_abs_pos) with
            # torch's kernel: a separable matrix built host-side — torch
            # F.interpolate uses cubic-convolution a=-0.75 WITHOUT
            # anti-aliasing, while jax.image.resize uses the Keys a=-0.5
            # kernel and anti-aliases on downscale (diffs up to ~1.9 on a
            # 14x14 -> 2x4 resize); interpolation stays linear in the
            # learned pos table, so gradients flow through the einsum
            wh = jnp.asarray(_torch_bicubic_matrix(pre, h))
            ww = jnp.asarray(_torch_bicubic_matrix(pre, w))
            pos = jnp.einsum("oi,pj,bijc->bopc", wh, ww, pos)
            x = x + pos

        block_cls = nn.remat(ViTBlock) if self.remat else ViTBlock
        for i in range(self.depth):
            x = block_cls(
                dim=self.embed_dim,
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                window_size=(
                    self.window_size if i in self.window_block_indexes
                    else self.global_window_size
                ),
                pt_hw_seq_len=self.pt_hw_seq_len,
                use_residual_block=i in self.residual_block_indexes,
                name=f"block{i}",
            )(x, train)
        return x  # [B, H/16, W/16, embed_dim]


class SimpleFeaturePyramid(nn.Module):
    """Multi-scale pyramid from the single ViT feature (vit.py:555-751).

    Emits features for scale_factors (4.0 -> stride 4 ... 0.5 -> stride
    32) plus a LastLevelMaxPool stride-64 level; ``out_layers`` selects
    which (reference default 'p4' = stride 16, or a list).
    """

    net: ViT
    out_channels: int = 256
    scale_factors: Tuple[float, ...] = (4.0, 2.0, 1.0, 0.5)
    out_layers: Any = "p4"

    @nn.compact
    def __call__(self, x, train=False, update_stats=True):
        feat = self.net(x, train=train, update_stats=update_stats)
        dim = feat.shape[-1]
        results = {}
        for scale in self.scale_factors:
            stage = int(math.log2(self.net.patch_size / scale))
            name = f"simfp_{stage}"
            y = feat
            if scale == 4.0:
                y = nn.ConvTranspose(
                    dim // 2, (2, 2), strides=(2, 2), transpose_kernel=True,
                    name=f"{name}_up1",
                )(y)
                y = nn.LayerNorm(epsilon=1e-6, name=f"{name}_ln_up")(y)
                y = nn.gelu(y, approximate=False)
                y = nn.ConvTranspose(
                    dim // 4, (2, 2), strides=(2, 2), transpose_kernel=True,
                    name=f"{name}_up2",
                )(y)
            elif scale == 2.0:
                # transpose_kernel=True: the torch ConvTranspose2d IOHW ->
                # HWOI layout the checkpoint converter emits
                y = nn.ConvTranspose(
                    dim // 2, (2, 2), strides=(2, 2), transpose_kernel=True,
                    name=f"{name}_up1",
                )(y)
            elif scale == 1.0:
                pass
            elif scale == 0.5:
                y = nn.max_pool(y, (2, 2), strides=(2, 2))
            else:
                raise NotImplementedError(scale)
            y = nn.Conv(
                self.out_channels, (1, 1), use_bias=False,
                name=f"{name}_lateral",
            )(y)
            y = nn.LayerNorm(epsilon=1e-6, name=f"{name}_lateral_ln")(y)
            y = nn.Conv(
                self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                use_bias=False, name=f"{name}_out",
            )(y)
            y = nn.LayerNorm(epsilon=1e-6, name=f"{name}_out_ln")(y)
            results[f"p{stage}"] = y
        # LastLevelMaxPool on the smallest level
        last = f"p{int(math.log2(self.net.patch_size / min(self.scale_factors)))}"
        results[f"p{int(last[1:]) + 1}"] = nn.max_pool(
            results[last], (1, 1), strides=(2, 2)
        )
        if isinstance(self.out_layers, str):
            return results[self.out_layers]
        return [results[k] for k in self.out_layers]


def vit_config(variant: str):
    """base/large/huge ViTDet parameter sets."""
    return {
        "base": dict(embed_dim=768, depth=12, num_heads=12,
                     window_block_indexes=tuple(
                         i for i in range(12) if (i + 1) % 3 != 0)),
        "large": dict(embed_dim=1024, depth=24, num_heads=16,
                      window_block_indexes=tuple(
                          i for i in range(24) if (i + 1) % 6 != 0)),
        "huge": dict(embed_dim=1280, depth=32, num_heads=16,
                     window_block_indexes=tuple(
                         i for i in range(32) if (i + 1) % 8 != 0)),
    }[variant]
