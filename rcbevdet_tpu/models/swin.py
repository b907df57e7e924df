"""Swin Transformer backbone (flax, NHWC).

Re-design of the reference mmdet-style Swin
(models/backbones/swin.py:79-990) for TPU:

- window partition/merge are pure reshapes/transposes (free under XLA);
- the relative-position-bias table uses the reference's "double_step_seq"
  index layout (swin.py:283-289 + :343-347) so released checkpoints load
  byte-for-byte through the converter;
- the mmcv PatchMerging is the UNFOLD ordering (channel-major c*4 + offset,
  swin.py:173-241), not the official Swin slice order;
- stochastic depth is inference-irrelevant and omitted (the reference's
  DropPath is identity at eval; training here runs without it);
- optional ``remat`` wraps each block in jax.checkpoint (the reference's
  with_cp, swin.py:665-668).

Shipped variants: tiny/small/base/large via ``swin_config``.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def relative_position_index(wh: int, ww: int) -> np.ndarray:
    """mmdet Swin's rel-pos index (double_step_seq + flip, swin.py:283-289,
    :343-347) — the layout the released checkpoints' bias tables assume."""
    seq1 = np.arange(0, (2 * ww - 1) * wh, 2 * ww - 1)
    seq2 = np.arange(0, ww)
    coords = (seq1[:, None] + seq2[None, :]).reshape(1, -1)  # [1, Wh*Ww]
    idx = coords + coords.T  # [N, N]
    return idx[:, ::-1].copy()  # flip(1)


class WindowMSA(nn.Module):
    """Window attention with relative position bias (swin.py:242-348)."""

    embed_dims: int
    num_heads: int
    window_size: Tuple[int, int]

    @nn.compact
    def __call__(self, x, mask=None):
        # x: [B_, N, C] where N = Wh*Ww
        b, n, c = x.shape
        h = self.num_heads
        hd = c // h
        wh, ww = self.window_size
        qkv = nn.Dense(3 * c, name="qkv")(x).reshape(b, n, 3, h, hd)
        qkv = qkv.transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        q = q * (hd ** -0.5)
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k)

        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * wh - 1) * (2 * ww - 1), h),
        )
        idx = relative_position_index(wh, ww).reshape(-1)
        bias = table[idx].reshape(n, n, h).transpose(2, 0, 1)
        attn = attn + bias[None]

        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(b // nw, nw, h, n, n) + mask[None, :, None]
            attn = attn.reshape(b, h, n, n)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        return nn.Dense(c, name="proj")(out)


def _window_partition(x, ws):
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def _window_reverse(windows, ws, h, w):
    b = windows.shape[0] // ((h // ws) * (w // ws))
    x = windows.reshape(b, h // ws, w // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


def _shift_attn_mask(h_pad, w_pad, ws, shift):
    """[nW, N, N] additive mask for SW-MSA (swin.py:425-446), built host-side
    from static shapes."""
    img = np.zeros((h_pad, w_pad), np.float32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[hs, wsl] = cnt
            cnt += 1
    m = img.reshape(h_pad // ws, ws, w_pad // ws, ws)
    m = m.transpose(0, 2, 1, 3).reshape(-1, ws * ws)
    diff = m[:, None, :] - m[:, :, None]
    return jnp.asarray(np.where(diff != 0, -100.0, 0.0), jnp.float32)


class SwinBlock(nn.Module):
    """LN -> (S)W-MSA -> +res, LN -> FFN(GELU) -> +res (swin.py:511-589)."""

    embed_dims: int
    num_heads: int
    mlp_ratio: float
    window_size: int
    shift: bool

    @nn.compact
    def __call__(self, x):
        # x: [B, H, W, C] NHWC map (reference carries [B, L, C] + hw_shape)
        # the reference never shrinks the window for small maps — it pads up
        # to a window multiple and always shifts odd blocks (swin.py:406-423)
        b, h, w, c = x.shape
        ws = self.window_size
        shift = ws // 2 if self.shift else 0
        identity = x
        y = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)

        pad_b = (ws - h % ws) % ws
        pad_r = (ws - w % ws) % ws
        y = jnp.pad(y, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        hp, wp = h + pad_b, w + pad_r

        if shift > 0:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
            mask = _shift_attn_mask(hp, wp, ws, shift)
        else:
            mask = None
        windows = _window_partition(y, ws)
        attn = WindowMSA(
            self.embed_dims, self.num_heads, (ws, ws), name="attn",
        )(windows, mask=mask)
        y = _window_reverse(attn, ws, hp, wp)
        if shift > 0:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        y = y[:, :h, :w]
        x = identity + y

        identity = x
        y = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        y = nn.Dense(int(c * self.mlp_ratio), name="ffn_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(c, name="ffn_fc2")(y)
        return identity + y


class PatchMerging(nn.Module):
    """Unfold(2x2) -> LN -> Linear(4C -> 2C, no bias) (swin.py:173-241).

    The unfold channel order is c-major ((c, dh, dw) flattened), NOT the
    official Swin slice concatenation — checkpoint-compatible with mmdet.
    """

    out_channels: int

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        pad_b, pad_r = h % 2, w % 2
        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
            h, w = h + pad_b, w + pad_r
        y = x.reshape(b, h // 2, 2, w // 2, 2, c)
        y = y.transpose(0, 1, 3, 5, 2, 4).reshape(b, h // 2, w // 2, c * 4)
        y = nn.LayerNorm(epsilon=1e-5, name="norm")(y)
        return nn.Dense(self.out_channels, use_bias=False, name="reduction")(y)


class SwinTransformer(nn.Module):
    """Hierarchical Swin backbone returning NHWC maps at ``out_indices``.

    Config mirror of the reference SwinTransformer (swin.py:674-990):
    embed_dims/depths/num_heads select tiny..large; patch embed is a 4x4
    conv + LN; each out index gets its own LN.  ``return_stereo_feat``
    additionally returns the pre-downsample stage-0 map (used by
    BEVStereo-Swin, swin.py:938-962).
    """

    embed_dims: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    patch_size: int = 4
    out_indices: Sequence[int] = (2, 3)
    return_stereo_feat: bool = False
    remat: bool = False

    @nn.compact
    def __call__(self, x, train=False, update_stats=True):
        # patch embed: conv k=4 s=4 (pad to multiples) + LN
        b, h, w, _ = x.shape
        p = self.patch_size
        pad_b = (p - h % p) % p
        pad_r = (p - w % p) % p
        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        x = nn.Conv(
            self.embed_dims, (p, p), strides=(p, p), name="patch_embed_proj",
        )(x)
        x = nn.LayerNorm(epsilon=1e-5, name="patch_embed_norm")(x)

        outs = []
        stereo_feat = None
        dims = self.embed_dims
        for i, depth in enumerate(self.depths):
            for j in range(depth):
                block_cls = nn.remat(SwinBlock) if self.remat else SwinBlock
                x = block_cls(
                    embed_dims=dims,
                    num_heads=self.num_heads[i],
                    mlp_ratio=self.mlp_ratio,
                    window_size=self.window_size,
                    shift=(j % 2 == 1),
                    name=f"stage{i}_block{j}",
                )(x)
            if i in self.out_indices:
                y = nn.LayerNorm(epsilon=1e-5, name=f"out_norm{i}")(x)
                outs.append(y)
            if i == 0 and self.return_stereo_feat:
                stereo_feat = x
            if i < len(self.depths) - 1:
                x = PatchMerging(dims * 2, name=f"downsample{i}")(x)
                dims *= 2
        if self.return_stereo_feat:
            return outs, stereo_feat
        return outs


def swin_config(variant: str):
    """tiny/small/base/large parameter sets (official Swin family)."""
    return {
        "tiny": dict(embed_dims=96, depths=(2, 2, 6, 2),
                     num_heads=(3, 6, 12, 24)),
        "small": dict(embed_dims=96, depths=(2, 2, 18, 2),
                      num_heads=(3, 6, 12, 24)),
        "base": dict(embed_dims=128, depths=(2, 2, 18, 2),
                     num_heads=(4, 8, 16, 32)),
        "large": dict(embed_dims=192, depths=(2, 2, 18, 2),
                      num_heads=(6, 12, 24, 48)),
    }[variant]
