"""Bilinear sampling / resize primitives (XLA formulations).

Replaces the reference's uses of ``F.grid_sample`` (temporal BEV alignment,
bevdet_rc.py:653-657) and ``nn.Upsample`` (FPN_LSS, lss_fpn.py).  Layout is
NHWC throughout.
"""

from __future__ import annotations

import jax.numpy as jnp


def _gather_2d(img, ix, iy):
    """img: [H, W, C]; ix/iy: [...] int32 (assumed in range)."""
    return img[iy, ix]


def grid_sample_2d(img, grid, align_corners=True, padding_mode="zeros"):
    """Bilinear grid sample matching ``torch.nn.functional.grid_sample``.

    Args:
      img: [H, W, C].
      grid: [..., 2] normalized (x, y) sample locations in [-1, 1].
      align_corners: torch semantics; True for BEV temporal alignment,
        False for deformable-attention sampling.
      padding_mode: only "zeros" (out-of-range contributes 0).

    Returns:
      [..., C] sampled values.
    """
    h, w, c = img.shape
    gx, gy = grid[..., 0], grid[..., 1]
    if align_corners:
        fx = (gx + 1.0) * 0.5 * (w - 1)
        fy = (gy + 1.0) * 0.5 * (h - 1)
    else:
        fx = ((gx + 1.0) * w - 1.0) * 0.5
        fy = ((gy + 1.0) * h - 1.0) * 0.5

    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx = fx - x0
    wy = fy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def corner(xi, yi, weight):
        inb = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi_c = jnp.clip(xi, 0, w - 1)
        yi_c = jnp.clip(yi, 0, h - 1)
        v = _gather_2d(img, xi_c, yi_c)
        return v * (weight * inb.astype(img.dtype))[..., None]

    out = (
        corner(x0i, y0i, (1 - wx) * (1 - wy))
        + corner(x0i + 1, y0i, wx * (1 - wy))
        + corner(x0i, y0i + 1, (1 - wx) * wy)
        + corner(x0i + 1, y0i + 1, wx * wy)
    )
    return out


def bilinear_resize(x, out_h, out_w, align_corners=True):
    """Bilinear resize of [..., H, W, C] matching torch ``interpolate``."""
    *lead, h, w, c = x.shape
    if align_corners and out_h > 1 and out_w > 1:
        fy = jnp.linspace(0.0, h - 1.0, out_h)
        fx = jnp.linspace(0.0, w - 1.0, out_w)
    else:
        # half-pixel centers (align_corners=False)
        fy = (jnp.arange(out_h) + 0.5) * (h / out_h) - 0.5
        fx = (jnp.arange(out_w) + 0.5) * (w / out_w) - 0.5
        fy = jnp.clip(fy, 0.0, h - 1.0)
        fx = jnp.clip(fx, 0.0, w - 1.0)

    y0 = jnp.floor(fy).astype(jnp.int32)
    x0 = jnp.floor(fx).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (fy - y0).astype(x.dtype)
    wx = (fx - x0).astype(x.dtype)

    top = x[..., y0, :, :]
    bot = x[..., y1, :, :]
    rows = top * (1 - wy)[:, None, None] + bot * wy[:, None, None]
    left = rows[..., :, x0, :]
    right = rows[..., :, x1, :]
    out = left * (1 - wx)[None, :, None] + right * wx[None, :, None]
    return out


def nearest_resize(x, out_h, out_w):
    """Nearest resize of [..., H, W, C] matching torch ``mode='nearest'``."""
    *lead, h, w, c = x.shape
    iy = jnp.floor(jnp.arange(out_h) * (h / out_h)).astype(jnp.int32)
    ix = jnp.floor(jnp.arange(out_w) * (w / out_w)).astype(jnp.int32)
    return x[..., iy, :, :][..., :, ix, :]


def grid_sample_2d_packed(imgs, grid, align_corners=True):
    """Batched bilinear grid sample via ONE packed-corner row gather.

    Same semantics as vmapping :func:`grid_sample_2d` over a leading batch
    dim, but ~4x cheaper on TPU: gather cost scales with the index count,
    so the 4 corner-gathers become one gather of channel-packed corner rows
    (see ops/deform_attn.py::packed_bilinear_parts).

    Args:
      imgs: [N, H, W, C].
      grid: [N, ..., 2] normalized (x, y) in [-1, 1].

    Returns:
      [N, ..., C]
    """
    from .deform_attn import packed_bilinear_parts

    n, h, w, c = imgs.shape
    lead = grid.shape[1:-1]
    gx = grid[..., 0].reshape(n, -1)
    gy = grid[..., 1].reshape(n, -1)
    if align_corners:
        fx = (gx + 1.0) * 0.5 * (w - 1)
        fy = (gy + 1.0) * 0.5 * (h - 1)
    else:
        fx = ((gx + 1.0) * w - 1.0) * 0.5
        fy = ((gy + 1.0) * h - 1.0) * 0.5
    patch, slot_w = packed_bilinear_parts(imgs, fx, fy, h, w)
    out = sum(
        patch[..., si * c : (si + 1) * c] * slot_w[si] for si in range(4)
    )
    return out.reshape((n,) + lead + (c,))
