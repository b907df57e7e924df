"""Bilinear sampling / resize primitives (XLA formulations).

Replaces the reference's uses of ``F.grid_sample`` (temporal BEV alignment,
bevdet_rc.py:653-657) and ``nn.Upsample`` (FPN_LSS, lss_fpn.py).  Layout is
NHWC throughout.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


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


def _resize_matrix(out_n, n, align_corners, nearest=False):
    """[out_n, n] constant interpolation matrix (resize = two matmuls).

    Axis-aligned resizes have shape-constant sample positions, so the
    gather formulation (which XLA lowers to slow TPU gathers, ~1.7 ms for
    the FPN_LSS upsample) collapses to a dense 2-sparse matrix that the
    compiler constant-folds and the MXU applies in ~us.
    """
    if nearest:
        src = np.floor(np.arange(out_n) * (n / out_n)).astype(np.int64)
        m = np.zeros((out_n, n), np.float32)
        m[np.arange(out_n), src] = 1.0
        return jnp.asarray(m)
    if align_corners and out_n > 1 and n > 1:
        f = np.linspace(0.0, n - 1.0, out_n)
    else:
        f = np.clip((np.arange(out_n) + 0.5) * (n / out_n) - 0.5, 0, n - 1.0)
    i0 = np.floor(f).astype(np.int64)
    i1 = np.minimum(i0 + 1, n - 1)
    wgt = (f - i0).astype(np.float32)
    m = np.zeros((out_n, n), np.float32)
    m[np.arange(out_n), i0] += 1.0 - wgt
    m[np.arange(out_n), i1] += wgt
    return jnp.asarray(m)


def bilinear_resize(x, out_h, out_w, align_corners=True):
    """Bilinear resize of [..., H, W, C] matching torch ``interpolate``
    (separable interpolation-matrix matmuls — MXU, no gathers)."""
    *lead, h, w, c = x.shape
    my = _resize_matrix(out_h, h, align_corners).astype(x.dtype)
    mx = _resize_matrix(out_w, w, align_corners).astype(x.dtype)
    rows = jnp.einsum("oh,...hwc->...owc", my, x)
    return jnp.einsum("pw,...owc->...opc", mx, rows)


def nearest_resize(x, out_h, out_w):
    """Nearest resize of [..., H, W, C] matching torch ``mode='nearest'``."""
    *lead, h, w, c = x.shape
    my = _resize_matrix(out_h, h, True, nearest=True).astype(x.dtype)
    mx = _resize_matrix(out_w, w, True, nearest=True).astype(x.dtype)
    rows = jnp.einsum("oh,...hwc->...owc", my, x)
    return jnp.einsum("pw,...owc->...opc", mx, rows)


def grid_sample_2d_packed(imgs, grid, align_corners=True,
                          pallas_combine=False,
                          split_batch_gather=False,
                          flat_channels=False,
                          prepacked=False,
                          flat_groups=1,
                          frame_order=None):
    """Batched bilinear grid sample via ONE packed-corner row gather.

    Same semantics as vmapping :func:`grid_sample_2d` over a leading batch
    dim, but ~4x cheaper on TPU: gather cost scales with the index count,
    so the 4 corner-gathers become one gather of channel-packed corner rows
    (see ops/deform_attn.py::packed_bilinear_parts).

    Args:
      imgs: [N, H, W, C].
      grid: [N, ..., 2] normalized (x, y) in [-1, 1].

    Returns:
      [N, ..., C]  (with ``flat_channels`` instead [..., N*C]: the batch
      axis stacked into channel groups, written directly by the Pallas
      combine kernel's block map — skips the [N, S, C] -> [S, N*C] HBM
      relayout the cached-BEV temporal warp's concat feed would pay)
    """
    from .deform_attn import packed_bilinear_parts

    n, h, w, c = imgs.shape
    if prepacked:
        c = c // 4  # imgs is the [N, H, W, 4C] corner table
    lead = grid.shape[1:-1]
    gx = grid[..., 0].reshape(n, -1)
    gy = grid[..., 1].reshape(n, -1)
    if align_corners:
        fx = (gx + 1.0) * 0.5 * (w - 1)
        fy = (gy + 1.0) * 0.5 * (h - 1)
    else:
        fx = ((gx + 1.0) * w - 1.0) * 0.5
        fy = ((gy + 1.0) * h - 1.0) * 0.5
    if pallas_combine and fx.shape[1] % 128 == 0:
        # forward-only fast path (no VJP): gather the packed rows and let
        # the Pallas kernel derive the 4 slot weights in-kernel from
        # (fx, fy) — no XLA-side slot fusion, no [N, 4, S] weight stack
        # (ops/deform_attn_pallas.py).  out_dot reduces the lane groups on
        # the MXU (C is rarely a 128-multiple here).
        from .deform_attn import packed_gather_rows
        from .deform_attn_pallas import combine4_p_reduce_fused

        patch = packed_gather_rows(
            imgs, fx, fy, h, w, split_batch_gather=split_batch_gather,
            prepacked=prepacked, frame_order=frame_order,
        )
        if flat_channels:
            from .deform_attn_pallas import warp_combine_flat

            out = warp_combine_flat(
                patch, fx, fy, hd=c, h=h, w=w, groups=flat_groups
            )
            if flat_groups > 1:  # [G, ..., (N//G)*C] per-stream slabs
                return out.reshape(
                    (flat_groups,) + lead + (n // flat_groups * c,)
                )
            return out.reshape(lead + (n * c,))
        out = combine4_p_reduce_fused(
            patch, fx, fy, None, p=1, hd=c, h=h, w=w, out_dot=True,
            out_dtype=imgs.dtype,
        )
        return out.reshape((n,) + lead + (c,))
    assert not prepacked, "prepacked tables require the pallas_combine path"
    assert frame_order is None, (
        "frame_order requires the pallas_combine path")
    patch, slot_w = packed_bilinear_parts(
        imgs, fx, fy, h, w, split_batch_gather=split_batch_gather
    )
    out = sum(
        patch[..., si * c : (si + 1) * c] * slot_w[si] for si in range(4)
    )
    if flat_channels:  # XLA fallback: explicit relayout
        return jnp.moveaxis(out, 0, -2).reshape(lead + (n * c,))
    return out.reshape((n,) + lead + (c,))
