"""Gaussian heatmap utilities.

Two families live here:

- ``*_np`` NumPy functions used CPU-side for CenterPoint target rendering in
  the input pipeline (the reference renders targets on-device inside the loss,
  core/utils/gaussian.py:26 + centerpoint_head.py:441-590; we move this to the
  data loader so the jitted train step stays shape-static).
- ``render_rcs_maps`` — a vectorized JAX renderer for the RCS-aware scatter's
  gaussian-disk heatmap + constant RCS patch (reference
  pillar_scatter.py:119-131 draws these with a Python loop over pillars; here
  every pillar renders a bounded window and windows combine by max-scatter).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def gaussian_2d_np(shape, sigma=1.0):
    """Isotropic 2D gaussian kernel (matches core/utils/gaussian.py:6-23)."""
    m, n = [(ss - 1.0) / 2.0 for ss in shape]
    y, x = np.ogrid[-m : m + 1, -n : n + 1]
    h = np.exp(-(x * x + y * y) / (2 * sigma * sigma))
    h[h < np.finfo(h.dtype).eps * h.max()] = 0
    return h


def gaussian_radius_np(det_size, min_overlap=0.5):
    """CornerNet-style gaussian radius (core/utils/gaussian.py:108-137)."""
    height, width = det_size
    a1 = 1
    b1 = height + width
    c1 = width * height * (1 - min_overlap) / (1 + min_overlap)
    sq1 = np.sqrt(b1**2 - 4 * a1 * c1)
    r1 = (b1 + sq1) / 2

    a2 = 4
    b2 = 2 * (height + width)
    c2 = (1 - min_overlap) * width * height
    sq2 = np.sqrt(b2**2 - 4 * a2 * c2)
    r2 = (b2 + sq2) / 2

    a3 = 4 * min_overlap
    b3 = -2 * min_overlap * (height + width)
    c3 = (min_overlap - 1) * width * height
    sq3 = np.sqrt(b3**2 - 4 * a3 * c3)
    r3 = (b3 + sq3) / 2
    return min(r1, r2, r3)


def draw_heatmap_gaussian_np(heatmap, center, radius, k=1.0):
    """Max-blend a gaussian into ``heatmap`` in place (gaussian.py:26-55)."""
    diameter = 2 * radius + 1
    gaussian = gaussian_2d_np((diameter, diameter), sigma=diameter / 6)
    x, y = int(center[0]), int(center[1])
    height, width = heatmap.shape[:2]
    left, right = min(x, radius), min(width - x, radius + 1)
    top, bottom = min(y, radius), min(height - y, radius + 1)
    if right + left <= 0 or bottom + top <= 0:
        return heatmap
    masked_heatmap = heatmap[y - top : y + bottom, x - left : x + right]
    masked_gaussian = gaussian[
        radius - top : radius + bottom, radius - left : radius + right
    ]
    np.maximum(masked_heatmap, masked_gaussian * k, out=masked_heatmap)
    return heatmap


def gaussian_radius_batch(height, width, min_overlap=0.5):
    """Elementwise JAX version of ``gaussian_radius_np`` for [...]-shaped
    box sizes (CornerNet radius, core/utils/gaussian.py:108-137)."""
    a1 = 1.0
    b1 = height + width
    c1 = width * height * (1 - min_overlap) / (1 + min_overlap)
    r1 = (b1 + jnp.sqrt(jnp.maximum(b1**2 - 4 * a1 * c1, 0.0))) / 2

    a2 = 4.0
    b2 = 2 * (height + width)
    c2 = (1 - min_overlap) * width * height
    r2 = (b2 + jnp.sqrt(jnp.maximum(b2**2 - 4 * a2 * c2, 0.0))) / 2

    a3 = 4.0 * min_overlap
    b3 = -2 * min_overlap * (height + width)
    c3 = (min_overlap - 1) * width * height
    r3 = (b3 + jnp.sqrt(jnp.maximum(b3**2 - 4 * a3 * c3, 0.0))) / 2
    return jnp.minimum(jnp.minimum(r1, r2), r3)


def render_gaussian_masked(cx, cy, radius, mask, shape, r_max=16):
    """Max-composited gaussian bumps: [B, M] centers -> [B, H, W].

    The JAX equivalent of looping ``draw_heatmap_gaussian`` over GT boxes
    (used by the distillation response mask; reference
    calculate_box_mask_gaussian): each valid box contributes a gaussian
    with sigma = (2r+1)/6 over a (2r+1)^2 window; windows are clamped to a
    static ``r_max`` (negligible beyond ~3 sigma) and composite by max.

    Args:
      cx, cy: [B, M] float center coordinates in output-grid pixels.
      radius: [B, M] float radii (int-truncated like the reference).
      mask: [B, M] validity.
      shape: (H, W) static.
    """
    h, w = shape
    r_int = jnp.clip(jnp.floor(radius), 0, r_max).astype(jnp.int32)
    d = jnp.arange(-r_max, r_max + 1)
    dyy, dxx = jnp.meshgrid(d, d, indexing="ij")  # [win, win]
    d2 = (dxx**2 + dyy**2).astype(jnp.float32)

    def one(cx_b, cy_b, r_b, m_b):
        sigma = (2.0 * r_b.astype(jnp.float32) + 1.0) / 6.0
        g = jnp.exp(-d2[None] / (2.0 * sigma[:, None, None] ** 2))
        inside = (jnp.abs(dxx)[None] <= r_b[:, None, None]) & (
            jnp.abs(dyy)[None] <= r_b[:, None, None]
        )
        ys = jnp.floor(cy_b)[:, None, None].astype(jnp.int32) + dyy[None]
        xs = jnp.floor(cx_b)[:, None, None].astype(jnp.int32) + dxx[None]
        ok = (
            (ys >= 0) & (ys < h) & (xs >= 0) & (xs < w)
            & inside & (m_b[:, None, None] > 0)
        )
        idx = jnp.where(ok, ys * w + xs, h * w)
        out = jnp.zeros((h * w + 1,), jnp.float32)
        out = out.at[idx.reshape(-1)].max(
            jnp.where(ok, g, 0.0).reshape(-1), mode="drop"
        )
        return out[: h * w].reshape(h, w)

    import jax

    return jax.vmap(one)(cx, cy, r_int, mask)


def _maxpool3(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
    )


def compute_rcs_seeds(centers_xy, radius, rcs_value, pillar_mask, ny, nx,
                      r_max=16):
    """Scatter per-pillar (radius class, RCS value) seeds onto the canvas.

    Returns (seed_r [ny, nx] int32, -1 where empty;
             seed_v [ny, nx] f32, -inf where empty).
    Shared by the XLA propagation (:func:`render_rcs_maps`) and the Pallas
    renderer (ops/rcs_render.py).
    """
    r_int = jnp.clip(jnp.floor(radius), 0, r_max).astype(jnp.int32)  # [P]
    xs, ys = centers_xy[:, 0], centers_xy[:, 1]
    inb = pillar_mask & (xs >= 0) & (xs < nx) & (ys >= 0) & (ys < ny)
    flat = jnp.where(inb, ys * nx + xs, ny * nx).astype(jnp.int32)

    seed_r = (
        jnp.full((ny * nx + 1,), -1, jnp.int32)
        .at[flat].max(jnp.where(inb, r_int, -1), mode="drop")
    )[: ny * nx].reshape(ny, nx)
    seed_v = (
        jnp.full((ny * nx + 1,), -jnp.inf, jnp.float32)
        .at[flat].max(jnp.where(inb, rcs_value, -jnp.inf), mode="drop")
    )[: ny * nx].reshape(ny, nx)
    return seed_r, seed_v


def render_rcs_maps(centers_xy, radius, rcs_value, pillar_mask, ny, nx,
                    r_max=16):
    """Render the RCS scatter's [heatmap, rcs-feat] channels for one sample
    — scatter-free shift/reduce formulation (TPU fast path).

    Semantics identical to :func:`render_rcs_maps_scatter` (the direct
    window max-scatter, kept as the test oracle), but instead of
    max-scattering P*(2r+1)^2 window elements (~1.3M scatter-max ops, the
    2nd-hottest op of the whole model on v5e) it scatters only the P
    per-pillar parameters onto the canvas and then propagates:

    - rcs feat: iterated 3x3 max-pool = exact Chebyshev dilation; a pillar
      with integer radius r is injected r steps before the end so it
      dilates exactly r times (the constant rectangle of gaussian.py:57-81).
    - heatmap: per radius-class k (17 classes, sigma_k=(2k+1)/6), a
      box-bounded separable squared-EDT (min-convolution with a parabola
      along x then y), then exp(-d2/(2 sigma_k^2)) and a max over classes.
      Exact because all pillars of a class share sigma, so the max of
      their gaussians is the gaussian of the min squared distance.

    Voxelized pillar centers are unique per canvas cell, so the parameter
    scatter needs no collision handling (padding goes to a trash cell).
    """
    seed_r, seed_v = compute_rcs_seeds(
        centers_xy, radius, rcs_value, pillar_mask, ny, nx, r_max
    )

    # --- rcs feat: Chebyshev dilation with staged seed injection ---
    neg = jnp.float32(-jnp.inf)
    acc = jnp.where(seed_r >= r_max, seed_v, neg)
    for k in range(r_max - 1, -1, -1):
        acc = jnp.maximum(_maxpool3(acc), jnp.where(seed_r == k, seed_v, neg))
    feat = jnp.where(jnp.isfinite(acc), acc, 0.0)

    # --- heatmap: per-class box-bounded squared-EDT + gaussian ---
    big = jnp.float32(1e9)
    heat = jnp.zeros((ny, nx), jnp.float32)
    for k in range(r_max + 1):
        sigma = (2.0 * k + 1.0) / 6.0
        seed = seed_r == k
        ind = jnp.where(seed, 0.0, big)
        if k == 0:
            d2 = ind
        else:
            ipad = jnp.pad(ind, ((0, 0), (k, k)), constant_values=big)
            g = jnp.full((ny, nx), big, jnp.float32)
            for dx in range(-k, k + 1):
                g = jnp.minimum(g, ipad[:, k + dx : k + dx + nx] + dx * dx)
            gpad = jnp.pad(g, ((k, k), (0, 0)), constant_values=big)
            d2 = jnp.full((ny, nx), big, jnp.float32)
            for dy in range(-k, k + 1):
                d2 = jnp.minimum(d2, gpad[k + dy : k + dy + ny, :] + dy * dy)
        heat = jnp.maximum(
            heat,
            jnp.where(d2 < big * 0.5,
                      jnp.exp(-d2 / (2.0 * sigma ** 2)), 0.0),
        )
    return heat, feat


def render_rcs_maps_scatter(centers_xy, radius, rcs_value, pillar_mask, ny,
                            nx, r_max=16):
    """Direct window max-scatter renderer (test oracle for
    :func:`render_rcs_maps`).

    For each valid pillar at integer canvas coords (x, y) with truncated
    integer radius r (clamped to ``r_max``):
    - heatmap: max-blend of a gaussian with sigma = (2r+1)/6 over a
      (2r+1)^2 window (pillar_scatter.py:130 / gaussian.py:26).
    - rcs feat: the raw RCS value written over the same window rectangle
      (gaussian.py:57-81 writes a constant rectangle, not a gaussian).

    Deviations from the reference, both bounded and documented:
    - windows are clamped to a static ``r_max`` (the reference's radii are
      unbounded; a gaussian's support beyond +-3 sigma is negligible, and the
      constant RCS rectangle for giant radii mostly saturates the canvas).
    - overlapping RCS rectangles combine by max; the reference's Python loop
      lets the last pillar in voxel-scan order win, an order-dependent detail.

    Args:
      centers_xy: [P, 2] int32 (x, y) canvas coordinates.
      radius: [P] float radii (pre-truncation); int-truncated here.
      rcs_value: [P] raw RCS value per pillar.
      pillar_mask: [P] bool.
      ny, nx: static canvas size.
      r_max: static max radius.

    Returns:
      heatmap [ny, nx], rcs_feat [ny, nx]
    """
    p = centers_xy.shape[0]
    win = 2 * r_max + 1
    r_int = jnp.clip(jnp.floor(radius), 0, r_max).astype(jnp.int32)  # [P]

    dy = jnp.arange(-r_max, r_max + 1)
    dx = jnp.arange(-r_max, r_max + 1)
    dyy, dxx = jnp.meshgrid(dy, dx, indexing="ij")  # [win, win]

    sigma = (2.0 * r_int.astype(jnp.float32) + 1.0) / 6.0  # [P]
    d2 = (dxx**2 + dyy**2).astype(jnp.float32)  # [win, win]
    gauss = jnp.exp(-d2[None] / (2.0 * sigma[:, None, None] ** 2))  # [P,win,win]
    in_disk_window = (jnp.abs(dxx)[None] <= r_int[:, None, None]) & (
        jnp.abs(dyy)[None] <= r_int[:, None, None]
    )
    gauss = jnp.where(in_disk_window, gauss, 0.0)

    ys = centers_xy[:, 1][:, None, None] + dyy[None]  # [P, win, win]
    xs = centers_xy[:, 0][:, None, None] + dxx[None]
    inb = (
        (ys >= 0)
        & (ys < ny)
        & (xs >= 0)
        & (xs < nx)
        & in_disk_window
        & pillar_mask[:, None, None]
    )
    flat_idx = jnp.where(inb, ys * nx + xs, ny * nx)  # trash cell at end

    heat = jnp.zeros((ny * nx + 1,), jnp.float32)
    heat = heat.at[flat_idx.reshape(-1)].max(
        jnp.where(inb, gauss, 0.0).reshape(-1), mode="drop"
    )
    heat = heat[: ny * nx].reshape(ny, nx)

    feat_vals = jnp.broadcast_to(
        rcs_value[:, None, None], (p, win, win)
    )
    feat = jnp.full((ny * nx + 1,), -jnp.inf, jnp.float32)
    feat = feat.at[flat_idx.reshape(-1)].max(
        jnp.where(inb, feat_vals, -jnp.inf).reshape(-1), mode="drop"
    )
    feat = jnp.where(jnp.isfinite(feat), feat, 0.0)
    feat = feat[: ny * nx].reshape(ny, nx)
    return heat, feat
