"""Direct unit tests for the flat-channels cached-BEV warp fast path.

``warp_combine_flat`` (ops/deform_attn_pallas.py) emits the temporal-warp
result as [Lq, N*C] frame-stacked channel groups straight from the kernel;
the oracle is the plain 4-slot XLA combine followed by the explicit
moveaxis relayout — the layout the cached-BEV concat feed would otherwise
pay an HBM round-trip for (detectors.py forward_cached b==1 branch).
Reference analog: BEVDet4D.shift_feature grid_sample + torch.cat
(reference bevdet_rc.py:585-657, :747-765).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rcbevdet_tpu.ops.deform_attn import (
    packed_bilinear_parts,
    packed_gather_rows,
)
from rcbevdet_tpu.ops.deform_attn_pallas import warp_combine_flat
from rcbevdet_tpu.ops.warp import grid_sample_2d_packed


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def _sample_points(rng, n, lq, h, w):
    """In-bounds and out-of-bounds fractional sample points."""
    fx = rng.uniform(-1.5, w + 0.5, (n, lq)).astype(np.float32)
    fy = rng.uniform(-1.5, h + 0.5, (n, lq)).astype(np.float32)
    return jnp.asarray(fx), jnp.asarray(fy)


def _oracle_flat(imgs, fx, fy):
    """4-slot combine + moveaxis relayout (the XLA fallback layout)."""
    n, h, w, c = imgs.shape
    patch, slot_w = packed_bilinear_parts(imgs, fx, fy, h, w)
    out = sum(
        patch[..., si * c:(si + 1) * c] * slot_w[si] for si in range(4)
    )  # [N, Lq, C]
    return jnp.moveaxis(out, 0, 1).reshape(out.shape[1], n * c)


@pytest.mark.parametrize("n,c", [(8, 80), (4, 24), (1, 16)])
def test_warp_combine_flat_matches_moveaxis_oracle(rng, n, c):
    h = w = 16
    lq = h * w
    imgs = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    fx, fy = _sample_points(rng, n, lq, h, w)
    patch = packed_gather_rows(imgs, fx, fy, h, w)
    out = warp_combine_flat(patch, fx, fy, hd=c, h=h, w=w)
    ref = _oracle_flat(imgs, fx, fy)
    assert out.shape == (lq, n * c)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_warp_combine_flat_bf16(rng):
    n, c, h, w = 8, 80, 16, 16
    lq = h * w
    imgs = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.bfloat16)
    fx, fy = _sample_points(rng, n, lq, h, w)
    patch = packed_gather_rows(imgs, fx, fy, h, w)
    out = warp_combine_flat(patch, fx, fy, hd=c, h=h, w=w)
    ref = _oracle_flat(imgs.astype(jnp.float32), fx, fy)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), rtol=0.05, atol=0.05
    )


def test_warp_combine_flat_block_tiling(rng):
    """Results identical across block_q choices (grid-tile coverage)."""
    n, c, h, w = 4, 16, 16, 32
    lq = h * w
    imgs = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    fx, fy = _sample_points(rng, n, lq, h, w)
    patch = packed_gather_rows(imgs, fx, fy, h, w)
    a = warp_combine_flat(patch, fx, fy, hd=c, h=h, w=w, block_q=512)
    b = warp_combine_flat(patch, fx, fy, hd=c, h=h, w=w, block_q=128)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-6, atol=1e-6)


def test_grid_sample_flat_channels_pallas_vs_xla(rng):
    """End-to-end: grid_sample_2d_packed flat_channels fast path (what
    forward_cached's b==1 branch calls via shift_bev) vs the XLA
    moveaxis fallback."""
    n, c, h, w = 8, 80, 16, 16
    imgs = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    grid = jnp.asarray(rng.uniform(-1.2, 1.2, (n, h, w, 2)), jnp.float32)
    fast = grid_sample_2d_packed(
        imgs, grid, align_corners=True, pallas_combine=True,
        split_batch_gather=True, flat_channels=True,
    )
    slow = grid_sample_2d_packed(
        imgs, grid, align_corners=True, pallas_combine=False,
        flat_channels=True,
    )
    assert fast.shape == slow.shape == (h, w, n * c)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(slow),
                               rtol=1e-5, atol=1e-5)
