"""grid_sample / resize parity against torch (CPU) — torch is the numerics
oracle for the reference's F.grid_sample / nn.Upsample call sites."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from rcbevdet_tpu.ops.warp import (
    bilinear_resize, grid_sample_2d, grid_sample_2d_packed, nearest_resize)


def test_grid_sample_align_true_matches_torch(rng):
    h, w, c = 9, 7, 3
    img = rng.random((h, w, c)).astype(np.float32)
    grid = (rng.random((5, 6, 2)) * 2.4 - 1.2).astype(np.float32)

    got = grid_sample_2d(jnp.asarray(img), jnp.asarray(grid), align_corners=True)
    ref = F.grid_sample(
        torch.from_numpy(img).permute(2, 0, 1)[None],
        torch.from_numpy(grid)[None],
        mode="bilinear", padding_mode="zeros", align_corners=True,
    )[0].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-6)


def test_grid_sample_align_false_matches_torch(rng):
    h, w, c = 8, 11, 2
    img = rng.random((h, w, c)).astype(np.float32)
    grid = (rng.random((4, 4, 2)) * 2.4 - 1.2).astype(np.float32)

    got = grid_sample_2d(jnp.asarray(img), jnp.asarray(grid), align_corners=False)
    ref = F.grid_sample(
        torch.from_numpy(img).permute(2, 0, 1)[None],
        torch.from_numpy(grid)[None],
        mode="bilinear", padding_mode="zeros", align_corners=False,
    )[0].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-6)


def test_bilinear_resize_matches_torch(rng):
    h, w, c = 8, 8, 4
    img = rng.random((1, h, w, c)).astype(np.float32)
    got = bilinear_resize(jnp.asarray(img), 32, 32, align_corners=True)
    ref = F.interpolate(
        torch.from_numpy(img).permute(0, 3, 1, 2), scale_factor=4,
        mode="bilinear", align_corners=True,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-6)


def test_nearest_resize_matches_torch(rng):
    h, w, c = 5, 6, 2
    img = rng.random((1, h, w, c)).astype(np.float32)
    got = nearest_resize(jnp.asarray(img), 10, 12)
    ref = F.interpolate(
        torch.from_numpy(img).permute(0, 3, 1, 2), scale_factor=2, mode="nearest"
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-6)


def test_grid_sample_2d_packed_matches_unpacked():
    from rcbevdet_tpu.ops.warp import grid_sample_2d, grid_sample_2d_packed
    import jax

    rng = np.random.default_rng(11)
    n, h, w, c = 3, 9, 13, 5
    imgs = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    grid = jnp.asarray(rng.uniform(-1.4, 1.4, (n, 6, 4, 2)), jnp.float32)
    for ac in (True, False):
        ref = jax.vmap(
            lambda f, g: grid_sample_2d(f, g, align_corners=ac)
        )(imgs, grid)
        got = grid_sample_2d_packed(imgs, grid, align_corners=ac)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=2e-6
        )


def test_packed_pallas_combine_matches_default():
    """grid_sample_2d_packed(pallas_combine=True) == default combine
    (interpret-mode kernel off-TPU); exercises the temporal-warp fast path."""
    rng = np.random.default_rng(7)
    n, h, w, c = 3, 16, 16, 8
    imgs = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    grid = jnp.asarray(rng.uniform(-1.2, 1.2, (n, 128, 2)), jnp.float32)
    a = grid_sample_2d_packed(imgs, grid, align_corners=True)
    b = grid_sample_2d_packed(imgs, grid, align_corners=True,
                              pallas_combine=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_packed_split_batch_gather_matches_default():
    """split_batch_gather (per-frame VMEM-resident tables) is exact."""
    rng = np.random.default_rng(9)
    n, h, w, c = 4, 12, 12, 8
    imgs = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    grid = jnp.asarray(rng.uniform(-1.2, 1.2, (n, 50, 2)), jnp.float32)
    a = grid_sample_2d_packed(imgs, grid, align_corners=True)
    b = grid_sample_2d_packed(imgs, grid, align_corners=True,
                              split_batch_gather=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
