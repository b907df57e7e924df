"""Fixed-capacity voxelization vs a brute-force NumPy binning."""

import jax.numpy as jnp
import numpy as np

from rcbevdet_tpu.ops.voxelize import voxelize_pillars


def _reference_pillars(points, mask, pc_range, voxel_size, max_pts):
    """Brute-force: dict of voxel-id -> first-come list of points."""
    x0, y0, z0, x1, y1, z1 = pc_range
    vx, vy, _ = voxel_size
    nx = int(round((x1 - x0) / vx))
    ny = int(round((y1 - y0) / vy))
    pillars = {}
    for i, p in enumerate(points):
        if not mask[i]:
            continue
        ix = int(np.floor((p[0] - x0) / vx))
        iy = int(np.floor((p[1] - y0) / vy))
        if not (0 <= ix < nx and 0 <= iy < ny and z0 <= p[2] < z1):
            continue
        vid = iy * nx + ix
        lst = pillars.setdefault(vid, [])
        if len(lst) < max_pts:
            lst.append(p)
    return pillars, nx


def test_voxelize_matches_bruteforce(rng):
    n, d = 200, 7
    pc_range = (-4.0, -4.0, -1.0, 4.0, 4.0, 1.0)
    voxel = (1.0, 1.0, 2.0)
    points = (rng.random((n, d)) * 10 - 5).astype(np.float32)
    mask = rng.random(n) > 0.1

    out = voxelize_pillars(
        jnp.asarray(points), jnp.asarray(mask), pc_range, voxel,
        max_pillars=64, max_points_per_pillar=5,
    )
    ref, nx = _reference_pillars(points, mask, pc_range, voxel, 5)

    got = {}
    feats = np.asarray(out.features)
    coors = np.asarray(out.coors)
    nums = np.asarray(out.num_points)
    pmask = np.asarray(out.pillar_mask)
    assert pmask.sum() == len(ref)
    for p in range(64):
        if not pmask[p]:
            assert nums[p] == 0
            continue
        vid = coors[p][1] * nx + coors[p][2]
        got[vid] = feats[p][: nums[p]]

    assert set(got.keys()) == set(ref.keys())
    for vid, pts in ref.items():
        np.testing.assert_allclose(
            np.sort(got[vid][:, 0]), np.sort(np.array(pts)[:, 0]), rtol=1e-6
        )
        assert len(got[vid]) == len(pts)


def test_voxelize_first_come_kept(rng):
    # 8 points all in one voxel; capacity 3 -> the first 3 by original order.
    pts = np.zeros((8, 4), np.float32)
    pts[:, 0] = 0.5
    pts[:, 1] = 0.5
    pts[:, 3] = np.arange(8)
    out = voxelize_pillars(
        jnp.asarray(pts), jnp.ones(8, bool), (0, 0, -1, 4, 4, 1), (1, 1, 2),
        max_pillars=4, max_points_per_pillar=3,
    )
    feats = np.asarray(out.features)
    assert np.asarray(out.num_points)[0] == 3
    np.testing.assert_array_equal(feats[0, :, 3], [0, 1, 2])
