"""roiaware_pool3d / points_in_boxes_3d vs a NumPy oracle."""

import jax.numpy as jnp
import numpy as np

from rcbevdet_tpu.ops.roiaware_pool import points_in_boxes_3d, roiaware_pool3d


def _oracle(points, feats, boxes, out_size, mode):
    ox, oy, oz = out_size
    m = len(boxes)
    c = feats.shape[1]
    out = np.zeros((m, ox, oy, oz, c), np.float32)
    for bi, b in enumerate(boxes):
        cx, cy, cz, dx, dy, dz, yaw = b
        cos, sin = np.cos(yaw), np.sin(yaw)
        buckets = {}
        for p, f in zip(points, feats):
            px, py, pz = p - [cx, cy, cz]
            lx = px * cos + py * sin
            ly = -px * sin + py * cos
            if abs(lx) > dx / 2 or abs(ly) > dy / 2 or abs(pz) > dz / 2:
                continue
            ix = min(int((lx + dx / 2) / dx * ox), ox - 1)
            iy = min(int((ly + dy / 2) / dy * oy), oy - 1)
            iz = min(int((pz + dz / 2) / dz * oz), oz - 1)
            buckets.setdefault((ix, iy, iz), []).append(f)
        for (ix, iy, iz), fs in buckets.items():
            fs = np.stack(fs)
            out[bi, ix, iy, iz] = (
                fs.max(0) if mode == "max" else fs.mean(0)
            )
    return out


def test_roiaware_pool3d_matches_oracle(rng):
    n, m, c = 200, 3, 5
    points = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    feats = rng.standard_normal((n, c)).astype(np.float32)
    boxes = np.array(
        [
            [0, 0, 0, 6, 4, 3, 0.4],
            [-3, 5, 0.5, 5, 5, 2, -1.1],
            [4, -4, -0.5, 8, 3, 4, 2.2],
        ],
        np.float32,
    )
    for mode in ("max", "avg"):
        got = np.asarray(
            roiaware_pool3d(
                jnp.asarray(points), jnp.asarray(feats), jnp.asarray(boxes),
                (4, 4, 2), mode=mode,
            )
        )
        ref = _oracle(points, feats, boxes, (4, 4, 2), mode)
        np.testing.assert_allclose(got, ref, atol=1e-5)


def test_points_in_boxes_3d(rng):
    boxes = jnp.asarray([[0.0, 0.0, 0.0, 4.0, 2.0, 2.0, np.pi / 2]])
    # yaw 90deg: box extent 4 along y, 2 along x after rotation
    pts = jnp.asarray(
        [[0.0, 1.9, 0.0], [1.9, 0.0, 0.0], [0.0, 0.0, 1.1]]
    )
    got = np.asarray(points_in_boxes_3d(pts, boxes))[:, 0]
    np.testing.assert_array_equal(got, [True, False, False])
