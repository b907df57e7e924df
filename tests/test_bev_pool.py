"""bev_pool correctness: the reference repo embeds one hand-computed golden
case for its CUDA kernel (ops/bev_pool_v2/bev_pool.py:145-176); we assert the
same forward sum and input gradients, plus a randomized comparison against a
brute-force NumPy accumulation.
"""

import jax
import jax.numpy as jnp
import numpy as np

from rcbevdet_tpu.ops.bev_pool import bev_pool, bev_pool_ranks


def test_bev_pool_golden():
    depth = jnp.asarray(
        [0.3, 0.4, 0.2, 0.1, 0.7, 0.6, 0.8, 0.9], jnp.float32
    ).reshape(1, 1, 2, 2, 2)
    feat = jnp.ones((1, 1, 2, 2, 2), jnp.float32)  # (B, N, H, W, C)
    ranks_depth = jnp.asarray([0, 4, 1, 6], jnp.int32)
    ranks_feat = jnp.asarray([0, 0, 1, 2], jnp.int32)
    ranks_bev = jnp.asarray([0, 0, 1, 1], jnp.int32)
    num_cells = 4  # 2x2 BEV

    def loss_fn(depth, feat):
        out = bev_pool(depth, feat, ranks_depth, ranks_feat, ranks_bev, num_cells)
        return jnp.sum(out)

    loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(depth, feat)
    np.testing.assert_allclose(float(loss), 4.4, rtol=1e-6)

    grad_depth = np.array([2.0, 2.0, 0.0, 0.0, 2.0, 0.0, 2.0, 0.0]).reshape(
        1, 1, 2, 2, 2
    )
    np.testing.assert_allclose(np.asarray(grads[0]), grad_depth, rtol=1e-6)
    grad_feat = np.array([1.0, 1.0, 0.4, 0.4, 0.8, 0.8, 0.0, 0.0]).reshape(
        1, 1, 2, 2, 2
    )
    np.testing.assert_allclose(np.asarray(grads[1]), grad_feat, rtol=1e-6)


def test_bev_pool_random_vs_numpy(rng):
    p, dtot, ftot, c, cells = 64, 40, 20, 5, 9
    depth = rng.random(dtot).astype(np.float32)
    feat = rng.random((ftot, c)).astype(np.float32)
    rd = rng.integers(0, dtot, p).astype(np.int32)
    rf = rng.integers(0, ftot, p).astype(np.int32)
    rb = rng.integers(0, cells + 1, p).astype(np.int32)  # some in trash cell

    out = bev_pool(
        jnp.asarray(depth), jnp.asarray(feat), jnp.asarray(rd), jnp.asarray(rf),
        jnp.asarray(rb), cells,
    )
    expected = np.zeros((cells, c), np.float32)
    for i in range(p):
        if rb[i] < cells:
            expected[rb[i]] += depth[rd[i]] * feat[rf[i]]
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5, atol=1e-6)


def test_bev_pool_ranks_masks_out_of_range():
    coor = jnp.asarray(
        [
            [0.05, 0.05, 0.0],  # cell (0, 0)
            [1.95, 0.05, 0.0],  # cell (1, 0) with nx=2
            # reference `.long()` binning truncates toward zero: a point up
            # to one voxel below the lower bound lands IN bin 0
            # (view_transformer.py:230-238)
            [-0.1, 0.0, 0.0],  # cell (0, 0) via trunc-toward-zero
            [-1.1, 0.0, 0.0],  # out of range (truncates to -1)
            [0.0, 0.0, 9.0],  # out of z range
        ]
    )
    ranks = bev_pool_ranks(
        coor, (0.0, 0.0, 0.0), (1.0, 1.0, 8.0), (2, 2, 1)
    )
    np.testing.assert_array_equal(np.asarray(ranks), [0, 1, 0, 4, 4])


def test_bev_pool_dense_matches_indexed():
    """The gather-free dense path must equal the indexed formulation for
    the natural frustum ordering it assumes."""
    from rcbevdet_tpu.ops.bev_pool import bev_pool, bev_pool_dense

    rng = np.random.default_rng(5)
    n, d, hf, wf, c = 2, 5, 4, 6, 7
    num_cells = 50
    depth = jnp.asarray(rng.standard_normal((n, d, hf, wf)), jnp.float32)
    feat = jnp.asarray(rng.standard_normal((n, hf, wf, c)), jnp.float32)
    p = n * d * hf * wf
    ranks_bev = jnp.asarray(
        rng.integers(0, num_cells + 1, (n, d, hf, wf)), jnp.int32
    )
    ranks_depth = jnp.arange(p, dtype=jnp.int32)
    rf = jnp.arange(n * hf * wf, dtype=jnp.int32).reshape(n, 1, hf * wf)
    ranks_feat = jnp.broadcast_to(rf, (n, d, hf * wf)).reshape(-1)
    ref = bev_pool(depth, feat, ranks_depth, ranks_feat,
                   ranks_bev.reshape(-1), num_cells)
    got = bev_pool_dense(depth, feat, ranks_bev, num_cells)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
