"""Accelerate-mode pooling (ops/bev_pool_accel.py) vs the segment-sum oracle."""

import os
import sys

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rcbevdet_tpu.ops.bev_pool import bev_pool_dense
from rcbevdet_tpu.ops.bev_pool_accel import bev_pool_accel, precompute_pool_meta


def _case(rng, n=2, d=6, hf=4, wf=5, c=16, num_cells=256, trash_frac=0.3):
    p = n * d * hf * wf
    ranks = rng.integers(0, num_cells, p)
    trash = rng.random(p) < trash_frac
    ranks = np.where(trash, num_cells, ranks).astype(np.int32)
    rf = np.broadcast_to(
        np.arange(n * hf * wf, dtype=np.int32).reshape(n, 1, hf * wf),
        (n, d, hf * wf),
    ).reshape(-1)
    depth = rng.standard_normal((n, d, hf, wf)).astype(np.float32)
    feat = rng.standard_normal((n, hf, wf, c)).astype(np.float32)
    return depth, feat, ranks, rf


def test_accel_matches_dense_oracle():
    rng = np.random.default_rng(0)
    num_cells = 256
    depth, feat, ranks, rf = _case(rng, num_cells=num_cells)
    oracle = bev_pool_dense(
        jnp.asarray(depth), jnp.asarray(feat),
        jnp.asarray(ranks).reshape(depth.shape), num_cells,
    )
    meta = precompute_pool_meta(
        ranks, rf, num_cells, depth_bins=depth.shape[1],
        hw=depth.shape[2] * depth.shape[3], cells_per_tile=32, chunk=16
    )
    out = bev_pool_accel(
        jnp.asarray(depth), jnp.asarray(feat), meta, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(oracle), rtol=1e-5, atol=1e-5
    )


def test_accel_empty_tiles_are_zero():
    """Cells whose tile receives no points must come back exactly zero."""
    rng = np.random.default_rng(1)
    num_cells = 256
    depth, feat, ranks, rf = _case(rng, num_cells=num_cells)
    # empty the 2nd tile (cells 32..63) entirely
    ranks = np.where(
        (ranks >= 32) & (ranks < 64), num_cells, ranks
    ).astype(np.int32)
    meta = precompute_pool_meta(
        ranks, rf, num_cells, depth_bins=depth.shape[1],
        hw=depth.shape[2] * depth.shape[3], cells_per_tile=32, chunk=16
    )
    out = np.asarray(bev_pool_accel(
        jnp.asarray(depth), jnp.asarray(feat), meta, interpret=True
    ))
    assert np.all(out[32:64] == 0.0)
    oracle = np.asarray(bev_pool_dense(
        jnp.asarray(depth), jnp.asarray(feat),
        jnp.asarray(ranks).reshape(depth.shape), num_cells,
    ))
    np.testing.assert_allclose(out, oracle, rtol=1e-5, atol=1e-5)
