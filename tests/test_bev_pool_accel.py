"""Accelerate-mode pooling (ops/bev_pool_accel.py) vs the segment-sum oracle."""

import os
import sys

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from rcbevdet_tpu.ops.bev_pool import bev_pool_dense
from rcbevdet_tpu.ops.bev_pool_accel import (
    bev_pool_accel, bev_pool_train, build_pool_meta_device,
    precompute_pool_meta,
)


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


def test_device_meta_matches_host_meta_pool():
    """bev_pool_accel over the device-built meta == over the host meta."""
    rng = np.random.default_rng(2)
    num_cells = 256
    depth, feat, ranks, rf = _case(rng, num_cells=num_cells)
    host = precompute_pool_meta(
        ranks, rf, num_cells, depth_bins=depth.shape[1],
        hw=depth.shape[2] * depth.shape[3], cells_per_tile=32, chunk=16
    )
    dev = build_pool_meta_device(
        jnp.asarray(ranks), num_cells, depth_bins=depth.shape[1],
        hw=depth.shape[2] * depth.shape[3], cells_per_tile=32, chunk=16
    )
    out_h = bev_pool_accel(
        jnp.asarray(depth), jnp.asarray(feat), host, interpret=True
    )
    out_d = bev_pool_accel(
        jnp.asarray(depth), jnp.asarray(feat), dev, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out_d), np.asarray(out_h), rtol=1e-6, atol=1e-6
    )


def test_bev_pool_train_forward_and_grads_match_dense():
    """Custom-VJP sorted train pool: forward == dense oracle; grads too."""
    rng = np.random.default_rng(3)
    num_cells = 256
    depth, feat, ranks, _ = _case(rng, num_cells=num_cells)
    dj, fj = jnp.asarray(depth), jnp.asarray(feat)
    rb = jnp.asarray(ranks)

    def loss_sorted(d, f):
        out = bev_pool_train(d, f, rb, num_cells, 32, 16)
        return jnp.sum(out * out), out

    def loss_dense(d, f):
        out = bev_pool_dense(d, f, rb.reshape(d.shape), num_cells)
        return jnp.sum(out * out), out

    (ls, outs), gs = jax.value_and_grad(loss_sorted, (0, 1), has_aux=True)(
        dj, fj
    )
    (ld, outd), gd = jax.value_and_grad(loss_dense, (0, 1), has_aux=True)(
        dj, fj
    )
    np.testing.assert_allclose(np.asarray(outs), np.asarray(outd),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(ls), float(ld), rtol=1e-5)
    for a, b in zip(gs, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_bev_pool_train_batched_combined_ranks():
    """One sort over the batch (per-sample rank offsets) == per-sample
    dense pooling — the exact combined-rank-space form the view
    transformer's 'sorted' train path uses."""
    rng = np.random.default_rng(5)
    b, num_cells = 3, 256
    cases = [_case(rng, num_cells=num_cells) for _ in range(b)]
    depth = np.stack([c_[0] for c_ in cases])   # [B, N, D, Hf, Wf]
    feat = np.stack([c_[1] for c_ in cases])
    ranks = np.stack([c_[2] for c_ in cases])   # [B, P]
    n, d, hf, wf = depth.shape[1:]
    c = feat.shape[-1]
    rk = jnp.asarray(ranks)
    rk_c = jnp.where(
        rk < num_cells,
        jnp.arange(b, dtype=jnp.int32)[:, None] * num_cells + rk,
        b * num_cells,
    ).reshape(-1)
    out = bev_pool_train(
        jnp.asarray(depth).reshape(b * n, d, hf, wf),
        jnp.asarray(feat).reshape(b * n, hf, wf, c),
        rk_c, b * num_cells, 32, 16,
    ).reshape(b, num_cells, c)
    oracle = jnp.stack([
        bev_pool_dense(
            jnp.asarray(depth[i]), jnp.asarray(feat[i]),
            rk[i].reshape(depth[i].shape), num_cells,
        )
        for i in range(b)
    ])
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(oracle), rtol=1e-5, atol=1e-5
    )


def test_device_meta_all_invalid_and_jit():
    """All-trash sample pools to zeros; the builder works under jit."""
    rng = np.random.default_rng(4)
    num_cells = 128
    depth, feat, ranks, _ = _case(rng, num_cells=num_cells)
    ranks = np.full_like(ranks, num_cells)

    @jax.jit
    def run(d, f, r):
        return bev_pool_train(d, f, r, num_cells, 32, 16)

    out = np.asarray(run(jnp.asarray(depth), jnp.asarray(feat),
                         jnp.asarray(ranks)))
    assert out.shape == (num_cells, feat.shape[-1])
    assert np.all(out == 0.0)

