"""A/B the two bev_pool implementations on the current backend.

Compares the XLA segment-sum formulation (ops/bev_pool.py) against the
fused Pallas kernel (ops/bev_pool_pallas.py) at the real RCBEVDet-R50 LSS
shapes (6 cams x 118 depth bins x 16x44 feature grid -> 128x128 BEV,
C=80), for forward and forward+backward, and checks numerical agreement.

Run on TPU:  python -m rcbevdet_tpu.tools.ab_bev_pool
Prints one JSON line per (batch, mode) with times and the winner.

Reference counterpart: the CUDA kernel benchmark implicit in
tools/analysis_tools/benchmark_view_transformer.py.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _realistic_inputs(b, n=6, num_d=118, hf=16, wf=44, c=80, nbev=128, seed=0):
    rng = np.random.default_rng(seed)
    p = n * num_d * hf * wf
    num_cells = nbev * nbev
    depth = jnp.asarray(
        jax.nn.softmax(
            jnp.asarray(rng.standard_normal((b, n, num_d, hf, wf)), jnp.float32),
            axis=2,
        )
    )
    feat = jnp.asarray(rng.standard_normal((b, n, hf, wf, c)), jnp.float32)
    ranks_depth = jnp.broadcast_to(
        jnp.arange(p, dtype=jnp.int32)[None], (b, p)
    )
    rf = jnp.arange(n * hf * wf, dtype=jnp.int32).reshape(n, 1, hf * wf)
    ranks_feat = jnp.broadcast_to(
        jnp.broadcast_to(rf, (n, num_d, hf * wf)).reshape(-1)[None], (b, p)
    )
    # realistic rank distribution: clustered like an LSS frustum (nearby
    # pixels land in nearby BEV cells), ~15% out of range (trash)
    base = rng.integers(0, num_cells, (b, n, hf * wf))
    jitter = rng.integers(-40, 40, (b, n, num_d, hf * wf))
    ranks = np.clip(base[:, :, None, :] + jitter, 0, num_cells - 1)
    trash = rng.random((b, n, num_d, hf * wf)) < 0.15
    ranks = np.where(trash, num_cells, ranks)
    ranks_bev = jnp.asarray(ranks.reshape(b, p), jnp.int32)
    return depth, feat, ranks_depth, ranks_feat, ranks_bev, num_cells


def _time(fn, args, iters=30, warmup=3):
    out = fn(*args)
    jax.block_until_ready(out)
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="*", default=[1, 8])
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    from rcbevdet_tpu.ops.bev_pool import bev_pool_batch
    from rcbevdet_tpu.ops.bev_pool_pallas import bev_pool_custom

    results = []
    for b in args.batches:
        inputs = _realistic_inputs(b)
        num_cells = inputs[-1]

        xla_fwd = jax.jit(
            lambda *a: bev_pool_batch(*a, num_cells)
        )
        pallas_fwd = jax.jit(
            jax.vmap(
                lambda d, f, rd, rf, rb: bev_pool_custom(
                    d, f, rd, rf, rb, num_cells
                )
            )
        )

        def loss_xla(d, f, rd, rf, rb):
            return jnp.sum(bev_pool_batch(d, f, rd, rf, rb, num_cells) ** 2)

        def loss_pallas(d, f, rd, rf, rb):
            out = jax.vmap(
                lambda dd, ff, a, bb, cc: bev_pool_custom(
                    dd, ff, a, bb, cc, num_cells
                )
            )(d, f, rd, rf, rb)
            return jnp.sum(out**2)

        xla_grad = jax.jit(jax.grad(loss_xla, argnums=(0, 1)))
        pallas_grad = jax.jit(jax.grad(loss_pallas, argnums=(0, 1)))

        fwd_args = inputs[:-1]
        # numerics: both paths must agree
        o_x = xla_fwd(*fwd_args)
        o_p = pallas_fwd(*fwd_args)
        max_err = float(jnp.max(jnp.abs(o_x - o_p)))
        g_x = xla_grad(*fwd_args)
        g_p = pallas_grad(*fwd_args)
        gerr = max(
            float(jnp.max(jnp.abs(a - b2))) for a, b2 in zip(g_x, g_p)
        )

        row = {
            "batch": b,
            "fwd_xla_ms": round(_time(xla_fwd, fwd_args, args.iters) * 1e3, 3),
            "fwd_pallas_ms": round(
                _time(pallas_fwd, fwd_args, args.iters) * 1e3, 3
            ),
            "grad_xla_ms": round(
                _time(xla_grad, fwd_args, args.iters) * 1e3, 3
            ),
            "grad_pallas_ms": round(
                _time(pallas_grad, fwd_args, args.iters) * 1e3, 3
            ),
            "fwd_max_abs_err": max_err,
            "grad_max_abs_err": gerr,
            "platform": jax.devices()[0].platform,
        }
        row["fwd_winner"] = (
            "pallas" if row["fwd_pallas_ms"] < row["fwd_xla_ms"] else "xla"
        )
        row["grad_winner"] = (
            "pallas" if row["grad_pallas_ms"] < row["grad_xla_ms"] else "xla"
        )
        results.append(row)
        print(json.dumps(row))
    return results


if __name__ == "__main__":
    main()
