"""Benchmark: RCBEVDet-R50 deployment-style inference FPS on one chip.

Reproduces the reference's FPS-measurement semantics
(tools/analysis_tools/benchmark_sequential.py, SURVEY.md §3.4): cached
previous BEV features + key-frame-only camera compute — i.e. the
incremental per-timestep cost of the deployed detector — NOT 9 full
forward passes.  Baseline: 21-28 FPS on an RTX 3090 (reference README.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from rcbevdet_tpu.models import RCBEVDet, RCBEVDetConfig
    from rcbevdet_tpu.inference import decode_predictions
    from __graft_entry__ import _example_batch

    num_adj = 8
    cfg = RCBEVDetConfig(num_adj=num_adj, freeze_img=True)
    model = RCBEVDet(cfg)
    rng = np.random.default_rng(0)

    # key-frame-only batch for the incremental path
    full = _example_batch(cfg, b=1, rng=rng)
    key_batch = {
        k: (v[:, 0:1] if k in ("imgs", "sensor2keyegos", "intrins",
                               "post_rots", "post_trans") else v)
        for k, v in full.items()
    }

    variables = model.init(jax.random.PRNGKey(0), full, train=False)

    ny = nx = cfg.bev_size
    prev_bev = jnp.asarray(
        rng.standard_normal((1, num_adj, ny, nx, cfg.num_trans_channels)),
        jnp.float32,
    )
    prev_s2k = jnp.asarray(full["sensor2keyegos"][:, 1:])

    @jax.jit
    def step(variables, batch, prev_bev, prev_s2k):
        preds, key_bev = model.apply(
            variables, batch, prev_bev, prev_s2k, method=RCBEVDet.forward_cached
        )
        dec = decode_predictions(preds)
        # roll the BEV cache like the deployed pipeline would
        new_prev = jnp.concatenate(
            [key_bev[:, None], prev_bev[:, :-1]], axis=1
        )
        return dec.bboxes, dec.scores, new_prev

    # compile + warmup
    boxes, scores, prev_bev = step(variables, key_batch, prev_bev, prev_s2k)
    jax.block_until_ready(boxes)
    warmup = 5
    for _ in range(warmup):
        boxes, scores, prev_bev = step(variables, key_batch, prev_bev, prev_s2k)
    jax.block_until_ready(boxes)

    iters = int(os.environ.get("BENCH_ITERS", "100"))
    t0 = time.perf_counter()
    for _ in range(iters):
        boxes, scores, prev_bev = step(variables, key_batch, prev_bev, prev_s2k)
    jax.block_until_ready(boxes)
    dt = time.perf_counter() - t0
    fps = iters / dt

    baseline_fps = 24.5  # midpoint of the reference's 21-28 FPS (RTX 3090)
    print(
        json.dumps(
            {
                "metric": "rcbevdet_r50_cached_sequential_fps",
                "value": round(fps, 2),
                "unit": "FPS/chip",
                "vs_baseline": round(fps / baseline_fps, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
