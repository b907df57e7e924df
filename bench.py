"""Benchmark: RCBEVDet-R50 deployment-style inference FPS on one chip.

Reproduces the reference's FPS-measurement semantics
(tools/analysis_tools/benchmark_sequential.py, SURVEY.md §3.4): cached
previous BEV features + key-frame-only camera compute — i.e. the
incremental per-timestep cost of the deployed detector — NOT 9 full
forward passes.  Baseline: 21-28 FPS on an RTX 3090 (reference README.md);
the reference loop times model(return_loss=False, rescale=True) which
includes its CUDA rotated NMS, so we report the device-graph FPS *and* the
end-to-end FPS including our host-side Scale-NMS, and use the end-to-end
number as the headline.

MEASUREMENT METHOD.  On this harness the TPU is reached through a network
tunnel whose async mode acks dispatches before the device finishes —
``block_until_ready`` returns at enqueue-ack, so wall-clock loops report
dispatch throughput, not compute time (100x too fast).  Per-frame device
time is therefore measured by running the jitted step under
``jax.profiler.trace`` and summing the device-op durations from the trace
(cross-checked against synchronous-mode timing minus the measured RTT
floor; the two agree within 2%).  No output of a timed executable is ever
fetched before or during measurement: the first device_get in a process
flips the tunnel into per-call synchronous dispatch.

Prints ONE JSON line with the required {"metric", "value", "unit",
"vs_baseline"} plus self-describing extras: ms/frame, GFLOPs/frame (XLA
cost analysis; upper bound), dtype of the winning config, and the
host-NMS cost.  Both float32 and bfloat16 activation paths are measured
(params stay f32 master copies; bf16 casts the conv/linear kernels and
image inputs — BN statistics and LSS geometry remain f32, see
models/layers.py BatchNorm).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

# Peak dense-matmul throughput per chip by device_kind substring, FLOP/s.
# (bf16 MXU peak; f32 lowers to bf16-multipass on these chips.)
_PEAK_BF16 = {
    "v5 lite": 197e12,  # TPU v5e
    "v5e": 197e12,
    "v5p": 459e12,
    "v4": 275e12,
    "v6": 918e12,  # Trillium
}


def _peak_flops(device) -> float:
    kind = getattr(device, "device_kind", "").lower()
    for k, v in _PEAK_BF16.items():
        if k in kind:
            return v
    return 197e12


def _traced_device_ms_per_step(run_n_steps, n) -> float:
    """True per-step device time via profiler-trace op sums (the only
    reliable timing on this tunneled-TPU harness — module docstring)."""
    from rcbevdet_tpu.utils.profiling import traced_device_ms_per_step

    return traced_device_ms_per_step(run_n_steps, n)


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _enable_compile_cache, _example_batch
    from rcbevdet_tpu.inference import decode_predictions, postprocess_sample
    from rcbevdet_tpu.models import RCBEVDet, RCBEVDetConfig
    from rcbevdet_tpu.utils.platform import tpu_compiler_options
    _enable_compile_cache()

    import dataclasses

    num_adj = 8
    cfg = RCBEVDetConfig(num_adj=num_adj, freeze_img=True)
    model = RCBEVDet(cfg)
    # same param tree, bf16 activation boundaries in the radar branch
    model_bf16 = RCBEVDet(
        dataclasses.replace(cfg, compute_dtype="bfloat16")
    )
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
    # NOTE r5: the packed-corner cache (forward_cached packed_cache=True)
    # was A/B'd here and REVERTED for the rolled-serving semantics: packing
    # once per frame saves 0.43 ms/step of re-pack, but rolling + feeding
    # the 4x-larger cache costs ~0.5 (84 MB shift + input relayout) — net
    # negative at B=1 and a wash at 8 streams.
    prev_bev0 = jnp.asarray(
        rng.standard_normal((1, num_adj, ny, nx, cfg.num_trans_channels)),
        jnp.float32,
    )
    prev_s2k = jnp.asarray(full["sensor2keyegos"][:, 1:])

    # accelerate-mode pooling metadata: precomputed ONCE on host for the
    # fixed camera rig, exactly like the reference benchmark's
    # `accelerate=True` rank precompute (benchmark_sequential.py:57-59,
    # view_transformer.py:267-271) — setup cost, not per-frame cost
    from rcbevdet_tpu.models.view_transformer import precompute_lss_pool_meta

    pool_meta = precompute_lss_pool_meta(
        cfg.grid_config, cfg.input_size, cfg.downsample,
        full["sensor2keyegos"][0, 0], full["intrins"][0, 0],
        full["post_rots"][0, 0], full["post_trans"][0, 0], full["bda"][0],
    )

    def make_step(m=model):
        import functools

        @functools.partial(
            jax.jit, donate_argnums=(2,),
            compiler_options=tpu_compiler_options(),
        )
        def step(variables, batch, prev_bev, prev_s2k, pool_meta):
            # prev_bev donated: the cache roll reuses the old buffer
            # in place instead of a fresh allocation + copy per step
            # (the deployed StreamServer donates the same way)
            preds, key_bev = m.apply(
                variables, batch, prev_bev, prev_s2k, pool_meta,
                method=RCBEVDet.forward_cached,
            )
            dec = decode_predictions(preds)
            # roll the BEV cache like the deployed pipeline would
            new_prev = jnp.concatenate(
                [key_bev[:, None], prev_bev[:, :-1]], axis=1
            )
            return dec, new_prev

        return step

    iters = int(os.environ.get("BENCH_ITERS", "100"))
    warmup = 5
    results = {}

    # IMPORTANT: the timed loops must never fetch an output of the timed
    # executable — on this tunneled-TPU harness, a single device_get of an
    # executable's outputs flips that executable into a mode where every
    # subsequent call materializes outputs to host (~150 ms/call vs the
    # real ~1 ms device time).  All host-side work happens after timing,
    # through a separately-jitted instance.
    for dtype_name in ("float32", "bfloat16"):
        if dtype_name == "bfloat16":
            dt = jnp.bfloat16
            vbench = {
                "params": jax.tree_util.tree_map(
                    lambda x: x.astype(dt)
                    if x.dtype == jnp.float32 else x,
                    variables["params"],
                ),
                "batch_stats": variables["batch_stats"],
            }
            kb = dict(key_batch, imgs=key_batch["imgs"].astype(dt))
            prev_bev = prev_bev0.astype(dt)
        else:
            # fresh copy: the step donates its cache argument and
            # prev_bev0 is reused later for the NMS-cost instance
            vbench, kb, prev_bev = variables, key_batch, prev_bev0 + 0.0

        step = make_step(model_bf16 if dtype_name == "bfloat16" else model)
        dec, prev_bev = step(vbench, kb, prev_bev, prev_s2k, pool_meta)
        jax.block_until_ready(dec.bboxes)
        for _ in range(warmup):
            dec, prev_bev = step(vbench, kb, prev_bev, prev_s2k, pool_meta)
        jax.block_until_ready(dec.bboxes)

        state = {"prev_bev": prev_bev}

        def run_n_steps(n):
            pb = state["prev_bev"]
            d = None
            for _ in range(n):
                d, pb = step(vbench, kb, pb, prev_s2k, pool_meta)
            jax.block_until_ready(d.bboxes)
            state["prev_bev"] = pb

        dev_s = (
            _traced_device_ms_per_step(run_n_steps, min(iters, 10)) / 1e3
        )

        # cost analysis via the SAME jitted function (hits the persistent
        # compile cache rather than recompiling a fresh wrapper)
        compiled = step.lower(vbench, kb, prev_bev, prev_s2k, pool_meta).compile(
            compiler_options=tpu_compiler_options()
        )
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        results[dtype_name] = {
            "fps_device": 1.0 / dev_s,
            "ms_per_frame_device": dev_s * 1e3,
            "gflops_per_frame": cost.get("flops", float("nan")) / 1e9,
        }

    # host-side Scale-NMS cost, measured on the f32 decode output, fetched
    # ONCE through a fresh jit instance so the timed executables above stay
    # un-poisoned (the reference's timed loop includes its CUDA rotated NMS)
    step_nms = make_step()
    dec, _ = step_nms(variables, key_batch, prev_bev0 + 0.0, prev_s2k,
                      pool_meta)
    t0 = time.perf_counter()
    bboxes, scores, labels, valid = jax.device_get(
        (dec.bboxes, dec.scores, dec.labels, dec.valid)
    )
    fetch_s = time.perf_counter() - t0
    postprocess_sample(bboxes[0], scores[0], labels[0], valid[0])
    t0 = time.perf_counter()
    nms_iters = 20
    for _ in range(nms_iters):
        postprocess_sample(bboxes[0], scores[0], labels[0], valid[0])
    host_s = (time.perf_counter() - t0) / nms_iters

    dev = jax.devices()[0]
    peak = _peak_flops(dev)
    for r in results.values():
        r["fps_e2e_incl_host_nms"] = 1.0 / (
            r["ms_per_frame_device"] / 1e3 + host_s
        )
        r["mfu_vs_bf16_peak"] = (
            r["gflops_per_frame"] * 1e9 * r["fps_device"] / peak
        )

    best_dtype = max(results, key=lambda k: results[k]["fps_e2e_incl_host_nms"])
    best = results[best_dtype]

    baseline_fps = 24.5  # midpoint of the reference's 21-28 FPS (RTX 3090)
    out = {
        "metric": "rcbevdet_r50_cached_sequential_fps",
        "value": round(best["fps_e2e_incl_host_nms"], 2),
        "unit": "FPS/chip",
        "vs_baseline": round(best["fps_e2e_incl_host_nms"] / baseline_fps, 3),
        "includes_host_nms": True,
        "dtype": best_dtype,
        "device_kind": getattr(dev, "device_kind", str(dev)),
        "host_nms_ms": round(host_s * 1e3, 3),
        # one-time D2H latency of the decode outputs over this harness's
        # network-tunneled TPU; on a locally-attached chip this is ~us and
        # it is NOT part of the per-frame cost (outputs stay on device
        # between frames), so it is reported separately, not in the FPS
        "decode_fetch_ms_tunnel": round(fetch_s * 1e3, 3),
        "peak_tflops_bf16": peak / 1e12,
        # XLA cost analysis counts every HLO flop (incl. f32-multipass
        # expansion, gather addressing and window arithmetic), so the
        # GFLOPs/frame — and the MFU derived from it — are upper bounds,
        # not an MXU-utilization measurement.
        "flops_source": "xla_cost_analysis_upper_bound",
        "per_dtype": {
            k: {
                "fps_device": round(r["fps_device"], 2),
                "fps_e2e_incl_host_nms": round(r["fps_e2e_incl_host_nms"], 2),
                "ms_per_frame_device": round(r["ms_per_frame_device"], 3),
                "gflops_per_frame": round(r["gflops_per_frame"], 2),
                "mfu_vs_bf16_peak": round(r["mfu_vs_bf16_peak"], 4),
            }
            for k, r in results.items()
        },
    }

    # Batched-stream serving throughput (extra, never the headline): the
    # same cached-sequential step over N INDEPENDENT camera streams
    # (multi-vehicle serving) amortizes the radar small-op tail and the
    # decode — FPS here counts frames (one per stream per step).  Guarded:
    # any failure must not cost the headline line.
    try:
        n_streams = int(os.environ.get("BENCH_STREAMS", "8"))
        if n_streams > 1:
            dt_b = jnp.bfloat16
            vb = {
                "params": jax.tree_util.tree_map(
                    lambda x: x.astype(dt_b)
                    if x.dtype == jnp.float32 else x,
                    variables["params"],
                ),
                "batch_stats": variables["batch_stats"],
            }
            fullb = _example_batch(cfg, b=n_streams, rng=rng)
            kbb = {
                k: (v[:, 0:1] if k in ("imgs", "sensor2keyegos", "intrins",
                                       "post_rots", "post_trans") else v)
                for k, v in fullb.items()
            }
            kbb = dict(kbb, imgs=kbb["imgs"].astype(dt_b))
            pbb = jnp.zeros(
                (n_streams, num_adj, ny, nx, cfg.num_trans_channels), dt_b
            )
            psb = jnp.asarray(fullb["sensor2keyegos"][:, 1:])
            stepb = make_step(model_bf16)
            dec, pbb = stepb(vb, kbb, pbb, psb, pool_meta)  # pbb donated
            jax.block_until_ready(dec.bboxes)
            for _ in range(3):
                dec, pbb = stepb(vb, kbb, pbb, psb, pool_meta)
            jax.block_until_ready(dec.bboxes)
            st = {"pb": pbb}

            def run_nb(n):
                pb = st["pb"]
                d = None
                for _ in range(n):
                    d, pb = stepb(vb, kbb, pb, psb, pool_meta)
                jax.block_until_ready(d.bboxes)
                st["pb"] = pb

            ms_step = _traced_device_ms_per_step(run_nb, 10)
            out["streams_bf16"] = {
                "n_streams": n_streams,
                "ms_per_step_device": round(ms_step, 3),
                "ms_per_frame_device": round(ms_step / n_streams, 3),
                "fps_per_chip_device": round(n_streams * 1e3 / ms_step, 2),
            }
    except Exception as e:  # pragma: no cover - best-effort extra
        out["streams_bf16"] = {"error": str(e)[:200]}

    print(json.dumps(out))


if __name__ == "__main__":
    main()
