"""AOT model export via ``jax.export`` — the TPU-serving counterpart of
the reference's TensorRT/ONNX deployment tools
(tools/convert_bevdet_to_TRT.py, convert_bevdepth4d_to_onnx.py,
TRTBEVPoolv2 at ops/bev_pool_v2/bev_pool.py:95-142).

On TPU there is no engine format to convert to: the deployed artifact is
the StableHLO of the jitted inference program, serialized with
``jax.export`` so a serving process can load and run it without Python
model code (or compile it for a different device topology).

Two programs are exported:
- ``full``: the standard multi-frame forward + decode (tools/test.py path)
- ``cached``: the incremental deployment path (key-frame camera compute +
  cached previous BEV, the benchmark_sequential semantics) — this is the
  one a real-time stack serves.

Usage:
  python -m rcbevdet_tpu.tools.export <config.py> --out model.stablehlo
      [--mode cached|full] [--checkpoint DIR]

The artifact round-trips with ``jax.export.deserialize`` (see
tests/test_export.py).
"""

from __future__ import annotations

import argparse
import logging
import sys

import numpy as np


def build_exported(model, cfg, variables, mode="cached", batch=None):
    """Return a jax.export.Exported of the requested inference program."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from ..inference import decode_predictions
    from ..models import RCBEVDet

    if batch is None:
        import os
        import sys as _sys

        _sys.path.insert(
            0,
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))),
        )
        from __graft_entry__ import _example_batch

        batch = _example_batch(cfg, b=1)

    if mode == "full":
        def fn(variables, batch):
            preds, _ = model.apply(variables, batch, train=False)
            dec = decode_predictions(preds)
            return dec.bboxes, dec.scores, dec.labels, dec.valid

        args = (variables, batch)
    elif mode == "cached":
        key_batch = {
            k: (v[:, 0:1] if k in ("imgs", "sensor2keyegos", "intrins",
                                   "post_rots", "post_trans") else v)
            for k, v in batch.items()
        }
        ny = nx = cfg.bev_size
        prev_bev = jnp.zeros(
            (1, cfg.num_adj, ny, nx, cfg.num_trans_channels), jnp.float32
        )
        prev_s2k = jnp.asarray(batch["sensor2keyegos"][:, 1:])

        def fn(variables, batch, prev_bev, prev_s2k):
            preds, key_bev = model.apply(
                variables, batch, prev_bev, prev_s2k,
                method=RCBEVDet.forward_cached,
            )
            dec = decode_predictions(preds)
            return dec.bboxes, dec.scores, dec.labels, dec.valid, key_bev

        args = (variables, key_batch, prev_bev, prev_s2k)
    else:
        raise ValueError(mode)

    return jexport.export(jax.jit(fn))(*args), args


def main(argv=None):
    p = argparse.ArgumentParser(description="Export an AOT inference program")
    p.add_argument("config")
    p.add_argument("--out", required=True)
    p.add_argument("--mode", choices=("cached", "full"), default="cached")
    p.add_argument("--checkpoint", default=None)
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    import os

    from ..utils.platform import apply_platform_env

    apply_platform_env(num_cpu_devices=int(
        os.environ.get("RCBEV_NUM_CPU_DEVICES", 0)) or None)

    import jax

    from ..builder import build_model
    from ..config import Config

    cfg_file = Config.fromfile(args.config)
    model, mcfg = build_model(cfg_file)

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))),
    )
    from __graft_entry__ import _example_batch

    batch = _example_batch(mcfg, b=1)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    if args.checkpoint:
        from ..training.checkpoint import restore_checkpoint

        state = restore_checkpoint(args.checkpoint, None)
        variables = {
            "params": state["ema_params"],
            "batch_stats": state["ema_batch_stats"],
        }

    exported, _ = build_exported(
        model, mcfg, variables, mode=args.mode, batch=batch
    )
    blob = exported.serialize()
    with open(args.out, "wb") as f:
        f.write(blob)
    logging.info(
        "exported %s program (%d bytes, platforms=%s) -> %s",
        args.mode, len(blob), exported.platforms, args.out,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
