"""jax.export AOT round-trip (TRT/ONNX-deployment counterpart)."""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from __graft_entry__ import _example_batch
from rcbevdet_tpu.models import RCBEVDet, RCBEVDetConfig
from rcbevdet_tpu.tools.export import build_exported


def _tiny_cfg():
    return RCBEVDetConfig(
        input_size=(32, 96), resnet_depth=18, img_neck_channels=32,
        num_trans_channels=8, num_adj=1,
        grid_config={"x": (-4.0, 4.0, 1.0), "y": (-4.0, 4.0, 1.0),
                     "z": (-5.0, 3.0, 8.0), "depth": (1.0, 5.0, 0.5)},
        aspp_mid_channels=8, use_radar=False, imc=32, bev_size=8,
    )


def test_cached_export_roundtrip(rng, tmp_path):
    from jax import export as jexport

    cfg = _tiny_cfg()
    model = RCBEVDet(cfg)
    batch = _example_batch(cfg, b=1, n=1, nmax_radar=8, rng=rng)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)

    exported, args = build_exported(
        model, cfg, variables, mode="cached", batch=batch
    )
    blob = exported.serialize()
    path = tmp_path / "model.stablehlo"
    path.write_bytes(blob)

    # a fresh process would do exactly this: deserialize + call
    reloaded = jexport.deserialize(path.read_bytes())
    out_direct = exported.call(*args)
    out_reload = reloaded.call(*args)
    for a, b in zip(out_direct, out_reload):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    # boxes head shape sane
    assert out_reload[0].shape[-1] == 9


def test_full_export_matches_eager(rng):
    cfg = _tiny_cfg()
    model = RCBEVDet(cfg)
    batch = _example_batch(cfg, b=1, n=1, nmax_radar=8, rng=rng)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)

    exported, args = build_exported(
        model, cfg, variables, mode="full", batch=batch
    )
    from rcbevdet_tpu.inference import decode_predictions

    preds, _ = model.apply(variables, batch, train=False)
    dec = decode_predictions(preds)
    out = exported.call(*args)
    np.testing.assert_allclose(
        np.asarray(out[0]), np.asarray(dec.bboxes), rtol=1e-5, atol=1e-5
    )
