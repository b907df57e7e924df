"""VoVNet V2-99 forward numerics parity vs the reference vovnet.py.

Loads the actual reference VoVNet (models/backbones/vovnet.py, the V2-99
backbone of the larger RC configs; detectron2 pieces shimmed to public
upstream implementations — get_norm('BN') is a plain BatchNorm2d) and
compares the full stem + 4 OSA-stage forward against
models/vovnet.py::VoVNetV2 with copied weights.  Covers the OSA concat
topology, the always-applied eSE (the reference ignores its SE flag,
vovnet.py:187-204), identity connections on blocks 2+, and the
ceil-mode/no-padding stage max-pool alignment.
"""

import re

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

import refshim
from test_reference_module_parity import (
    TOL,
    _randomize_bn_stats,
    _randomize_params,
)


def _convert_vovnet(tm, variables):
    """torch VoVNet state_dict -> flax VoVNetV2 params (in-test map; the
    torch names embed '/' from the OrderedDict Sequentials)."""
    import flax

    from rcbevdet_tpu.utils.convert_torch import convert_torch_state_dict

    sd = convert_torch_state_dict(tm.state_dict())
    flat = flax.traverse_util.flatten_dict(variables["params"])
    stats = flax.traverse_util.flatten_dict(variables["batch_stats"])
    bn_leaf = {"weight": "scale", "bias": "bias",
               "running_mean": "mean", "running_var": "var"}
    n_assigned = 0
    for key, w in sd.items():
        m = re.match(r"^stem\.stem_(\d)/(conv|norm)\.(\w+)$", key)
        if m:
            k, kind, leaf = int(m.group(1)), m.group(2), m.group(3)
            path = (f"stem{k - 1}",)
        else:
            m = re.match(
                r"^stage(\d)\.OSA\d_(\d+)\.(?:layers\.(\d+)\.OSA\S+?|"
                r"(concat)\.OSA\S+?|(ese))[./]"
                r"(conv|norm|fc)\.(\w+)$", key)
            if not m:
                raise AssertionError(f"unmapped vovnet key: {key}")
            stage, block = int(m.group(1)), int(m.group(2))
            layer_i, is_concat, is_ese = m.group(3), m.group(4), m.group(5)
            kind, leaf = m.group(6), m.group(7)
            base = (f"stage{stage}_block{block - 1}",)
            if layer_i is not None:
                path = base + (f"layer{layer_i}",)
            elif is_concat:
                path = base + ("concat",)
            else:
                path = base + ("ese",)
        if kind == "conv":
            assert leaf == "weight"
            flat[path + ("conv", "kernel")] = jnp.asarray(w)
        elif kind == "fc":
            flat[path + ("fc", {"weight": "kernel", "bias": "bias"}[leaf])] \
                = jnp.asarray(w)
        else:  # norm (BN)
            if leaf == "num_batches_tracked":
                continue
            tgt = path + ("bn", bn_leaf[leaf])
            if bn_leaf[leaf] in ("mean", "var"):
                stats[tgt] = jnp.asarray(w)
            else:
                flat[tgt] = jnp.asarray(w)
        n_assigned += 1
    assert n_assigned > 100
    return {
        "params": flax.traverse_util.unflatten_dict(flat),
        "batch_stats": flax.traverse_util.unflatten_dict(stats),
    }


def test_vovnet_v99_forward_parity():
    rng = np.random.default_rng(3)
    mod = refshim.load_vovnet()
    tm = mod.VoVNet(
        norm="BN", name="V-99-eSE", input_ch=3,
        out_features=["stage4", "stage5"],
    ).eval()
    _randomize_params(tm, rng)
    _randomize_bn_stats(tm, rng)

    x = rng.standard_normal((1, 3, 64, 96)).astype(np.float32)
    with torch.no_grad():
        t_outs = tm(torch.tensor(x))

    from rcbevdet_tpu.models.vovnet import VoVNetV2

    jm = VoVNetV2(spec="V-99", out_indices=(2, 3))
    jx = jnp.asarray(np.moveaxis(x, 1, -1))
    variables = jm.init(jax.random.PRNGKey(0), jx)
    variables = _convert_vovnet(tm, variables)
    j_outs = jm.apply(variables, jx)
    assert len(j_outs) == 2
    for j, name in zip(j_outs, ("stage4", "stage5")):
        np.testing.assert_allclose(
            np.moveaxis(np.asarray(j), -1, 1), t_outs[name].numpy(),
            err_msg=name, **TOL)


def test_stage_pool_matches_torch_ceil_mode():
    """The stage max-pool must reproduce MaxPool2d(3, 2, ceil_mode=True)
    on odd AND even extents (window start alignment + clipped last
    window)."""
    rng = np.random.default_rng(1)
    for h, w in ((7, 10), (8, 9), (6, 6)):
        x = rng.standard_normal((1, 4, h, w)).astype(np.float32)
        t = torch.nn.functional.max_pool2d(
            torch.tensor(x), 3, stride=2, ceil_mode=True).numpy()
        oh = -(-(h - 1) // 2)
        ow = -(-(w - 1) // 2)
        pad_h = max(0, 2 * (oh - 1) + 3 - h)
        pad_w = max(0, 2 * (ow - 1) + 3 - w)
        from flax import linen as nn

        j = nn.max_pool(
            jnp.pad(
                jnp.asarray(np.moveaxis(x, 1, -1)),
                ((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
                constant_values=-jnp.inf,
            ),
            (3, 3), strides=(2, 2),
        )
        np.testing.assert_allclose(np.moveaxis(np.asarray(j), -1, 1), t)
