"""Numerics parity of flax building blocks against torch equivalents,
exercised THROUGH the checkpoint converter — this is the machinery that will
load the reference's released checkpoints (SURVEY.md §7 step 1)."""

import flax
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn

from rcbevdet_tpu.models.layers import (
    BatchNorm,
    ConvBNReLU,
    BasicBlock,
    Bottleneck,
    TorchMultiheadAttention,
)
from rcbevdet_tpu.utils.convert_torch import (
    assign_into_variables,
    convert_torch_state_dict,
)


def _nhwc(x):
    return jnp.asarray(x.detach().numpy().transpose(0, 2, 3, 1))


def _nchw_out(y):
    return np.asarray(y).transpose(0, 3, 1, 2)


def test_conv_bn_relu_eval_parity(rng):
    tmod = nn.Sequential(
        nn.Conv2d(4, 8, 3, stride=2, padding=1, bias=False), nn.BatchNorm2d(8),
        nn.ReLU(),
    )
    tmod.eval()
    with torch.no_grad():
        tmod[1].running_mean.normal_()
        tmod[1].running_var.uniform_(0.5, 2.0)
        tmod[1].weight.normal_()
        tmod[1].bias.normal_()
    x = torch.randn(2, 4, 10, 10)
    ref = tmod(x).detach().numpy()

    jmod = ConvBNReLU(features=8, kernel_size=3, stride=2, padding=1)
    variables = jmod.init(jax.random.PRNGKey(0), _nhwc(x))
    sd = convert_torch_state_dict(tmod.state_dict())
    variables = assign_into_variables(
        variables,
        [
            (("params", "conv", "kernel"), sd["0.weight"]),
            (("params", "bn", "scale"), sd["1.weight"]),
            (("params", "bn", "bias"), sd["1.bias"]),
            (("batch_stats", "bn", "mean"), sd["1.running_mean"]),
            (("batch_stats", "bn", "var"), sd["1.running_var"]),
        ],
    )
    out = jmod.apply(variables, _nhwc(x), train=False)
    np.testing.assert_allclose(_nchw_out(out), ref, rtol=1e-4, atol=1e-5)


def test_batchnorm_train_mode_and_stats_update(rng):
    tbn = nn.BatchNorm2d(6, momentum=0.1)
    tbn.train()
    x = torch.randn(4, 6, 5, 5)
    ref = tbn(x).detach().numpy()

    jbn = BatchNorm(momentum=0.1)
    variables = jbn.init(
        jax.random.PRNGKey(0), _nhwc(x), use_running_average=False
    )
    out, updates = jbn.apply(
        variables, _nhwc(x), use_running_average=False,
        mutable=["batch_stats"],
    )
    np.testing.assert_allclose(_nchw_out(out), ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(updates["batch_stats"]["mean"]),
        tbn.running_mean.detach().numpy(), rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(updates["batch_stats"]["var"]),
        tbn.running_var.detach().numpy(), rtol=1e-4, atol=1e-5,
    )


class TorchBasicBlock(nn.Module):
    """mmdet-style BasicBlock for the parity oracle."""

    def __init__(self, cin, cout, stride=1, conv_downsample=False):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.downsample = (
            nn.Conv2d(cin, cout, 3, stride, 1) if conv_downsample else None
        )

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = torch.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return torch.relu(y + idt)


def test_basicblock_conv_downsample_parity(rng):
    tmod = TorchBasicBlock(4, 8, stride=2, conv_downsample=True)
    tmod.eval()
    with torch.no_grad():
        for m in tmod.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_()
                m.running_var.uniform_(0.5, 2.0)
    x = torch.randn(1, 4, 8, 8)
    ref = tmod(x).detach().numpy()

    jmod = BasicBlock(
        features=8, stride=2, downsample=True, downsample_conv_only=True
    )
    variables = jmod.init(jax.random.PRNGKey(0), _nhwc(x))
    sd = convert_torch_state_dict(tmod.state_dict())
    a = [
        (("params", "conv1", "kernel"), sd["conv1.weight"]),
        (("params", "conv2", "kernel"), sd["conv2.weight"]),
        (("params", "downsample", "kernel"), sd["downsample.weight"]),
        (("params", "downsample", "bias"), sd["downsample.bias"]),
    ]
    for i in (1, 2):
        a += [
            (("params", f"bn{i}", "scale"), sd[f"bn{i}.weight"]),
            (("params", f"bn{i}", "bias"), sd[f"bn{i}.bias"]),
            (("batch_stats", f"bn{i}", "mean"), sd[f"bn{i}.running_mean"]),
            (("batch_stats", f"bn{i}", "var"), sd[f"bn{i}.running_var"]),
        ]
    variables = assign_into_variables(variables, a)
    out = jmod.apply(variables, _nhwc(x), train=False)
    np.testing.assert_allclose(_nchw_out(out), ref, rtol=1e-4, atol=1e-5)


def test_multihead_attention_parity(rng):
    d, h = 16, 4
    tattn = nn.MultiheadAttention(d, h, batch_first=True)
    tattn.eval()
    q = torch.randn(2, 6, d)
    bias = torch.randn(2 * h, 6, 6)
    ref, _ = tattn(q, q, q, attn_mask=bias)
    ref = ref.detach().numpy()

    jattn = TorchMultiheadAttention(d, h)
    variables = jattn.init(jax.random.PRNGKey(0), jnp.asarray(q.numpy()))
    sd = convert_torch_state_dict(tattn.state_dict())
    variables = assign_into_variables(
        variables,
        [
            # packed in_proj stays [3d, d] in our module (no transpose)
            (("params", "in_proj_weight"), np.asarray(
                tattn.in_proj_weight.detach().numpy()
            )),
            (("params", "in_proj_bias"), sd["in_proj_bias"]),
            (("params", "out_proj", "kernel"), sd["out_proj.weight"]),
            (("params", "out_proj", "bias"), sd["out_proj.bias"]),
        ],
    )
    out = jattn.apply(
        variables, jnp.asarray(q.numpy()), attn_bias=jnp.asarray(bias.numpy())
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_deconv_parity(rng):
    """SECONDFPN's 2x2-stride-2 deconv vs torch ConvTranspose2d."""
    from flax import linen as fnn

    tmod = nn.ConvTranspose2d(6, 4, 2, stride=2, bias=False)
    x = torch.randn(1, 6, 5, 5)
    ref = tmod(x).detach().numpy()

    jmod = fnn.ConvTranspose(4, (2, 2), strides=(2, 2), use_bias=False,
                             transpose_kernel=True)
    variables = jmod.init(jax.random.PRNGKey(0), _nhwc(x))
    # torch deconv weight is [in, out, kh, kw] -> flax transpose_kernel wants
    # [kh, kw, out, in]
    w = tmod.weight.detach().numpy().transpose(2, 3, 1, 0)
    variables = flax.core.freeze(
        {"params": {"kernel": jnp.asarray(w)}}
    ).unfreeze()
    out = jmod.apply(variables, _nhwc(x))
    np.testing.assert_allclose(_nchw_out(out), ref, rtol=1e-4, atol=1e-5)
