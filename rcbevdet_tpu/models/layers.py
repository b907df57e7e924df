"""Shared flax building blocks with torch-matching semantics.

All convolutions use NHWC layout and explicit symmetric padding so the
arithmetic matches torch's ``padding=N`` exactly (XLA's ``SAME`` pads
asymmetrically for stride 2 and would silently diverge from reference
checkpoints).  BatchNorm uses the torch momentum convention: ``running =
(1 - momentum) * running + momentum * batch``.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import contextlib

import jax
import jax.numpy as jnp
from flax import linen as nn

# Frame-grouped batch statistics for the FROZEN camera branch's batched
# adjacent-frame pass.  The reference loops over temporal frames in Python,
# so its frozen-BN normalization uses PER-FRAME batch stats
# (bevdet_rc.py:753-775 + track_running_stats=False at :570-580); this repo
# batches all adjacent frames into one pass for the MXU, which would
# otherwise pool the stats across frames.  The context below tells every
# BatchNorm inside to compute stats per frame group.  Trace-time Python
# state: set via the ``bn_frame_groups`` context manager around the
# adjacent camera call (detectors.extract_img_feat), read at trace time —
# safe under jit because tracing is sequential.
# Value: None, or (outer_batch, n_groups) — the flattened leading axis of
# every tensor inside is (outer_batch, n_groups, ...).
_BN_FRAME_GROUPS = None


@contextlib.contextmanager
def bn_frame_groups(outer_batch, n_groups):
    global _BN_FRAME_GROUPS
    prev = _BN_FRAME_GROUPS
    _BN_FRAME_GROUPS = (outer_batch, n_groups) if n_groups > 1 else None
    try:
        yield
    finally:
        _BN_FRAME_GROUPS = prev


class BatchNorm(nn.Module):
    """BatchNorm over the channel (last) axis with torch conventions.

    - ``momentum`` is the torch momentum (weight of the NEW batch stat).
    - ``update_stats=False`` with ``use_running_average=False`` reproduces
      the reference's frozen-camera-branch behavior (bevdet_rc.py:570-580):
      normalize with batch statistics, leave running stats untouched.
    - ``mask`` restricts batch statistics to valid positions, needed because
      our fixed-capacity padding would otherwise pollute stats with zeros the
      reference never sees (its pillar count is dynamic).
    - Under pjit/GSPMD with the batch sharded over a mesh, the reductions
      here are over the GLOBAL logical batch (XLA inserts the cross-device
      collectives) — i.e. SyncBN semantics from step 0, which is what the
      reference's SyncbnControlHook switches to (core/hook/syncbncontrol.py
      :10-32).  Verified by tests/test_multichip.py.
    """

    momentum: float = 0.1
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, use_running_average, update_stats=True, mask=None,
                 fold=False):
        c = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)

        if fold:
            # inference-folded affine: (scale', bias') such that
            # x * scale' + bias' == BN(x, use_running_average=True);
            # feeds the fused conv+BN Pallas path (ops/conv_pallas.py)
            inv = jax.lax.rsqrt(ra_var.value + self.epsilon) * scale
            return inv, bias - ra_mean.value * inv

        if not use_running_average and _BN_FRAME_GROUPS is not None:
            # frozen-camera adjacent pass: PER-FRAME batch stats (see the
            # module docstring above bn_frame_groups).  Stats-only path —
            # running averages are untouched by contract.
            assert not update_stats, "grouped BN stats are freeze-only"
            assert mask is None
            bo, g = _BN_FRAME_GROUPS
            b0 = x.shape[0]
            assert b0 % (bo * g) == 0, (b0, bo, g)
            xg = x.astype(jnp.float32).reshape(
                (bo, g, b0 // (bo * g)) + x.shape[1:]
            )
            axes = tuple(a for a in range(xg.ndim - 1) if a != 1)
            gmean = jnp.mean(xg, axis=axes, keepdims=True)
            # two-pass variance (matches torch's accumulation; the one-pass
            # E[x^2]-mean^2 form loses ~3 digits to cancellation and the
            # error COMPOUNDS through stacked train-mode BNs)
            gvar = jnp.mean(jnp.square(xg - gmean), axis=axes,
                            keepdims=True)
            inv = jax.lax.rsqrt(gvar + self.epsilon) * scale
            out = (xg - gmean) * inv + bias
            return out.reshape(x.shape).astype(x.dtype)

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            x32 = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            if mask is None:
                mean = jnp.mean(x32, axis=axes)
                # two-pass variance: matches torch's accumulation; the
                # one-pass E[x^2]-mean^2 form loses ~3 digits to
                # cancellation, and the error compounds through stacked
                # train-mode BNs (assembled train parity caught it)
                var = jnp.mean(jnp.square(x32 - mean), axis=axes)
                count = 1.0
                for a in axes:
                    count = count * x.shape[a]
            else:
                m = jnp.broadcast_to(
                    mask.astype(jnp.float32)[..., None], x.shape
                )
                count = jnp.maximum(jnp.sum(m, axis=axes), 1.0)
                mean = jnp.sum(x32 * m, axis=axes) / count
                var = jnp.sum(jnp.square(x32 - mean) * m, axis=axes) / count
                count = count[0] if count.ndim else count
            if update_stats and not self.is_initializing():
                n = count
                unbiased = var * (n / jnp.maximum(n - 1.0, 1.0))
                ra_mean.value = (
                    (1 - self.momentum) * ra_mean.value + self.momentum * mean
                )
                ra_var.value = (
                    (1 - self.momentum) * ra_var.value + self.momentum * unbiased
                )

        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        out = (x.astype(jnp.float32) - mean) * inv + bias
        return out.astype(x.dtype)

class ConvKernel(nn.Module):
    """Bare conv-kernel parameter holder.

    Declares exactly the pytree of ``nn.Conv(use_bias=False, name=...)``
    (one ``kernel`` param, lecun-normal init) but RETURNS the kernel value
    so call sites can route the compute through the fused Pallas conv
    (ops/conv_pallas.py) at inference while keeping checkpoint paths and
    the torch name map unchanged."""

    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel", nn.initializers.lecun_normal(), self.shape
        )


class ConvKernelBias(nn.Module):
    """``nn.Conv(use_bias=True)`` pytree (kernel + bias), values returned."""

    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(), self.shape
        )
        b = self.param("bias", nn.initializers.zeros, (self.shape[-1],))
        return k, b


def conv_bn_relu_3x3(x, kernel, bn, train=False, update_stats=True,
                     fast=False):
    """3x3 same-conv + BN + ReLU over a declared ``ConvKernel`` value and
    ``BatchNorm`` module.

    ``fast=True`` (inference only) folds the running-stat BN affine into
    the conv epilogue and runs the fused Pallas kernel
    (ops/conv_pallas.py) — the in-graph XLA conv at BEV shapes pays a ~3x
    layout penalty (round-2 profile).  Training / CPU use the
    identical-math XLA path."""
    if fast and not train:
        from ..ops.conv_pallas import conv3x3_bn_act_auto

        cb = jnp.zeros((1, 1, 1, kernel.shape[-1]), x.dtype)
        scale, bias = bn(cb, True, fold=True)
        return conv3x3_bn_act_auto(x, kernel, scale, bias, act="relu")
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = bn(y, use_running_average=not train, update_stats=update_stats)
    return nn.relu(y)


class Conv(nn.Module):
    """NHWC conv with torch-style integer padding and OIHW-convertible names."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: int = 0
    dilation: int = 1
    use_bias: bool = True
    feature_group_count: int = 1

    @nn.compact
    def __call__(self, x):
        p = self.padding
        return nn.Conv(
            self.features,
            self.kernel_size,
            strides=self.strides,
            padding=((p, p), (p, p)),
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=self.use_bias,
            feature_group_count=self.feature_group_count,
            name="conv",
        )(x)


class ConvBNReLU(nn.Module):
    """Conv -> BN -> (ReLU) — the mmcv ConvModule default ordering."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    use_bias: bool = False
    relu: bool = True
    bn_momentum: float = 0.1
    bn_eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train=False, update_stats=True):
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=((self.padding, self.padding),) * 2,
            use_bias=self.use_bias,
            name="conv",
        )(x)
        x = BatchNorm(
            momentum=self.bn_momentum, epsilon=self.bn_eps, name="bn"
        )(x, use_running_average=not train, update_stats=update_stats)
        if self.relu:
            x = nn.relu(x)
        return x


class BasicBlock(nn.Module):
    """mmdet ResNet BasicBlock: 3x3-BN-ReLU-3x3-BN + residual, final ReLU.

    ``downsample_conv_only=True`` reproduces CustomResNet's raw-conv
    downsample (reference models/backbones/resnet.py:55-60: a bare nn.Conv2d,
    no BN).
    """

    features: int
    stride: int = 1
    downsample: bool = False
    downsample_conv_only: bool = False
    downsample_kernel: int = 3
    bn_momentum: float = 0.1
    bn_eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train=False, update_stats=True, fast=False):
        bn = lambda name: BatchNorm(
            momentum=self.bn_momentum, epsilon=self.bn_eps, name=name
        )
        # the fused Pallas path covers exactly the CustomResNet flavor of
        # this block (3x3 convs, bare-conv-3x3 shortcut) — the BEV-encoder
        # hot set; image-backbone variants keep the XLA path
        fast = (
            fast and not train and self.stride in (1, 2)
            and (not self.downsample
                 or (self.downsample_conv_only
                     and self.downsample_kernel == 3))
            and x.shape[1] % (2 * self.stride) == 0
            and x.shape[2] % (2 * self.stride) == 0
        )
        if fast:
            from ..ops.conv_pallas import conv3x3_bn_act_auto as conv3x3_bn_act

            f = self.features
            k1 = ConvKernel((3, 3, x.shape[-1], f), name="conv1")()
            s1, b1 = bn("bn1")(
                jnp.zeros((1, 1, 1, f), x.dtype), True, fold=True
            )
            k2 = ConvKernel((3, 3, f, f), name="conv2")()
            s2, b2 = bn("bn2")(
                jnp.zeros((1, 1, 1, f), x.dtype), True, fold=True
            )
            if self.downsample:
                kd, bd = ConvKernelBias(
                    (3, 3, x.shape[-1], f), name="downsample"
                )()
                identity = conv3x3_bn_act(
                    x, kd, jnp.ones((f,), jnp.float32), bd, act=None,
                    stride=self.stride,
                )
            else:
                identity = x
            out = conv3x3_bn_act(x, k1, s1, b1, act="relu",
                                 stride=self.stride)
            return conv3x3_bn_act(out, k2, s2, b2, act="relu",
                                  residual=identity)
        identity = x
        out = nn.Conv(
            self.features, (3, 3), strides=(self.stride, self.stride),
            padding=((1, 1), (1, 1)), use_bias=False, name="conv1",
        )(x)
        out = bn("bn1")(out, use_running_average=not train, update_stats=update_stats)
        out = nn.relu(out)
        out = nn.Conv(
            self.features, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
            name="conv2",
        )(out)
        out = bn("bn2")(out, use_running_average=not train, update_stats=update_stats)
        if self.downsample:
            if self.downsample_conv_only:
                k = self.downsample_kernel
                identity = nn.Conv(
                    self.features, (k, k), strides=(self.stride, self.stride),
                    padding=((k // 2, k // 2),) * 2, use_bias=True,
                    name="downsample",
                )(x)
            else:
                identity = nn.Conv(
                    self.features, (1, 1), strides=(self.stride, self.stride),
                    use_bias=False, name="downsample_conv",
                )(x)
                identity = bn("downsample_bn")(
                    identity, use_running_average=not train, update_stats=update_stats
                )
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    """torchvision/mmdet ResNet Bottleneck (pytorch style: stride on conv2)."""

    features: int  # bottleneck width; output is features * 4
    stride: int = 1
    downsample: bool = False
    bn_momentum: float = 0.1
    bn_eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train=False, update_stats=True):
        bn = lambda name: BatchNorm(
            momentum=self.bn_momentum, epsilon=self.bn_eps, name=name
        )
        identity = x
        out = nn.Conv(self.features, (1, 1), use_bias=False, name="conv1")(x)
        out = bn("bn1")(out, use_running_average=not train, update_stats=update_stats)
        out = nn.relu(out)
        out = nn.Conv(
            self.features, (3, 3), strides=(self.stride, self.stride),
            padding=((1, 1), (1, 1)), use_bias=False, name="conv2",
        )(out)
        out = bn("bn2")(out, use_running_average=not train, update_stats=update_stats)
        out = nn.relu(out)
        out = nn.Conv(self.features * 4, (1, 1), use_bias=False, name="conv3")(out)
        out = bn("bn3")(out, use_running_average=not train, update_stats=update_stats)
        if self.downsample:
            identity = nn.Conv(
                self.features * 4, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, name="downsample_conv",
            )(x)
            identity = bn("downsample_bn")(
                identity, use_running_average=not train, update_stats=update_stats
            )
        return nn.relu(out + identity)


class Mlp(nn.Module):
    """fc1 -> act -> fc2 (timm-style Mlp used by DepthNet and RadarBEVNet)."""

    hidden: int
    out: int
    act: Callable = nn.relu

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, name="fc1")(x)
        x = self.act(x)
        x = nn.Dense(self.out, name="fc2")(x)
        return x


class SELayer(nn.Module):
    """Squeeze-excite gate as in BEVDepth's DepthNet (view_transformer.py:459)."""

    channels: int

    @nn.compact
    def __call__(self, x, x_se):
        x_se = nn.Dense(self.channels, name="conv_reduce")(x_se)
        x_se = nn.relu(x_se)
        x_se = nn.Dense(self.channels, name="conv_expand")(x_se)
        return x * jax.nn.sigmoid(x_se)


class LayerNorm(nn.Module):
    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=self.epsilon, name="ln")(x)


class TorchMultiheadAttention(nn.Module):
    """torch.nn.MultiheadAttention-compatible attention (batch_first).

    Parameters mirror torch's packed in_proj so checkpoints convert 1:1.
    ``attn_bias`` is an additive [B * heads, Lq, Lk] (or [B, heads, Lq, Lk])
    mask — the DMSA distance bias path (radar_encoder.py:225-245).
    """

    embed_dim: int
    num_heads: int

    @nn.compact
    def __call__(self, q, k=None, v=None, attn_bias=None, key_padding_mask=None):
        if k is None:
            k = q
        if v is None:
            v = k
        d = self.embed_dim
        h = self.num_heads
        hd = d // h
        in_w = self.param(
            "in_proj_weight", nn.initializers.xavier_uniform(), (3 * d, d)
        )
        in_b = self.param("in_proj_bias", nn.initializers.zeros, (3 * d,))
        qp = q @ in_w[:d].T + in_b[:d]
        kp = k @ in_w[d : 2 * d].T + in_b[d : 2 * d]
        vp = v @ in_w[2 * d :].T + in_b[2 * d :]

        b, lq, _ = qp.shape
        lk = kp.shape[1]
        qp = qp.reshape(b, lq, h, hd).transpose(0, 2, 1, 3)
        kp = kp.reshape(b, lk, h, hd).transpose(0, 2, 1, 3)
        vp = vp.reshape(b, lk, h, hd).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", qp, kp) / jnp.sqrt(hd)
        if attn_bias is not None:
            if attn_bias.ndim == 3:
                attn_bias = attn_bias.reshape(b, h, lq, lk)
            logits = logits + attn_bias
        if key_padding_mask is not None:
            # True = padded (torch convention)
            logits = jnp.where(
                key_padding_mask[:, None, None, :], -jnp.inf, logits
            )
        attn = jax.nn.softmax(logits, axis=-1)
        attn = jnp.nan_to_num(attn)  # fully-masked rows -> 0
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, vp)
        out = out.transpose(0, 2, 1, 3).reshape(b, lq, d)
        return nn.Dense(d, name="out_proj")(out)
