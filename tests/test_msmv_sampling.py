"""msmv_sampling parity against the reference's own PyTorch oracle.

The reference ships a grid_sample-based fallback of its msmv_sampling CUDA
op (mmdet3d/ops/csrc/wrapper.py:14-38); it is the correctness oracle the
reference itself uses to validate the kernel, so matching it (values and
gradients) establishes parity with the CUDA path too.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rcbevdet_tpu.ops.msmv_sampling import msmv_sampling

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _torch_oracle(mlvl_feats, sampling_locations, scale_weights):
    """Transcription of wrapper.py:14-38 (msmv_sampling_pytorch)."""
    B, C = mlvl_feats[0].shape[:2]
    _, Q, P, _ = sampling_locations.shape
    loc = sampling_locations * 2 - 1
    loc = loc[:, :, :, None, :]  # [B, Q, P, 1, 3]
    final = torch.zeros([B, C, Q, P], dtype=mlvl_feats[0].dtype)
    for lvl, feat in enumerate(mlvl_feats):
        out = F.grid_sample(
            feat, loc, mode="bilinear", padding_mode="zeros",
            align_corners=True,
        )[..., 0]
        final = final + out * scale_weights[..., lvl].reshape(B, 1, Q, P)
    return final.permute(0, 2, 1, 3)  # [B, Q, C, P]


def _random_case(seed, b=2, n=6, c=8, q=16, p=4, levels=(16, 8, 4, 2)):
    rng = np.random.default_rng(seed)
    feats = [
        rng.standard_normal((b, n, h, 2 * h, c)).astype(np.float32)
        for h in levels
    ]
    # locations mostly inside [0,1], some outside to exercise zeros padding
    loc = rng.uniform(-0.1, 1.1, (b, q, p, 3)).astype(np.float32)
    # view coordinate: exact view indices for half the points (the sparse
    # decoder samples per-camera), fractional for the rest
    views = rng.integers(0, n, (b, q, p)).astype(np.float32) / (n - 1)
    mix = rng.random((b, q, p)) < 0.5
    loc[..., 2] = np.where(mix, views, np.clip(loc[..., 2], 0, 1))
    w = rng.random((b, q, p, len(levels))).astype(np.float32)
    return feats, loc, w


@pytest.mark.parametrize("seed", [0, 1])
def test_forward_matches_reference_oracle(seed):
    feats, loc, w = _random_case(seed)
    ours = msmv_sampling(
        [jnp.asarray(f) for f in feats], jnp.asarray(loc), jnp.asarray(w)
    )  # [B, Q, P, C]
    tfeats = [
        torch.from_numpy(np.moveaxis(f, -1, 1)) for f in feats
    ]  # [B, C, N, H, W]
    ref = _torch_oracle(
        tfeats, torch.from_numpy(loc), torch.from_numpy(w)
    )  # [B, Q, C, P]
    ref = ref.permute(0, 1, 3, 2).numpy()  # [B, Q, P, C]
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5, atol=1e-5)


def test_gradients_match_reference_oracle():
    feats, loc, w = _random_case(3, b=1, n=3, c=4, q=5, p=3, levels=(8, 4))

    def loss_jax(feats, loc, w):
        out = msmv_sampling(feats, loc, w)
        return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape)))

    g_feats, g_loc, g_w = jax.grad(loss_jax, argnums=(0, 1, 2))(
        [jnp.asarray(f) for f in feats], jnp.asarray(loc), jnp.asarray(w)
    )

    tfeats = [
        torch.from_numpy(np.moveaxis(f, -1, 1)).requires_grad_(True)
        for f in feats
    ]
    tloc = torch.from_numpy(loc).requires_grad_(True)
    tw = torch.from_numpy(w).requires_grad_(True)
    out = _torch_oracle(tfeats, tloc, tw).permute(0, 1, 3, 2)
    cos = torch.cos(
        torch.arange(out.numel(), dtype=torch.float32).reshape(out.shape)
    )
    torch.sum(out * cos).backward()

    for gj, tf in zip(g_feats, tfeats):
        ref = np.moveaxis(tf.grad.numpy(), 1, -1)
        np.testing.assert_allclose(np.asarray(gj), ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(g_loc), tloc.grad.numpy(), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(g_w), tw.grad.numpy(), rtol=1e-4, atol=1e-4
    )
