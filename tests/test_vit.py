"""ViTDet (EVA-02-style) backbone tests.

The reference ViT forward is CUDA/flash-attn-only (vit.py:118-124 asserts
q.is_cuda), so a golden torch parity run is not possible on this host;
these tests pin the architecture's own invariants instead: rotary
embedding is a pure rotation, window partition round-trips, block/trunk
shapes, and the SimpleFeaturePyramid level geometry.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rcbevdet_tpu.models.vit import (
    SimpleFeaturePyramid,
    ViT,
    ViTBlock,
    apply_rope,
    rope_freqs,
    window_partition,
    window_unpartition,
)


def test_rope_is_a_rotation(rng):
    """Axial RoPE must preserve per-token norms and relative-position
    structure: <rope(q)_i, rope(k)_j> depends only on (i - j)."""
    dim = 8  # half head dim
    cos, sin = rope_freqs(dim, pt_seq_len=4, ft_seq_len=4)
    t = jnp.asarray(rng.standard_normal((2, 16, 2 * dim)), jnp.float32)
    r = apply_rope(t, cos, sin)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(r), axis=-1),
        np.linalg.norm(np.asarray(t), axis=-1),
        rtol=1e-5,
    )
    # relative-position property along one axis: tokens in the same row
    q = jnp.ones((1, 16, 2 * dim))
    k = jnp.ones((1, 16, 2 * dim))
    rq, rk = apply_rope(q, cos, sin), apply_rope(k, cos, sin)
    dots = np.asarray(jnp.einsum("bnd,bmd->bnm", rq, rk))[0]
    # (row 0, col 0) vs (row 0, col 1)  ==  (row 0, col 1) vs (row 0, col 2)
    assert dots[0, 1] == pytest.approx(dots[1, 2], rel=1e-5)
    assert dots[0, 2] == pytest.approx(dots[1, 3], rel=1e-5)


def test_window_partition_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 10, 14, 6)), jnp.float32)
    wins, pad_hw = window_partition(x, 4)
    assert wins.shape == (2 * 3 * 4, 4, 4, 6)
    back = window_unpartition(wins, 4, pad_hw, (10, 14))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), rtol=1e-6)


def test_vit_block_shapes(rng):
    block = ViTBlock(
        dim=32, num_heads=4, mlp_ratio=4 * 2 / 3, window_size=4,
        pt_hw_seq_len=4, use_residual_block=True,
    )
    x = jnp.asarray(rng.standard_normal((1, 6, 10, 32)), jnp.float32)
    variables = block.init(jax.random.PRNGKey(0), x)
    y = block.apply(variables, x)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()
    # zero-init of the residual bottleneck's final LN scale: at init the
    # conv branch contributes nothing
    p = variables["params"]
    assert float(jnp.abs(p["residual"]["norm3"]["scale"]).max()) == 0.0


def test_vit_trunk_and_pyramid(rng):
    net = ViT(
        patch_size=16, embed_dim=32, depth=2, num_heads=4,
        window_size=2, global_window_size=4, window_block_indexes=(0,),
        residual_block_indexes=(1,), pt_hw_seq_len=4,
        pretrain_img_size=64,
    )
    fpn = SimpleFeaturePyramid(
        net=net, out_channels=16, scale_factors=(4.0, 2.0, 1.0, 0.5),
        out_layers=["p2", "p4"],
    )
    x = jnp.asarray(rng.standard_normal((1, 64, 96, 3)), jnp.float32)
    variables = fpn.init(jax.random.PRNGKey(0), x)
    outs = fpn.apply(variables, x)
    # p2 = stride 4, p4 = stride 16
    assert outs[0].shape == (1, 16, 24, 16)
    assert outs[1].shape == (1, 4, 6, 16)
    for o in outs:
        assert np.isfinite(np.asarray(o)).all()


def test_vit_abs_pos_interpolation(rng):
    """pos_embed stored at the pretrain grid (+cls token) interpolates to
    the fine-tune grid; forward works at a non-square resolution."""
    net = ViT(
        patch_size=16, embed_dim=32, depth=1, num_heads=4,
        window_size=2, global_window_size=2, window_block_indexes=(0,),
        pt_hw_seq_len=2, pretrain_img_size=32,
    )
    x = jnp.asarray(rng.standard_normal((1, 32, 64, 3)), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x)
    pos = variables["params"]["pos_embed"]
    assert pos.shape == (1, 2 * 2 + 1, 32)  # pretrain grid + cls token
    y = net.apply(variables, x)
    assert y.shape == (1, 2, 4, 32)
