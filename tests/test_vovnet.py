"""VoVNetV2 backbone shapes."""

import jax
import jax.numpy as jnp
import numpy as np

from rcbevdet_tpu.models.vovnet import VoVNetV2


def test_vovnet_stage_shapes(rng):
    model = VoVNetV2(spec="V-39", out_indices=(0, 2, 3))
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    outs = model.apply(variables, x)
    assert len(outs) == 3
    assert outs[0].shape == (1, 16, 16, 256)   # stride 4
    assert outs[1].shape == (1, 4, 4, 768)     # stride 16
    assert outs[2].shape == (1, 2, 2, 1024)    # stride 32
    for o in outs:
        assert np.isfinite(np.asarray(o)).all()


def test_vovnet_v99_block_counts():
    model = VoVNetV2(spec="V-99")
    x = jnp.ones((1, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    names = set(variables["params"].keys())
    assert "stage4_block8" in names  # 9 blocks in stage 4
    assert "stage5_block2" in names
    assert "stage3_block2" in names
