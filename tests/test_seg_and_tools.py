"""BEV seg head, profiling utilities, log analysis."""

import jax
import jax.numpy as jnp
import numpy as np

from rcbevdet_tpu.models.seg_head import BEVSegHead, seg_iou, seg_loss
from rcbevdet_tpu.utils.profiling import flops_of, timeit


def test_seg_head_forward_and_loss(rng):
    head = BEVSegHead(classes=("vehicle", "drivable"), conv_channels=(16, 16))
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 8)), jnp.float32)
    variables = head.init(jax.random.PRNGKey(0), x)
    logits = head.apply(variables, x)
    assert logits.shape == (2, 16, 16, 2)
    masks = jnp.asarray(rng.random((2, 16, 16, 2)) > 0.5, jnp.float32)
    for lt in ("focal", "bce"):
        l = seg_loss(logits, masks, loss_type=lt)
        assert np.isfinite(float(l))
    iou = seg_iou(logits, masks)
    assert iou.shape == (2,)
    assert (np.asarray(iou) >= 0).all() and (np.asarray(iou) <= 1).all()


def test_seg_iou_perfect():
    masks = jnp.zeros((1, 8, 8, 1)).at[0, 2:5, 2:5, 0].set(1.0)
    logits = (masks - 0.5) * 100
    np.testing.assert_allclose(np.asarray(seg_iou(logits, masks)), 1.0)


def test_flops_of_matmul():
    a = jnp.ones((64, 64))
    cost = flops_of(lambda x: x @ x, a)
    # 64^3 MACs ~ 2*64^3 flops (XLA counts fused variants; just sanity-check
    # the right order of magnitude)
    assert cost["flops"] > 64**3


def test_timeit_runs():
    f = jax.jit(lambda x: x * 2)
    t = timeit(f, jnp.ones(8), iters=3, warmup=1)
    assert t >= 0


def test_analyze_logs(tmp_path):
    from rcbevdet_tpu.tools.analyze_logs import parse_log

    log = tmp_path / "t.log"
    log.write_text(
        '2026-01-01 epoch 0 iter 50/100 0.50s/it {"loss": 10.0}\n'
        '2026-01-01 epoch 0 iter 100/100 0.40s/it {"loss": 8.0}\n'
        "noise line\n"
    )
    recs = parse_log(str(log))
    assert len(recs) == 2
    assert recs[0]["loss"] == 10.0
    assert recs[1]["sec_per_iter"] == 0.40
