"""Multi-chip (8 virtual CPU devices) data-parallel train-step test.

The TPU-native replacement for the reference's DDP training path
(apis/train.py:227-231): a 1-D GSPMD 'data' mesh, batch sharded over it,
params replicated; XLA inserts the gradient all-reduce.  This test runs ONE
real optimizer step of the full RCBEVDet train program (camera + radar +
CAMF + head + AdamW backward) across the mesh and checks that:

- the batch really is distributed (one shard per device),
- the loss is finite,
- trainable (fusion) parameters moved while frozen camera params did not,
- the updated state stays replicated.

First run compiles in ~2-3 min on this 1-core host; the persistent compile
cache (.jax_cache, enabled in conftest) makes reruns take seconds.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rcbevdet_tpu.models import RCBEVDet, RCBEVDetConfig
from rcbevdet_tpu.parallel.mesh import (
    create_mesh, replicate, shard_batch, shard_host_local_batch,
)
from rcbevdet_tpu.training.train_step import (
    create_train_state, make_optimizer, make_train_step,
)


def _tiny_cfg():
    return RCBEVDetConfig(
        input_size=(32, 96), resnet_depth=18, img_neck_channels=32,
        num_trans_channels=8, num_adj=0,
        grid_config={"x": (-4.0, 4.0, 1.0), "y": (-4.0, 4.0, 1.0),
                     "z": (-5.0, 3.0, 8.0), "depth": (1.0, 5.0, 0.5)},
        aspp_mid_channels=8, radar_feat_channels=(8, 8),
        radar_voxel_size=(0.5, 0.5, 8.0),
        point_cloud_range=(-4.0, -4.0, -5.0, 4.0, 4.0, 3.0),
        radar_max_pillars=32, radar_max_points_per_pillar=4,
        radar_canvas=(32, 32), radar_second_channels=(8, 8, 8),
        radar_second_layers=(1, 1, 1), radar_fpn_channels=(8, 8, 8),
        rcs_r_max=2, imc=32, bev_size=8, freeze_img=True,
    )


def _batch(cfg, b, rng):
    from __graft_entry__ import _example_batch

    batch = _example_batch(cfg, b=b, n=1, nmax_radar=32, rng=rng)
    batch["heatmap_t"] = jnp.zeros((b, 10, 8, 8)).at[:, 0, 4, 4].set(1.0)
    batch["anno_box_t"] = jnp.zeros((b, 100, 10))
    batch["inds_t"] = jnp.zeros((b, 100), jnp.int32)
    batch["mask_t"] = jnp.zeros((b, 100)).at[:, 0].set(1.0)
    batch["gt_depth"] = (
        jnp.zeros((b, 1, 32, 96)).at[:, :, ::7, ::11].set(3.0)
    )
    return batch


def test_train_step_on_8_device_mesh(rng):
    n = 8
    assert jax.device_count() >= n, "conftest must provide 8 CPU devices"
    cfg = _tiny_cfg()
    model = RCBEVDet(cfg)
    batch = _batch(cfg, b=n, rng=rng)

    mesh = create_mesh(jax.devices()[:n])
    variables = model.init(
        jax.random.PRNGKey(0),
        jax.tree_util.tree_map(lambda x: x[:1], batch),
        train=False,
    )
    tx = make_optimizer(
        total_steps=10, freeze_img=True, params=variables["params"]
    )
    state = replicate(mesh, create_train_state(model, variables, tx))
    sharded = shard_batch(mesh, batch)

    # the batch is really split: each device holds 1 of the 8 samples
    imgs = sharded["imgs"]
    assert len(imgs.sharding.device_set) == n
    shard_shapes = {s.data.shape for s in imgs.addressable_shards}
    assert shard_shapes == {(1,) + imgs.shape[1:]}

    step = jax.jit(make_train_step(model, tx, cfg))
    new_state, metrics = step(state, sharded)

    loss = float(jax.device_get(metrics["loss"]))
    assert np.isfinite(loss), loss

    # frozen camera subtree untouched; fusion subtree updated
    cam_old = variables["params"]["camera"]
    cam_new = jax.device_get(new_state.params["camera"])
    for old, new in zip(
        jax.tree_util.tree_leaves(cam_old), jax.tree_util.tree_leaves(cam_new)
    ):
        np.testing.assert_array_equal(np.asarray(old), np.asarray(new))
    camf_old = jax.tree_util.tree_leaves(variables["params"]["camf"])
    camf_new = jax.tree_util.tree_leaves(
        jax.device_get(new_state.params["camf"])
    )
    moved = sum(
        float(np.abs(np.asarray(a) - np.asarray(b)).sum())
        for a, b in zip(camf_old, camf_new)
    )
    assert moved > 0.0

    # params stay replicated across the mesh after the step
    kern = new_state.params["camf"]["fuser"]["fuse_conv"]["kernel"]
    assert kern.sharding.is_fully_replicated

    # grad_norm reported over the trainable subtree only
    assert float(jax.device_get(metrics["grad_norm"])) > 0.0


def test_host_local_batch_matches_global(rng):
    """shard_host_local_batch == shard_batch in the single-process case."""
    mesh = create_mesh(jax.devices()[:8])
    batch = {"x": rng.standard_normal((8, 4)).astype(np.float32)}
    a = shard_batch(mesh, {k: jnp.asarray(v) for k, v in batch.items()})
    b = shard_host_local_batch(mesh, batch)
    np.testing.assert_allclose(
        np.asarray(jax.device_get(a["x"])), np.asarray(jax.device_get(b["x"]))
    )
    assert b["x"].shape == (8, 4)
    assert len(b["x"].sharding.device_set) == 8


def test_batchnorm_global_batch_stats_under_gspmd(rng):
    """BatchNorm under pjit computes GLOBAL-batch statistics even when the
    batch is sharded 8 ways — the SyncBN equivalent (reference
    core/hook/syncbncontrol.py:10-32 converts BN to SyncBN so stats span
    the global batch; GSPMD gives those semantics by construction, XLA
    inserts the cross-device reduction)."""
    import flax.linen as fnn

    from rcbevdet_tpu.models.layers import BatchNorm

    class M(fnn.Module):
        @fnn.compact
        def __call__(self, x, train):
            return BatchNorm(momentum=0.1, name="bn")(
                x, use_running_average=not train, update_stats=True
            )

    m = M()
    x = rng.standard_normal((8, 4, 3)).astype(np.float32)
    # make per-device slices statistically distinct so local-BN would differ
    x[0::2] += 5.0
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x[:1]), True)

    # single-device oracle: full batch on one device
    ref_out, ref_updates = m.apply(
        variables, jnp.asarray(x), True, mutable=["batch_stats"]
    )

    mesh = create_mesh(jax.devices()[:8])
    from jax.sharding import NamedSharding, PartitionSpec as P

    xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("data")))
    vs = replicate(mesh, variables)
    out, updates = jax.jit(
        lambda v, x: m.apply(v, x, True, mutable=["batch_stats"])
    )(vs, xs)

    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref_out), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(updates["batch_stats"]["bn"]["mean"]),
        np.asarray(ref_updates["batch_stats"]["bn"]["mean"]),
        rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(updates["batch_stats"]["bn"]["var"]),
        np.asarray(ref_updates["batch_stats"]["bn"]["var"]),
        rtol=1e-5, atol=1e-5)
    # sanity: the stats really reflect the global batch, not device 0's slice
    local_mean = x[:1].reshape(-1, 3).mean(0)
    global_mean = x.reshape(-1, 3).mean(0)
    got = np.asarray(updates["batch_stats"]["bn"]["mean"])
    assert np.abs(got - 0.1 * global_mean).max() < 1e-4
    assert np.abs(got - 0.1 * local_mean).max() > 0.1
