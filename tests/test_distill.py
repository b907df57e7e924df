"""Distillation losses: parity against transcriptions of the reference
torch code (models/losses/pkd_loss.py, unidistill_loss.py).

The reference's UniDistill static methods reference helpers that its own
file never imports (calculate_box_mask_gaussian, reduce_mean, _sigmoid —
unidistill_loss.py:102,190,223 would NameError), i.e. they are inherited
UniDistill-repo code; the transcriptions here pin the published semantics.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rcbevdet_tpu.training.distill import (
    PKDFeatureLoss,
    box_mask_gaussian,
    response_distill_loss,
    unidistill_bev_affinity_loss,
    unidistill_feature_loss,
    unidistill_response_kl,
)

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def test_pkd_loss_matches_torch_replica():
    """PKD: channel standardization -> student 1x1-conv MLP -> MSE/2
    (pkd_loss.py:37-93)."""
    rng = np.random.default_rng(0)
    n, h, w, c = 2, 6, 5, 8
    fs = rng.standard_normal((n, h, w, c)).astype(np.float32)
    ft = rng.standard_normal((n, h, w, c)).astype(np.float32)

    loss_mod = PKDFeatureLoss(channels=c, loss_weight=1.3)
    variables = loss_mod.init(
        jax.random.PRNGKey(0), jnp.asarray(fs), jnp.asarray(ft)
    )
    ours = float(loss_mod.apply(variables, jnp.asarray(fs), jnp.asarray(ft)))

    # torch replica of pkd_loss.py with the SAME mlp weights
    def norm(feat):
        n_, c_, h_, w_ = feat.shape
        x = feat.permute(1, 0, 2, 3).reshape(c_, -1)
        mean = x.mean(dim=-1, keepdim=True)
        std = x.std(dim=-1, keepdim=True)
        x = (x - mean) / (std + 1e-6)
        return x.reshape(c_, n_, h_, w_).permute(1, 0, 2, 3)

    k0 = np.asarray(variables["params"]["mlp0"]["kernel"])  # [1,1,C,C] HWIO
    b0 = np.asarray(variables["params"]["mlp0"]["bias"])
    k1 = np.asarray(variables["params"]["mlp1"]["kernel"])
    b1 = np.asarray(variables["params"]["mlp1"]["bias"])
    mlp = torch.nn.Sequential(
        torch.nn.Conv2d(c, c, 1), torch.nn.ReLU(), torch.nn.Conv2d(c, c, 1)
    )
    with torch.no_grad():
        mlp[0].weight.copy_(
            torch.from_numpy(k0[0, 0].T[:, :, None, None])
        )  # HWIO -> OI11
        mlp[0].bias.copy_(torch.from_numpy(b0))
        mlp[2].weight.copy_(torch.from_numpy(k1[0, 0].T[:, :, None, None]))
        mlp[2].bias.copy_(torch.from_numpy(b1))

    ts = torch.from_numpy(np.moveaxis(fs, -1, 1))
    tt = torch.from_numpy(np.moveaxis(ft, -1, 1))
    norm_s, norm_t = norm(ts), norm(tt)
    ref = float(F.mse_loss(mlp(norm_s), norm_t) / 2) * 1.3
    assert ours == pytest.approx(ref, rel=1e-5)


def test_unidistill_response_kl_matches_torch():
    """Spatial softmax KL (unidistill_loss.py:25-56)."""
    rng = np.random.default_rng(1)
    n, h, w, c = 2, 4, 6, 3
    s = rng.standard_normal((n, h, w, c)).astype(np.float32)
    t = rng.standard_normal((n, h, w, c)).astype(np.float32)
    tau = 2.0
    ours = float(
        unidistill_response_kl(jnp.asarray(s), jnp.asarray(t), tau=tau)
    )

    ts = torch.from_numpy(np.moveaxis(s, -1, 1)).reshape(-1, w * h) / tau
    tt = torch.from_numpy(np.moveaxis(t, -1, 1)).reshape(-1, w * h) / tau
    p_t = F.softmax(tt, dim=1)
    logsoftmax = torch.nn.LogSoftmax(dim=1)
    ref = float(
        torch.sum(p_t * logsoftmax(tt) - p_t * logsoftmax(ts)) * tau**2
    ) / (c * n)
    assert ours == pytest.approx(ref, rel=1e-5)


def _box_corners(rng, b, m, h, w):
    """[B, M, 4, 2] axis-aligned-ish box corners in pixel coords + mask."""
    cx = rng.uniform(2, w - 2, (b, m))
    cy = rng.uniform(2, h - 2, (b, m))
    dx = rng.uniform(0.5, 2.0, (b, m))
    dy = rng.uniform(0.5, 2.0, (b, m))
    corners = np.stack(
        [
            np.stack([cx - dx, cy - dy], -1),
            np.stack([cx + dx, cy - dy], -1),
            np.stack([cx + dx, cy + dy], -1),
            np.stack([cx - dx, cy + dy], -1),
        ],
        axis=2,
    ).astype(np.float32)
    mask = (rng.random((b, m)) < 0.7).astype(np.float32)
    return corners, mask


def _torch_feature_distill(feat, corners, indices):
    """Transcription of FeatureDistillLoss's sampling half
    (unidistill_loss.py:57-104) for ONE feature map; returns [B, M, 9, C]
    sampled features.  ``corners`` fed in the reference's stored (y, x)
    order so its normalize-then-swap reproduces exactly."""
    h, w = feat.shape[-2:]
    c0 = torch.from_numpy(corners)
    center = torch.mean(c0, dim=2).unsqueeze(2)
    e1 = torch.mean(c0[:, :, [0, 1], :], dim=2).unsqueeze(2)
    e2 = torch.mean(c0[:, :, [1, 2], :], dim=2).unsqueeze(2)
    e3 = torch.mean(c0[:, :, [2, 3], :], dim=2).unsqueeze(2)
    e4 = torch.mean(c0[:, :, [0, 3], :], dim=2).unsqueeze(2)
    allp = torch.cat((c0, center, e1, e2, e3, e4), dim=2)
    allp[:, :, :, 0] = (allp[:, :, :, 0] - w / 2) / (w / 2)
    allp[:, :, :, 1] = (allp[:, :, :, 1] - h / 2) / (h / 2)
    allp[:, :, :, [0, 1]] = allp[:, :, :, [1, 0]]
    out = torch.nn.functional.grid_sample(feat, allp)
    return out.permute(0, 2, 3, 1)  # [B, M, 9, C]


def test_unidistill_feature_loss_matches_torch():
    rng = np.random.default_rng(2)
    b, m, h, w, c = 2, 5, 8, 8, 4  # square map: swap quirk is symmetric
    fs = rng.standard_normal((b, h, w, c)).astype(np.float32)
    ft = rng.standard_normal((b, h, w, c)).astype(np.float32)
    corners, mask = _box_corners(rng, b, m, h, w)

    ours = float(
        unidistill_feature_loss(
            jnp.asarray(fs), jnp.asarray(ft), jnp.asarray(corners),
            jnp.asarray(mask),
        )
    )

    # reference transcription: stored order (y, x), boolean indexing
    corners_yx = corners[..., ::-1].copy()
    idx = torch.from_numpy(mask.astype(bool))
    s = _torch_feature_distill(
        torch.from_numpy(np.moveaxis(fs, -1, 1)), corners_yx, idx
    )
    t = _torch_feature_distill(
        torch.from_numpy(np.moveaxis(ft, -1, 1)), corners_yx, idx
    )
    diff = torch.abs(s[idx] - t[idx])
    ref = float(
        torch.sum(torch.mean(torch.mean(diff, 2), 1))
        / (idx.float().sum() + 1e-4)
    )
    assert ours == pytest.approx(ref, rel=1e-4)


def test_unidistill_affinity_loss_matches_torch():
    rng = np.random.default_rng(3)
    b, m, h, w, c = 1, 4, 8, 8, 4
    fs = rng.standard_normal((b, h, w, c)).astype(np.float32)
    ft = rng.standard_normal((b, h, w, c)).astype(np.float32)
    corners, mask = _box_corners(rng, b, m, h, w)

    ours = float(
        unidistill_bev_affinity_loss(
            jnp.asarray(fs), jnp.asarray(ft), jnp.asarray(corners),
            jnp.asarray(mask),
        )
    )

    corners_yx = corners[..., ::-1].copy()
    idx = torch.from_numpy(mask.astype(bool))
    s = _torch_feature_distill(
        torch.from_numpy(np.moveaxis(fs, -1, 1)), corners_yx, idx
    )
    t = _torch_feature_distill(
        torch.from_numpy(np.moveaxis(ft, -1, 1)), corners_yx, idx
    )

    def gram(x):
        flat = x.reshape(-1, x.shape[-2], x.shape[-1])
        flat = flat / (torch.norm(flat, dim=-1, keepdim=True) + 1e-4)
        rel = torch.bmm(flat, flat.transpose(1, 2))
        return rel.reshape(x.shape[0], x.shape[1], 9, 9)

    diff = torch.abs(gram(s)[idx] - gram(t)[idx])
    ref = float(
        torch.sum(torch.mean(torch.mean(diff, 2), 1))
        / (idx.float().sum() + 1e-4)
    )
    assert ours == pytest.approx(ref, rel=1e-4)


def test_distill_train_step_tiny():
    """One jitted distillation step: RC teacher -> camera-only student.
    Student params move, distill losses are finite, PKD MLP params exist."""
    import os
    import sys

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import dataclasses

    from __graft_entry__ import _example_batch
    from rcbevdet_tpu.models import RCBEVDet, RCBEVDetConfig
    from rcbevdet_tpu.training.distill import (
        Distiller, make_distill_train_step,
    )
    from rcbevdet_tpu.training.train_step import (
        create_train_state, make_optimizer,
    )

    tcfg = RCBEVDetConfig(
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
    scfg = dataclasses.replace(tcfg, use_radar=False, freeze_img=False)
    teacher = RCBEVDet(tcfg)
    student = RCBEVDet(scfg)

    rng = np.random.default_rng(0)
    b = 2
    batch = _example_batch(tcfg, b=b, n=1, nmax_radar=32, rng=rng)
    batch["heatmap_t"] = jnp.zeros((b, 10, 8, 8)).at[:, 0, 4, 4].set(1.0)
    batch["anno_box_t"] = jnp.zeros((b, 100, 10))
    batch["inds_t"] = jnp.zeros((b, 100), jnp.int32)
    batch["mask_t"] = jnp.zeros((b, 100)).at[:, 0].set(1.0)

    key = jax.random.PRNGKey(0)
    teacher_vars = teacher.init(key, batch, train=False)
    preds_t, _, feats_t = teacher.apply(
        teacher_vars, batch, train=False, return_feats=True
    )
    distiller = Distiller(student=student, pkd_weight=1.0, kd_weight=1.0)
    variables = distiller.init(key, batch, feats_t, preds_t, train=False)
    assert "pkd" in variables["params"]

    tx = make_optimizer(total_steps=4, freeze_img=False)
    state = create_train_state(distiller, variables, tx)
    step = jax.jit(
        make_distill_train_step(distiller, teacher, teacher_vars, tx, scfg)
    )
    new_state, metrics = step(state, batch)
    for k in ("loss", "loss_distill_pkd", "loss_distill_kd"):
        assert np.isfinite(float(metrics[k])), k
    moved = sum(
        float(jnp.abs(a - b2).sum())
        for a, b2 in zip(
            jax.tree_util.tree_leaves(variables["params"]["student"]),
            jax.tree_util.tree_leaves(
                jax.device_get(new_state.params["student"])
            ),
        )
    )
    assert moved > 0.0


def test_response_distill_loss_sane():
    """Gaussian-masked response distillation: finite, positive where the
    student and teacher disagree, mask concentrated at GT centers."""
    rng = np.random.default_rng(4)
    b, h, w = 1, 16, 16
    pcr = (-8.0, -8.0, -5.0, 8.0, 8.0, 3.0)
    voxel = (0.125, 0.125)

    def preds(seed):
        r = np.random.default_rng(seed)
        return {
            "heatmap": jnp.asarray(r.standard_normal((b, h, w, 10)), jnp.float32),
            "reg": jnp.asarray(r.standard_normal((b, h, w, 2)), jnp.float32),
            "height": jnp.asarray(r.standard_normal((b, h, w, 1)), jnp.float32),
            "dim": jnp.asarray(r.standard_normal((b, h, w, 3)), jnp.float32),
            "rot": jnp.asarray(r.standard_normal((b, h, w, 2)), jnp.float32),
            "vel": jnp.asarray(r.standard_normal((b, h, w, 2)), jnp.float32),
        }

    boxes = np.zeros((b, 3, 9), np.float32)
    boxes[0, 0, :2] = (0.0, 0.0)
    boxes[0, 0, 3:6] = (4.0, 4.0, 1.5)
    boxes[0, 1, :2] = (-6.0, 6.0)
    boxes[0, 1, 3:6] = (2.0, 2.0, 1.0)
    mask = jnp.asarray(np.array([[1.0, 1.0, 0.0]], np.float32))

    cls_l, reg_l = response_distill_loss(
        preds(0), preds(1), jnp.asarray(boxes), mask, pcr, voxel,
        out_size_scale=8,
    )
    assert np.isfinite(float(cls_l)) and float(cls_l) > 0
    assert np.isfinite(float(reg_l)) and float(reg_l) > 0

    gm = box_mask_gaussian(
        (b, h, w), jnp.asarray(boxes), mask, pcr, voxel, 8
    )
    gm = np.asarray(gm)
    # center of box 0 is at grid (8, 8): mask peaks there
    assert gm[0, 8, 8] == pytest.approx(1.0, abs=1e-5)
    # masked-out box 2 contributes nothing; far corner is ~0
    assert gm[0, 0, 15] < 1e-3
    # identical preds -> zero loss
    cls0, reg0 = response_distill_loss(
        preds(0), preds(0), jnp.asarray(boxes), mask, pcr, voxel,
        out_size_scale=8,
    )
    assert float(reg0) == pytest.approx(0.0, abs=1e-6)
