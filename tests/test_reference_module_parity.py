"""Forward-numerics parity against the ACTUAL reference torch modules.

Each test instantiates the reference source from /root/reference (loaded
through tests/refshim.py — mmcv/timm glue shimmed with standard torch
layers, reference utilities loaded verbatim), converts its state_dict
through the production name map (utils/load_reference.py), runs both
models on the same inputs, and asserts forward parity.

This is the round-2 upgrade of the name-map coverage test into actual
numerics evidence, module by module:

- RadarBEVNet        (reference radar_encoder.py:265-451)
- DepthNet (+ASPP)   (reference view_transformer.py:326-635)
- MSDeformAttn       (reference model_utils/ops/modules/ms_deform_attn.py:182)
- CenterHead         (reference centerpoint_head.py:19-368)
- PointPillarsScatterRCS (reference pillar_scatter.py:107-135)
- SECOND             (reference second.py:12)
- SECONDFPN          (reference second_fpn.py:12)

BN running stats are randomized so eval-mode normalization is tested
non-trivially.  conftest pins float32 matmul precision; tolerance 1e-4.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import refshim
from rcbevdet_tpu.utils.load_reference import load_reference_checkpoint

TOL = dict(rtol=2e-4, atol=2e-4)


def _randomize_bn_stats(module, rng):
    """Give running stats non-default values so eval BN is really tested."""
    for m in module.modules():
        if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
            with torch.no_grad():
                m.running_mean.copy_(torch.tensor(
                    rng.standard_normal(m.num_features) * 0.3,
                    dtype=torch.float32))
                m.running_var.copy_(torch.tensor(
                    rng.uniform(0.5, 1.5, m.num_features),
                    dtype=torch.float32))


def _randomize_params(module, rng):
    for p in module.parameters():
        with torch.no_grad():
            p.copy_(torch.tensor(
                rng.standard_normal(tuple(p.shape)) * 0.1,
                dtype=torch.float32))


def _convert(torch_module, prefix, flax_variables, wrap):
    """torch state_dict -> flax variables through the production name map.

    wrap: path tuple under which the flax module's tree sits in the full
    detector (e.g. ('radar_voxel_encoder',) or ('camera',
    'img_view_transformer', 'depth_net')).
    """
    sd = {prefix + k: v for k, v in torch_module.state_dict().items()}

    def nest(tree):
        for p in reversed(wrap):
            tree = {p: tree}
        return tree

    def unnest(tree):
        for p in wrap:
            tree = tree[p]
        return tree

    wrapped = {root: nest(sub) for root, sub in flax_variables.items()}
    new_vars, report = load_reference_checkpoint(sd, wrapped)
    assert not report["unmapped"], f"unmapped: {report['unmapped'][:8]}"
    assert not report["untouched"], f"untouched: {report['untouched'][:8]}"
    return {root: unnest(sub) for root, sub in new_vars.items()}


# --------------------------------------------------------------- RadarBEVNet
def test_radar_bevnet_forward_parity(rng):
    ref_mod = refshim.load_radar_encoder()
    pc_range = (-8.0, -8.0, -5.0, 8.0, 8.0, 3.0)
    voxel_size = (0.5, 0.5, 8.0)
    tm = ref_mod.RadarBEVNet(
        in_channels=7, feat_channels=[16, 32], voxel_size=voxel_size,
        point_cloud_range=pc_range, with_pos_embed=True, return_rcs=True,
    ).eval()
    _randomize_params(tm, rng)
    _randomize_bn_stats(tm, rng)

    b, p, k = 2, 10, 6
    feats = rng.standard_normal((b * p, k, 7)).astype(np.float32)
    feats[..., 0] = rng.uniform(pc_range[0], pc_range[3], (b * p, k))
    feats[..., 1] = rng.uniform(pc_range[1], pc_range[4], (b * p, k))
    feats[..., 2] = rng.uniform(pc_range[2], pc_range[5], (b * p, k))
    num_voxels = rng.integers(1, k + 1, b * p).astype(np.int64)
    # zero padded slots like the real voxelizer output
    for i in range(b * p):
        feats[i, num_voxels[i]:] = 0.0
    # coors: (batch, z, y, x) rows, batch-sorted
    coors = np.zeros((b * p, 4), np.int64)
    coors[:, 0] = np.repeat(np.arange(b), p)
    coors[:, 2] = rng.integers(0, 32, b * p)
    coors[:, 3] = rng.integers(0, 32, b * p)

    with torch.no_grad():
        t_out, t_rcs = tm(
            torch.tensor(feats.copy()), torch.tensor(num_voxels),
            torch.tensor(coors),
        )

    from rcbevdet_tpu.models.radar_encoder import RadarBEVNet

    jm = RadarBEVNet(
        in_channels=7, feat_channels=(16, 32), voxel_size=voxel_size,
        point_cloud_range=pc_range, with_pos_embed=True,
    )
    j_feats = jnp.asarray(feats.reshape(b, p, k, 7))
    j_num = jnp.asarray(num_voxels.reshape(b, p).astype(np.int32))
    j_coors = jnp.asarray(coors[:, 1:].reshape(b, p, 3).astype(np.int32))
    j_mask = jnp.ones((b, p), bool)
    variables = jm.init(jax.random.PRNGKey(0), j_feats, j_num, j_coors, j_mask)
    variables = _convert(tm, "radar_voxel_encoder.", variables,
                         ("radar_voxel_encoder",))
    j_out, j_rcs = jm.apply(variables, j_feats, j_num, j_coors, j_mask)

    np.testing.assert_allclose(
        np.asarray(j_out).reshape(b * p, -1), t_out.numpy(), **TOL)
    np.testing.assert_allclose(
        np.asarray(j_rcs).reshape(b * p, -1), t_rcs.numpy(), **TOL)


# ------------------------------------------------------------------ DepthNet
def test_depthnet_aspp_forward_parity(rng):
    ref_mod = refshim.load_view_transformer()
    tm = ref_mod.DepthNet(
        in_channels=32, mid_channels=32, context_channels=16,
        depth_channels=12, use_dcn=False, use_aspp=True,
        aspp_mid_channels=12,
    ).eval()
    _randomize_params(tm, rng)
    _randomize_bn_stats(tm, rng)

    bn, h, w = 2, 8, 12
    x = rng.standard_normal((bn, 32, h, w)).astype(np.float32)
    mlp_input = rng.standard_normal((1, bn, 27)).astype(np.float32)

    with torch.no_grad():
        t_out = tm(torch.tensor(x), torch.tensor(mlp_input))

    from rcbevdet_tpu.models.view_transformer import DepthNet

    jm = DepthNet(mid_channels=32, context_channels=16, depth_channels=12,
                  aspp_mid_channels=12)
    jx = jnp.asarray(np.moveaxis(x, 1, -1))
    jmlp = jnp.asarray(mlp_input)
    variables = jm.init(jax.random.PRNGKey(0), jx, jmlp)
    variables = _convert(
        tm, "img_view_transformer.depth_net.", variables,
        ("camera", "img_view_transformer", "depth_net"),
    )
    j_out = jm.apply(variables, jx, jmlp)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(j_out), -1, 1), t_out.numpy(), **TOL)


# -------------------------------------------------------------- MSDeformAttn
def test_ms_deform_attn_forward_parity(rng):
    mod, funcs = refshim.load_ms_deform_attn()

    class _PyFn:
        @staticmethod
        def apply(value, shapes, start_index, locs, weights, step):
            return funcs.ms_deform_attn_core_pytorch(
                value, shapes, locs, weights)

    mod.MSDeformAttnFunction = _PyFn  # CPU oracle instead of the CUDA ext

    tm = mod.MSDeformAttn(d_model=32, n_levels=1, n_heads=8, n_points=8)
    tm.eval()
    _randomize_params(tm, rng)
    # restore the structured inits the random fill destroyed? No — random
    # weights are a STRONGER parity test than the ring init.

    b, lq, h, w = 2, 20, 8, 10
    query = rng.standard_normal((b, lq, 32)).astype(np.float32)
    ref_pts = rng.uniform(0.05, 0.95, (b, lq, 1, 2)).astype(np.float32)
    flat = rng.standard_normal((b, h * w, 32)).astype(np.float32)
    shapes = torch.tensor([[h, w]], dtype=torch.long)
    start = torch.tensor([0], dtype=torch.long)
    with torch.no_grad():
        t_out = tm(torch.tensor(query), torch.tensor(ref_pts),
                   torch.tensor(flat), shapes, start)

    from rcbevdet_tpu.models.camf import MSDeformAttn

    jm = MSDeformAttn(d_model=32, n_levels=1, n_heads=8, n_points=8)
    variables = jm.init(
        jax.random.PRNGKey(0), jnp.asarray(query), jnp.asarray(ref_pts),
        jnp.asarray(flat), ((h, w),),
    )
    variables = _convert(tm, "DeformAttn1.", variables,
                         ("camf", "deform_attn1"))
    j_out = jm.apply(variables, jnp.asarray(query), jnp.asarray(ref_pts),
                     jnp.asarray(flat), ((h, w),))
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(), **TOL)


# ---------------------------------------------------------------- CenterHead
def test_centerhead_forward_parity(rng):
    ref_mod = refshim.load_centerpoint_head()
    classes = ["car", "truck", "construction_vehicle", "bus", "trailer",
               "barrier", "motorcycle", "bicycle", "pedestrian",
               "traffic_cone"]
    tm = ref_mod.CenterHead(
        in_channels=32,
        tasks=[dict(num_class=10, class_names=classes)],
        common_heads=dict(reg=(2, 2), height=(1, 2), dim=(3, 2),
                          rot=(2, 2), vel=(2, 2)),
        share_conv_channel=16,
        bbox_coder=dict(type="CenterPointBBoxCoder", code_size=9),
        separate_head=dict(type="SeparateHead", init_bias=-2.19,
                           final_kernel=3),
        norm_bbox=True,
    ).eval()
    _randomize_params(tm, rng)
    _randomize_bn_stats(tm, rng)

    b, h, w = 2, 8, 8
    x = rng.standard_normal((b, 32, h, w)).astype(np.float32)
    with torch.no_grad():
        t_ret = tm([torch.tensor(x)])[0][0]  # task 0 dict

    from rcbevdet_tpu.models.centerpoint_head import CenterHead

    jm = CenterHead(in_channels=32, num_classes=10, share_conv_channel=16)
    jx = jnp.asarray(np.moveaxis(x, 1, -1))
    variables = jm.init(jax.random.PRNGKey(0), jx)
    variables = _convert(tm, "pts_bbox_head.", variables, ("pts_bbox_head",))
    j_ret = jm.apply(variables, jx)
    for key in ("reg", "height", "dim", "rot", "vel", "heatmap"):
        np.testing.assert_allclose(
            np.moveaxis(np.asarray(j_ret[key]), -1, 1),
            t_ret[key].numpy(), err_msg=key, **TOL)


# --------------------------------------------------- PointPillarsScatterRCS
def test_pillar_scatter_rcs_forward_parity(rng):
    ref_mod = refshim.load_pillar_scatter()
    ny = nx = 36
    tm = ref_mod.PointPillarsScatterRCS(
        in_channels=8, output_shape=[ny, nx]).eval()
    _randomize_params(tm, rng)

    b, p = 2, 5
    npil = b * p
    feats = rng.standard_normal((npil, 8)).astype(np.float32)
    # rcs rows mimic RadarBEVNet's masked-mean output of the normalized
    # point features: columns 0,1 = normalized xy in [0,1], -2 = raw RCS
    rcs = rng.standard_normal((npil, 7)).astype(np.float32) * 0.3
    rcs[:, 0] = rng.uniform(0.1, 0.9, npil)
    rcs[:, 1] = rng.uniform(0.1, 0.9, npil)
    rcs[:, -2] = rng.uniform(-1.0, 2.0, npil)  # int radius <= 4 (window 9)
    coors = np.zeros((npil, 4), np.int64)
    coors[:, 0] = np.repeat(np.arange(b), p)
    # non-overlapping windows: the reference feat-rectangle is last-wins on
    # overlap (an order-dependent detail our max-combine deliberately
    # replaces, see render_rcs_maps docstring) — keep disks disjoint so the
    # mechanism itself is what's compared
    grid = np.array([(gy, gx) for gy in (6, 17, 28) for gx in (6, 17, 28)])
    for s in range(b):
        pick = rng.choice(len(grid), size=p, replace=False)
        coors[s * p:(s + 1) * p, 2] = grid[pick, 0]
        coors[s * p:(s + 1) * p, 3] = grid[pick, 1]

    with torch.no_grad():
        t_out = tm((torch.tensor(feats), torch.tensor(rcs)),
                   torch.tensor(coors), batch_size=b)

    from rcbevdet_tpu.models.pillar_scatter import PointPillarsScatterRCS

    jm = PointPillarsScatterRCS(in_channels=8, output_shape=(ny, nx),
                                r_max=8)
    j_feats = jnp.asarray(feats.reshape(b, p, 8))
    j_rcs = jnp.asarray(rcs.reshape(b, p, 7))
    j_coors = jnp.asarray(coors[:, 1:].reshape(b, p, 3).astype(np.int32))
    j_mask = jnp.ones((b, p), bool)
    variables = jm.init(jax.random.PRNGKey(0), j_feats, j_rcs, j_coors, j_mask)
    variables = _convert(tm, "radar_middle_encoder.", variables,
                         ("radar_middle_encoder",))
    j_out = jm.apply(variables, j_feats, j_rcs, j_coors, j_mask)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(j_out), -1, 1), t_out.numpy(), **TOL)


# -------------------------------------------------------- SECOND + SECONDFPN
def test_second_backbone_forward_parity(rng):
    ref_mod = refshim.load_second()
    tm = ref_mod.SECOND(
        in_channels=8, out_channels=[8, 16, 32], layer_nums=[1, 1, 1],
        layer_strides=[2, 2, 2],
        norm_cfg=dict(type="BN", eps=1e-3, momentum=0.01),
    ).eval()
    _randomize_params(tm, rng)
    _randomize_bn_stats(tm, rng)

    x = rng.standard_normal((2, 8, 16, 16)).astype(np.float32)
    with torch.no_grad():
        t_outs = tm(torch.tensor(x))

    from rcbevdet_tpu.models.fpn import SECOND

    jm = SECOND(out_channels=(8, 16, 32), layer_nums=(1, 1, 1),
                layer_strides=(2, 2, 2))
    jx = jnp.asarray(np.moveaxis(x, 1, -1))
    variables = jm.init(jax.random.PRNGKey(0), jx)
    variables = _convert(tm, "radar_bev_backbone.", variables,
                         ("radar_bev_backbone",))
    j_outs = jm.apply(variables, jx)
    assert len(j_outs) == len(t_outs)
    for j, t in zip(j_outs, t_outs):
        np.testing.assert_allclose(
            np.moveaxis(np.asarray(j), -1, 1), t.numpy(), **TOL)


def test_second_fpn_forward_parity(rng):
    ref_mod = refshim.load_second_fpn()
    tm = ref_mod.SECONDFPN(
        in_channels=[8, 16, 32], out_channels=[8, 8, 8],
        upsample_strides=[0.5, 1, 2], use_conv_for_no_stride=True,
        norm_cfg=dict(type="BN", eps=1e-3, momentum=0.01),
    ).eval()
    _randomize_params(tm, rng)
    _randomize_bn_stats(tm, rng)

    feats = [
        rng.standard_normal((2, 8, 16, 16)).astype(np.float32),
        rng.standard_normal((2, 16, 8, 8)).astype(np.float32),
        rng.standard_normal((2, 32, 4, 4)).astype(np.float32),
    ]
    with torch.no_grad():
        t_out = tm([torch.tensor(f) for f in feats])[0]

    from rcbevdet_tpu.models.fpn import SECONDFPN

    jm = SECONDFPN(out_channels=(8, 8, 8), upsample_strides=(0.5, 1, 2),
                   use_conv_for_no_stride=True)
    jfeats = [jnp.asarray(np.moveaxis(f, 1, -1)) for f in feats]
    variables = jm.init(jax.random.PRNGKey(0), jfeats)
    variables = _convert(tm, "radar_bev_neck.", variables,
                         ("radar_bev_neck",))
    j_out = jm.apply(variables, jfeats)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(j_out), -1, 1), t_out.numpy(), **TOL)


# ------------------------------------------------------------------ ConvNeXt
def test_convnext_forward_parity(rng):
    import refshim as rs

    rs.install()
    ref_mod = rs._load_by_path("mmdet3d/models/backbones/convnext.py")
    tm = ref_mod.ConvNeXt(
        in_chans=3, depths=[2, 2, 3, 2], dims=[16, 32, 48, 64],
        drop_path_rate=0.0, out_indices=(2, 3), return_stereo_feat=True,
    )
    tm.eval()
    _randomize_params(tm, rng)

    x = rng.standard_normal((2, 3, 32, 48)).astype(np.float32)
    with torch.no_grad():
        t_outs = tm(torch.tensor(x))

    from rcbevdet_tpu.models.convnext import ConvNeXt

    jm = ConvNeXt(
        depths=(2, 2, 3, 2), dims=(16, 32, 48, 64), out_indices=(2, 3),
        return_stereo_feat=True,
    )
    jx = jnp.asarray(np.moveaxis(x, 1, -1))
    variables = jm.init(jax.random.PRNGKey(0), jx)
    variables = _convert(tm, "img_backbone.", variables,
                         ("camera", "img_backbone"))
    j_outs = jm.apply(variables, jx)
    assert len(j_outs) == len(t_outs) == 3  # stereo tap + 2 out stages
    for j, t in zip(j_outs, t_outs):
        np.testing.assert_allclose(
            np.moveaxis(np.asarray(j), -1, 1), t.numpy(), **TOL)


# ---------------------------------------------------------------------- Swin
def test_swin_transformer_forward_parity(rng):
    import refshim as rs

    rs.install()
    ref_mod = rs._load_by_path("mmdet3d/models/backbones/swin.py")
    tm = ref_mod.SwinTransformer(
        embed_dims=32, depths=(2, 2), num_heads=(2, 4), window_size=4,
        out_indices=(0, 1), drop_path_rate=0.0, with_cp=False,
        return_stereo_feat=False,
    )
    tm.eval()  # the reference train() override returns None, can't chain
    _randomize_params(tm, rng)

    x = rng.standard_normal((2, 3, 17, 23)).astype(np.float32)  # odd dims
    with torch.no_grad():
        t_outs = tm(torch.tensor(x))

    from rcbevdet_tpu.models.swin import SwinTransformer

    jm = SwinTransformer(embed_dims=32, depths=(2, 2), num_heads=(2, 4),
                         window_size=4, out_indices=(0, 1))
    jx = jnp.asarray(np.moveaxis(x, 1, -1))
    variables = jm.init(jax.random.PRNGKey(0), jx)
    variables = _convert(tm, "img_backbone.", variables,
                         ("camera", "img_backbone"))
    j_outs = jm.apply(variables, jx)
    assert len(j_outs) == len(t_outs)
    for j, t in zip(j_outs, t_outs):
        np.testing.assert_allclose(
            np.moveaxis(np.asarray(j), -1, 1), t.numpy(), **TOL)


# ----------------------------------------------------------------------- DLA
def test_dla_forward_parity(rng):
    import refshim as rs

    rs.install()
    ref_mod = rs._load_by_path("mmdet3d/models/backbones/dla.py")
    tm = ref_mod.DLANet(
        depth=34, norm_cfg=dict(type="BN"), out_indices=(2, 3, 4, 5),
    )
    tm.eval()
    _randomize_params(tm, rng)
    _randomize_bn_stats(tm, rng)

    x = rng.standard_normal((2, 3, 64, 96)).astype(np.float32)
    with torch.no_grad():
        t_outs = tm(torch.tensor(x))

    from rcbevdet_tpu.models.dla import DLANet

    jm = DLANet(depth=34, out_indices=(2, 3, 4, 5))
    jx = jnp.asarray(np.moveaxis(x, 1, -1))
    variables = jm.init(jax.random.PRNGKey(0), jx)
    variables = _convert(tm, "img_backbone.", variables,
                         ("camera", "img_backbone"))
    j_outs = jm.apply(variables, jx)
    assert len(j_outs) == len(t_outs) == 4
    for j, t in zip(j_outs, t_outs):
        np.testing.assert_allclose(
            np.moveaxis(np.asarray(j), -1, 1), t.numpy(), **TOL)


# ------------------------------------------------------------ CAMF glue
def test_camf_glue_parity(rng, monkeypatch):
    """Run the REFERENCE BEVDet_RC.extract_feat fusion glue itself
    (bevdet_rc.py:303-357) — reduc conv, learned pos embeds, dense
    reference points, both MSDeformAttn directions, RadarConvFuser — with
    canned branch outputs, and compare against models/camf.py::CAMF with
    converted weights.  This covers the glue the module-level tests
    don't: pos-embed pairing, the batch-1 mask broadcast, the spurious
    level_start_index, and the fuser's clone/concat pattern."""
    import sys as _sys

    mod = refshim.load_bevdet_rc()

    # CPU oracle instead of the CUDA ext
    msda = _sys.modules[
        "mmdet3d.models.model_utils.ops.modules.ms_deform_attn"]
    funcs = _sys.modules["mmdet3d.models.model_utils.ops.functions"]

    class _PyFn:
        @staticmethod
        def apply(value, shapes, start_index, locs, weights, step):
            return funcs.ms_deform_attn_core_pytorch(
                value, shapes, locs, weights)

    monkeypatch.setattr(msda, "MSDeformAttnFunction", _PyFn)

    # identity camera/BEV-encoder branches (never exercised here)
    import mmdet3d.models.builder as b

    class _Id(torch.nn.Module):
        def __init__(self, **kw):
            super().__init__()

        def forward(self, *a, **k):
            return a[0] if a else None

    b.NECKS.register_module(name="_Id", module=_Id)
    b.BACKBONES.register_module(name="_Id", module=_Id)

    bev = 16
    det = mod.BEVDet_RC(
        img_view_transformer=dict(type="_Id"),
        img_bev_encoder_backbone=dict(type="_Id"),
        img_bev_encoder_neck=dict(type="_Id"),
        imc=256, rac=64, bev_size=bev,
    )
    det.eval()
    _randomize_params(det, rng)
    _randomize_bn_stats(det, rng)

    img_bev = rng.standard_normal((1, 256, bev, bev)).astype(np.float32)
    radar_bev = rng.standard_normal((1, 64, bev, bev)).astype(np.float32)

    det.extract_img_feat = lambda img, metas, **kw: (
        [torch.tensor(img_bev)], None)
    det.extract_radar_feat = lambda radar, metas: [torch.tensor(radar_bev)]
    # the glue hardcodes cuda: torch.device("cuda") for masks/shape
    # tensors, device='cuda' in get_reference_points
    real_device = torch.device
    monkeypatch.setattr(
        torch, "device", lambda *a, **k: real_device("cpu"))
    orig_ref_pts = mod.BEVDet_RC.get_reference_points
    monkeypatch.setattr(
        mod.BEVDet_RC, "get_reference_points",
        staticmethod(lambda H, W, **k: orig_ref_pts(H, W, device="cpu")),
    )

    with torch.no_grad():
        fusion_feats, _, _ = det.extract_feat(
            points=None, img=None, img_metas=None, radar=None)
    t_out = fusion_feats[0].numpy()  # [1, 256, bev, bev]

    from rcbevdet_tpu.models.camf import CAMF

    jm = CAMF(imc=256, rac=64, bev_size=bev)
    j_img = jnp.asarray(np.moveaxis(img_bev, 1, -1))
    j_radar = jnp.asarray(np.moveaxis(radar_bev, 1, -1))
    variables = jm.init(jax.random.PRNGKey(0), j_img, j_radar)
    variables = _convert(det, "", variables, ("camf",))
    j_out = jm.apply(variables, j_img, j_radar)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(j_out), -1, 1), t_out, **TOL)


# ------------------------------------------------- temporal alignment glue
def test_temporal_shift_glue_parity(rng):
    """Run the REFERENCE BEVDet4D_RC.gen_grid/shift_feature homography
    chain (bevdet_rc.py:585-657: feat2bev^-1 . bda.c02l0 .
    (bda_adj.c12l0)^-1 . feat2bev + grid_sample) against
    models/temporal.py::shift_bev on random SE(3) ego motion."""
    import types as _types

    mod = refshim.load_bevdet_rc()

    b, c, h, w = 2, 8, 16, 16
    feat = rng.standard_normal((b, c, h, w)).astype(np.float32)

    def rand_pose(scale_t=1.0):
        th = rng.uniform(-0.2, 0.2)
        m = np.tile(np.eye(4, dtype=np.float32), (b, 2, 1, 1))
        m[..., 0, 0] = np.cos(th)
        m[..., 0, 1] = -np.sin(th)
        m[..., 1, 0] = np.sin(th)
        m[..., 1, 1] = np.cos(th)
        m[..., :3, 3] = rng.uniform(-scale_t, scale_t, (b, 2, 3))
        return m

    s2k0 = rand_pose()
    s2k1 = rand_pose()
    bda = np.tile(np.eye(3, dtype=np.float32), (b, 1, 1))
    th = rng.uniform(-0.3, 0.3)
    bda[:, 0, 0] = np.cos(th)
    bda[:, 0, 1] = -np.sin(th)
    bda[:, 1, 0] = np.sin(th)
    bda[:, 1, 1] = np.cos(th)
    bda_adj = bda.copy()
    bda_adj[:, 0, 0] *= 1.05  # slightly different adjacent-frame aug

    gi = (1.0, 1.0)
    glb = (-8.0, -8.0)
    self_like = _types.SimpleNamespace(
        grid=None,
        img_view_transformer=_types.SimpleNamespace(
            grid_interval=torch.tensor(list(gi)),
            grid_lower_bound=torch.tensor(list(glb)),
        ),
    )
    self_like.gen_grid = mod.BEVDet4D_RC.gen_grid.__get__(self_like)
    with torch.no_grad():
        t_out = mod.BEVDet4D_RC.shift_feature(
            self_like, torch.tensor(feat),
            [torch.tensor(s2k0), torch.tensor(s2k1)],
            torch.tensor(bda), bda_adj=torch.tensor(bda_adj),
        ).numpy()

    from rcbevdet_tpu.models.temporal import shift_bev

    j_out = shift_bev(
        jnp.asarray(np.moveaxis(feat, 1, -1)),
        jnp.asarray(s2k0), jnp.asarray(s2k1), jnp.asarray(bda),
        grid_lower_bound=glb, grid_interval=gi,
        bda_adj=jnp.asarray(bda_adj),
    )
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(j_out), -1, 1), t_out, **TOL)


# -------------------------------------------------------- LSS geometry glue
def test_lss_geometry_parity(rng):
    """Reference LSSViewTransformer.create_frustum + get_lidar_coor
    (view_transformer.py:85-157: inverse image aug, un-projection,
    cam->ego, BDA) vs models/view_transformer.py::create_frustum +
    frustum_to_ego, on random intrinsics/augs/poses."""
    import types as _types

    ref_mod = refshim.load_view_transformer()

    depth_cfg = (1.0, 9.0, 0.5)
    input_size = (64, 96)
    downsample = 16
    b, n = 2, 3

    self_like = _types.SimpleNamespace(sid=False)
    frustum_t = ref_mod.LSSViewTransformer.create_frustum(
        self_like, depth_cfg, input_size, downsample)
    self_like.frustum = frustum_t

    s2e = np.tile(np.eye(4, dtype=np.float32), (b, n, 1, 1))
    for i in range(b):
        for j in range(n):
            th = rng.uniform(-np.pi, np.pi)
            c, s = np.cos(th), np.sin(th)
            s2e[i, j, :3, :3] = np.array(
                [[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
            s2e[i, j, :3, 3] = rng.uniform(-2, 2, 3)
    intr = np.tile(np.eye(3, dtype=np.float32), (b, n, 1, 1))
    intr[..., 0, 0] = rng.uniform(80, 120, (b, n))
    intr[..., 1, 1] = rng.uniform(80, 120, (b, n))
    intr[..., 0, 2] = rng.uniform(40, 56, (b, n))
    intr[..., 1, 2] = rng.uniform(24, 40, (b, n))
    post_rots = np.tile(np.eye(3, dtype=np.float32), (b, n, 1, 1))
    post_rots[..., 0, 0] = rng.uniform(0.8, 1.2, (b, n))
    post_rots[..., 1, 1] = rng.uniform(0.8, 1.2, (b, n))
    post_trans = np.zeros((b, n, 3), np.float32)
    post_trans[..., :2] = rng.uniform(-8, 8, (b, n, 2))
    bda = np.tile(np.eye(3, dtype=np.float32), (b, 1, 1))
    th = rng.uniform(-0.4, 0.4)
    bda[:, 0, 0] = np.cos(th)
    bda[:, 0, 1] = -np.sin(th)
    bda[:, 1, 0] = np.sin(th)
    bda[:, 1, 1] = np.cos(th)

    with torch.no_grad():
        t_coor = ref_mod.LSSViewTransformer.get_lidar_coor(
            self_like, torch.tensor(s2e), None, torch.tensor(intr),
            torch.tensor(post_rots), torch.tensor(post_trans),
            torch.tensor(bda),
        ).numpy()

    from rcbevdet_tpu.models.view_transformer import (
        create_frustum, frustum_to_ego,
    )

    frustum_j = create_frustum(depth_cfg, input_size, downsample)
    np.testing.assert_allclose(
        np.asarray(frustum_j), frustum_t.numpy(), rtol=1e-6, atol=1e-6)
    j_coor = frustum_to_ego(
        frustum_j, jnp.asarray(s2e), jnp.asarray(intr),
        jnp.asarray(post_rots), jnp.asarray(post_trans), jnp.asarray(bda),
    )
    np.testing.assert_allclose(np.asarray(j_coor), t_coor,
                               rtol=1e-3, atol=2e-3)


# ------------------------------------------------------- depth supervision
def test_depth_gt_downsample_parity(rng):
    """Reference get_downsampled_gt_depth (view_transformer.py:732-768:
    min-pool of non-zero GT, bin index, one-hot over D+1 dropping bin 0)
    vs models/view_transformer.py::downsample_gt_depth."""
    import types as _types

    ref_mod = refshim.load_view_transformer()

    depth_cfg = (1.0, 9.0, 0.5)
    num_d = int(round((depth_cfg[1] - depth_cfg[0]) / depth_cfg[2]))
    downsample = 8
    b, n, h, w = 2, 2, 32, 48
    gt = np.zeros((b, n, h, w), np.float32)
    idx = rng.random((b, n, h, w)) < 0.07  # sparse lidar hits
    gt[idx] = rng.uniform(0.2, 12.0, idx.sum())  # incl. out-of-range depths

    self_like = _types.SimpleNamespace(
        downsample=downsample, sid=False, D=num_d,
        grid_config={"depth": depth_cfg},
    )
    with torch.no_grad():
        t_out = ref_mod.LSSViewTransformerBEVDepth.get_downsampled_gt_depth(
            self_like, torch.tensor(gt)).numpy()

    from rcbevdet_tpu.models.view_transformer import downsample_gt_depth

    j_out = downsample_gt_depth(jnp.asarray(gt), downsample, depth_cfg)
    np.testing.assert_allclose(
        np.asarray(j_out).reshape(t_out.shape), t_out, rtol=1e-6, atol=1e-6)


# ---------------------------------------------------------- bbox coder
def test_centerpoint_bbox_coder_decode_parity(rng):
    """Reference CenterPointBBoxCoder.decode (centerpoint_bbox_coders.py:
    117-229: per-class topK -> union topK, sub-cell reg, metric scaling,
    score + center-range filtering) vs core/coders.py::centerpoint_decode
    (static top-K with validity mask)."""
    ref_mod = refshim.load_bbox_coder()

    b, num_cls, h, w = 2, 4, 16, 16
    k = 20
    pc_range = (-8.0, -8.0)
    voxel_size = (0.125, 0.125)
    osf = 8
    pcr = (-10.0, -10.0, -6.0, 10.0, 10.0, 6.0)
    thr = 0.1

    heat = 1.0 / (1.0 + np.exp(-rng.standard_normal(
        (b, num_cls, h, w)).astype(np.float32)))
    reg = rng.standard_normal((b, 2, h, w)).astype(np.float32) * 0.3
    hei = rng.standard_normal((b, 1, h, w)).astype(np.float32)
    dim = np.exp(rng.standard_normal((b, 3, h, w)).astype(np.float32) * 0.3)
    rots = rng.standard_normal((b, 1, h, w)).astype(np.float32)
    rotc = rng.standard_normal((b, 1, h, w)).astype(np.float32)
    vel = rng.standard_normal((b, 2, h, w)).astype(np.float32)

    coder = ref_mod.CenterPointBBoxCoder(
        pc_range=list(pc_range), out_size_factor=osf,
        voxel_size=list(voxel_size), post_center_range=list(pcr),
        max_num=k, score_threshold=thr,
    )
    with torch.no_grad():
        t_dicts = coder.decode(
            torch.tensor(heat), torch.tensor(rots), torch.tensor(rotc),
            torch.tensor(hei), torch.tensor(dim), torch.tensor(vel),
            reg=torch.tensor(reg),
        )

    from rcbevdet_tpu.core.coders import centerpoint_decode

    nhwc = lambda x: jnp.asarray(np.moveaxis(x, 1, -1))
    dec = centerpoint_decode(
        nhwc(heat), nhwc(rots), nhwc(rotc), nhwc(hei), nhwc(dim),
        nhwc(vel), nhwc(reg),
        pc_range=pc_range, voxel_size=voxel_size, out_size_factor=osf,
        post_center_range=pcr, max_num=k, score_threshold=thr,
    )
    for i in range(b):
        v = np.asarray(dec.valid[i])
        np.testing.assert_allclose(
            np.asarray(dec.bboxes[i])[v], t_dicts[i]["bboxes"].numpy(),
            rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(dec.scores[i])[v], t_dicts[i]["scores"].numpy(),
            rtol=1e-6, atol=1e-6)
        np.testing.assert_array_equal(
            np.asarray(dec.labels[i])[v],
            t_dicts[i]["labels"].numpy().astype(np.int32))


# ------------------------------------------------ CenterHead targets + loss
def test_centerhead_targets_and_loss_parity(rng):
    """Reference get_targets_single + loss (centerpoint_head.py:441-683:
    per-GT gaussian rendering with gaussian_radius, anno-box encoding,
    clip_sigmoid focal + code-weighted task-split L1) vs
    core/targets.py::centerpoint_targets_single +
    models/centerpoint_head.py::centerpoint_loss, with the RC config's
    loss weights (6.0 / 1.5, config :173-174)."""
    import types as _types

    ref_mod = refshim.load_centerpoint_head()
    classes = ["car", "truck", "construction_vehicle", "bus", "trailer",
               "barrier", "motorcycle", "bicycle", "pedestrian",
               "traffic_cone"]
    pc_range = (-8.0, -8.0, -5.0, 8.0, 8.0, 3.0)
    train_cfg = dict(
        grid_size=[128, 128, 40], point_cloud_range=list(pc_range),
        voxel_size=[0.125, 0.125, 0.2], out_size_factor=8,
        gaussian_overlap=0.1, max_objs=500, dense_reg=1, min_radius=2,
        code_weights=[1.0] * 10,
    )
    tm = ref_mod.CenterHead(
        in_channels=32,
        tasks=[dict(num_class=10, class_names=classes)],
        common_heads=dict(reg=(2, 2), height=(1, 2), dim=(3, 2),
                          rot=(2, 2), vel=(2, 2)),
        share_conv_channel=16,
        bbox_coder=dict(type="CenterPointBBoxCoder", code_size=9),
        separate_head=dict(type="SeparateHead", init_bias=-2.19,
                           final_kernel=3),
        loss_cls=dict(type="GaussianFocalLoss", reduction="mean",
                      loss_weight=6.0),
        loss_bbox=dict(type="L1Loss", reduction="mean", loss_weight=1.5),
        norm_bbox=True,
        train_cfg=train_cfg,
        task_specific=True,
    ).eval()

    n_gt = 5
    boxes = np.zeros((n_gt, 9), np.float32)
    boxes[:, 0] = rng.uniform(-7, 7, n_gt)
    boxes[:, 1] = rng.uniform(-7, 7, n_gt)
    boxes[:, 2] = rng.uniform(-2, 1, n_gt)  # BOTTOM z (LiDAR box format)
    boxes[:, 3:6] = rng.uniform(0.5, 4.0, (n_gt, 3))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n_gt)
    boxes[:, 7:9] = rng.uniform(-2, 2, (n_gt, 2))
    labels = rng.integers(0, 10, n_gt)

    # LiDARInstance3DBoxes stand-in: gravity_center = bottom z + dz/2
    grav = boxes.copy()
    grav_z = boxes[:, 2] + boxes[:, 5] / 2.0
    gt_obj = _types.SimpleNamespace(
        gravity_center=torch.tensor(
            np.stack([boxes[:, 0], boxes[:, 1], grav_z], -1)),
        tensor=torch.tensor(boxes),
    )
    heatmaps, anno_boxes, inds, masks = tm.get_targets(
        [gt_obj], [torch.tensor(labels.astype(np.int64))])

    from rcbevdet_tpu.core.targets import centerpoint_targets_single

    grav[:, 2] = grav_z  # my renderer takes gravity-centered boxes
    t = centerpoint_targets_single(
        grav, labels.astype(np.int32), num_classes=10,
        grid_size=(128, 128), point_cloud_range=pc_range,
        voxel_size=(0.125, 0.125), out_size_factor=8,
        gaussian_overlap=0.1, min_radius=2, max_objs=500,
    )
    np.testing.assert_allclose(
        np.asarray(t.heatmap), heatmaps[0][0].numpy(), rtol=1e-5, atol=1e-5)
    # the reference reorders GTs class-by-class (task_masks via torch.where
    # per class); slot order is immaterial to the loss — compare as sets
    # keyed by the (unique) heatmap index
    n_ref = int(masks[0][0].sum())
    assert int(np.asarray(t.mask).sum()) == n_ref
    ref_order = np.argsort(inds[0][0].numpy()[:n_ref])
    my_order = np.argsort(np.asarray(t.inds)[:n_ref])
    np.testing.assert_array_equal(
        np.asarray(t.inds)[:n_ref][my_order],
        inds[0][0].numpy()[:n_ref][ref_order])
    np.testing.assert_allclose(
        np.asarray(t.anno_box)[:n_ref][my_order],
        anno_boxes[0][0].numpy()[:n_ref][ref_order], rtol=1e-5, atol=1e-5)

    # ------- loss on random predictions
    b, h, w = 1, 16, 16
    preds_t = {
        "heatmap": torch.tensor(
            rng.standard_normal((b, 10, h, w)).astype(np.float32)),
        "reg": torch.tensor(
            rng.standard_normal((b, 2, h, w)).astype(np.float32)),
        "height": torch.tensor(
            rng.standard_normal((b, 1, h, w)).astype(np.float32)),
        "dim": torch.tensor(
            rng.standard_normal((b, 3, h, w)).astype(np.float32)),
        "rot": torch.tensor(
            rng.standard_normal((b, 2, h, w)).astype(np.float32)),
        "vel": torch.tensor(
            rng.standard_normal((b, 2, h, w)).astype(np.float32)),
    }
    # snapshot BEFORE the reference loss: its clip_sigmoid mutates the
    # heatmap pred in place (x.sigmoid_(), models/utils/clip_sigmoid.py)
    preds_j = {k: jnp.asarray(np.moveaxis(v.numpy().copy(), 1, -1))
               for k, v in preds_t.items()}
    with torch.no_grad():
        t_losses = tm.loss([gt_obj], [torch.tensor(labels.astype(np.int64))],
                           [[dict(preds_t)]])

    from rcbevdet_tpu.models.centerpoint_head import centerpoint_loss

    j_losses = centerpoint_loss(
        preds_j,
        jnp.asarray(t.heatmap)[None],
        jnp.asarray(t.anno_box)[None],
        jnp.asarray(t.inds)[None],
        jnp.asarray(t.mask)[None].astype(jnp.float32),
        code_weights=tuple(train_cfg["code_weights"]),
        cls_weight=6.0, bbox_weight=1.5,
    )
    for name in ("heatmap", "xy", "z", "whl", "yaw", "vel"):
        ref_key = f"task0.loss_{name}"
        np.testing.assert_allclose(
            float(j_losses[f"loss_{name}"]), float(t_losses[ref_key]),
            rtol=1e-4, err_msg=name)


def test_depth_loss_parity(rng):
    """Reference get_depth_loss (view_transformer.py:770-784: BCE over
    foreground depth bins / max(1, num_fg) * weight) vs
    models/view_transformer.py::depth_loss."""
    import types as _types

    ref_mod = refshim.load_view_transformer()

    depth_cfg = (1.0, 9.0, 0.5)
    num_d = int(round((depth_cfg[1] - depth_cfg[0]) / depth_cfg[2]))
    downsample = 8
    b, n, h, w = 2, 2, 32, 48
    gt = np.zeros((b, n, h, w), np.float32)
    idx = rng.random((b, n, h, w)) < 0.07
    gt[idx] = rng.uniform(0.2, 12.0, idx.sum())
    # softmax depth predictions [B*N, D, hf, wf]
    logits = rng.standard_normal(
        (b * n, num_d, h // downsample, w // downsample)).astype(np.float32)
    pred = torch.softmax(torch.tensor(logits), dim=1)

    self_like = _types.SimpleNamespace(
        downsample=downsample, sid=False, D=num_d,
        grid_config={"depth": depth_cfg}, loss_depth_weight=3.0,
        get_downsampled_gt_depth=None,
    )
    self_like.get_downsampled_gt_depth = (
        ref_mod.LSSViewTransformerBEVDepth.get_downsampled_gt_depth
        .__get__(self_like))
    with torch.no_grad():
        t_loss = float(ref_mod.LSSViewTransformerBEVDepth.get_depth_loss(
            self_like, torch.tensor(gt), pred))

    from rcbevdet_tpu.models.view_transformer import depth_loss

    j_pred = jnp.asarray(
        np.moveaxis(pred.numpy(), 1, -1).reshape(
            b, n, h // downsample, w // downsample, num_d))
    j_loss = float(depth_loss(jnp.asarray(gt), j_pred, downsample,
                              depth_cfg, weight=3.0))
    np.testing.assert_allclose(j_loss, t_loss, rtol=1e-5)


# --------------------------------------------------------- radar BDA aug
def test_radar_points_bda_parity(rng):
    """Reference GlobalRotScaleTrans_radar order (rotate -> scale -> flip,
    transforms_3d.py:959-966) over the real RadarPoints ops
    (radar_points.py:29-99: velocities in dims 3:5 rotate/scale/flip with
    the points, degrees->radians quirk) vs core/boxes.py::bda_matrix +
    transform_radar_points_bda."""
    ref_mod = refshim.load_radar_points()

    n = 40
    pts = rng.standard_normal((n, 7)).astype(np.float32) * 4.0
    rot_deg = float(rng.uniform(-22.5, 22.5))
    scale = float(rng.uniform(0.95, 1.05))
    for flip_dx in (False, True):
        for flip_dy in (False, True):
            rp = ref_mod.RadarPoints(
                torch.tensor(pts.copy()), points_dim=7)
            rp.rotate(rot_deg / 180.0 * np.pi)   # _rot_bbox_points
            rp.scale(scale)                      # _scale_bbox_points
            if flip_dx:                          # _flip_bbox_points
                rp.flip("vertical")
            if flip_dy:
                rp.flip("horizontal")
            t_out = rp.tensor.numpy()

            from rcbevdet_tpu.core.boxes import (
                bda_matrix, transform_radar_points_bda,
            )

            bda = bda_matrix(rot_deg, scale, flip_dx, flip_dy)
            j_out = transform_radar_points_bda(pts.copy(), bda)
            np.testing.assert_allclose(j_out, t_out, rtol=1e-4, atol=1e-4,
                                       err_msg=f"{flip_dx} {flip_dy}")
