"""Reference-checkpoint name mapping: every curated reference key must land
on an existing leaf of the (tiny) RCBEVDet variables tree."""

import flax
import jax
import numpy as np
import pytest

from rcbevdet_tpu.models import RCBEVDet
from rcbevdet_tpu.utils.load_reference import (
    load_reference_checkpoint,
    map_reference_key,
)
from tests.test_models import tiny_batch, tiny_config

REPRESENTATIVE_KEYS = [
    "img_backbone.conv1.weight",
    "img_backbone.bn1.weight",
    "img_backbone.bn1.running_mean",
    "img_backbone.layer1.0.conv1.weight",
    "img_backbone.layer2.0.downsample.0.weight",
    "img_backbone.layer2.0.downsample.1.running_var",
    "img_neck.lateral_convs.0.conv.weight",
    "img_neck.fpn_convs.0.conv.bias",
    "img_view_transformer.depth_net.reduce_conv.0.weight",
    "img_view_transformer.depth_net.reduce_conv.1.running_mean",
    "img_view_transformer.depth_net.bn.weight",
    "img_view_transformer.depth_net.depth_mlp.fc1.weight",
    "img_view_transformer.depth_net.context_se.conv_reduce.weight",
    "img_view_transformer.depth_net.context_conv.bias",
    "img_view_transformer.depth_net.depth_conv.0.conv1.weight",
    "img_view_transformer.depth_net.depth_conv.2.bn2.running_var",
    "img_view_transformer.depth_net.depth_conv.3.aspp2.atrous_conv.weight",
    "img_view_transformer.depth_net.depth_conv.3.global_avg_pool.1.weight",
    "img_view_transformer.depth_net.depth_conv.3.conv1.weight",
    "img_view_transformer.depth_net.depth_conv.4.weight",
    "pre_process_net.layers.0.0.conv1.weight",
    "pre_process_net.layers.0.0.downsample.bias",
    "img_bev_encoder_backbone.layers.1.0.downsample.weight",
    "img_bev_encoder_neck.conv.0.weight",
    "img_bev_encoder_neck.up2.4.bias",
    "radar_voxel_encoder.point_block.0.linear.weight",
    "radar_voxel_encoder.point_block.1.norm.running_mean",
    "radar_voxel_encoder.point_embed.conv1.0.weight",
    "radar_voxel_encoder.point_embed.conv2.3.bias",
    "radar_voxel_encoder.pos_embed.0.weight",
    "radar_voxel_encoder.pos_embed.4.bias",
    "radar_voxel_encoder.injector.0.gamma",
    "radar_voxel_encoder.injector.1.attn.kv.weight",
    "radar_voxel_encoder.extractor.0.ffn.fc1.weight",
    "radar_voxel_encoder.extractor.1.query_norm.bias",
    "radar_voxel_encoder.transformer_block.0.attn.beta.bias",
    "radar_voxel_encoder.transformer_block.1.attn.attention.attn.in_proj_weight",
    "radar_voxel_encoder.transformer_block.1.attn.attention.attn.out_proj.weight",
    "radar_voxel_encoder.linear_module.0.weight",
    "radar_voxel_encoder.out_linear.bias",
    "radar_middle_encoder.compress.weight",
    "radar_middle_encoder.rcs_att.bias",
    "radar_bev_backbone.blocks.0.0.weight",
    "radar_bev_backbone.blocks.1.4.running_mean",
    "radar_bev_neck.deblocks.2.0.weight",
    "radar_bev_neck.deblocks.0.1.running_var",
    "DeformAttn1.sampling_offsets.weight",
    "DeformAttn2.output_proj.bias",
    "LearnedPositionalEncoding1.row_embed.weight",
    "radar_reduc_conv.conv.weight",
    "radar_reduc_conv.bn.running_mean",
    "RadarConvFuser_fuse.fuse_conv.0.weight",
    "RadarConvFuser_fuse.deconv.2.1.weight",
    "pts_bbox_head.shared_conv.conv.weight",
    "pts_bbox_head.task_heads.0.heatmap.0.conv.weight",
    "pts_bbox_head.task_heads.0.reg.1.bias",
    "pts_bbox_head.task_heads.0.vel.0.bn.running_var",
]


@pytest.fixture(scope="module")
def tiny_variables():
    cfg = tiny_config(use_radar=True)
    model = RCBEVDet(cfg)
    rng = np.random.default_rng(0)
    batch = tiny_batch(rng, cfg)
    return model.init(jax.random.PRNGKey(0), batch, train=False)


def test_all_representative_keys_map(tiny_variables):
    flat = flax.traverse_util.flatten_dict(tiny_variables)
    missing = []
    for key in REPRESENTATIVE_KEYS:
        path = map_reference_key(key)
        assert path is not None, f"unmapped: {key}"
        root = "batch_stats" if path[-1] in ("mean", "var") else "params"
        full = (root,) + path
        if full not in flat:
            if "deconv" in full[-2]:
                alt = full[:-2] + (full[-2].replace("deconv", "conv"), full[-1])
                if alt in flat:
                    continue
            missing.append((key, "/".join(full)))
    assert not missing, missing


def test_load_reference_tensors(tiny_variables):
    import flax as _f

    flat = _f.traverse_util.flatten_dict(tiny_variables)
    k_conv = ("params", "camera", "img_backbone", "conv1", "kernel")
    k_bn = ("batch_stats", "camera", "img_backbone", "bn1", "mean")
    h, w, cin, cout = flat[k_conv].shape
    sd = {
        # torch conv layout OIHW
        "img_backbone.conv1.weight": np.arange(
            cout * cin * h * w, dtype=np.float32
        ).reshape(cout, cin, h, w),
        "img_backbone.bn1.running_mean": np.full(
            flat[k_bn].shape, 7.0, np.float32
        ),
        "img_backbone.bn1.num_batches_tracked": np.zeros(1),
        "some.unknown.key": np.zeros(3),
    }
    new_vars, report = load_reference_checkpoint(sd, tiny_variables)
    assert report["loaded"] == 2
    assert report["unmapped"] == ["some.unknown.key"]
    new_flat = _f.traverse_util.flatten_dict(new_vars)
    np.testing.assert_allclose(
        np.asarray(new_flat[k_conv]),
        sd["img_backbone.conv1.weight"].transpose(2, 3, 1, 0),
    )
    np.testing.assert_allclose(np.asarray(new_flat[k_bn]), 7.0)
