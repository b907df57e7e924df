"""Reference-checkpoint loader: RCBEVDet torch state_dict -> flax variables.

Maps the reference model's parameter names (BEVDepth4D_RC as built by
configs/rcbevdet/rcbevdet-256x704-r50-...py) onto this framework's flax tree
for per-layer parity validation against released checkpoints (SURVEY.md §7
step 1).  Rules are ordered regexes; tensors are layout-converted by
``convert_torch_state_dict`` and reshaped to the target leaf (handles
Conv1x1 -> Dense).

Usage:
  import torch
  sd = torch.load('rcbevdet-r50.pth', map_location='cpu')['state_dict']
  variables = load_reference_checkpoint(sd, variables)
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

import numpy as np

from .convert_torch import convert_torch_state_dict

# (regex, template) — template groups use \1 etc.; {P}/{B} expand to the
# params/batch_stats prefix chosen by the leaf kind.
_CAM = "camera/"

_BN_LEAF = {"weight": "scale", "bias": "bias",
            "running_mean": "mean", "running_var": "var"}
_CONV_LEAF = {"weight": "kernel", "bias": "bias"}


def _bn(torch_leaf):
    return _BN_LEAF.get(torch_leaf)


RULES: List[Tuple[str, str]] = [
    # ---- image backbone (ResNet) ----
    (r"^img_backbone\.conv1\.(weight)$", _CAM + "img_backbone/conv1/kernel"),
    (r"^img_backbone\.bn1\.(\w+)$", _CAM + "img_backbone/bn1/@bn1"),
    (r"^img_backbone\.layer(\d+)\.(\d+)\.conv(\d)\.weight$",
     _CAM + r"img_backbone/layer\1_\2/conv\3/kernel"),
    (r"^img_backbone\.layer(\d+)\.(\d+)\.bn(\d)\.(\w+)$",
     _CAM + r"img_backbone/layer\1_\2/bn\3/@bn4"),
    (r"^img_backbone\.layer(\d+)\.(\d+)\.downsample\.0\.weight$",
     _CAM + r"img_backbone/layer\1_\2/downsample_conv/kernel"),
    (r"^img_backbone\.layer(\d+)\.(\d+)\.downsample\.1\.(\w+)$",
     _CAM + r"img_backbone/layer\1_\2/downsample_bn/@bn3"),
    # ---- image backbone (ViT-L, models/backbones/vit.py:350-751:
    # SimpleFeaturePyramidForViT wrapping ViT; EVA-02 blocks with separate
    # q/k/v projections, q/v bias Parameters, SwiGLU mlp, simfp stages) ----
    (r"^img_backbone\.net\.patch_embed\.proj\.(weight|bias)$",
     _CAM + r"img_backbone/net/patch_embed/@conv1"),
    (r"^img_backbone\.net\.pos_embed$",
     _CAM + r"img_backbone/net/pos_embed"),
    (r"^img_backbone\.net\.blocks\.(\d+)\.norm(\d)\.(weight|bias)$",
     _CAM + r"img_backbone/net/block\1/norm\2/@ln3"),
    (r"^img_backbone\.net\.blocks\.(\d+)\.attn\.([qkv])_proj\.weight$",
     _CAM + r"img_backbone/net/block\1/\2_proj/kernel"),
    (r"^img_backbone\.net\.blocks\.(\d+)\.attn\.([qv])_bias$",
     _CAM + r"img_backbone/net/block\1/\2_proj/bias"),
    (r"^img_backbone\.net\.blocks\.(\d+)\.mlp\.w(\d)\.(weight|bias)$",
     _CAM + r"img_backbone/net/block\1/mlp/w\2/@dense3"),
    (r"^img_backbone\.net\.blocks\.(\d+)\.mlp\.ffn_ln\.(weight|bias)$",
     _CAM + r"img_backbone/net/block\1/mlp/ffn_ln/@ln2"),
    (r"^img_backbone\.net\.blocks\.(\d+)\.residual\.conv(\d)\.weight$",
     _CAM + r"img_backbone/net/block\1/residual/conv\2/kernel"),
    (r"^img_backbone\.net\.blocks\.(\d+)\.residual\.norm(\d)\.(weight|bias)$",
     _CAM + r"img_backbone/net/block\1/residual/norm\2/@ln3"),
    # rope cos/sin tables are deterministic buffers, rebuilt from config
    (r"^img_backbone\.net\.(?:blocks\.\d+\.attn\.)?rope(?:_win|_glb)?\."
     r"freqs_(?:cos|sin)$", "@skip"),
    (r"^img_backbone\.simfp_(\d+)\.(\d+)\.norm\.(weight|bias)$",
     "@simfp_norm"),
    (r"^img_backbone\.simfp_(\d+)\.(\d+)\.(weight|bias)$", "@simfp_conv"),
    # ---- image backbone (Swin, models/backbones/swin.py) ----
    (r"^img_backbone\.patch_embed\.projection\.(weight|bias)$",
     _CAM + r"img_backbone/patch_embed_proj/@conv1"),
    (r"^img_backbone\.patch_embed\.norm\.(weight|bias)$",
     _CAM + r"img_backbone/patch_embed_norm/@ln1"),
    (r"^img_backbone\.stages\.(\d+)\.blocks\.(\d+)\.norm(\d)\.(weight|bias)$",
     _CAM + r"img_backbone/stage\1_block\2/norm\3/@ln4"),
    (r"^img_backbone\.stages\.(\d+)\.blocks\.(\d+)\.attn\.w_msa\.relative_position_bias_table$",
     _CAM + r"img_backbone/stage\1_block\2/attn/relative_position_bias_table"),
    (r"^img_backbone\.stages\.(\d+)\.blocks\.(\d+)\.attn\.w_msa\.relative_position_index$",
     "@skip"),  # deterministic buffer, rebuilt from window size
    (r"^img_backbone\.stages\.(\d+)\.blocks\.(\d+)\.attn\.w_msa\.(qkv|proj)\.(weight|bias)$",
     _CAM + r"img_backbone/stage\1_block\2/attn/\3/@dense4"),
    (r"^img_backbone\.stages\.(\d+)\.blocks\.(\d+)\.ffn\.layers\.0\.0\.(weight|bias)$",
     _CAM + r"img_backbone/stage\1_block\2/ffn_fc1/@dense3"),
    (r"^img_backbone\.stages\.(\d+)\.blocks\.(\d+)\.ffn\.layers\.1\.(weight|bias)$",
     _CAM + r"img_backbone/stage\1_block\2/ffn_fc2/@dense3"),
    (r"^img_backbone\.stages\.(\d+)\.downsample\.norm\.(weight|bias)$",
     _CAM + r"img_backbone/downsample\1/norm/@ln2"),
    (r"^img_backbone\.stages\.(\d+)\.downsample\.reduction\.weight$",
     _CAM + r"img_backbone/downsample\1/reduction/kernel"),
    (r"^img_backbone\.norm(\d)\.(weight|bias)$",
     _CAM + r"img_backbone/out_norm\1/@ln2"),
    # ---- image backbone (ConvNeXt, models/backbones/convnext.py) ----
    (r"^img_backbone\.downsample_layers\.0\.0\.(weight|bias)$",
     _CAM + r"img_backbone/stem_conv/@conv1"),
    (r"^img_backbone\.downsample_layers\.0\.1\.(weight|bias)$",
     _CAM + r"img_backbone/stem_norm/@ln1"),
    (r"^img_backbone\.downsample_layers\.([123])\.0\.(weight|bias)$",
     _CAM + r"img_backbone/down\1_norm/@ln2"),
    (r"^img_backbone\.downsample_layers\.([123])\.1\.(weight|bias)$",
     _CAM + r"img_backbone/down\1_conv/@conv2"),
    (r"^img_backbone\.stages\.(\d+)\.(\d+)\.dwconv\.(weight|bias)$",
     _CAM + r"img_backbone/stage\1_block\2/dwconv/@conv3"),
    (r"^img_backbone\.stages\.(\d+)\.(\d+)\.norm\.(weight|bias)$",
     _CAM + r"img_backbone/stage\1_block\2/norm/@ln3"),
    (r"^img_backbone\.stages\.(\d+)\.(\d+)\.pwconv(\d)\.(weight|bias)$",
     _CAM + r"img_backbone/stage\1_block\2/pwconv\3/@dense4"),
    (r"^img_backbone\.stages\.(\d+)\.(\d+)\.gamma$",
     _CAM + r"img_backbone/stage\1_block\2/gamma"),
    # (img_backbone.norm{i} out-norms shared with the Swin rule above)
    # ---- image backbone (DLA, models/backbones/dla.py) ----
    # Sequential indices: base_layer/level conv levels are [conv,bn,relu]*n,
    # so torch index 3j is conv{j} and 3j+1 is bn{j}; Trees nest at most one
    # level deep in DLA-34 (levels table dla.py:306), enumerated explicitly.
    (r"^img_backbone\.base_layer\.0\.weight$",
     _CAM + "img_backbone/base_conv/kernel"),
    (r"^img_backbone\.base_layer\.1\.(\w+)$",
     _CAM + "img_backbone/base_bn/@bn1"),
    (r"^img_backbone\.level([01])\.0\.weight$",
     _CAM + r"img_backbone/level\1_conv0/kernel"),
    (r"^img_backbone\.level([01])\.1\.(\w+)$",
     _CAM + r"img_backbone/level\1_bn0/@bn2"),
    (r"^img_backbone\.level([01])\.3\.weight$",
     _CAM + r"img_backbone/level\1_conv1/kernel"),
    (r"^img_backbone\.level([01])\.4\.(\w+)$",
     _CAM + r"img_backbone/level\1_bn1/@bn2"),
    (r"^img_backbone\.level(\d)\.tree([12])\.conv([12])\.weight$",
     _CAM + r"img_backbone/level\1/tree\2/conv\3/kernel"),
    (r"^img_backbone\.level(\d)\.tree([12])\.bn([12])\.(\w+)$",
     _CAM + r"img_backbone/level\1/tree\2/bn\3/@bn4"),
    (r"^img_backbone\.level(\d)\.tree([12])\.tree([12])\.conv([12])\.weight$",
     _CAM + r"img_backbone/level\1/tree\2/tree\3/conv\4/kernel"),
    (r"^img_backbone\.level(\d)\.tree([12])\.tree([12])\.bn([12])\.(\w+)$",
     _CAM + r"img_backbone/level\1/tree\2/tree\3/bn\4/@bn5"),
    (r"^img_backbone\.level(\d)\.root\.conv\.weight$",
     _CAM + r"img_backbone/level\1/root/conv/kernel"),
    (r"^img_backbone\.level(\d)\.root\.bn\.(\w+)$",
     _CAM + r"img_backbone/level\1/root/bn/@bn2"),
    (r"^img_backbone\.level(\d)\.tree([12])\.root\.conv\.weight$",
     _CAM + r"img_backbone/level\1/tree\2/root/conv/kernel"),
    (r"^img_backbone\.level(\d)\.tree([12])\.root\.bn\.(\w+)$",
     _CAM + r"img_backbone/level\1/tree\2/root/bn/@bn3"),
    (r"^img_backbone\.level(\d)\.project\.0\.weight$",
     _CAM + r"img_backbone/level\1/project_conv/kernel"),
    (r"^img_backbone\.level(\d)\.project\.1\.(\w+)$",
     _CAM + r"img_backbone/level\1/project_bn/@bn2"),
    (r"^img_backbone\.level(\d)\.tree([12])\.project\.0\.weight$",
     _CAM + r"img_backbone/level\1/tree\2/project_conv/kernel"),
    (r"^img_backbone\.level(\d)\.tree([12])\.project\.1\.(\w+)$",
     _CAM + r"img_backbone/level\1/tree\2/project_bn/@bn3"),
    # ---- image neck (CustomFPN) ----
    (r"^img_neck\.lateral_convs\.(\d+)\.conv\.(weight|bias)$",
     _CAM + r"img_neck/lateral_\1/@conv2"),
    (r"^img_neck\.fpn_convs\.(\d+)\.conv\.(weight|bias)$",
     _CAM + r"img_neck/fpn_conv_\1/@conv2"),
    # ---- view transformer / DepthNet ----
    (r"^img_view_transformer\.depth_net\.reduce_conv\.0\.(weight|bias)$",
     _CAM + r"img_view_transformer/depth_net/reduce_conv/@conv1"),
    (r"^img_view_transformer\.depth_net\.reduce_conv\.1\.(\w+)$",
     _CAM + r"img_view_transformer/depth_net/reduce_bn/@bn1"),
    (r"^img_view_transformer\.depth_net\.bn\.(\w+)$",
     _CAM + r"img_view_transformer/depth_net/param_bn/@bn1"),
    (r"^img_view_transformer\.depth_net\.(depth|context)_mlp\.fc(\d)\.(weight|bias)$",
     _CAM + r"img_view_transformer/depth_net/\1_mlp/fc\2/@dense3"),
    (r"^img_view_transformer\.depth_net\.(depth|context)_se\.conv_(reduce|expand)\.(weight|bias)$",
     _CAM + r"img_view_transformer/depth_net/\1_se/conv_\2/@dense3"),
    (r"^img_view_transformer\.depth_net\.context_conv\.(weight|bias)$",
     _CAM + r"img_view_transformer/depth_net/context_conv/@conv1"),
    # BEVStereo DepthNet extras (reference view_transformer.py:505-517):
    # two stride-2 cost-volume conv-BNs + the biased 1x1 downsample
    # shortcut on the first depth block
    (r"^img_view_transformer\.depth_net\.cost_volumn_net\.0\.(weight|bias)$",
     _CAM + r"img_view_transformer/depth_net/cv_conv0/@conv1"),
    (r"^img_view_transformer\.depth_net\.cost_volumn_net\.1\.(\w+)$",
     _CAM + r"img_view_transformer/depth_net/cv_bn0/@bn1"),
    (r"^img_view_transformer\.depth_net\.cost_volumn_net\.2\.(weight|bias)$",
     _CAM + r"img_view_transformer/depth_net/cv_conv1/@conv1"),
    (r"^img_view_transformer\.depth_net\.cost_volumn_net\.3\.(\w+)$",
     _CAM + r"img_view_transformer/depth_net/cv_bn1/@bn1"),
    (r"^img_view_transformer\.depth_net\.depth_conv\.0\.downsample\.(weight|bias)$",
     _CAM + r"img_view_transformer/depth_net/depth_block0/downsample/@conv1"),
    (r"^img_view_transformer\.depth_net\.depth_conv\.([012])\.conv(\d)\.weight$",
     _CAM + r"img_view_transformer/depth_net/depth_block\1/conv\2/kernel"),
    (r"^img_view_transformer\.depth_net\.depth_conv\.([012])\.bn(\d)\.(\w+)$",
     _CAM + r"img_view_transformer/depth_net/depth_block\1/bn\2/@bn3"),
    (r"^img_view_transformer\.depth_net\.depth_conv\.3\.aspp(\d)\.atrous_conv\.weight$",
     _CAM + r"img_view_transformer/depth_net/aspp/aspp\1_conv/kernel"),
    (r"^img_view_transformer\.depth_net\.depth_conv\.3\.aspp(\d)\.bn\.(\w+)$",
     _CAM + r"img_view_transformer/depth_net/aspp/aspp\1_bn/@bn2"),
    (r"^img_view_transformer\.depth_net\.depth_conv\.3\.global_avg_pool\.1\.weight$",
     _CAM + r"img_view_transformer/depth_net/aspp/gap_conv/kernel"),
    (r"^img_view_transformer\.depth_net\.depth_conv\.3\.global_avg_pool\.2\.(\w+)$",
     _CAM + r"img_view_transformer/depth_net/aspp/gap_bn/@bn1"),
    (r"^img_view_transformer\.depth_net\.depth_conv\.3\.conv1\.weight$",
     _CAM + r"img_view_transformer/depth_net/aspp/out_conv/kernel"),
    (r"^img_view_transformer\.depth_net\.depth_conv\.3\.bn1\.(\w+)$",
     _CAM + r"img_view_transformer/depth_net/aspp/out_bn/@bn1"),
    (r"^img_view_transformer\.depth_net\.depth_conv\.4\.(weight|bias)$",
     _CAM + r"img_view_transformer/depth_net/depth_pred/@conv1"),
    # ---- pre_process + BEV encoder ----
    (r"^pre_process_net\.layers\.0\.(\d+)\.conv(\d)\.weight$",
     _CAM + r"pre_process/layer0_\1/conv\2/kernel"),
    (r"^pre_process_net\.layers\.0\.(\d+)\.bn(\d)\.(\w+)$",
     _CAM + r"pre_process/layer0_\1/bn\2/@bn3"),
    (r"^pre_process_net\.layers\.0\.(\d+)\.downsample\.(weight|bias)$",
     _CAM + r"pre_process/layer0_\1/downsample/@conv2"),
    (r"^img_bev_encoder_backbone\.layers\.(\d+)\.(\d+)\.conv(\d)\.weight$",
     r"img_bev_encoder_backbone/layer\1_\2/conv\3/kernel"),
    (r"^img_bev_encoder_backbone\.layers\.(\d+)\.(\d+)\.bn(\d)\.(\w+)$",
     r"img_bev_encoder_backbone/layer\1_\2/bn\3/@bn4"),
    (r"^img_bev_encoder_backbone\.layers\.(\d+)\.(\d+)\.downsample\.(weight|bias)$",
     r"img_bev_encoder_backbone/layer\1_\2/downsample/@conv3"),
    (r"^img_bev_encoder_neck\.conv\.0\.weight$", r"img_bev_encoder_neck/conv1/kernel"),
    (r"^img_bev_encoder_neck\.conv\.1\.(\w+)$", r"img_bev_encoder_neck/bn1/@bn1"),
    (r"^img_bev_encoder_neck\.conv\.3\.weight$", r"img_bev_encoder_neck/conv2/kernel"),
    (r"^img_bev_encoder_neck\.conv\.4\.(\w+)$", r"img_bev_encoder_neck/bn2/@bn1"),
    (r"^img_bev_encoder_neck\.up2\.1\.weight$", r"img_bev_encoder_neck/up2_conv/kernel"),
    (r"^img_bev_encoder_neck\.up2\.2\.(\w+)$", r"img_bev_encoder_neck/up2_bn/@bn1"),
    (r"^img_bev_encoder_neck\.up2\.4\.(weight|bias)$",
     r"img_bev_encoder_neck/up2_out/@conv1"),
    # ---- radar encoder ----
    (r"^radar_voxel_encoder\.point_block\.(\d+)\.linear\.weight$",
     r"radar_voxel_encoder/rfn\1/linear/kernel"),
    (r"^radar_voxel_encoder\.point_block\.(\d+)\.norm\.(\w+)$",
     r"radar_voxel_encoder/rfn\1/norm/@bn2"),
    (r"^radar_voxel_encoder\.point_embed\.conv1\.0\.(weight|bias)$",
     r"radar_voxel_encoder/point_embed/conv1_0/@dense1"),
    (r"^radar_voxel_encoder\.point_embed\.conv1\.1\.(\w+)$",
     r"radar_voxel_encoder/point_embed/conv1_bn/@bn1"),
    (r"^radar_voxel_encoder\.point_embed\.conv1\.3\.(weight|bias)$",
     r"radar_voxel_encoder/point_embed/conv1_1/@dense1"),
    (r"^radar_voxel_encoder\.point_embed\.conv2\.0\.(weight|bias)$",
     r"radar_voxel_encoder/point_embed/conv2_0/@dense1"),
    (r"^radar_voxel_encoder\.point_embed\.conv2\.1\.(\w+)$",
     r"radar_voxel_encoder/point_embed/conv2_bn/@bn1"),
    (r"^radar_voxel_encoder\.point_embed\.conv2\.3\.(weight|bias)$",
     r"radar_voxel_encoder/point_embed/conv2_1/@dense1"),
    (r"^radar_voxel_encoder\.pos_embed\.0\.(weight|bias)$",
     r"radar_voxel_encoder/pos_embed_fc1/@dense1"),
    (r"^radar_voxel_encoder\.pos_embed\.1\.(weight|bias)$",
     r"radar_voxel_encoder/pos_embed_ln1/@ln1"),
    (r"^radar_voxel_encoder\.pos_embed\.3\.(weight|bias)$",
     r"radar_voxel_encoder/pos_embed_fc2/@dense1"),
    (r"^radar_voxel_encoder\.pos_embed\.4\.(weight|bias)$",
     r"radar_voxel_encoder/pos_embed_ln2/@ln1"),
    (r"^radar_voxel_encoder\.(injector|extractor)\.(\d+)\.(query_norm|feat_norm)\.(weight|bias)$",
     r"radar_voxel_encoder/\g<1>\2/\3/@ln4"),
    (r"^radar_voxel_encoder\.(injector|extractor)\.(\d+)\.attn\.(kv|q|proj)\.(weight|bias)$",
     r"radar_voxel_encoder/\g<1>\2/attn/\3/@dense4"),
    (r"^radar_voxel_encoder\.injector\.(\d+)\.gamma$",
     r"radar_voxel_encoder/injector\1/gamma"),
    (r"^radar_voxel_encoder\.extractor\.(\d+)\.ffn_norm\.(weight|bias)$",
     r"radar_voxel_encoder/extractor\1/ffn_norm/@ln2"),
    (r"^radar_voxel_encoder\.extractor\.(\d+)\.ffn\.fc(\d)\.(weight|bias)$",
     r"radar_voxel_encoder/extractor\1/ffn_fc\2/@dense3"),
    (r"^radar_voxel_encoder\.transformer_block\.(\d+)\.query_norm\.(weight|bias)$",
     r"radar_voxel_encoder/transformer\1/query_norm/@ln2"),
    (r"^radar_voxel_encoder\.transformer_block\.(\d+)\.ffn_norm\.(weight|bias)$",
     r"radar_voxel_encoder/transformer\1/ffn_norm/@ln2"),
    (r"^radar_voxel_encoder\.transformer_block\.(\d+)\.ffn\.fc(\d)\.(weight|bias)$",
     r"radar_voxel_encoder/transformer\1/ffn_fc\2/@dense3"),
    (r"^radar_voxel_encoder\.transformer_block\.(\d+)\.attn\.beta\.(weight|bias)$",
     r"radar_voxel_encoder/transformer\1/attn/beta/@dense2"),
    (r"^radar_voxel_encoder\.transformer_block\.(\d+)\.attn\.attention\.attn\.in_proj_(weight|bias)$",
     r"radar_voxel_encoder/transformer\1/attn/attention/in_proj_\2"),
    (r"^radar_voxel_encoder\.transformer_block\.(\d+)\.attn\.attention\.attn\.out_proj\.(weight|bias)$",
     r"radar_voxel_encoder/transformer\1/attn/attention/out_proj/@dense2"),
    (r"^radar_voxel_encoder\.linear_module\.(\d+)\.(weight|bias)$",
     r"radar_voxel_encoder/linear\1/@dense2"),
    (r"^radar_voxel_encoder\.out_linear\.(weight|bias)$",
     r"radar_voxel_encoder/out_linear/@dense1"),
    # ---- radar scatter / backbone / neck ----
    (r"^radar_middle_encoder\.compress\.(weight|bias)$",
     r"radar_middle_encoder/compress/@conv1"),
    (r"^radar_middle_encoder\.rcs_att\.(weight|bias)$",
     r"radar_middle_encoder/rcs_att/@conv1"),
    (r"^radar_bev_backbone\.blocks\.(\d+)\.(\d+)\.weight$",
     "@second_conv"),
    (r"^radar_bev_backbone\.blocks\.(\d+)\.(\d+)\.(\w+)$",
     "@second_bn"),
    (r"^radar_bev_neck\.deblocks\.(\d+)\.0\.weight$",
     r"radar_bev_neck/deblock_\1_@deconv_or_conv/kernel"),
    (r"^radar_bev_neck\.deblocks\.(\d+)\.1\.(\w+)$",
     r"radar_bev_neck/deblock_\1_bn/@bn2"),
    # ---- CAMF ----
    (r"^DeformAttn(\d)\.(sampling_offsets|attention_weights|value_proj|output_proj)\.(weight|bias)$",
     r"camf/deform_attn\1/\2/@dense3"),
    (r"^LearnedPositionalEncoding(\d)\.(row|col)_embed\.weight$",
     r"camf/pos\1/\2_embed"),
    (r"^radar_reduc_conv\.conv\.weight$", r"camf/radar_reduc_conv/kernel"),
    (r"^radar_reduc_conv\.bn\.(\w+)$", r"camf/radar_reduc_bn/@bn1"),
    (r"^RadarConvFuser_fuse\.fuse_conv\.0\.weight$", r"camf/fuser/fuse_conv/kernel"),
    (r"^RadarConvFuser_fuse\.fuse_conv\.1\.(\w+)$", r"camf/fuser/fuse_bn/@bn1"),
    (r"^RadarConvFuser_fuse\.deconv\.(\d+)\.0\.weight$",
     r"camf/fuser/deconv\1_conv/kernel"),
    (r"^RadarConvFuser_fuse\.deconv\.(\d+)\.1\.(\w+)$",
     r"camf/fuser/deconv\1_bn/@bn2"),
    # ---- head ----
    # --- HoP BiTemporalPredictor (history_decoder, temporal_backbone.py
    # :152-336 + temporal_cross_attention.py) ---
    (r"^history_decoder\.proj\.0\.(weight)$",
     r"history_decoder/proj_conv/@conv1"),
    (r"^history_decoder\.proj\.1\.(weight|bias)$",
     r"history_decoder/proj_ln/@ln1"),
    (r"^history_decoder\.frame_embeds$",
     r"history_decoder/frame_embeds"),
    (r"^history_decoder\.queries_(long|short)\.weight$",
     r"history_decoder/queries_\1"),
    (r"^history_decoder\.input_proj\.0\.(weight|bias)$",
     r"history_decoder/input_proj/@dense1"),
    (r"^history_decoder\.input_proj\.1\.(weight|bias)$",
     r"history_decoder/input_proj_ln/@ln1"),
    (r"^history_decoder\.output_proj\.0\.(weight)$",
     r"history_decoder/output_conv/@conv1"),
    (r"^history_decoder\.output_proj\.1\.(weight|bias)$",
     r"history_decoder/output_ln/@ln1"),
    (r"^history_decoder\.decoder_(long|short)\.layers\.(\d)\.attentions\.0"
     r"\.(sampling_offsets|attention_weights|value_proj|output_proj)"
     r"\.(weight|bias)$",
     r"history_decoder/\1_layer\2/\3/@dense4"),
    (r"^history_decoder\.decoder_(long|short)\.layers\.(\d)\.ffns\.0"
     r"\.layers\.0\.0\.(weight|bias)$",
     r"history_decoder/\1_layer\2/ffn_fc1/@dense3"),
    (r"^history_decoder\.decoder_(long|short)\.layers\.(\d)\.ffns\.0"
     r"\.layers\.1\.(weight|bias)$",
     r"history_decoder/\1_layer\2/ffn_fc2/@dense3"),
    (r"^history_decoder\.decoder_(long|short)\.layers\.(\d)\.norms"
     r"\.([01])\.(weight|bias)$",
     r"history_decoder/\1_layer\2/norm\3/@ln4"),
    (r"^pts_bbox_head\.shared_conv\.conv\.weight$",
     r"pts_bbox_head/shared_conv/kernel"),
    (r"^pts_bbox_head\.shared_conv\.bn\.(\w+)$", r"pts_bbox_head/shared_bn/@bn1"),
    (r"^pts_bbox_head\.task_heads\.0\.(\w+)\.0\.conv\.weight$",
     r"pts_bbox_head/task0/\1_conv0/kernel"),
    (r"^pts_bbox_head\.task_heads\.0\.(\w+)\.0\.bn\.(\w+)$",
     r"pts_bbox_head/task0/\1_bn0/@bn2"),
    (r"^pts_bbox_head\.task_heads\.0\.(\w+)\.1\.(weight|bias)$",
     r"pts_bbox_head/task0/\1_final/@conv2"),
]


def map_reference_key(key: str, second_layer_nums=(3, 5, 5)) -> Optional[Tuple[str, ...]]:
    """Translate one torch state_dict key to a flax path tuple (without the
    params/batch_stats root), or None if unmapped."""
    for pattern, template in RULES:
        m = re.match(pattern, key)
        if not m:
            continue
        groups = m.groups()
        if template == "@second_conv":
            blk, seq = int(groups[0]), int(groups[1])
            if seq % 3 != 0:  # a BN 'weight' (scale), not a conv kernel
                return (
                    "radar_bev_backbone", f"block{blk}_bn{seq // 3}", "scale"
                )
            return ("radar_bev_backbone", f"block{blk}_conv{seq // 3}", "kernel")
        if template == "@second_bn":
            blk, seq, leaf = int(groups[0]), int(groups[1]), groups[2]
            if seq % 3 != 1 or _bn(leaf) is None:
                return None  # not a BN slot / num_batches_tracked
            return (
                "radar_bev_backbone", f"block{blk}_bn{seq // 3}", _bn(leaf)
            )
        if template in ("@simfp_conv", "@simfp_norm"):
            # SimpleFeaturePyramid stage Sequentials (vit.py:625-667): the
            # torch module index within simfp_<stage> depends on the
            # stage's scale factor; map to this repo's named modules.
            stage, idx, leaf = int(groups[0]), int(groups[1]), groups[2]
            names_by_stage = {
                2: {0: "up1", 1: "ln_up", 3: "up2", 4: "lateral", 5: "out"},
                3: {0: "up1", 1: "lateral", 2: "out"},
                4: {0: "lateral", 1: "out"},
                5: {1: "lateral", 2: "out"},
            }
            local = names_by_stage.get(stage, {}).get(idx)
            if local is None:
                return None
            if template == "@simfp_norm":
                local = {"lateral": "lateral_ln", "out": "out_ln"}[local]
            if local in ("ln_up", "lateral_ln", "out_ln"):
                leaf = {"weight": "scale", "bias": "bias"}[leaf]
            else:
                leaf = {"weight": "kernel", "bias": "bias"}[leaf]
            return ("camera", "img_backbone", f"simfp_{stage}_{local}", leaf)
        out = template
        # positional group substitution
        for gi, g in enumerate(groups, start=1):
            out = out.replace(f"\\g<{gi}>", g if g else "")
            out = out.replace(f"\\{gi}", g if g else "")
        # leaf-kind markers: @bnN / @convN / @denseN / @lnN consume group N
        marker = re.search(r"@(bn|conv|dense|ln)(\d)", out)
        if marker:
            kind, gn = marker.group(1), int(marker.group(2))
            leaf = groups[gn - 1]
            if kind == "bn":
                leaf_name = _bn(leaf)
                if leaf_name is None:
                    return None  # num_batches_tracked etc.
            elif kind == "ln":
                leaf_name = {"weight": "scale", "bias": "bias"}[leaf]
            else:
                leaf_name = _CONV_LEAF[leaf]
            out = out.replace(marker.group(0), leaf_name)
        if out.startswith("@skip"):
            return "@skip"  # deliberately-unloaded key (deterministic buffer)
        if "@deconv_or_conv" in out:
            out = out.replace("@deconv_or_conv/kernel", "deconv/kernel")
        return tuple(out.split("/"))
    return None


def _is_stats(path):
    return path[-1] in ("mean", "var")


def load_reference_checkpoint(state_dict, variables, strict=False,
                              verbose=False):
    """Load a reference torch state_dict into flax variables.

    Returns (new_variables, report) where report lists unmapped source keys
    and untouched target leaves.
    """
    import flax

    converted = convert_torch_state_dict(state_dict)
    flat = flax.traverse_util.flatten_dict(variables)
    touched = set()
    unmapped = []
    for key, arr in converted.items():
        path = map_reference_key(key)
        if path == "@skip":
            continue
        if path is None:
            if not key.endswith("num_batches_tracked"):
                unmapped.append(key)
            continue
        root = "batch_stats" if _is_stats(path) else "params"
        full = (root,) + path
        # SECONDFPN stride-1 level uses a plain conv, not a deconv
        if full not in flat and "deconv" in full[-2]:
            alt = full[:-2] + (full[-2].replace("deconv", "conv"), full[-1])
            if alt in flat:
                full = alt
                # plain conv: torch OIHW already converted to HWIO; ok
        if full not in flat:
            unmapped.append(key)
            continue
        target = flat[full]
        if arr.shape != target.shape:
            if arr.size == target.size:
                arr = arr.reshape(target.shape)
            else:
                raise ValueError(
                    f"{key} -> {'/'.join(full)}: shape {arr.shape} vs "
                    f"{target.shape}"
                )
        flat[full] = np.asarray(arr, dtype=np.asarray(target).dtype)
        touched.add(full)
    untouched = [p for p in flat if p not in touched and p[0] == "params"]
    if strict and (unmapped or untouched):
        raise ValueError(f"unmapped={unmapped[:10]} untouched={untouched[:10]}")
    if verbose:
        print(f"loaded {len(touched)} tensors; "
              f"{len(unmapped)} unmapped source keys; "
              f"{len(untouched)} untouched target params")
    return flax.traverse_util.unflatten_dict(flat), dict(
        unmapped=unmapped, untouched=untouched, loaded=len(touched)
    )
