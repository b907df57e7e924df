# Tiny smoke-test config: full RCBEVDet architecture at toy scale.
# For CI / CPU smoke runs (--synthetic) and quick CLI verification; NOT a
# benchmark config.
_base_ = ["./rcbevdet-256x704-r50-BEV128-9kf-depth-cbgs12e.py"]

point_cloud_range = [-8.0, -8.0, -5.0, 8.0, 8.0, 3.0]

grid_config = dict(
    x=[-8.0, 8.0, 1.0],
    y=[-8.0, 8.0, 1.0],
    z=[-5, 3, 8],
    depth=[1.0, 9.0, 0.5],
)

data_config = dict(input_size=(64, 176))

model = dict(
    num_adj=1,
    input_size=(64, 176),
    resnet_depth=18,
    img_neck_channels=64,
    num_trans_channels=16,
    grid_config=grid_config,
    aspp_mid_channels=16,
    radar_feat_channels=[8, 16],
    radar_voxel_size=[0.25, 0.25, 8],
    point_cloud_range=point_cloud_range,
    radar_max_pillars=64,
    radar_max_points_per_pillar=4,
    radar_canvas=[64, 64],
    radar_second_channels=[16, 32, 64],
    radar_second_layers=[1, 1, 1],
    radar_fpn_channels=[16, 16, 16],
    imc=64,
    bev_size=16,
)

multi_adj_frame_id_cfg = (1, 2, 1)

data = dict(samples_per_gpu=2, radar_max_num=96)

train_cfg = dict(grid_size=[128, 128, 40], voxel_size=[0.125, 0.125, 0.2])

test_cfg = dict(
    pc_range=point_cloud_range[:2],
    post_center_limit_range=[-10.0, -10.0, -10.0, 10.0, 10.0, 10.0],
    voxel_size=[0.125, 0.125],
)

runner = dict(max_epochs=1)
load_from = None
