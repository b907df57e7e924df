# RCBEVDet-R50 radar-camera config — the headline experiment.
# Public-surface counterpart of the reference's
# configs/rcbevdet/rcbevdet-256x704-r50-BEV128-9kf-depth-cbgs12e-circlelarger.py
# (same hyper-parameters; structure adapted to the TPU-native builders).
_base_ = ["../_base_/nus-3d.py", "../_base_/default_runtime.py"]

point_cloud_range = [-51.2, -51.2, -5.0, 51.2, 51.2, 3.0]
radar_voxel_size = [0.2, 0.2, 8]
voxel_size = [0.1, 0.1, 0.2]
numC_Trans = 80
multi_adj_frame_id_cfg = (1, 9, 1)  # 8 adjacent frames

data_config = dict(
    cams=[
        "CAM_FRONT_LEFT", "CAM_FRONT", "CAM_FRONT_RIGHT",
        "CAM_BACK_LEFT", "CAM_BACK", "CAM_BACK_RIGHT",
    ],
    input_size=(256, 704),
    src_size=(900, 1600),
    resize=(-0.06, 0.11),
    rot=(-5.4, 5.4),
    flip=True,
    crop_h=(0.0, 0.0),
    resize_test=0.0,
)

grid_config = dict(
    x=[-51.2, 51.2, 0.8],
    y=[-51.2, 51.2, 0.8],
    z=[-5, 3, 8],
    depth=[1.0, 60.0, 0.5],
)

model = dict(
    type="RCBEVDet",
    freeze_img=True,
    use_radar=True,
    num_adj=8,
    input_size=data_config["input_size"],
    resnet_depth=50,
    img_neck_channels=512,
    num_trans_channels=numC_Trans,
    grid_config=grid_config,
    aspp_mid_channels=96,
    radar_in_channels=7,
    radar_feat_channels=[32, 64],
    radar_voxel_size=radar_voxel_size,
    point_cloud_range=point_cloud_range,
    radar_max_pillars=1200,
    radar_max_points_per_pillar=10,
    radar_canvas=[512, 512],
    radar_second_channels=[64, 128, 256],
    radar_second_layers=[3, 5, 5],
    radar_fpn_channels=[128, 128, 128],
    imc=256,
    bev_size=128,
    num_classes=10,
)

bda_aug_conf = dict(
    rot_lim=(-22.5, 22.5), scale_lim=(0.95, 1.05),
    flip_dx_ratio=0.5, flip_dy_ratio=0.5,
)

data = dict(
    samples_per_gpu=8,
    workers_per_gpu=8,
    cbgs=True,
    radar_sweeps=8,
    radar_max_num=1200,
    train=dict(ann_file="data/nuscenes/nuscenes_RC_infos_train.pkl"),
    val=dict(ann_file="data/nuscenes/nuscenes_RC_infos_val.pkl"),
    test=dict(ann_file="data/nuscenes/nuscenes_RC_infos_val.pkl"),
)

train_cfg = dict(
    grid_size=[1024, 1024, 40],
    voxel_size=voxel_size,
    out_size_factor=8,
    gaussian_overlap=0.1,
    max_objs=500,
    min_radius=2,
    code_weights=[1.0] * 10,
)

test_cfg = dict(
    pc_range=point_cloud_range[:2],
    post_center_limit_range=[-61.2, -61.2, -10.0, 61.2, 61.2, 10.0],
    max_per_img=500,
    score_threshold=0.1,
    out_size_factor=8,
    voxel_size=voxel_size[:2],
    pre_max_size=1000,
    post_max_size=500,
    nms_type="rotate",
    nms_thr=0.2,
    nms_rescale_factor=[1.0, 0.7, 0.7, 0.4, 0.55, 1.1, 1.0, 1.0, 1.5, 3.5],
)

optimizer = dict(type="AdamW", lr=1e-4, weight_decay=1e-2)
optimizer_config = dict(grad_clip=dict(max_norm=5, norm_type=2))
lr_config = dict(
    policy="cyclic", target_ratio=(10, 0.0001), cyclic_times=1, step_ratio_up=0.4
)
momentum_config = dict(
    policy="cyclic", target_ratio=(0.8947368421052632, 1), cyclic_times=1,
    step_ratio_up=0.4,
)
runner = dict(type="EpochBasedRunner", max_epochs=12)
evaluation = dict(interval=4)
# TPU train-path levers (ROADMAP r5): loader-precomputed static-capacity
# LSS pooling tables (42 -> ~6 ms/step of pooling) — bit-exact vs the
# dense pool; bf16 frozen-camera forward is opt-in via
# model.train_camera_dtype = "bfloat16" (loss-curve A/B-tested).
lss_pool_meta = True
ema = dict(enabled=True, decay=0.999, init_updates=10560)
sequential_control = dict(temporal_start_epoch=-1)
load_from = "checkpoint/det-256x704-r50-BEV128-9kf-depth.ckpt"
