# RCBEVDet with VoVNet V2-99 backbone + temporal stereo — the test-set
# configuration family (reference README test table: RCBEVDet C+R V2-99,
# NDS 63.9 / mAP 55.0, no future frames).
_base_ = ["./rcbevdet-256x704-r50-BEV128-9kf-depth-cbgs12e.py"]

model = dict(
    img_backbone_type="vovnet",
    vovnet_spec="V-99",
    img_neck_channels=512,
    stereo=True,
)
