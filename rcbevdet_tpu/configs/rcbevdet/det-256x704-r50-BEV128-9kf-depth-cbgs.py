# Camera-only BEVDepth4D baseline (counterpart of the reference's
# configs/rcbevdet/det-256x704-r50-BEV128-9kf-depth-cbgs12e-circlelarger.py).
_base_ = ["./rcbevdet-256x704-r50-BEV128-9kf-depth-cbgs12e.py"]

model = dict(
    use_radar=False,
    freeze_img=False,
)

# The reference counterpart ships Scale-NMS (nms_type=['rotate'],
# det-...-circlelarger.py:150) despite the file name; min_radius is the
# per-task squared-distance list used only when nms_type='circle'.
test_cfg = dict(
    nms_type="rotate",
    min_radius=[4, 12, 10, 1, 0.85, 0.175],
)

runner = dict(max_epochs=8)
load_from = None
