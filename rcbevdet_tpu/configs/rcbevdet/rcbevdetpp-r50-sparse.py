# RCBEVDet++ sparse-query detector (README test-table model family; the
# reference repo ships only its msmv_sampling op — "code not in repo").
# Camera-only R50 pyramid -> SparseBEV-style decoder (models/rcbevdetpp.py).
_base_ = ["../_base_/default_runtime.py"]

point_cloud_range = [-51.2, -51.2, -5.0, 51.2, 51.2, 3.0]

model = dict(
    type="RCBEVDetPlusPlus",
    resnet_depth=50,
    dim=256,
    num_queries=900,
    num_layers=6,
    num_classes=10,
    num_points=8,
    point_cloud_range=point_cloud_range,
)

data_config = dict(
    cams=["CAM_FRONT_LEFT", "CAM_FRONT", "CAM_FRONT_RIGHT",
          "CAM_BACK_LEFT", "CAM_BACK", "CAM_BACK_RIGHT"],
    input_size=(256, 704),
)
