# nuScenes 3D detection base (counterpart of the reference's
# configs/_base_/datasets/nus-3d.py — only the keys our pipeline consumes).
point_cloud_range = [-51.2, -51.2, -5.0, 51.2, 51.2, 3.0]
class_names = [
    "car", "truck", "construction_vehicle", "bus", "trailer", "barrier",
    "motorcycle", "bicycle", "pedestrian", "traffic_cone",
]
dataset_type = "NuScenesRCDataset"
data_root = "data/nuscenes/"
input_modality = dict(
    use_lidar=False, use_camera=True, use_radar=True,
    use_map=False, use_external=False,
)
