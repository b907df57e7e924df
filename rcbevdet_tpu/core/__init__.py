from .gaussian import (
    gaussian_2d_np,
    gaussian_radius_np,
    draw_heatmap_gaussian_np,
    render_rcs_maps,
)
from .boxes import (
    gravity_center,
    boxes_bev,
    box_corners_bev,
    transform_boxes_bda,
)
from .targets import centerpoint_targets_single
from .coders import centerpoint_decode
from .nms import circle_nms_np, rotated_nms_np, rotated_iou_matrix_np

__all__ = [
    "gaussian_2d_np",
    "gaussian_radius_np",
    "draw_heatmap_gaussian_np",
    "render_rcs_maps",
    "CAM",
    "DEPTH",
    "LIDAR",
    "cam_box_corners",
    "convert_boxes",
    "project_cam_corners",
    "gravity_center",
    "boxes_bev",
    "box_corners_bev",
    "transform_boxes_bda",
    "centerpoint_targets_single",
    "centerpoint_decode",
    "circle_nms_np",
    "rotated_nms_np",
    "rotated_iou_matrix_np",
]
from .box_modes import (
    CAM,
    DEPTH,
    LIDAR,
    cam_box_corners,
    convert_boxes,
    project_cam_corners,
)
