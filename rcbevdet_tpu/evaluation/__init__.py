from .nuscenes_metrics import DetectionEvalConfig, evaluate_detections
from .format import format_nuscenes_results, DEFAULT_ATTRIBUTES
from .kitti_metrics import evaluate_kitti, VOD_CORRIDOR
from .tracking import evaluate_tracking, greedy_track

__all__ = [
    "DetectionEvalConfig",
    "evaluate_detections",
    "format_nuscenes_results",
    "DEFAULT_ATTRIBUTES",
    "evaluate_kitti",
    "VOD_CORRIDOR",
    "evaluate_tracking",
    "greedy_track",
]
