from .nuscenes_metrics import DetectionEvalConfig, evaluate_detections
from .format import format_nuscenes_results, DEFAULT_ATTRIBUTES

__all__ = [
    "DetectionEvalConfig",
    "evaluate_detections",
    "format_nuscenes_results",
    "DEFAULT_ATTRIBUTES",
]
