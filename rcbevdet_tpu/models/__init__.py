from .detectors import RCBEVDet, RCBEVDetConfig, CameraBEVBranch
from .centerpoint_head import (
    CenterHead,
    MultiTaskCenterHead,
    centerpoint_loss,
    multi_task_loss,
    clip_sigmoid,
)
from .hop import HoPTemporalPredictor
from .rcbevdetpp import RCBEVDetPlusPlus
from .centerpoint_lidar import CenterPointPillars, PillarFeatureNet
from .sparse_decoder import SparseBEVDecoder, set_prediction_loss, hungarian_match
from .seg_head import BEVSegHead, seg_loss, seg_iou
from .vovnet import VoVNetV2
from .dla import DLANet
from .temporal import shift_bev
from .camf import CAMF, MSDeformAttn, LearnedPositionalEncoding, RadarConvFuser
from .radar_encoder import RadarBEVNet
from .pillar_scatter import PointPillarsScatterRCS
from .resnet import ResNet, CustomResNet
from .fpn import CustomFPN, FPN_LSS, SECOND, SECONDFPN
from .view_transformer import (
    LSSViewTransformerBEVDepth,
    create_frustum,
    frustum_to_ego,
    depth_mlp_input,
    depth_loss,
)

__all__ = [
    "RCBEVDet",
    "RCBEVDetConfig",
    "CameraBEVBranch",
    "CenterHead",
    "centerpoint_loss",
    "clip_sigmoid",
    "CAMF",
    "MSDeformAttn",
    "LearnedPositionalEncoding",
    "RadarConvFuser",
    "RadarBEVNet",
    "PointPillarsScatterRCS",
    "ResNet",
    "CustomResNet",
    "CustomFPN",
    "FPN_LSS",
    "SECOND",
    "SECONDFPN",
    "LSSViewTransformerBEVDepth",
    "create_frustum",
    "frustum_to_ego",
    "depth_mlp_input",
    "depth_loss",
]
