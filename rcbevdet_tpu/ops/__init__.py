from .bev_pool import bev_pool, bev_pool_ranks
from .voxelize import voxelize_pillars
from .warp import grid_sample_2d, bilinear_resize
from .deform_attn import ms_deform_attn_core
from .roiaware_pool import points_in_boxes_3d, roiaware_pool3d
from .msmv_sampling import msmv_sampling

__all__ = [
    "bev_pool",
    "bev_pool_ranks",
    "voxelize_pillars",
    "grid_sample_2d",
    "bilinear_resize",
    "ms_deform_attn_core",
    "points_in_boxes_3d",
    "roiaware_pool3d",
    "msmv_sampling",
]
