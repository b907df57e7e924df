"""rcbevdet_tpu — a TPU-native (JAX/XLA/Pallas) radar-camera BEV 3D detection
framework with the capabilities of RCBEVDet (CVPR 2024).

The package is organised bottom-up:

- ``ops``       device ops: bev_pool (LSS splat), deformable attention,
                fixed-capacity voxelization, bilinear warps, RCS scatter.
- ``core``      pure-math primitives: 3D boxes, gaussian heatmaps, target
                assignment, box coding, NMS.
- ``models``    flax modules: image/radar backbones, necks, LSS view
                transformer, RadarBEVNet, CAMF fusion, CenterPoint head,
                and the top-level detectors.
- ``data``      CPU-side input pipeline (nuScenes infos, image aug with
                tracked homographies, radar sweeps, BDA, depth GT).
- ``training``  jitted train step, optax schedules, EMA, checkpointing.
- ``parallel``  mesh/sharding helpers (pjit data parallelism over ICI).
- ``evaluation``nuScenes result formatting + metric computation.

Everything on the device path uses static shapes: variable-length structures
from the reference implementation (radar points, pillars, GT boxes, LSS point
lists) are fixed-capacity padded tensors with validity masks.
"""

__version__ = "0.1.0"
