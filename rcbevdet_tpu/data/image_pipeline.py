"""Multi-camera image loading + augmentation with tracked homographies.

NumPy/PIL re-design of the reference ``PrepareImageInputs``
(datasets/pipelines/loading.py:1576-1916).  The tracked ``post_rot`` /
``post_tran`` 2D homography composes resize -> crop -> flip -> rotate exactly
as the reference's ``img_transform`` (:1617-1637), so the LSS inverse-aug
unprojection stays consistent.  Sweep->keyego chains are computed here in
float64 (the model consumes ready sensor2keyego matrices; the reference
inverts on device in double, bevdet.py:705-708).

Output layout: frames-major, NHWC — imgs [F, N, H, W, 3] float32 normalized
(frame 0 = key), geometry [F, N, ...].
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

IMG_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
IMG_STD = np.array([58.395, 57.12, 57.375], np.float32)


@dataclasses.dataclass
class ImageAugConfig:
    """data_config of the reference configs (rcbevdet-...py:20-36)."""

    cams: Sequence[str] = (
        "CAM_FRONT_LEFT", "CAM_FRONT", "CAM_FRONT_RIGHT",
        "CAM_BACK_LEFT", "CAM_BACK", "CAM_BACK_RIGHT",
    )
    input_size: Tuple[int, int] = (256, 704)
    src_size: Tuple[int, int] = (900, 1600)
    resize: Tuple[float, float] = (-0.06, 0.11)
    rot: Tuple[float, float] = (-5.4, 5.4)
    flip: bool = True
    crop_h: Tuple[float, float] = (0.0, 0.0)
    resize_test: float = 0.0


def sample_image_augmentation(cfg: ImageAugConfig, src_h, src_w, is_train, rng):
    """Sample one camera's aug params (loading.py:1659-1686)."""
    fh, fw = cfg.input_size
    if is_train:
        resize = float(fw) / float(src_w) + rng.uniform(*cfg.resize)
        new_w, new_h = int(src_w * resize), int(src_h * resize)
        crop_h = int((1 - rng.uniform(*cfg.crop_h)) * new_h) - fh
        crop_w = int(rng.uniform(0, max(0, new_w - fw)))
        crop = (crop_w, crop_h, crop_w + fw, crop_h + fh)
        flip = bool(cfg.flip and rng.choice([0, 1]))
        rotate = rng.uniform(*cfg.rot)
    else:
        resize = float(fw) / float(src_w) + cfg.resize_test
        new_w, new_h = int(src_w * resize), int(src_h * resize)
        crop_h = int((1 - np.mean(cfg.crop_h)) * new_h) - fh
        crop_w = int(max(0, new_w - fw) / 2)
        crop = (crop_w, crop_h, crop_w + fw, crop_h + fh)
        flip, rotate = False, 0.0
    return resize, (new_w, new_h), crop, flip, rotate


def _rot2(deg):
    h = np.deg2rad(deg)
    return np.array([[np.cos(h), np.sin(h)], [-np.sin(h), np.cos(h)]], np.float64)


def transform_image(img: Image.Image, resize_dims, crop, flip, rotate):
    """Apply the PIL pixel ops (loading.py:1639-1646)."""
    img = img.resize(resize_dims)
    img = img.crop(crop)
    if flip:
        img = img.transpose(method=Image.FLIP_LEFT_RIGHT)
    img = img.rotate(rotate)
    return img


def compose_post_homography(resize, crop, flip, rotate, fw):
    """post_rot [2,2], post_tran [2] for the aug chain (loading.py:1617-1637)."""
    post_rot = np.eye(2) * resize
    post_tran = -np.array([crop[0], crop[1]], np.float64)
    if flip:
        a = np.array([[-1.0, 0.0], [0.0, 1.0]])
        b = np.array([crop[2] - crop[0], 0.0])
        post_rot = a @ post_rot
        post_tran = a @ post_tran + b
    a = _rot2(rotate)
    b = np.array([crop[2] - crop[0], crop[3] - crop[1]], np.float64) / 2
    b = a @ (-b) + b
    post_rot = a @ post_rot
    post_tran = a @ post_tran + b
    return post_rot, post_tran


def normalize_image(img: Image.Image):
    """ImageNet-normalized float32 HWC (the reference's mmlabNormalize,
    loading.py:1565-1572; PIL already gives RGB)."""
    arr = np.asarray(img, np.float32)
    return (arr - IMG_MEAN) / IMG_STD


def preprocess_image(img: Image.Image, resize_dims, crop, flip, rotate):
    """Fused resize/crop/flip/rotate/normalize, native C++ when available.

    The native path (csrc/image_ops.cc via data/image_ops_native.py) fuses
    the whole PIL chain + ImageNet normalize into one C++ pass; per-image
    cost is comparable to PIL single-threaded (PIL's SIMD fixed-point
    resampling is excellent), and the batched entry point
    (image_ops_native.transform_normalize_batch) runs the 54
    images-per-sample hot loop on a C++ thread pool with no GIL
    round-trips (SURVEY hard-part #7).  Tracks PIL within ~1/255
    (resize/crop/flip bit-tolerant, rotate >=99.9% pixel-exact); set
    RCBEVDET_NO_NATIVE_IMAGE=1 to force the PIL path.
    """
    import os

    from . import image_ops_native

    if (
        not os.environ.get("RCBEVDET_NO_NATIVE_IMAGE")
        and img.mode == "RGB"
        and image_ops_native.available()
    ):
        return image_ops_native.transform_normalize(
            np.asarray(img), resize_dims, crop, flip, rotate,
            IMG_MEAN.reshape(3), IMG_STD.reshape(3),
        )
    return normalize_image(
        transform_image(img, resize_dims, crop, flip, rotate)
    )


def quaternion_matrix(wxyz):
    """Rotation matrix from a (w, x, y, z) quaternion."""
    w, x, y, z = np.asarray(wxyz, np.float64)
    n = w * w + x * x + y * y + z * z
    s = 0.0 if n == 0 else 2.0 / n
    wx, wy, wz = s * w * x, s * w * y, s * w * z
    xx, xy, xz = s * x * x, s * x * y, s * x * z
    yy, yz, zz = s * y * y, s * y * z, s * z * z
    return np.array(
        [
            [1 - (yy + zz), xy - wz, xz + wy],
            [xy + wz, 1 - (xx + zz), yz - wx],
            [xz - wy, yz + wx, 1 - (xx + yy)],
        ]
    )


def pose_to_matrix(rotation_wxyz, translation):
    m = np.eye(4)
    m[:3, :3] = quaternion_matrix(rotation_wxyz)
    m[:3, 3] = np.asarray(translation, np.float64)
    return m


def camera_transforms(cam_info):
    """(sensor2ego, ego2global) 4x4 from a per-camera info dict."""
    s2e = pose_to_matrix(
        cam_info["sensor2ego_rotation"], cam_info["sensor2ego_translation"]
    )
    e2g = pose_to_matrix(
        cam_info["ego2global_rotation"], cam_info["ego2global_translation"]
    )
    return s2e, e2g


def prepare_image_inputs(
    key_info: Dict,
    adj_infos: Sequence[Dict],
    cfg: ImageAugConfig,
    is_train: bool,
    rng: np.random.Generator,
    image_loader=None,
):
    """Build the model's camera inputs for one sample.

    Args:
      key_info / adj_infos: nuScenes info dicts with a 'cams' sub-dict.
      image_loader: callable(path) -> PIL.Image (injectable for tests).

    Returns dict with:
      imgs [F, N, H, W, 3], sensor2egos/ego2globals [F, N, 4, 4] (float64),
      sensor2keyegos [F, N, 4, 4] (float32), intrins/post_rots [F, N, 3, 3],
      post_trans [F, N, 3].
    """
    if image_loader is None:
        image_loader = Image.open
    cams = list(cfg.cams)
    infos = [key_info] + list(adj_infos)
    f, n = len(infos), len(cams)
    fh, fw = cfg.input_size

    imgs = np.zeros((f, n, fh, fw, 3), np.float32)
    sensor2egos = np.zeros((f, n, 4, 4))
    ego2globals = np.zeros((f, n, 4, 4))
    intrins = np.zeros((f, n, 3, 3), np.float32)
    post_rots = np.zeros((f, n, 3, 3), np.float32)
    post_trans = np.zeros((f, n, 3), np.float32)

    for ci, cam in enumerate(cams):
        cam_data = key_info["cams"][cam]
        img = image_loader(cam_data["data_path"])
        aug = sample_image_augmentation(cfg, img.height, img.width, is_train, rng)
        resize, resize_dims, crop, flip, rotate = aug

        pr2, pt2 = compose_post_homography(resize, crop, flip, rotate, fw)
        pr = np.eye(3, dtype=np.float32)
        pr[:2, :2] = pr2
        pt = np.zeros(3, np.float32)
        pt[:2] = pt2

        for fi, info in enumerate(infos):
            cdat = info["cams"][cam]
            if fi == 0:
                im = img
            else:
                im = image_loader(cdat["data_path"])
            imgs[fi, ci] = preprocess_image(im, resize_dims, crop, flip,
                                            rotate)
            s2e, e2g = camera_transforms(cdat)
            sensor2egos[fi, ci] = s2e
            ego2globals[fi, ci] = e2g
            intrins[fi, ci] = np.asarray(cam_data["cam_intrinsic"], np.float32)
            post_rots[fi, ci] = pr
            post_trans[fi, ci] = pt

    # sweep sensor -> key ego, float64 on host (bevdet.py:704-708)
    keyego2global = ego2globals[0, 0]
    global2keyego = np.linalg.inv(keyego2global)
    sensor2keyegos = (global2keyego[None, None] @ ego2globals @ sensor2egos).astype(
        np.float32
    )

    return {
        "imgs": imgs,
        "sensor2egos": sensor2egos.astype(np.float32),
        "ego2globals": ego2globals.astype(np.float32),
        "sensor2keyegos": sensor2keyegos,
        "intrins": intrins,
        "post_rots": post_rots,
        "post_trans": post_trans,
    }
