"""Data pipeline: pcd parsing, radar sweeps, image aug homography, dataset."""

import io
import numpy as np
import pytest

from rcbevdet_tpu.data.pcd import FIELD_NAMES, load_radar_pcd
from rcbevdet_tpu.data.image_pipeline import (
    ImageAugConfig,
    compose_post_homography,
    sample_image_augmentation,
    transform_image,
)
from rcbevdet_tpu.data.radar_pipeline import load_radar_sweeps, pad_radar_points
from rcbevdet_tpu.data.dataset import cbgs_indices, collate_samples
from rcbevdet_tpu.data.synthetic import synthetic_batch, synthetic_sample


def _write_pcd(path, pts):
    """Write a nuScenes-style radar pcd (18 float32 fields, binary)."""
    n = len(pts)
    header = (
        "VERSION 0.7\n"
        f"FIELDS {' '.join(FIELD_NAMES)}\n"
        f"SIZE {' '.join(['4'] * 18)}\n"
        f"TYPE {' '.join(['F'] * 18)}\n"
        f"COUNT {' '.join(['1'] * 18)}\n"
        f"WIDTH {n}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\n"
        f"POINTS {n}\nDATA binary\n"
    )
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        f.write(np.asarray(pts, np.float32).tobytes())


def test_pcd_roundtrip_and_filter(tmp_path, rng):
    pts = np.zeros((6, 18), np.float32)
    pts[:, 0] = np.arange(6)
    pts[:, 11] = 3  # ambig_state valid
    pts[2, 14] = 1  # invalid_state -> dropped
    pts[3, 3] = 7  # dyn_prop out of range -> dropped
    pts[4, 11] = 1  # ambig_state -> dropped
    p = tmp_path / "radar.pcd"
    _write_pcd(p, pts)
    out = load_radar_pcd(str(p))
    np.testing.assert_array_equal(out[:, 0], [0, 1, 5])


def test_radar_sweeps_rot90(rng):
    def fake_pcd(path):
        pts = np.zeros((1, 18), np.float32)
        pts[0, 0] = 2.0  # x
        pts[0, 1] = 1.0  # y
        pts[0, 8] = 3.0  # vx_comp
        pts[0, 9] = 0.5  # vy_comp
        pts[0, 5] = 7.0  # rcs
        return pts

    radars = {
        "R": [dict(data_path="p", timestamp=1e6,
                   sensor2lidar_rotation=np.eye(3),
                   sensor2lidar_translation=np.zeros(3))]
    }
    out = load_radar_sweeps(radars, sweeps_num=1, pcd_loader=fake_pcd)
    assert out.shape == (1, 7)
    # (x, y) -> (y, -x)
    np.testing.assert_allclose(out[0, :2], [1.0, -2.0], atol=1e-6)
    np.testing.assert_allclose(out[0, 3:5], [0.5, -3.0], atol=1e-6)
    np.testing.assert_allclose(out[0, 5], 7.0)
    np.testing.assert_allclose(out[0, 6], 0.0)  # key-sweep time diff


def test_pad_radar_points():
    pts = np.ones((3, 7), np.float32)
    out, mask = pad_radar_points(pts, 5)
    assert out.shape == (5, 7) and mask.sum() == 3
    out2, mask2 = pad_radar_points(np.ones((9, 7), np.float32), 5)
    assert out2.shape == (5, 7) and mask2.all()


def test_post_homography_tracks_pixels(rng):
    """A source pixel moved through PIL ops must land where the homography
    says: for a pure resize+crop, dst = post_rot @ src + post_tran."""
    resize = 0.5
    crop = (10, 5, 110, 55)
    pr, pt = compose_post_homography(resize, crop, False, 0.0, 100)
    src = np.array([100.0, 60.0])
    dst = pr @ src + pt
    np.testing.assert_allclose(dst, [100 * 0.5 - 10, 60 * 0.5 - 5], atol=1e-6)

    # flip: x -> (crop_w - 1 ... approximately W - x)
    pr2, pt2 = compose_post_homography(resize, crop, True, 0.0, 100)
    dst2 = pr2 @ src + pt2
    np.testing.assert_allclose(dst2[0], (crop[2] - crop[0]) - dst[0], atol=1e-6)
    np.testing.assert_allclose(dst2[1], dst[1], atol=1e-6)


def test_synthetic_sample_shapes():
    sample, ds = synthetic_sample(num_adj=2)
    assert sample["imgs"].shape == (3, 6, 256, 704, 3)
    assert sample["sensor2keyegos"].shape == (3, 6, 4, 4)
    assert sample["radar_points"].shape == (1200, 7)
    assert sample["heatmap_t"].shape == (10, 128, 128)
    assert sample["gt_depth"].shape == (6, 256, 704)
    assert np.isfinite(sample["imgs"]).all()
    # key frame is its own keyego: sensor2keyego[0] approx sensor2ego[0]
    np.testing.assert_allclose(
        sample["sensor2keyegos"][0], sample["sensor2egos"][0], atol=1e-4
    )


def test_collate_and_cbgs():
    batch = synthetic_batch(batch_size=2, num_adj=1)
    assert batch["imgs"].shape[0] == 2
    assert len(batch["token"]) == 2

    _, ds = synthetic_sample(num_adj=1)
    idxs = cbgs_indices(ds)
    assert len(idxs) > 0
    assert all(0 <= i < len(ds) for i in idxs)


def test_longterm_adjacent_window(rng):
    """multi_adj_frame_ids_longterm adds a second history window
    (reference get_adj_info_lt + PrepareImageInputsLongterm,
    nuscenes_dataset_rc.py:318-327) with its own *_lt batch keys."""
    from rcbevdet_tpu.data.image_pipeline import ImageAugConfig
    from rcbevdet_tpu.data.synthetic import synthetic_sample

    cfg = ImageAugConfig(input_size=(64, 176))
    sample, ds = synthetic_sample(
        rng, img_config=cfg, num_adj=2, num_samples=12,
        multi_adj_frame_ids_longterm=(4, 8),
    )
    n_cams = len(cfg.cams)
    assert sample["imgs_lt"].shape == (2, n_cams, 64, 176, 3)
    assert sample["sensor2keyegos_lt"].shape == (2, n_cams, 4, 4)
    assert sample["post_trans_lt"].shape == (2, n_cams, 3)
    # short window untouched: key + 2 adjacent frames
    assert sample["imgs"].shape[0] == 3
    # collation keeps the _lt keys
    from rcbevdet_tpu.data.dataset import collate_samples

    batch = collate_samples([sample, sample])
    assert batch["imgs_lt"].shape[0] == 2
