"""VoD dataset: KITTI-format infos -> lidar GT -> AP evaluation."""

import numpy as np

from rcbevdet_tpu.core.box_modes import CAM, LIDAR, convert_boxes
from rcbevdet_tpu.data.vod_dataset import VoDDataset, kitti_anno_to_lidar


def _fake_info(idx, annos):
    rect = np.eye(4)
    # a non-trivial velo->cam: KITTI-style axis permutation
    trv2c = np.array(
        [[0, -1, 0, 0.1], [0, 0, -1, -0.05], [1, 0, 0, 0.2], [0, 0, 0, 1]],
        np.float64,
    )
    p2 = np.array(
        [[700.0, 0, 600, 40.0], [0, 700.0, 180, 1.0], [0, 0, 1, 0.003],
         [0, 0, 0, 1]]
    )
    return {
        "image": {"image_idx": idx, "image_path": f"img/{idx}.jpg",
                  "image_shape": (1216, 1936)},
        "point_cloud": {"velodyne_path": f"radar/{idx}.bin"},
        "calib": {"R0_rect": rect, "Tr_velo_to_cam": trv2c, "P2": p2},
        "annos": annos,
    }


def _annos(names, locs, dims, rots):
    n = len(names)
    return {
        "name": np.asarray(names),
        "location": np.asarray(locs, np.float64).reshape(n, 3),
        "dimensions": np.asarray(dims, np.float64).reshape(n, 3),
        "rotation_y": np.asarray(rots, np.float64).reshape(n),
        "bbox": np.zeros((n, 4)),
        "truncated": np.zeros(n),
        "occluded": np.zeros(n, np.int64),
        "alpha": np.zeros(n),
    }


def _dataset(rng):
    infos = [
        _fake_info(0, _annos(
            ["Car", "Pedestrian", "DontCare"],
            [[2.0, 1.0, 10.0], [-1.0, 1.2, 6.0], [0, 0, 0]],
            [[4.0, 1.5, 1.8], [0.6, 1.7, 0.6], [1, 1, 1]],
            [0.3, -0.2, 0.0],
        )),
        _fake_info(1, _annos(
            ["Cyclist"], [[0.5, 1.1, 8.0]], [[1.8, 1.6, 0.6]], [1.1],
        )),
    ]

    def load_points(path):
        return rng.uniform(-5, 5, (40, 7)).astype(np.float32)

    return VoDDataset(info_path="", infos=infos, point_loader=load_points)


def test_ann_roundtrip_and_sample(rng):
    ds = _dataset(rng)
    assert len(ds) == 2
    s = ds[0]
    assert s["radar_points"].shape == (1200, 7)
    assert int(s["radar_mask"].sum()) == 40
    boxes, labels = s["gt_boxes"], s["gt_labels"]
    assert boxes.shape == (3, 7)
    assert list(labels) == [0, 1, -1]
    # invert: lidar gravity-center -> bottom -> cam must give back the anno
    rect, trv2c, _ = ds.calib(0)
    b = boxes.astype(np.float64).copy()
    b[:, 2] -= b[:, 5] / 2
    cam = convert_boxes(b, LIDAR, CAM, rt_mat=(rect @ trv2c)[:3])
    np.testing.assert_allclose(
        cam[0, :3], [2.0, 1.0, 10.0], atol=1e-5
    )
    np.testing.assert_allclose(cam[0, 3:6], [4.0, 1.5, 1.8], atol=1e-5)


def test_evaluate_perfect_predictions(rng):
    # enough GT per class that the official R40 recall sampling is dense
    # (the KITTI algorithm structurally underreports at tiny GT counts)
    infos = []
    for idx in range(15):
        names, locs, dims, rots = [], [], [], []
        for ci, (name, dim) in enumerate(
            [("Car", [4.0, 1.5, 1.8]), ("Pedestrian", [0.6, 1.7, 0.6]),
             ("Cyclist", [1.8, 1.6, 0.6])]
        ):
            for k in range(3):
                names.append(name)
                locs.append([(-1) ** k * (2 + 3 * k + ci), 1.0,
                             5.0 + 4 * k + 7 * ci])
                dims.append(dim)
                rots.append(0.2 * k - 0.3 * ci)
        infos.append(_fake_info(idx, _annos(names, locs, dims, rots)))

    def load_points(path):
        return rng.uniform(-5, 5, (10, 7)).astype(np.float32)

    ds = VoDDataset(info_path="", infos=infos, point_loader=load_points)
    preds = {}
    for i in range(len(ds)):
        boxes, labels = ds.get_ann_info(i)
        keep = labels >= 0
        b = np.concatenate(
            [boxes[keep], np.zeros((int(keep.sum()), 2))], axis=1
        )  # pad vel dims
        preds[str(ds.infos[i]["image"]["image_idx"])] = (
            b, rng.uniform(0.5, 1.0, int(keep.sum())), labels[keep]
        )
    m = ds.evaluate(preds)
    assert m["mAP_3D_R40"] > 90.0
    assert m["mAP_BEV_R40"] > 90.0
    # corridor table also present
    assert any(k.startswith("corridor/") for k in m)
