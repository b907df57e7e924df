"""Minimal nuScenes radar .pcd reader.

Standalone replacement for nuscenes-devkit's ``RadarPointCloud.from_file``
(used by the reference's LoadRadarPointsMultiSweeps, loading.py:666-679) so
the data pipeline has no devkit dependency.  nuScenes radar files are PCD
v0.7 with an ASCII header and binary payload of 18 fields:

x y z dyn_prop id rcs vx vy vx_comp vy_comp is_quality_valid ambig_state
x_rms y_rms invalid_state pdh0 vx_rms vy_rms

Default filtering matches the devkit: keep points with invalid_state in
{0}, dyn_prop in {0..6}, ambig_state in {3}.
"""

from __future__ import annotations

import numpy as np

_PCD_TYPES = {("F", 4): "f4", ("F", 8): "f8", ("I", 1): "i1", ("I", 2): "i2",
              ("I", 4): "i4", ("U", 1): "u1", ("U", 2): "u2", ("U", 4): "u4"}

FIELD_NAMES = (
    "x y z dyn_prop id rcs vx vy vx_comp vy_comp is_quality_valid "
    "ambig_state x_rms y_rms invalid_state pdh0 vx_rms vy_rms"
).split()


def load_radar_pcd(
    path,
    invalid_states=(0,),
    dynprop_states=tuple(range(7)),
    ambig_states=(3,),
):
    """Parse a nuScenes radar .pcd file.

    Returns:
      [N, 18] float32 array of the fields above, devkit-filtered.
    """
    with open(path, "rb") as f:
        header = {}
        while True:
            line = f.readline().decode("ascii").strip()
            key, _, val = line.partition(" ")
            header[key.upper()] = val
            if key.upper() == "DATA":
                break
        fields = header["FIELDS"].split()
        sizes = [int(s) for s in header["SIZE"].split()]
        types = header["TYPE"].split()
        counts = [int(c) for c in header.get("COUNT", "1 " * len(fields)).split()]
        n_points = int(header["POINTS"])
        assert header["DATA"] == "binary", f"unsupported PCD data {header['DATA']}"
        assert all(c == 1 for c in counts), "vector fields unsupported"

        dtype = np.dtype(
            [(name, _PCD_TYPES[(t, s)]) for name, t, s in zip(fields, types, sizes)]
        )
        raw = np.frombuffer(f.read(dtype.itemsize * n_points), dtype=dtype)

    cols = [raw[name].astype(np.float32) for name in fields]
    pts = np.stack(cols, axis=-1)  # [N, 18]

    keep = np.isin(raw["invalid_state"], invalid_states)
    keep &= np.isin(raw["dyn_prop"], dynprop_states)
    keep &= np.isin(raw["ambig_state"], ambig_states)
    return pts[keep]
