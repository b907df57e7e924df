"""ctypes bindings for the native rotated NMS (csrc/rotated_nms.cc).

Builds the shared library on first use (g++, ~1 s) and caches it next to the
source.  Falls back to the NumPy implementation in core/nms.py when no
compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_FAILED = False


def _src_dir():
    return os.path.join(os.path.dirname(os.path.dirname(__file__)), "csrc")


def _load():
    global _LIB, _FAILED
    if _LIB is not None or _FAILED:
        return _LIB
    with _LOCK:
        if _LIB is not None or _FAILED:
            return _LIB
        src = os.path.join(_src_dir(), "rotated_nms.cc")
        lib_path = os.path.join(_src_dir(), "librotated_nms.so")
        try:
            if not os.path.exists(lib_path) or os.path.getmtime(
                lib_path
            ) < os.path.getmtime(src):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", lib_path, src],
                    check=True, capture_output=True,
                )
            lib = ctypes.CDLL(lib_path)
            lib.rotated_iou_matrix.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float),
            ]
            lib.rotated_nms.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.c_float, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64),
            ]
            lib.rotated_nms.restype = ctypes.c_int64
            _LIB = lib
        except (OSError, subprocess.CalledProcessError):
            _FAILED = True
    return _LIB


def available():
    return _load() is not None


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def rotated_iou_matrix(boxes_a, boxes_b):
    lib = _load()
    if lib is None:
        from .nms import rotated_iou_matrix_np

        return rotated_iou_matrix_np(boxes_a, boxes_b)
    a = np.ascontiguousarray(boxes_a, np.float32)
    b = np.ascontiguousarray(boxes_b, np.float32)
    out = np.zeros((len(a), len(b)), np.float32)
    lib.rotated_iou_matrix(_fptr(a), len(a), _fptr(b), len(b), _fptr(out))
    return out


def rotated_nms(bev_boxes, scores, thresh, pre_max_size=1000, post_max_size=500):
    """Greedy rotated NMS; same contract as core.nms.rotated_nms_np."""
    lib = _load()
    if lib is None:
        from .nms import rotated_nms_np

        return rotated_nms_np(
            bev_boxes, scores, thresh,
            pre_max_size=pre_max_size, post_max_size=post_max_size,
        )
    order = np.argsort(-np.asarray(scores), kind="stable")
    if pre_max_size is not None:
        order = order[:pre_max_size]
    boxes_s = np.ascontiguousarray(np.asarray(bev_boxes)[order], np.float32)
    keep = np.zeros(len(order), np.int64)
    n = lib.rotated_nms(
        _fptr(boxes_s), len(order), ctypes.c_float(thresh),
        ctypes.c_int64(post_max_size),
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return order[keep[:n]]
