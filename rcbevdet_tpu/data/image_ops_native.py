"""ctypes bindings for the native fused image preprocessing
(csrc/image_ops.cc): PIL-chain resize(bicubic)/crop/flip/rotate/normalize
in one C++ pass.  Falls back to the PIL path when no compiler is
available; parity with PIL is pinned to ~1/255 by tests.
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
        src = os.path.join(_src_dir(), "image_ops.cc")
        lib_path = os.path.join(_src_dir(), "libimage_ops.so")
        try:
            if not os.path.exists(lib_path) or os.path.getmtime(
                lib_path
            ) < os.path.getmtime(src):
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-funroll-loops",
                     "-shared", "-fPIC", "-o", lib_path, src],
                    check=True, capture_output=True,
                )
            lib = ctypes.CDLL(lib_path)
            u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
            f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
            lib.resize_bicubic_u8.argtypes = [
                u8p, ctypes.c_int, ctypes.c_int, f32p, ctypes.c_int,
                ctypes.c_int,
            ]
            lib.transform_normalize_u8.argtypes = [
                u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_double, f32p, f32p, f32p,
            ]
            i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
            lib.transform_normalize_batch_u8.argtypes = [
                u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                i32p, i32p, i32p, u8p, 
                np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
                f32p, f32p, f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ]
            _LIB = lib
        except Exception:
            _FAILED = True
    return _LIB


def available() -> bool:
    return _load() is not None


def transform_normalize(img_u8, resize_dims, crop, flip, rotate, mean, std):
    """Fused PIL-chain preprocessing.

    Args:
      img_u8: [H, W, 3] uint8 RGB.
      resize_dims: (new_w, new_h) like PIL.resize.
      crop: (x0, y0, x1, y1).
      flip: bool horizontal flip.
      rotate: degrees CCW (PIL.rotate semantics, nearest).
      mean, std: [3] float.

    Returns:
      [y1-y0, x1-x0, 3] float32 normalized.
    """
    lib = _load()
    assert lib is not None
    img_u8 = np.ascontiguousarray(img_u8, np.uint8)
    sh, sw = img_u8.shape[:2]
    nw, nh = resize_dims
    x0, y0, x1, y1 = crop
    out = np.empty((y1 - y0, x1 - x0, 3), np.float32)
    lib.transform_normalize_u8(
        img_u8, sh, sw, int(nh), int(nw), int(x0), int(y0), int(x1),
        int(y1), int(bool(flip)), float(rotate),
        np.ascontiguousarray(mean, np.float32).reshape(3),
        np.ascontiguousarray(std, np.float32).reshape(3), out,
    )
    return out


def transform_normalize_batch(imgs_u8, resize_dims, crops, flips, rotates,
                              mean, std, out_hw, num_threads=4):
    """Batched fused preprocessing on a C++ thread pool.

    Args:
      imgs_u8: [N, H, W, 3] uint8 (same source size per batch).
      resize_dims: [N, 2] (new_w, new_h) per image.
      crops: [N, 4] (x0, y0, x1, y1); all crops must produce out_hw.
      flips: [N] bool; rotates: [N] degrees.
      out_hw: (fh, fw).

    Returns [N, fh, fw, 3] float32.
    """
    lib = _load()
    assert lib is not None
    imgs_u8 = np.ascontiguousarray(imgs_u8, np.uint8)
    n, sh, sw = imgs_u8.shape[:3]
    fh, fw = out_hw
    rd = np.ascontiguousarray(resize_dims, np.int32)
    nh = np.ascontiguousarray(rd[:, 1]).copy()
    nw = np.ascontiguousarray(rd[:, 0]).copy()
    out = np.empty((n, fh, fw, 3), np.float32)
    lib.transform_normalize_batch_u8(
        imgs_u8, n, sh, sw, nh, nw,
        np.ascontiguousarray(crops, np.int32),
        np.ascontiguousarray(flips, np.uint8),
        np.ascontiguousarray(rotates, np.float64),
        np.ascontiguousarray(mean, np.float32).reshape(3),
        np.ascontiguousarray(std, np.float32).reshape(3),
        out, fh, fw, int(num_threads),
    )
    return out
