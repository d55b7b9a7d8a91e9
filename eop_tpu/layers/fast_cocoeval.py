"""ctypes binding + on-demand build of the C++ COCOeval matcher.

The reference ships its matcher as a pybind11 torch extension
(`/root/reference/yolox/layers/fast_coco_eval_api.py:19` binding
`yolox._C`); this image has neither pybind11 nor torch-extension headers,
so the native core (`csrc/cocoeval.cpp`) uses a flat extern "C" ABI and is
compiled on first use with g++ into the package build dir.  A pure-numpy
fallback implements identical semantics for environments without a
compiler (`match_image_py`), and the test suite asserts both agree.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "csrc", "cocoeval.cpp")
_BUILD_DIR = os.path.join(_HERE, "_build")
_SO_PATH = os.path.join(_BUILD_DIR, "libcocoeval.so")

_lib = None
_lib_lock = threading.Lock()
_build_failed = False


def _build() -> Optional[str]:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-o", _SO_PATH,
    ]
    try:
        # the makedirs lives inside the guard too: a read-only install
        # (site-packages without write access) must fall back to the
        # numpy matcher, not crash evaluation
        os.makedirs(_BUILD_DIR, exist_ok=True)
        subprocess.run(cmd, check=True, capture_output=True)
        return _SO_PATH
    except (subprocess.CalledProcessError, FileNotFoundError, OSError):
        return None


def _load():
    global _lib, _build_failed
    with _lib_lock:
        if _lib is not None or _build_failed:
            return _lib
        so = _SO_PATH if os.path.exists(_SO_PATH) else _build()
        if so is None:
            _build_failed = True
            return None
        lib = ctypes.CDLL(so)
        p_i64 = ctypes.POINTER(ctypes.c_int64)
        p_i32 = ctypes.POINTER(ctypes.c_int32)
        p_f64 = ctypes.POINTER(ctypes.c_double)
        lib.cocoeval_match_image.argtypes = [
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            p_f64, p_f64, p_i32, p_i32, p_i32,
            p_i64, p_i64, p_i32,
        ]
        lib.cocoeval_match_image.restype = None
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def match_image_py(iou_thrs, iou, gt_ignore, gt_iscrowd, dt_out_of_range):
    """Pure-numpy matcher with identical semantics (fallback + oracle)."""
    T = len(iou_thrs)
    D, G = iou.shape if iou.size else (len(dt_out_of_range), len(gt_ignore))
    dtm = np.zeros((T, D), np.int64)
    gtm = np.zeros((T, G), np.int64)
    dti = np.zeros((T, D), np.int32)
    for t, thr in enumerate(iou_thrs):
        for d in range(D):
            best = min(thr, 1 - 1e-10)
            m = -1
            for g in range(G):
                if gtm[t, g] > 0 and not gt_iscrowd[g]:
                    continue
                if m > -1 and not gt_ignore[m] and gt_ignore[g]:
                    break
                if iou[d, g] < best:
                    continue
                best = iou[d, g]
                m = g
            if m >= 0:
                dtm[t, d] = m + 1
                gtm[t, m] = d + 1
                dti[t, d] = gt_ignore[m]
        dti[t] |= ((dtm[t] == 0) & dt_out_of_range).astype(np.int32)
    return dtm, gtm, dti


def match_image(
    iou_thrs: np.ndarray,
    iou: np.ndarray,
    gt_ignore: np.ndarray,
    gt_iscrowd: np.ndarray,
    dt_out_of_range: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Greedy COCO matcher for one (image, category, area-range) cell.

    Args: iou [D, G] float64 (dt-major, both pre-sorted: dts by score desc,
    gts ignores-last); flags int32.
    Returns (dt_matches [T, D], gt_matches [T, G], dt_ignores [T, D]).
    """
    lib = _load()
    iou_thrs = np.ascontiguousarray(iou_thrs, np.float64)
    gt_ignore = np.ascontiguousarray(gt_ignore, np.int32)
    gt_iscrowd = np.ascontiguousarray(gt_iscrowd, np.int32)
    dt_out_of_range = np.ascontiguousarray(dt_out_of_range, np.int32)
    T = len(iou_thrs)
    D = len(dt_out_of_range)
    G = len(gt_ignore)
    if lib is None:
        return match_image_py(
            iou_thrs, iou, gt_ignore, gt_iscrowd, dt_out_of_range
        )
    iou = np.ascontiguousarray(iou, np.float64)
    dtm = np.zeros((T, D), np.int64)
    gtm = np.zeros((T, G), np.int64)
    dti = np.zeros((T, D), np.int32)
    lib.cocoeval_match_image(
        T, D, G,
        _ptr(iou_thrs, ctypes.c_double),
        _ptr(iou, ctypes.c_double),
        _ptr(gt_ignore, ctypes.c_int32),
        _ptr(gt_iscrowd, ctypes.c_int32),
        _ptr(dt_out_of_range, ctypes.c_int32),
        _ptr(dtm, ctypes.c_int64),
        _ptr(gtm, ctypes.c_int64),
        _ptr(dti, ctypes.c_int32),
    )
    return dtm, gtm, dti
