"""ctypes bindings for the native CPU oracle ops (NMS, ROIAlign).

The reference exposes its C++/CUDA ops through a pybind11 torch extension
(`Detection/support/src/vision.cpp:6-10`, built by `support/setup.py`).
Here the native library is a plain C-ABI shared object (``native/``), built
with ``make`` and bound via ctypes — no torch dependency. These oracles
exist for parity testing the jit-compiled TPU implementations in
:mod:`afan.ops.nms` / :mod:`afan.ops.roi_align`; they are also a usable
host-side fallback (e.g. for pure-CPU postprocessing in serving).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_LIB_DIR, "libafan_cpu.so"))
_lib: Optional[ctypes.CDLL] = None


def _build() -> None:
    subprocess.run(["make", "-C", os.path.abspath(_LIB_DIR)], check=True,
                   capture_output=True)


def load_library(auto_build: bool = True) -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and auto_build:
        _build()
    lib = ctypes.CDLL(_LIB_PATH)
    lib.afan_nms_cpu.restype = ctypes.c_int64
    lib.afan_nms_cpu.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64, ctypes.c_float, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int64)]
    lib.afan_roi_align_cpu.restype = None
    lib.afan_roi_align_cpu.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_float,
        ctypes.c_int64, ctypes.POINTER(ctypes.c_float)]
    _lib = lib
    return lib


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _iptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def nms_cpu(boxes: np.ndarray, scores: np.ndarray, threshold: float,
            plus_one: bool = True) -> np.ndarray:
    """Greedy NMS oracle; returns kept indices, score-descending
    (dynamic length, like the reference `nms_cpu.cpp`)."""
    lib = load_library()
    boxes = np.ascontiguousarray(boxes, np.float32)
    scores = np.ascontiguousarray(scores, np.float32)
    n = len(boxes)
    keep = np.empty(max(n, 1), np.int64)
    m = lib.afan_nms_cpu(_fptr(boxes), _fptr(scores), n,
                         ctypes.c_float(threshold), int(plus_one),
                         _iptr(keep))
    return keep[:m].copy()


def roi_align_cpu(feat: np.ndarray, boxes: np.ndarray,
                  batch_indices: np.ndarray, output_size=(14, 14),
                  spatial_scale: float = 1.0 / 16,
                  sampling_ratio: int = 2) -> np.ndarray:
    """ROIAlign forward oracle (NHWC). ``sampling_ratio<=0`` = the
    reference's adaptive grid."""
    lib = load_library()
    feat = np.ascontiguousarray(feat, np.float32)
    boxes = np.ascontiguousarray(boxes, np.float32)
    bidx = np.ascontiguousarray(batch_indices, np.int64)
    B, H, W, C = feat.shape
    R = len(boxes)
    ph, pw = output_size
    out = np.empty((R, ph, pw, C), np.float32)
    lib.afan_roi_align_cpu(_fptr(feat), B, H, W, C, _fptr(boxes),
                           _iptr(bidx), R, ph, pw,
                           ctypes.c_float(spatial_scale), sampling_ratio,
                           _fptr(out))
    return out
