"""ctypes bindings for the native host kernels (native/libmmdt.so).

Auto-builds the shared library with `make` on first use when a toolchain is
present; every entry point has a numpy fallback (utils.metrics) so the
framework runs without a compiler. Tests cross-check native vs numpy.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), 'native')
_LIB_PATH = os.path.join(_NATIVE_DIR, 'libmmdt.so')
_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(['make', '-C', _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception as e:
            logger.info('native build unavailable (%s); using numpy paths', e)
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        f32p = np.ctypeslib.ndpointer(np.float32, flags='C_CONTIGUOUS')
        i32p = np.ctypeslib.ndpointer(np.int32, flags='C_CONTIGUOUS')
        lib.mmdt_nms.restype = ctypes.c_int
        lib.mmdt_nms.argtypes = [f32p, f32p, ctypes.c_int, ctypes.c_float,
                                 i32p]
        lib.mmdt_batch_statistics.restype = None
        lib.mmdt_batch_statistics.argtypes = [
            f32p, ctypes.c_int, ctypes.c_int, f32p, ctypes.c_int,
            ctypes.c_float, f32p]
        lib.mmdt_central_distances.restype = None
        lib.mmdt_central_distances.argtypes = [
            f32p, ctypes.c_int, ctypes.c_int, f32p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float)]
        _lib = lib
    except OSError as e:
        logger.info('native lib load failed (%s); using numpy paths', e)
    return _lib


def available() -> bool:
    return _load() is not None


def nms(boxes: np.ndarray, scores: np.ndarray, iou_threshold: float
        ) -> np.ndarray:
    """Greedy NMS; returns kept indices in selection order."""
    lib = _load()
    n = len(boxes)
    if lib is None or n == 0:
        return _np_nms(boxes, scores, iou_threshold)
    boxes = np.ascontiguousarray(boxes, np.float32)
    scores = np.ascontiguousarray(scores, np.float32)
    keep = np.zeros(n, np.int32)
    n_keep = lib.mmdt_nms(boxes, scores, n, iou_threshold, keep)
    return keep[:n_keep].copy()


def _np_nms(boxes, scores, iou_threshold):
    order = np.argsort(-scores, kind='stable')
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    for i in order:
        if suppressed[i]:
            continue
        keep.append(int(i))
        x1 = np.maximum(boxes[i, 0], boxes[:, 0])
        y1 = np.maximum(boxes[i, 1], boxes[:, 1])
        x2 = np.minimum(boxes[i, 2], boxes[:, 2])
        y2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
        iou = inter / np.clip(areas[i] + areas - inter, 1e-8, None)
        suppressed |= iou > iou_threshold
        suppressed[i] = True
    return np.asarray(keep, np.int32)


def batch_statistics_tp(preds: np.ndarray, targets: np.ndarray,
                        iou_threshold: float) -> Optional[np.ndarray]:
    """Native TP assignment for one image; None when native is absent
    (caller falls back to utils.metrics.get_batch_statistics)."""
    lib = _load()
    if lib is None:
        return None
    preds = np.ascontiguousarray(preds, np.float32)
    targets = np.ascontiguousarray(targets, np.float32)
    tp = np.zeros(len(preds), np.float32)
    lib.mmdt_batch_statistics(preds, len(preds), preds.shape[1], targets,
                              len(targets), iou_threshold, tp)
    return tp


def central_distances(preds: np.ndarray, targets: np.ndarray):
    """Native CD matching for one image; None when native is absent."""
    lib = _load()
    if lib is None:
        return None
    preds = np.ascontiguousarray(preds, np.float32)
    targets = np.ascontiguousarray(targets, np.float32)
    dx = ctypes.c_float()
    dy = ctypes.c_float()
    lib.mmdt_central_distances(preds, len(preds),
                               preds.shape[1] if preds.size else 6,
                               targets, len(targets),
                               ctypes.byref(dx), ctypes.byref(dy))
    return float(dx.value), float(dy.value)
