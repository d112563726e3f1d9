"""ctypes binding for the native evaluation kernels (csrc/rle_ops.c).

Compiles the C library on first use (cc -O3 -shared) and caches the .so next to
the source; falls back to the pure-python path when no compiler is available.
This is the TPU-framework analogue of the reference's pybind'd COCOeval C++
fast path (csrc/cocoeval/cocoeval.cpp, enabled by use_fast_impl).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import List, Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger("vnext_tpu")

_LIB = None
_TRIED = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    src = os.path.join(os.path.dirname(__file__), "csrc", "rle_ops.c")
    so = os.path.join(os.path.dirname(__file__), "csrc", "_rle_ops.so")
    try:
        if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
            subprocess.run(
                ["cc", "-O3", "-fPIC", "-shared", "-o", so, src],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(so)
        lib.rle_intersection_union.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ]
        lib.tube_iou_matrix.argtypes = [
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.match_greedy.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ]
        _LIB = lib
        logger.info("native rle_ops loaded from %s", so)
    except Exception as e:  # pragma: no cover - depends on toolchain
        logger.warning("native rle_ops unavailable (%s); using python fallback", e)
        _LIB = None
    return _LIB


def available() -> bool:
    return _build_and_load() is not None


def _ptr(a: np.ndarray, typ):
    return a.ctypes.data_as(ctypes.POINTER(typ))


def rle_intersection_union_native(ca: Sequence[int], cb: Sequence[int]) -> Tuple[float, float]:
    lib = _build_and_load()
    assert lib is not None
    a = np.ascontiguousarray(ca, dtype=np.int64)
    b = np.ascontiguousarray(cb, dtype=np.int64)
    inter = ctypes.c_double()
    union = ctypes.c_double()
    lib.rle_intersection_union(
        _ptr(a, ctypes.c_int64), len(a), _ptr(b, ctypes.c_int64), len(b),
        ctypes.byref(inter), ctypes.byref(union),
    )
    return inter.value, union.value


def tube_iou_matrix_native(
    det_segms: List[List[Optional[dict]]],
    gt_segms: List[List[Optional[dict]]],
    gt_iscrowd: Sequence[bool],
) -> np.ndarray:
    """[D, G] tube IoU over aligned frame lists of (decompressed-countable) RLEs."""
    from .rle import decompress_counts

    lib = _build_and_load()
    assert lib is not None
    D, G = len(det_segms), len(gt_segms)
    T = len(det_segms[0]) if D else (len(gt_segms[0]) if G else 0)

    counts_flat: List[np.ndarray] = []
    offsets = {}
    total = 0

    def intern(segms, tag):
        nonlocal total
        off = np.zeros((len(segms), T), np.int64)
        ln = np.zeros((len(segms), T), np.int64)
        for i, frames in enumerate(segms):
            for t, s in enumerate(frames):
                if s is None:
                    continue
                c = s["counts"]
                if isinstance(c, (str, bytes)):
                    c = decompress_counts(c)
                arr = np.ascontiguousarray(c, dtype=np.int64)
                counts_flat.append(arr)
                off[i, t] = total
                ln[i, t] = len(arr)
                total += len(arr)
        return off, ln

    det_off, det_len = intern(det_segms, "d")
    gt_off, gt_len = intern(gt_segms, "g")
    buf = (
        np.concatenate(counts_flat) if counts_flat else np.zeros((1,), np.int64)
    ).astype(np.int64)
    crowd = np.ascontiguousarray(gt_iscrowd, dtype=np.uint8)
    out = np.zeros((D, G), np.float64)
    if D and G:
        lib.tube_iou_matrix(
            _ptr(buf, ctypes.c_int64),
            _ptr(det_off.reshape(-1), ctypes.c_int64), _ptr(det_len.reshape(-1), ctypes.c_int64),
            _ptr(gt_off.reshape(-1), ctypes.c_int64), _ptr(gt_len.reshape(-1), ctypes.c_int64),
            _ptr(crowd, ctypes.c_uint8),
            D, G, T, _ptr(out.reshape(-1), ctypes.c_double),
        )
    return out


def match_greedy_native(
    iou: np.ndarray,
    gt_ignore: Sequence[bool],
    thrs: np.ndarray,
    iscrowd: Optional[Sequence[bool]] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Greedy matching at every threshold: (matched [T, D], ignored [T, D]).

    The reference's cocoeval.cpp MatchDetectionsToGt inner loop; detections must
    be score-sorted rows of ``iou`` and GT columns sorted ignore-last (the
    pycocotools gtind argsort invariant). Only crowd GTs may be re-matched.
    """
    lib = _build_and_load()
    assert lib is not None
    iou = np.ascontiguousarray(iou, dtype=np.float64)
    d, g = iou.shape
    ign = np.ascontiguousarray(gt_ignore, dtype=np.uint8)
    crowd = (
        np.zeros(g, np.uint8)
        if iscrowd is None
        else np.ascontiguousarray(iscrowd, dtype=np.uint8)
    )
    th = np.ascontiguousarray(thrs, dtype=np.float64)
    t = len(th)
    matched = np.zeros((t, d), np.uint8)
    ignored = np.zeros((t, d), np.uint8)
    lib.match_greedy(
        _ptr(iou.reshape(-1), ctypes.c_double), d, g,
        _ptr(ign, ctypes.c_uint8), _ptr(crowd, ctypes.c_uint8),
        _ptr(th, ctypes.c_double), t,
        _ptr(matched.reshape(-1), ctypes.c_uint8),
        _ptr(ignored.reshape(-1), ctypes.c_uint8),
    )
    return matched.astype(bool), ignored.astype(bool)
