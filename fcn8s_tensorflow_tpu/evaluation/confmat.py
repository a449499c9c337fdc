"""ctypes binding to the native confusion-matrix kernel, with NumPy fallback.

Mirrors the reference's Cython fast path / Python slow path split
(`/root/reference/cityscapesscripts/evaluation/evalPixelLevelSemanticLabeling.py:584-593`):
the native kernel (fcn8s_tensorflow_tpu/native/confusion_matrix.cpp) is
auto-built on first use if missing; if no compiler is available, a vectorized
``np.bincount`` path (already ~100x the reference's pixel loop) takes over.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_SO_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libconfmat.so"))

_lib = None
_load_attempted = False


def _load_native():
    global _lib, _load_attempted
    if _load_attempted:
        return _lib
    _load_attempted = True
    if not os.path.isfile(_SO_PATH):
        try:
            subprocess.run(
                ["make", "-C", os.path.abspath(_NATIVE_DIR)],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
        lib.confusion_matrix_u8_mt.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint32,
            ctypes.c_void_p, ctypes.c_int32,
        ]
        lib.validate_labels_u8.restype = ctypes.c_int64
        lib.validate_labels_u8.argtypes = [
            ctypes.c_void_p, ctypes.c_uint64, ctypes.c_void_p,
        ]
        lib.instance_tp_size_u8.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint64, ctypes.c_int32,
            ctypes.c_uint8, ctypes.c_void_p, ctypes.c_void_p,
        ]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def native_available() -> bool:
    return _load_native() is not None


def accumulate_confusion(
    prediction: np.ndarray,
    ground_truth: np.ndarray,
    conf_matrix: np.ndarray,
    *,
    n_threads: int | None = None,
) -> np.ndarray:
    """conf_matrix[gt, pred] += 1 over all pixels, in place.

    ``conf_matrix`` must be a C-contiguous uint64 (dim, dim) array;
    prediction/ground_truth are uint8 arrays of identical shape.
    """
    pred = np.ascontiguousarray(prediction, dtype=np.uint8).reshape(-1)
    gt = np.ascontiguousarray(ground_truth, dtype=np.uint8).reshape(-1)
    if pred.size != gt.size:
        raise ValueError(f"size mismatch: pred {pred.size} vs gt {gt.size}")
    if conf_matrix.dtype != np.uint64 or not conf_matrix.flags.c_contiguous:
        raise ValueError("conf_matrix must be C-contiguous uint64")
    dim = conf_matrix.shape[0]

    lib = _load_native()
    if lib is not None:
        lib.confusion_matrix_u8_mt(
            gt.ctypes.data, pred.ctypes.data, gt.size, dim,
            conf_matrix.ctypes.data, n_threads or (os.cpu_count() or 1),
        )
        return conf_matrix
    # NumPy fallback: flat bincount of gt*dim+pred
    flat = gt.astype(np.int64) * dim + pred
    counts = np.bincount(flat, minlength=dim * dim)
    conf_matrix += counts.reshape(dim, dim).astype(np.uint64)
    return conf_matrix


def find_invalid_label(ground_truth: np.ndarray, valid_labels) -> int:
    """Index of the first GT pixel with a label outside ``valid_labels``,
    or -1 (the reference's 'Unknown label' check)."""
    gt = np.ascontiguousarray(ground_truth, dtype=np.uint8).reshape(-1)
    lut = np.zeros(256, dtype=np.uint8)
    lut[np.asarray(list(valid_labels), dtype=np.int64)] = 1
    lib = _load_native()
    if lib is not None:
        return int(lib.validate_labels_u8(gt.ctypes.data, gt.size, lut.ctypes.data))
    bad = np.nonzero(~lut[gt].astype(bool))[0]
    return int(bad[0]) if bad.size else -1


def instance_tp_size(prediction: np.ndarray, instance_map: np.ndarray,
                     inst_id: int, label_id: int) -> tuple[int, int]:
    """(true positives, instance size) for one instance id — the per-instance
    hot loop of the pixel evaluator's instance-weighted stats."""
    pred = np.ascontiguousarray(prediction, dtype=np.uint8).reshape(-1)
    inst = np.ascontiguousarray(instance_map, dtype=np.int32).reshape(-1)
    lib = _load_native()
    if lib is not None:
        tp = ctypes.c_uint64()
        size = ctypes.c_uint64()
        lib.instance_tp_size_u8(
            pred.ctypes.data, inst.ctypes.data, pred.size,
            int(inst_id), int(label_id), ctypes.byref(tp), ctypes.byref(size),
        )
        return tp.value, size.value
    mask = inst == inst_id
    return int(np.count_nonzero(pred[mask] == label_id)), int(np.count_nonzero(mask))
