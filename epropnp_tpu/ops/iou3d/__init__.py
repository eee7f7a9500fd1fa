"""Native rotated IoU / NMS (C++ via ctypes) for host-side evaluation.

The device compute path uses the pure-JAX kernels
(``epropnp_tpu.core.bbox_3d``); this package provides the native
equivalents of the reference's CUDA ``iou3d_cuda`` extension and
numba(-CUDA) evaluation kernels for host-side post-processing — KITTI-style
AP evaluation and nuScenes multi-camera fusion NMS — where numpy arrays,
not device buffers, are in play.

The shared library is compiled from ``src/iou3d.cpp`` on first use and
cached next to the source; import falls back to the JAX implementation if
no C++ toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), 'src',
                    'iou3d.cpp')
_LIB = os.path.join(os.path.dirname(os.path.abspath(__file__)), 'src',
                    '_iou3d.so')

_lib = None
_load_error = None


def _build():
    cmd = ['g++', '-O3', '-shared', '-fPIC', '-std=c++17', _SRC, '-o', _LIB]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib, _load_error
    if _lib is not None or _load_error is not None:
        return _lib
    try:
        if (not os.path.isfile(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_LIB)
        lib.rotated_iou_matrix.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float)]
        lib.nms_rotated.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_float, ctypes.POINTER(ctypes.c_uint8)]
        lib.boxes_iou_3d.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float)]
        _lib = lib
    except Exception as e:  # noqa: BLE001
        _load_error = e
    return _lib


def native_available() -> bool:
    return _load() is not None


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def rotated_iou_matrix(boxes1: np.ndarray, boxes2: np.ndarray,
                       criterion: str = 'iou') -> np.ndarray:
    """All-pairs rotated IoU on host. boxes: (n, 5) [cx, cy, w, h, ang]."""
    lib = _load()
    boxes1 = np.ascontiguousarray(boxes1, np.float32)
    boxes2 = np.ascontiguousarray(boxes2, np.float32)
    n1, n2 = len(boxes1), len(boxes2)
    crit = {'iou': 0, 'iof1': 1, 'inter': 2}[criterion]
    if lib is None:  # fallback: JAX implementation on CPU
        from ...core.bbox_3d.rotate_iou import rotated_iou_matrix as jx
        import jax.numpy as jnp
        return np.asarray(jx(jnp.asarray(boxes1), jnp.asarray(boxes2),
                             criterion=criterion))
    out = np.empty((n1, n2), np.float32)
    lib.rotated_iou_matrix(_fptr(boxes1), n1, _fptr(boxes2), n2, crit,
                           _fptr(out))
    return out


def nms_rotated(boxes: np.ndarray, scores: np.ndarray,
                thresh: float) -> np.ndarray:
    """Greedy rotated NMS on host -> bool keep mask (original order)."""
    lib = _load()
    boxes = np.ascontiguousarray(boxes, np.float32)
    scores = np.ascontiguousarray(scores, np.float32)
    n = len(boxes)
    if lib is None:
        from ...core.bbox_3d.nms import nms_rotated as jx
        import jax.numpy as jnp
        return np.asarray(jx(jnp.asarray(boxes), jnp.asarray(scores),
                             thresh))
    keep = np.empty((n,), np.uint8)
    lib.nms_rotated(_fptr(boxes),
                    scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                    n, ctypes.c_float(thresh),
                    keep.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return keep.astype(bool)


def boxes_iou_3d(boxes1: np.ndarray, boxes2: np.ndarray) -> np.ndarray:
    """All-pairs 3D IoU of camera-frame boxes [l, h, w, x, y, z, ry]."""
    lib = _load()
    boxes1 = np.ascontiguousarray(boxes1, np.float32)
    boxes2 = np.ascontiguousarray(boxes2, np.float32)
    if lib is None:
        from ...core.bbox_3d.rotate_iou import box3d_overlap_camera
        import jax.numpy as jnp
        return np.asarray(box3d_overlap_camera(
            jnp.asarray(boxes1), jnp.asarray(boxes2), aligned=False))
    out = np.empty((len(boxes1), len(boxes2)), np.float32)
    lib.boxes_iou_3d(_fptr(boxes1), len(boxes1), _fptr(boxes2),
                     len(boxes2), _fptr(out))
    return out
