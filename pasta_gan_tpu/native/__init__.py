"""ctypes bindings for the native host-ops library (host_ops.cpp).

Compiled on first use with g++ (cached as host_ops.so next to the source, keyed
on a source digest — the same incremental-build idea as the reference's
`custom_ops.get_plugin`, `torch_utils/custom_ops.py:46-124`).  All entry
points fall back to numpy/cv2 implementations when the toolchain is absent.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "host_ops.cpp")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        digest = hashlib.md5(open(_SRC, "rb").read()).hexdigest()[:12]
        so_path = os.path.join(_HERE, f"host_ops-{digest}.so")
        if not os.path.exists(so_path):
            try:
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
                     "-o", so_path, _SRC],
                    check=True, capture_output=True,
                )
            except Exception:
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(so_path)
        except OSError:
            _build_failed = True
            return None

        lib.warp_perspective_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ]
        lib.fill_polygon_f32.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ]
        lib.dilate_box_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.draw_line_u8.argtypes = [
            ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_ubyte, ctypes.c_ubyte, ctypes.c_ubyte, ctypes.c_int,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _build() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def warp_perspective(src: np.ndarray, M: np.ndarray, out_hw, border: str = "constant"):
    """cv2.warpPerspective-compatible host warp; src [H,W,C] float32."""
    lib = _build()
    src = np.ascontiguousarray(src, np.float32)
    if src.ndim == 2:
        src = src[..., None]
    h, w = out_hw
    if lib is None:
        from ..data.warp import warp_perspective as jwarp
        import jax.numpy as jnp

        return np.asarray(jwarp(jnp.asarray(src), jnp.asarray(M, jnp.float32), (h, w), border))
    dst = np.empty((h, w, src.shape[2]), np.float32)
    M64 = np.ascontiguousarray(M, np.float64)
    lib.warp_perspective_f32(
        _fptr(src), src.shape[0], src.shape[1], src.shape[2],
        _fptr(dst), h, w,
        M64.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        1 if border == "replicate" else 0,
    )
    return dst


def fill_polygon(points: np.ndarray, h: int, w: int) -> np.ndarray:
    lib = _build()
    pts = np.ascontiguousarray(points, np.float64)
    if lib is None:
        from ..data.masks import _fill_polygon

        return _fill_polygon(points.astype(np.float32), h, w)[..., 0]
    mask = np.empty((h, w), np.float32)
    lib.fill_polygon_f32(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(pts), _fptr(mask), h, w
    )
    return mask


def dilate_box(mask: np.ndarray, ksize: int) -> np.ndarray:
    lib = _build()
    m = np.ascontiguousarray(mask, np.float32)
    squeeze = m.ndim == 3
    if squeeze:
        m = m[..., 0]
    if lib is None:
        from ..data.masks import _dilate

        out = _dilate(m[..., None], ksize)
        return out if squeeze else out[..., 0]
    dst = np.empty_like(m)
    lib.dilate_box_f32(_fptr(m), _fptr(dst), m.shape[0], m.shape[1], ksize)
    return dst[..., None] if squeeze else dst


def draw_line(img: np.ndarray, p0, p1, color, thickness: int = 2) -> np.ndarray:
    lib = _build()
    assert img.dtype == np.uint8 and img.ndim == 3 and img.shape[2] == 3
    if lib is None:
        from ..data.stickman import _draw_line_np

        return _draw_line_np(img, p0, p1, color, thickness)
    lib.draw_line_u8(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        img.shape[0], img.shape[1],
        int(p0[0]), int(p0[1]), int(p1[0]), int(p1[1]),
        int(color[0]), int(color[1]), int(color[2]), thickness,
    )
    return img
