"""ctypes bindings for the native preprocessing library.

Builds lazily with `make` on first use (g++ only; no pybind11 dependency).
All entry points return None gracefully when the library is unavailable so
callers can fall back to the PIL path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libdspreprocess.so")
_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-s", "-C", _DIR],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.ds_resize_bicubic.argtypes = [u8p, ctypes.c_int, ctypes.c_int, u8p, ctypes.c_int, ctypes.c_int]
    lib.ds_pad_normalize.argtypes = [u8p, ctypes.c_int, ctypes.c_int, f32p, ctypes.c_int, ctypes.c_uint8]
    lib.ds_normalize_chw.argtypes = [u8p, ctypes.c_int, ctypes.c_int, f32p]
    lib.ds_tile_normalize.argtypes = [u8p, ctypes.c_int, ctypes.c_int, f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.ds_rotate_cw.argtypes = [u8p, ctypes.c_int, ctypes.c_int, u8p, ctypes.c_int]
    lib.ds_gray.argtypes = [u8p, ctypes.c_int, ctypes.c_int, u8p]
    lib.ds_edge_ratio_dx_dy.argtypes = [u8p, ctypes.c_int, ctypes.c_int]
    lib.ds_edge_ratio_dx_dy.restype = ctypes.c_double
    lib.ds_dark_top_minus_bottom.argtypes = [u8p, ctypes.c_int, ctypes.c_int, ctypes.c_uint8]
    lib.ds_dark_top_minus_bottom.restype = ctypes.c_double
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _u8(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _f32(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def resize_bicubic(rgb: np.ndarray, dw: int, dh: int) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    rgb = np.ascontiguousarray(rgb, np.uint8)
    h, w, _ = rgb.shape
    out = np.empty((dh, dw, 3), np.uint8)
    lib.ds_resize_bicubic(_u8(rgb), w, h, _u8(out), dw, dh)
    return out


def pad_normalize(rgb: np.ndarray, size: int, pad_color: int) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    rgb = np.ascontiguousarray(rgb, np.uint8)
    h, w, _ = rgb.shape
    out = np.empty((3, size, size), np.float32)
    lib.ds_pad_normalize(_u8(rgb), w, h, _f32(out), size, pad_color)
    return out


def tile_normalize(rgb: np.ndarray, size: int, tiles_w: int, tiles_h: int) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    rgb = np.ascontiguousarray(rgb, np.uint8)
    h, w, _ = rgb.shape
    out = np.empty((tiles_w * tiles_h, 3, size, size), np.float32)
    lib.ds_tile_normalize(_u8(rgb), w, h, _f32(out), size, tiles_w, tiles_h)
    return out


def rotate_cw(rgb: np.ndarray, deg: int) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    rgb = np.ascontiguousarray(rgb, np.uint8)
    h, w, _ = rgb.shape
    if deg % 360 in (90, 270):
        out = np.empty((w, h, 3), np.uint8)
    else:
        out = np.empty((h, w, 3), np.uint8)
    lib.ds_rotate_cw(_u8(rgb), w, h, _u8(out), deg % 360)
    return out


def gray(rgb: np.ndarray) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    rgb = np.ascontiguousarray(rgb, np.uint8)
    h, w, _ = rgb.shape
    out = np.empty((h, w), np.uint8)
    lib.ds_gray(_u8(rgb), w, h, _u8(out))
    return out


def edge_ratio_dx_dy(g: np.ndarray) -> Optional[float]:
    lib = _load()
    if lib is None:
        return None
    g = np.ascontiguousarray(g, np.uint8)
    h, w = g.shape
    return float(lib.ds_edge_ratio_dx_dy(_u8(g), w, h))


def dark_top_minus_bottom(g: np.ndarray, thr: int = 100) -> Optional[float]:
    lib = _load()
    if lib is None:
        return None
    g = np.ascontiguousarray(g, np.uint8)
    h, w = g.shape
    return float(lib.ds_dark_top_minus_bottom(_u8(g), w, h, thr))
