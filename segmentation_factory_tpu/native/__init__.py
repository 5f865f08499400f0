"""Native (C++) input-pipeline engine, loaded via ctypes.

Builds transform_engine.cpp on first import (g++ -O3 -shared); falls back
cleanly to the pure-numpy/PIL path when no toolchain is available — callers
check :func:`available`.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "transform_engine.cpp")
_SO = os.path.join(_HERE, "libsft_transform.so")
_lib: Optional[ctypes.CDLL] = None
_lock = threading.Lock()
_build_error: Optional[str] = None


def _build() -> Optional[str]:
    cmd = [
        "g++", "-O3", "-march=native", "-fPIC", "-shared", "-std=c++17",
        "-pthread", _SRC, "-o", _SO,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return None
    except Exception as e:  # toolchain missing or compile error
        return str(e)


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_error
    with _lock:
        if _lib is not None:
            return _lib
        if _build_error is not None:
            return None
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            _build_error = _build()
            if _build_error is not None:
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError as e:
            _build_error = str(e)
            return None
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        f32p = ctypes.POINTER(ctypes.c_float)
        ip = ctypes.POINTER(ctypes.c_int)
        lib.sft_resize_bilinear_u8.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, u8p, ctypes.c_int,
            ctypes.c_int,
        ]
        lib.sft_resize_nearest_i32.argtypes = [
            i32p, ctypes.c_int, ctypes.c_int, i32p, ctypes.c_int, ctypes.c_int,
        ]
        lib.sft_batch_scale_crop.argtypes = [
            u8p, i32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, f32p, ip, ip,
            ctypes.c_int, ctypes.c_int, u8p, i32p, ctypes.c_int,
        ]
        lib.sft_rotate_pair.argtypes = [
            u8p, i32p, ctypes.c_int, ctypes.c_int, ctypes.c_float,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, u8p, i32p,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def resize_bilinear_u8(img: np.ndarray, dh: int, dw: int) -> np.ndarray:
    lib = _load()
    assert lib is not None
    img = np.ascontiguousarray(img, np.uint8)
    h, w, c = img.shape
    out = np.empty((dh, dw, c), np.uint8)
    lib.sft_resize_bilinear_u8(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, c,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), dh, dw,
    )
    return out


def resize_nearest_i32(lbl: np.ndarray, dh: int, dw: int) -> np.ndarray:
    lib = _load()
    assert lib is not None
    lbl = np.ascontiguousarray(lbl, np.int32)
    h, w = lbl.shape
    out = np.empty((dh, dw), np.int32)
    lib.sft_resize_nearest_i32(
        lbl.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), dh, dw,
    )
    return out


def batch_scale_crop(
    imgs: np.ndarray,  # (N, H, W, 3) uint8 — shared canvas
    lbls: np.ndarray,  # (N, H, W) int32
    scales: np.ndarray,  # (N,) float32
    tops: np.ndarray,  # (N,) int32 crop offsets in the scaled canvas
    lefts: np.ndarray,
    crop: int,
    ignore_index: int = 255,
    num_threads: int = 8,
) -> Tuple[np.ndarray, np.ndarray]:
    lib = _load()
    assert lib is not None
    imgs = np.ascontiguousarray(imgs, np.uint8)
    lbls = np.ascontiguousarray(lbls, np.int32)
    assert imgs.ndim == 4 and imgs.shape[-1] == 3, imgs.shape
    assert lbls.shape == imgs.shape[:3], (lbls.shape, imgs.shape)
    n, h, w, _ = imgs.shape
    scales = np.ascontiguousarray(scales, np.float32)
    tops = np.ascontiguousarray(tops, np.int32)
    lefts = np.ascontiguousarray(lefts, np.int32)
    out_i = np.empty((n, crop, crop, 3), np.uint8)
    out_l = np.empty((n, crop, crop), np.int32)
    lib.sft_batch_scale_crop(
        imgs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        lbls.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n, h, w,
        scales.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        tops.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        lefts.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        crop, ignore_index,
        out_i.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out_l.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        num_threads,
    )
    return out_i, out_l


def rotate_pair(
    img: np.ndarray,  # (H, W, 3) uint8
    lbl: np.ndarray,  # (H, W) int32
    angle_deg: float,
    nearest_img: bool = False,
    img_fill: int = 0,
    lbl_fill: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Paired center rotation (PIL rotate(expand=False) semantics); label
    NEAREST, image bilinear unless nearest_img."""
    lib = _load()
    assert lib is not None
    img = np.ascontiguousarray(img, np.uint8)
    lbl = np.ascontiguousarray(lbl, np.int32)
    # the C++ writes h*w*3 bytes derived from the LABEL shape — a mismatched
    # image would be heap corruption, not a Python error
    assert img.ndim == 3 and img.shape[-1] == 3, img.shape
    assert img.shape[:2] == lbl.shape, (img.shape, lbl.shape)
    h, w = lbl.shape
    out_i = np.empty_like(img)
    out_l = np.empty_like(lbl)
    lib.sft_rotate_pair(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        lbl.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        h, w, float(angle_deg), int(nearest_img), int(img_fill), int(lbl_fill),
        out_i.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out_l.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out_i, out_l
