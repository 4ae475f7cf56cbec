"""ctypes bindings for the native host-ops library (native/host_ops.cc).

Auto-builds with g++ on first use (cached in the repo's native/ dir); every
entry point has a numpy fallback so the framework works without a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_REPO_ROOT, "native", "host_ops.cc")
_LIB = os.path.join(_REPO_ROOT, "native", "libloongx_host.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB, _SRC],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) and os.path.exists(_SRC):
            if not _build():
                return None
        if not os.path.exists(_LIB):
            return None
        lib = ctypes.CDLL(_LIB)
        lib.u8_to_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_float, ctypes.c_float,
            ctypes.c_void_p,
        ]
        lib.resize_bilinear_u8_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_float,
            ctypes.c_float,
        ]
        lib.rgb_to_gray3_u8.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
        ]
        _lib = lib
        return _lib


def u8_to_f32(img: np.ndarray, scale: float = 1.0 / 255.0,
              offset: float = 0.0) -> np.ndarray:
    """uint8 array -> float32 (y = x*scale + offset)."""
    img = np.ascontiguousarray(img, np.uint8)
    lib = get_lib()
    if lib is None:
        return img.astype(np.float32) * scale + offset
    out = np.empty(img.shape, np.float32)
    lib.u8_to_f32(
        img.ctypes.data, img.size, ctypes.c_float(scale),
        ctypes.c_float(offset), out.ctypes.data,
    )
    return out


def resize_bilinear(img: np.ndarray, dh: int, dw: int,
                    scale: float = 1.0 / 255.0,
                    offset: float = 0.0) -> np.ndarray:
    """uint8 [H, W, C] -> float32 [dh, dw, C] bilinear + affine."""
    img = np.ascontiguousarray(img, np.uint8)
    sh, sw, c = img.shape
    lib = get_lib()
    if lib is None:
        from PIL import Image

        pil = Image.fromarray(img).resize((dw, dh), Image.BILINEAR)
        return np.asarray(pil, np.float32) * scale + offset
    out = np.empty((dh, dw, c), np.float32)
    lib.resize_bilinear_u8_f32(
        img.ctypes.data, sh, sw, c, out.ctypes.data, dh, dw,
        ctypes.c_float(scale), ctypes.c_float(offset),
    )
    return out


def rgb_to_gray3(img: np.ndarray) -> np.ndarray:
    """uint8 [H, W, 3] -> uint8 [H, W, 3] grayscale-replicated."""
    img = np.ascontiguousarray(img, np.uint8)
    lib = get_lib()
    if lib is None:
        g = (img @ np.asarray([0.299, 0.587, 0.114])).round().astype(np.uint8)
        return np.repeat(g[..., None], 3, axis=-1)
    out = np.empty_like(img)
    lib.rgb_to_gray3_u8(img.ctypes.data, img.shape[0] * img.shape[1],
                        out.ctypes.data)
    return out
