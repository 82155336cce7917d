"""ctypes binding for the native image codec (native/imgcodec.cpp).

Builds libimgcodec.so on first use (g++ + libjpeg + libpng, all present in
the image) and caches it next to the source.  Falls back gracefully: the data
pipeline uses cv2/PIL when the native codec is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_ROOT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SRC = os.path.join(_ROOT, "imgcodec.cpp")
_SO = os.path.join(_ROOT, "libimgcodec.so")

_lock = threading.Lock()
_lib = None
_failed = False


def _load():
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    with _lock:
        if _lib is not None or _failed:
            return _lib
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", _SRC,
                     "-ljpeg", "-lpng", "-o", _SO],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(_SO)
            lib.dg_decode.restype = ctypes.c_int
            lib.dg_decode.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t, ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
            lib.dg_jpeg_roundtrip.restype = ctypes.c_int
            lib.dg_jpeg_roundtrip.argtypes = [
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_void_p]
            _lib = lib
        except Exception:
            _failed = True
    return _lib


def available() -> bool:
    return _load() is not None


def decode(path: str) -> np.ndarray | None:
    """Decode a JPEG/PNG file to RGB uint8 (H, W, 3); None if unsupported."""
    lib = _load()
    if lib is None:
        return None
    with open(path, "rb") as f:
        data = f.read()
    h = ctypes.c_int()
    w = ctypes.c_int()
    if lib.dg_decode(data, len(data), None, ctypes.byref(h),
                     ctypes.byref(w)) != 0:
        return None
    out = np.empty((h.value, w.value, 3), np.uint8)
    if lib.dg_decode(data, len(data), out.ctypes.data, ctypes.byref(h),
                     ctypes.byref(w)) != 0:
        return None
    return out


def jpeg_roundtrip_u8(rgb: np.ndarray, quality: int) -> np.ndarray | None:
    """Exact libjpeg encode/decode round trip on RGB uint8 — byte-level
    parity with tf.image.adjust_jpeg_quality, for golden tests and an
    optional host degradation path."""
    lib = _load()
    if lib is None:
        return None
    rgb = np.ascontiguousarray(rgb, np.uint8)
    h, w = rgb.shape[:2]
    out = np.empty_like(rgb)
    rc = lib.dg_jpeg_roundtrip(rgb.ctypes.data, h, w, int(quality),
                               out.ctypes.data)
    return out if rc == 0 else None
