"""JPEG decode (baseline + progressive) via the native library (jpeg.cc)."""

from __future__ import annotations

import ctypes

import numpy as np

from tpuvf.native import lib as _lib_mod


class JpegError(ValueError):
    pass


_ERRORS = {
    1: "not a JPEG", 2: "bad marker stream", 3: "truncated/invalid segment",
    4: "unsupported precision/component count", 5: "sampling beyond 2x2",
    6: "lossless/arithmetic/hierarchical JPEG unsupported",
    7: "missing SOF before SOS", 8: "no scan data",
}


def _fn():
    lib = _lib_mod._load()
    f = lib.vf_jpeg_decode
    f.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ]
    f.restype = ctypes.c_int
    return f


def decode(data: bytes) -> np.ndarray:
    """JPEG bytes -> (H, W, 4) uint8 RGBA (alpha = 255)."""
    f = _fn()
    buf = np.frombuffer(data, np.uint8)
    ptr = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    w = ctypes.c_int32(0)
    h = ctypes.c_int32(0)
    rc = f(ptr, len(data), None, ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        raise JpegError(_ERRORS.get(rc, f"decode error {rc}"))
    out = np.empty((h.value, w.value, 4), np.uint8)
    rc = f(ptr, len(data),
           out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
           ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        raise JpegError(_ERRORS.get(rc, f"decode error {rc}"))
    return out


def _enc_fn():
    lib = _lib_mod._load()
    f = lib.vf_jpeg_encode
    f.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
    ]
    f.restype = ctypes.c_int64
    return f


def encode(rgba: np.ndarray, quality: int = 85) -> bytes:
    """(H, W, 4) uint8 RGBA -> baseline JFIF bytes (4:2:0, Annex-K
    tables, IJG quality scaling; jpegenc.cc)."""
    f = _enc_fn()
    rgba = np.ascontiguousarray(rgba, np.uint8)
    if rgba.ndim != 3 or rgba.shape[2] != 4:
        raise JpegError(f"encode expects (H, W, 4) RGBA, got {rgba.shape}")
    h, w = rgba.shape[:2]
    cap = w * h * 4 + (1 << 16)
    out = np.empty(cap, np.uint8)
    n = f(rgba.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
          w, h, int(quality),
          out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap)
    if n == -1:  # pathological content: retry with a worst-case buffer
        cap = w * h * 12 + (1 << 16)
        out = np.empty(cap, np.uint8)
        n = f(rgba.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
              w, h, int(quality),
              out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap)
    if n < 0:
        raise JpegError(f"encode error {n}")
    return out[:n].tobytes()
