"""ctypes bindings for libtpuvf_native.so."""

from __future__ import annotations

import ctypes

import numpy as np

from tpuvf import native as _native_pkg

_lib = None


def _load():
    global _lib
    if _lib is None:
        path = _native_pkg.build()
        _lib = ctypes.CDLL(path)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64 = ctypes.c_int64
        _lib.vf_interleaved_to_planar.argtypes = [u8p, u8p, i64, i64, i32p]
        _lib.vf_planar_to_interleaved.argtypes = [u8p, u8p, i64, i64, i32p]
        _lib.vf_deinterleave2.argtypes = [u8p, u8p, u8p, i64]
        _lib.vf_interleave2.argtypes = [u8p, u8p, u8p, i64]
        _lib.vf_split_quad.argtypes = [u8p, u8p, u8p, u8p, u8p, i64, i64]
        u32p = ctypes.POINTER(ctypes.c_uint32)
        _lib.vf_interleave4_u32.argtypes = [u32p, u32p, u32p, u32p, u32p,
                                            i64, i64]
        _lib.vf_interleave16_u32.argtypes = [ctypes.POINTER(u32p), u32p,
                                             i64, i64]
        _lib.vf_interleave_grid_u32.argtypes = [ctypes.POINTER(u32p), u32p,
                                                i64, i64, ctypes.c_int]
        _lib.vf_interleave2_u32.argtypes = [u32p, u32p, u32p, i64]
        u16p = ctypes.POINTER(ctypes.c_uint16)
        _lib.vf_interleave_6byte.argtypes = [u32p, u16p, u8p, i64]
        _lib.vf_unpack_422.argtypes = [u8p, u8p, u8p, u8p, i64, i64,
                                       ctypes.c_int, ctypes.c_int,
                                       ctypes.c_int, ctypes.c_int]
        _lib.vf_pack_422.argtypes = [u8p, u8p, u8p, u8p, i64, i64,
                                     ctypes.c_int, ctypes.c_int,
                                     ctypes.c_int, ctypes.c_int]
        _lib.vf_png_unfilter.argtypes = [u8p, u8p, i64, i64, ctypes.c_int]
        _lib.vf_png_unfilter.restype = ctypes.c_int
    return _lib


def _u8ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def interleaved_to_planar(src: np.ndarray, perm=(0, 1, 2, 3)) -> np.ndarray:
    """(h, w, 4) uint8 -> (4, h, w); dst[c] = src[..., perm[c]]."""
    lib = _load()
    src = np.ascontiguousarray(src, np.uint8)
    h, w = src.shape[:2]
    dst = np.empty((4, h, w), np.uint8)
    p = np.asarray(perm, np.int32)
    lib.vf_interleaved_to_planar(
        _u8ptr(src), _u8ptr(dst), h, w,
        p.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return dst


def planar_to_interleaved(src: np.ndarray, perm=(0, 1, 2, 3)) -> np.ndarray:
    """(4, h, w) uint8 -> (h, w, 4); dst[..., perm[c]] = src[c]."""
    lib = _load()
    src = np.ascontiguousarray(src, np.uint8)
    _, h, w = src.shape
    dst = np.empty((h, w, 4), np.uint8)
    p = np.asarray(perm, np.int32)
    lib.vf_planar_to_interleaved(
        _u8ptr(src), _u8ptr(dst), h, w,
        p.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return dst


def deinterleave2(src: np.ndarray):
    """(h, 2n) uint8 -> ((h, n), (h, n))."""
    lib = _load()
    src = np.ascontiguousarray(src, np.uint8)
    h, w2 = src.shape
    n = h * (w2 // 2)
    a = np.empty((h, w2 // 2), np.uint8)
    b = np.empty((h, w2 // 2), np.uint8)
    lib.vf_deinterleave2(_u8ptr(src), _u8ptr(a), _u8ptr(b), n)
    return a, b


def interleave2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    lib = _load()
    a = np.ascontiguousarray(a, np.uint8)
    b = np.ascontiguousarray(b, np.uint8)
    h, n = a.shape
    dst = np.empty((h, 2 * n), np.uint8)
    lib.vf_interleave2(_u8ptr(a), _u8ptr(b), _u8ptr(dst), h * n)
    return dst


def split_quad(src: np.ndarray):
    """(h, w) uint8 -> (ee, eo, oe, oo) (h/2, w/2) row x col phase planes."""
    lib = _load()
    src = np.ascontiguousarray(src, np.uint8)
    h, w = src.shape
    quads = tuple(np.empty((h // 2, w // 2), np.uint8) for _ in range(4))
    lib.vf_split_quad(_u8ptr(src), *(_u8ptr(q) for q in quads), h, w)
    return quads


def interleave4_u32(ee: np.ndarray, eo: np.ndarray, oe: np.ndarray,
                    oo: np.ndarray) -> np.ndarray:
    """Four (h2, w2) uint32 word planes -> (2*h2, 2*w2) uint32 interleaved
    (dst[2r+rp, 2c+cp] = phase[rp][cp][r, c])."""
    lib = _load()
    u32p = ctypes.POINTER(ctypes.c_uint32)

    def p32(a):
        return a.ctypes.data_as(u32p)

    quads = [np.ascontiguousarray(a, np.uint32) for a in (ee, eo, oe, oo)]
    h2, w2 = quads[0].shape
    dst = np.empty((2 * h2, 2 * w2), np.uint32)
    lib.vf_interleave4_u32(*(p32(q) for q in quads), p32(dst), h2, w2)
    return dst


def interleave16_u32(grid) -> np.ndarray:
    """Sixteen (h4, w4) uint32 word planes (row-major grid phase order,
    grid[4*qq + p]) -> (4*h4, 4*w4) uint32 interleaved
    (dst[4r+qq, 4c+p] = grid[4*qq+p][r, c]) — the packed32g sink edge."""
    lib = _load()
    u32p = ctypes.POINTER(ctypes.c_uint32)
    grid = [np.ascontiguousarray(a, np.uint32) for a in grid]
    if len(grid) != 16:
        raise ValueError(f"interleave16_u32 needs 16 planes, got {len(grid)}")
    h4, w4 = grid[0].shape
    dst = np.empty((4 * h4, 4 * w4), np.uint32)
    ptrs = (u32p * 16)(*(a.ctypes.data_as(u32p) for a in grid))
    lib.vf_interleave16_u32(ptrs, dst.ctypes.data_as(u32p), h4, w4)
    return dst


def interleave_grid_u32(grid, g: int) -> np.ndarray:
    """g*g (hg, wg) uint32 word planes (row-major grid phase order,
    grid[g*qq + p]) -> (g*hg, g*wg) uint32 interleaved
    (dst[g*r+qq, g*c+p] = grid[g*qq+p][r, c]) — the packed32g8 sink
    edge at g=8."""
    lib = _load()
    u32p = ctypes.POINTER(ctypes.c_uint32)
    grid = [np.ascontiguousarray(a, np.uint32) for a in grid]
    if len(grid) != g * g:
        raise ValueError(
            f"interleave_grid_u32 needs {g * g} planes, got {len(grid)}")
    hg, wg = grid[0].shape
    dst = np.empty((g * hg, g * wg), np.uint32)
    ptrs = (u32p * (g * g))(*(a.ctypes.data_as(u32p) for a in grid))
    lib.vf_interleave_grid_u32(ptrs, dst.ctypes.data_as(u32p), hg, wg, g)
    return dst


def interleave2_u32(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise u32 column interleave of two equal-shape 2D planes:
    dst[r, 2c] = a[r, c], dst[r, 2c+1] = b[r, c] (the packed420g8
    half-word streams)."""
    lib = _load()
    u32p = ctypes.POINTER(ctypes.c_uint32)
    a = np.ascontiguousarray(a, np.uint32)
    b = np.ascontiguousarray(b, np.uint32)
    if a.shape != b.shape:
        raise ValueError("interleave2_u32 needs equal shapes")
    h, w = a.shape
    dst = np.empty((h, 2 * w), np.uint32)
    lib.vf_interleave2_u32(a.ctypes.data_as(u32p), b.ctypes.data_as(u32p),
                           dst.ctypes.data_as(u32p), h * w)
    return dst


def interleave_6byte(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(h, w) u32 + (h, w) u16 word streams -> (h, 6w) u8 rows with a
    6-byte period: dst[r, 6c+{0..3}] = a[r, c] bytes, dst[r, 6c+{4,5}]
    = b[r, c] bytes (the packed420g6 sink-edge row re-join)."""
    lib = _load()
    u32p = ctypes.POINTER(ctypes.c_uint32)
    u16p = ctypes.POINTER(ctypes.c_uint16)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    a = np.ascontiguousarray(a, np.uint32)
    b = np.ascontiguousarray(b, np.uint16)
    if a.shape != b.shape:
        raise ValueError("interleave_6byte needs equal shapes")
    h, w = a.shape
    dst = np.empty((h, 6 * w), np.uint8)
    lib.vf_interleave_6byte(a.ctypes.data_as(u32p), b.ctypes.data_as(u16p),
                            dst.ctypes.data_as(u8p), h * w)
    return dst


_422_ORDER = {"UYVY": (0, 1, 2, 3), "YUY2": (1, 0, 3, 2)}  # (u, y0, v, y1)


def unpack_422(raw: np.ndarray, fmt: str):
    """(h, 2w) byte rows -> (y (h,w), u (h,w/2), v (h,w/2))."""
    lib = _load()
    raw = np.ascontiguousarray(raw, np.uint8)
    h, bw = raw.shape
    w = bw // 2
    y = np.empty((h, w), np.uint8)
    u = np.empty((h, w // 2), np.uint8)
    v = np.empty((h, w // 2), np.uint8)
    up, y0p, vp, y1p = _422_ORDER[fmt]
    lib.vf_unpack_422(_u8ptr(raw), _u8ptr(y), _u8ptr(u), _u8ptr(v),
                      h, w, up, y0p, vp, y1p)
    return y, u, v


def pack_422(y: np.ndarray, u: np.ndarray, v: np.ndarray, fmt: str) -> np.ndarray:
    lib = _load()
    y = np.ascontiguousarray(y, np.uint8)
    u = np.ascontiguousarray(u, np.uint8)
    v = np.ascontiguousarray(v, np.uint8)
    h, w = y.shape
    dst = np.empty((h, 2 * w), np.uint8)
    up, y0p, vp, y1p = _422_ORDER[fmt]
    lib.vf_pack_422(_u8ptr(y), _u8ptr(u), _u8ptr(v), _u8ptr(dst),
                    h, w, up, y0p, vp, y1p)
    return dst


def png_unfilter(raw: np.ndarray, height: int, stride: int, bpp: int) -> np.ndarray:
    """raw (height, 1+stride) -> (height, stride); raises on bad filter."""
    lib = _load()
    raw = np.ascontiguousarray(raw, np.uint8)
    out = np.empty((height, stride), np.uint8)
    rc = lib.vf_png_unfilter(_u8ptr(raw), _u8ptr(out), height, stride, bpp)
    if rc != 0:
        raise ValueError(f"invalid PNG filter type {rc}")
    return out
