"""Numpy oracle of the Metal reference semantics.

A deliberately *independent* implementation of the reference shaders' math
(gather-based per-pixel sampling, straight from the MSL formulas in
/root/reference/src/**/*_shaders.h and src/common/vfmetalshaders.m) used as
the golden baseline for the framework's matmul-based TPU kernels.

Everything is float32 to mirror GPU arithmetic; tests allow 1-2/255
per-channel tolerance for accumulated rounding differences.
"""

from __future__ import annotations

import numpy as np

F = np.float32

YUV_OFFSET = np.array([16.0 / 255.0, 128.0 / 255.0, 128.0 / 255.0], F)

# rows = output channel coefficients over (Y, U, V) / (R, G, B)
YUV_TO_RGB = {
    0: np.array(
        [[1.164383, 0.0, 1.596027],
         [1.164383, -0.391762, -0.812968],
         [1.164383, 2.017232, 0.0]], F),
    1: np.array(
        [[1.164383, 0.0, 1.792741],
         [1.164383, -0.213249, -0.532909],
         [1.164383, 2.112402, 0.0]], F),
}
RGB_TO_YUV = {
    0: np.array(
        [[0.256788, 0.504129, 0.097906],
         [-0.148223, -0.290993, 0.439216],
         [0.439216, -0.367788, -0.071427]], F),
    1: np.array(
        [[0.182586, 0.614231, 0.062007],
         [-0.100644, -0.338572, 0.439216],
         [0.439216, -0.398942, -0.040274]], F),
}


def dequant(x: np.ndarray) -> np.ndarray:
    return (x.astype(F)) / F(255.0)


def quant(x: np.ndarray) -> np.ndarray:
    return np.round(np.clip(x, 0.0, 1.0) * 255.0).astype(np.uint8)


def yuv_to_rgb(yuv: np.ndarray, matrix: int) -> np.ndarray:
    """yuv (..., 3) -> rgb (..., 3), clamped (yuvToRGB)."""
    m = YUV_TO_RGB[matrix]
    rgb = (yuv - YUV_OFFSET) @ m.T
    return np.clip(rgb, 0.0, 1.0)


def rgb_to_yuv(rgb: np.ndarray, matrix: int) -> np.ndarray:
    """Unclamped mat*rgb + offset; the MSL kernels clamp only at the final
    texture write (which quant() reproduces)."""
    m = RGB_TO_YUV[matrix]
    return (rgb @ m.T + YUV_OFFSET).astype(F)


# ---------------------------------------------------------------------------
# Metal sampler (normalized coords, half-texel centers, clamp_to_edge)
# ---------------------------------------------------------------------------

def sample2d(tex: np.ndarray, tx: np.ndarray, ty: np.ndarray, filt: str) -> np.ndarray:
    """Sample tex (H, W[, C]) at normalized coords (ty rows x tx cols grid)."""
    h, w = tex.shape[0], tex.shape[1]
    tx = np.asarray(tx, np.float64)
    ty = np.asarray(ty, np.float64)
    if filt == "nearest":
        ix = np.clip(np.floor(tx * w).astype(np.int64), 0, w - 1)
        iy = np.clip(np.floor(ty * h).astype(np.int64), 0, h - 1)
        return tex[iy[:, None], ix[None, :]]
    assert filt == "linear"
    sx = tx * w - 0.5
    sy = ty * h - 0.5
    x0 = np.floor(sx).astype(np.int64)
    y0 = np.floor(sy).astype(np.int64)
    fx = F(sx - x0)
    fy = F(sy - y0)
    x0c = np.clip(x0, 0, w - 1)
    x1c = np.clip(x0 + 1, 0, w - 1)
    y0c = np.clip(y0, 0, h - 1)
    y1c = np.clip(y0 + 1, 0, h - 1)
    if tex.ndim == 3:
        fx = fx[None, :, None]
        fy = fy[:, None, None]
    else:
        fx = fx[None, :]
        fy = fy[:, None]
    t00 = tex[y0c[:, None], x0c[None, :]].astype(F)
    t01 = tex[y0c[:, None], x1c[None, :]].astype(F)
    t10 = tex[y1c[:, None], x0c[None, :]].astype(F)
    t11 = tex[y1c[:, None], x1c[None, :]].astype(F)
    top = t00 * (1 - fx) + t01 * fx
    bot = t10 * (1 - fx) + t11 * fx
    return top * (1 - fy) + bot * fy


def grid_texcoords(out_size: int, scale: float = 1.0) -> np.ndarray:
    t = (np.arange(out_size, dtype=np.float64) + 0.5) / out_size
    if scale != 1.0:
        t = (t - 0.5) / scale + 0.5
    return t


# ---------------------------------------------------------------------------
# Fragment stage: input planes -> RGBA float at the output grid
# ---------------------------------------------------------------------------

def sample_rgba(
    planes: dict,
    fmt: str,
    matrix: int,
    out_w: int,
    out_h: int,
    filt: str = "linear",
    scale_x: float = 1.0,
    scale_y: float = 1.0,
    border: tuple | None = None,
) -> np.ndarray:
    """-> (out_h, out_w, 4) float32 RGBA, emulating the fragment shaders."""
    tx = grid_texcoords(out_w, scale_x)
    ty = grid_texcoords(out_h, scale_y)
    inside_x = (tx >= 0.0) & (tx <= 1.0)
    inside_y = (ty >= 0.0) & (ty <= 1.0)
    txc = np.clip(tx, 0.0, 1.0)
    tyc = np.clip(ty, 0.0, 1.0)

    if fmt in ("BGRA", "RGBA"):
        rgba_tex = dequant(np.stack(
            [planes["rgba"][c] for c in range(4)], axis=-1))
        out = sample2d(rgba_tex, txc, tyc, filt).astype(F)
    elif fmt in ("NV12", "I420"):
        y = sample2d(dequant(planes["y"]), txc, tyc, filt)
        u = sample2d(dequant(planes["u"]), txc, tyc, filt)
        v = sample2d(dequant(planes["v"]), txc, tyc, filt)
        rgb = yuv_to_rgb(np.stack([y, u, v], -1).astype(F), matrix)
        out = np.concatenate([rgb, np.ones_like(rgb[..., :1])], -1)
    elif fmt in ("UYVY", "YUY2"):
        # macro-pixel decode == nearest sampling of the planar decomposition
        y = sample2d(dequant(planes["y"]), txc, tyc, "nearest")
        u = sample2d(dequant(planes["u"]), txc, tyc, "nearest")
        v = sample2d(dequant(planes["v"]), txc, tyc, "nearest")
        rgb = yuv_to_rgb(np.stack([y, u, v], -1).astype(F), matrix)
        out = np.concatenate([rgb, np.ones_like(rgb[..., :1])], -1)
    else:
        raise ValueError(fmt)

    if border is not None:
        mask = np.logical_and.outer(inside_y, inside_x)
        out = np.where(mask[..., None], out, np.asarray(border, F))
    return out.astype(F)


# ---------------------------------------------------------------------------
# Output stage: quantized RGBA -> format planes
# ---------------------------------------------------------------------------

def pack_rgba(rgba_q: np.ndarray, fmt: str, matrix: int) -> dict:
    """rgba_q (4, H, W) uint8 -> canonical planes, emulating VfMetalYUVOutput
    and the packed-output compute kernels."""
    _, h, w = rgba_q.shape
    if fmt in ("BGRA", "RGBA"):
        return {"rgba": rgba_q.copy()}
    rgb = dequant(rgba_q[:3]).transpose(1, 2, 0)  # (H, W, 3)
    yuv = rgb_to_yuv(rgb, matrix)
    if fmt in ("NV12", "I420"):
        cw, ch = (w + 1) // 2, (h + 1) // 2
        u = np.zeros((ch, cw), F)
        v = np.zeros((ch, cw), F)
        for by in range(ch):
            for bx in range(cw):
                s = np.zeros(3, F)
                for dy in range(2):
                    for dx in range(2):
                        py = min(2 * by + dy, h - 1)
                        px = min(2 * bx + dx, w - 1)
                        s += rgb[py, px]
                s *= F(0.25)
                out = rgb_to_yuv(s[None], matrix)[0]
                u[by, bx] = out[1]
                v[by, bx] = out[2]
        return {"y": quant(yuv[..., 0]), "u": quant(u), "v": quant(v)}
    if fmt in ("UYVY", "YUY2"):
        y0 = yuv[:, 0::2, 0]
        y1 = yuv[:, 1::2, 0]
        u = (yuv[:, 0::2, 1] + yuv[:, 1::2, 1]) * F(0.5)
        v = (yuv[:, 0::2, 2] + yuv[:, 1::2, 2]) * F(0.5)
        yq = np.empty((h, w), np.uint8)
        yq[:, 0::2] = quant(y0)
        yq[:, 1::2] = quant(y1)
        return {"y": yq, "u": quant(u), "v": quant(v)}
    raise ValueError(fmt)
