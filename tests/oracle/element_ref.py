"""Numpy oracles for transform / overlay / deinterlace / compositor —
independent per-pixel implementations following the MSL shaders literally."""

from __future__ import annotations

import numpy as np

from tests.oracle import metal_ref

F = np.float32


# -- transform (metaltransform_shaders.h + renderer m:44-104, 265-293) ------

UV_MATS = {
    0: [[1, 0], [0, 1]],
    1: [[0, 1], [-1, 0]],
    2: [[-1, 0], [0, -1]],
    3: [[0, -1], [1, 0]],
    4: [[-1, 0], [0, 1]],
    5: [[1, 0], [0, -1]],
    6: [[0, 1], [1, 0]],
    7: [[0, -1], [-1, 0]],
}


def transform(planes, fmt, matrix, w, h, method, crop_l=0, crop_r=0,
              crop_t=0, crop_b=0):
    """-> (4, h, w) uint8 quantized RGBA before output packing."""
    cl, cr = crop_l / w, crop_r / w
    ct, cb = crop_t / h, crop_b / h
    scale = np.array([1.0 - cl - cr, 1.0 - ct - cb])
    coff = np.array([(cl - cr) * 0.5, (ct - cb) * 0.5])
    m = np.array(UV_MATS[method], np.float64)
    mm = m * scale[None, :]
    off = m @ coff

    u = (np.arange(w, dtype=np.float64) + 0.5) / w
    v = (np.arange(h, dtype=np.float64) + 0.5) / h
    uu, vv = np.meshgrid(u, v)
    src_u = mm[0, 0] * (uu - 0.5) + mm[0, 1] * (vv - 0.5) + 0.5 + off[0]
    src_v = mm[1, 0] * (uu - 0.5) + mm[1, 1] * (vv - 0.5) + 0.5 + off[1]
    outside = (src_u < 0) | (src_u > 1) | (src_v < 0) | (src_v > 1)

    def samp(tex, filt="linear"):
        """per-pixel gather at (src_v, src_u) with the Metal sampler math."""
        hh, ww = tex.shape[:2]
        sx = src_u * ww - 0.5
        sy = src_v * hh - 0.5
        x0 = np.floor(sx).astype(np.int64)
        y0 = np.floor(sy).astype(np.int64)
        fx = F(sx - x0)
        fy = F(sy - y0)
        x0c, x1c = np.clip(x0, 0, ww - 1), np.clip(x0 + 1, 0, ww - 1)
        y0c, y1c = np.clip(y0, 0, hh - 1), np.clip(y0 + 1, 0, hh - 1)
        t00 = tex[y0c, x0c].astype(F)
        t01 = tex[y0c, x1c].astype(F)
        t10 = tex[y1c, x0c].astype(F)
        t11 = tex[y1c, x1c].astype(F)
        if tex.ndim == 3:
            fx = fx[..., None]
            fy = fy[..., None]
        return (t00 * (1 - fx) + t01 * fx) * (1 - fy) + (
            t10 * (1 - fx) + t11 * fx) * fy

    if fmt in ("BGRA", "RGBA"):
        tex = metal_ref.dequant(np.stack([planes["rgba"][c] for c in range(4)], -1))
        rgba = samp(tex)
    else:
        y = samp(metal_ref.dequant(planes["y"]))
        uch = samp(metal_ref.dequant(planes["u"]))
        vch = samp(metal_ref.dequant(planes["v"]))
        rgb = metal_ref.yuv_to_rgb(np.stack([y, uch, vch], -1).astype(F), matrix)
        rgba = np.concatenate([rgb, np.ones_like(rgb[..., :1])], -1)
    rgba = np.where(outside[..., None], np.array([0, 0, 0, 1], F), rgba)
    return metal_ref.quant(rgba).transpose(2, 0, 1)


# -- overlay (metaloverlay_shaders.h:60-86) ---------------------------------

def overlay(video_rgba_f, overlay_rgba_u8_premult, ox, oy, ow, oh, alpha):
    """video (H, W, 4) f32; overlay premultiplied uint8; -> (H, W, 4) f32."""
    h, w = video_rgba_f.shape[:2]
    out = video_rgba_f.copy()
    px = np.arange(w, dtype=np.float64) + 0.5
    py = np.arange(h, dtype=np.float64) + 0.5
    in_x = (px >= ox) & (px < ox + ow)
    in_y = (py >= oy) & (py < oy + oh)
    mask = np.logical_and.outer(in_y, in_x)
    tx = (px - ox) / ow
    ty = (py - oy) / oh
    ov = metal_ref.sample2d(
        metal_ref.dequant(overlay_rgba_u8_premult),
        np.clip(tx, 0, 1), np.clip(ty, 0, 1), "linear",
    )
    a = ov[..., 3] * F(alpha)
    blended = out[..., :3] * (1 - a[..., None]) + ov[..., :3] * a[..., None]
    out[..., :3] = np.where(mask[..., None], blended, out[..., :3])
    return out


# -- deinterlace (metaldeinterlace_shaders.h) -------------------------------

def _rows_keep(h, tff):
    rows = np.arange(h)
    return (rows % 2 == 0) if tff else (rows % 2 == 1)


def _bob_interp(cur):
    h = cur.shape[0]
    above = cur[np.clip(np.arange(h) - 1, 0, h - 1)]
    below = cur[np.clip(np.arange(h) + 1, 0, h - 1)]
    return (above + below) * F(0.5)


def deinterlace(cur, prev, method, tff, motion_threshold=0.1, has_prev=True):
    """cur/prev (H, W, 4) f32 RGBA -> (H, W, 4) f32."""
    keep = _rows_keep(cur.shape[0], tff)[:, None, None]
    if method in (0, 2):  # bob / linear (same 2-tap average)
        return np.where(keep, cur, _bob_interp(cur)).astype(F)
    if not has_prev:
        return np.where(keep, cur, _bob_interp(cur)).astype(F)
    if method == 1:  # weave
        return np.where(keep, cur, prev).astype(F)
    # greedyh
    motion = np.sqrt(((cur[..., :3] - prev[..., :3]) ** 2).sum(-1))
    repl = np.where((motion < motion_threshold)[..., None], prev,
                    _bob_interp(cur))
    return np.where(keep, cur, repl).astype(F)


# -- compositor blending (metalcomprenderer.m) ------------------------------

def checker_bg(w, h):
    ys, xs = np.mgrid[0:h, 0:w]
    c = ((xs // 8) + (ys // 8)) % 2
    gray = np.where(c == 1, F(0.75), F(0.5))
    return np.stack([gray, gray, gray, np.ones_like(gray)], -1)


def composite_draw(dst_f, src_planes, fmt, matrix, x, y, w, h, alpha, op):
    """One pad draw onto dst (H, W, 4) f32; returns quantized-dequantized."""
    H, W = dst_f.shape[:2]
    px = np.arange(W, dtype=np.float64) + 0.5
    py = np.arange(H, dtype=np.float64) + 0.5
    in_x = (px >= x) & (px < x + w)
    in_y = (py >= y) & (py < y + h)
    mask = np.logical_and.outer(in_y, in_x)
    tx = np.clip((px - x) / w, 0, 1)
    ty = np.clip((py - y) / h, 0, 1)
    if fmt in ("BGRA", "RGBA"):
        tex = metal_ref.dequant(np.stack([src_planes["rgba"][c] for c in range(4)], -1))
        src = metal_ref.sample2d(tex, tx, ty, "linear").astype(F)
    else:
        yv = metal_ref.sample2d(metal_ref.dequant(src_planes["y"]), tx, ty, "linear")
        uv = metal_ref.sample2d(metal_ref.dequant(src_planes["u"]), tx, ty, "linear")
        vv = metal_ref.sample2d(metal_ref.dequant(src_planes["v"]), tx, ty, "linear")
        rgb = metal_ref.yuv_to_rgb(np.stack([yv, uv, vv], -1).astype(F), matrix)
        src = np.concatenate([rgb, np.ones_like(rgb[..., :1])], -1)
    a = src[..., 3] * F(alpha)
    src_p = src.copy()
    src_p[..., :3] *= a[..., None]
    src_p[..., 3] = a
    if op == 0:  # source
        blended = src_p
    elif op == 2:  # add
        blended = src_p + dst_f
    else:  # over
        blended = src_p + dst_f * (1 - a[..., None])
    out = np.where(mask[..., None], blended, dst_f)
    return metal_ref.dequant(metal_ref.quant(out))
