"""Numpy oracle of the vfmetalvideofilter shader math (independent of the
framework kernels; follows metalvideofilter_shaders.h literally with host
float32 arithmetic and python-level uniform branches)."""

from __future__ import annotations

import numpy as np

F = np.float32


def fract(x):
    return x - np.floor(x)


def smoothstep(e0, e1, x):
    t = np.clip((x - e0) / (e1 - e0), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def hash12(px, py, frame):
    p3 = np.stack([px, py, px], -1).astype(F)
    p3 = fract(p3 * F(0.1031) + F(frame) * F(0.00137))
    d = (
        p3[..., 0] * (p3[..., 1] + F(33.33))
        + p3[..., 1] * (p3[..., 2] + F(33.33))
        + p3[..., 2] * (p3[..., 0] + F(33.33))
    )
    p3 = p3 + d[..., None]
    return fract((p3[..., 0] + p3[..., 1]) * p3[..., 2])


def rgb_to_hsv(c):
    r, g, b = c[..., 0], c[..., 1], c[..., 2]
    gb = (g >= b)
    px = np.where(gb, g, b)
    py = np.where(gb, b, g)
    pz = np.where(gb, F(0.0), F(-1.0))
    pw = np.where(gb, F(-1.0 / 3.0), F(2.0 / 3.0))
    rp = (r >= px)
    qx = np.where(rp, r, px)
    qy = py
    qz = np.where(rp, pz, pw)
    qw = np.where(rp, px, r)
    d = qx - np.minimum(qw, qy)
    e = F(1.0e-10)
    h = np.abs(qz + (qw - qy) / (6.0 * d + e))
    s = d / (qx + e)
    return np.stack([h, s, qx], -1).astype(F)


def hsv_to_rgb(c):
    h, s, v = c[..., 0], c[..., 1], c[..., 2]
    out = []
    for off in (1.0, 2.0 / 3.0, 1.0 / 3.0):
        p = np.abs(fract(h + F(off)) * 6.0 - 3.0)
        out.append(v * ((1.0 - s) + s * np.clip(p - 1.0, 0.0, 1.0)))
    return np.stack(out, -1).astype(F)


def apply_color_adjustments(rgba, u, texcoord_xy, frame_index):
    """rgba (H, W, 4) f32, u: dict of python floats, texcoord_xy (H, W, 2)."""
    rgb = rgba[..., :3].astype(F)
    alpha = rgba[..., 3].astype(F)

    rgb = rgb + F(u["brightness"])
    rgb = (rgb - 0.5) * F(u["contrast"]) + 0.5
    lum = rgb @ np.array([0.2126, 0.7152, 0.0722], F)
    rgb = lum[..., None] + (rgb - lum[..., None]) * F(u["saturation"])

    if abs(u["hue"]) > 0.001:
        hsv = rgb_to_hsv(np.clip(rgb, 0.0, 1.0))
        hsv[..., 0] = fract(hsv[..., 0] + F(u["hue"]) / F(2.0 * np.pi))
        rgb = hsv_to_rgb(hsv)

    rgb = np.power(np.clip(rgb, 0.0001, 1.0), F(1.0 / u["gamma"]))

    if u["sepia"] > 0.001:
        m = np.array(
            [[0.393, 0.769, 0.189], [0.349, 0.686, 0.168], [0.272, 0.534, 0.131]],
            F,
        )
        rgb = rgb + (rgb @ m.T - rgb) * F(u["sepia"])

    if u["invert"]:
        rgb = 1.0 - rgb

    if u["chroma_key_enabled"]:
        key = np.array([u["key_r"], u["key_g"], u["key_b"]], F)
        dist = np.sqrt(((rgb - key) ** 2).sum(-1))
        mask = smoothstep(
            F(u["key_tolerance"]),
            F(u["key_tolerance"]) + F(u["key_smoothness"]),
            dist,
        )
        alpha = alpha * mask

    if u["vignette"] > 0.001:
        center = texcoord_xy - 0.5
        dist = np.sqrt((center ** 2).sum(-1)) * F(1.414)
        vig = 1.0 - smoothstep(F(0.5), F(1.0), dist) * F(u["vignette"])
        rgb = rgb * vig[..., None]

    if u["noise"] > 0.001:
        h, w = rgba.shape[:2]
        px = texcoord_xy[..., 0] * w
        py = texcoord_xy[..., 1] * h
        n = hash12(px, py, frame_index)
        rgb = rgb + ((n - 0.5) * F(u["noise"]) * F(0.5))[..., None]

    return np.concatenate(
        [np.clip(rgb, 0.0, 1.0), alpha[..., None]], axis=-1
    ).astype(F)


def apply_lut(rgba, lut, size):
    """lut (S, S, S, 3) [b][g][r]; trilinear at rgb*(S-1)."""
    rgb = rgba[..., :3]
    p = rgb * F(size - 1)
    i0 = np.clip(np.floor(p).astype(np.int64), 0, size - 1)
    i1 = np.minimum(i0 + 1, size - 1)
    f = (p - np.floor(p)).astype(F)
    out = np.zeros_like(rgb)
    for db in (0, 1):
        for dg in (0, 1):
            for dr in (0, 1):
                bi = i1[..., 2] if db else i0[..., 2]
                gi = i1[..., 1] if dg else i0[..., 1]
                ri = i1[..., 0] if dr else i0[..., 0]
                wgt = (
                    (f[..., 2] if db else 1 - f[..., 2])
                    * (f[..., 1] if dg else 1 - f[..., 1])
                    * (f[..., 0] if dr else 1 - f[..., 0])
                )
                out += lut[bi, gi, ri] * wgt[..., None]
    res = rgba.copy()
    res[..., :3] = out
    return res


BLUR_W = np.array(
    [0.028532, 0.067234, 0.124009, 0.179044, 0.20236,
     0.179044, 0.124009, 0.067234, 0.028532], F)


def blur_axis(img, axis):
    n = img.shape[axis]
    out = np.zeros_like(img, dtype=F)
    for i, w in enumerate(BLUR_W):
        idx = np.clip(np.arange(n) + i - 4, 0, n - 1)
        out += np.take(img, idx, axis=axis).astype(F) * w
    return out


def unsharp(orig, blurred, amount):
    if amount > 0:
        res = np.clip(orig + (orig - blurred) * F(amount), 0.0, 1.0)
    else:
        res = orig + (blurred - orig) * F(abs(amount))
    res = res.copy()
    res[..., 3] = orig[..., 3]
    return res.astype(F)
