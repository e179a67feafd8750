"""Videofilter math: fused color-adjustment chain, 3D LUT, blur/unsharp.

Faithful translation of the MSL in
/root/reference/src/videofilter/metalvideofilter_shaders.h:

- applyColorAdjustments (h:88-155): brightness -> contrast -> saturation ->
  hue (HSV rotate, gated |hue|>0.001) -> gamma -> sepia -> invert ->
  chroma key -> vignette -> film grain -> clamp.  The whole chain is one
  elementwise VPU program; XLA fuses it with the surrounding sample/pack
  stages into a single kernel.
- hash12 grain (h:63-67) bit-for-bit in float32.
- 3D LUT (h:188-194): coord = rgb*(s-1)/s + 0.5/s, trilinear — becomes an
  8-corner gather on a flattened (S^3, 3) table.
- separable 9-tap Gaussian + unsharp mask (h:253-328) with edge clamping.

Traced parameters arrive as float32 scalars so per-frame property changes
(GST_PARAM_CONTROLLABLE analogs) never recompile.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

F32 = jnp.float32

BLUR_WEIGHTS = np.array(
    [0.028532, 0.067234, 0.124009, 0.179044, 0.20236,
     0.179044, 0.124009, 0.067234, 0.028532],
    np.float32,
)

REC709_LUMA = np.array([0.2126, 0.7152, 0.0722], np.float32)
SEPIA = np.array(
    [[0.393, 0.769, 0.189],
     [0.349, 0.686, 0.168],
     [0.272, 0.534, 0.131]],
    np.float32,
)


def _fract(x):
    return x - jnp.floor(x)


def _smoothstep(e0, e1, x):
    t = jnp.clip((x - e0) / (e1 - e0), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def hash12(px, py, frame_index):
    """MSL hash12 (h:63-67): screen-space white noise varying per frame.

    px/py are pixel-center coordinates (x+0.5, y+0.5) — the shader computes
    texcoord * (width, height).
    """
    fi = frame_index.astype(F32) * F32(0.00137)
    p3x = _fract(px * F32(0.1031) + fi)
    p3y = _fract(py * F32(0.1031) + fi)
    p3z = p3x  # p.xyx
    d = p3x * (p3y + F32(33.33)) + p3y * (p3z + F32(33.33)) + p3z * (p3x + F32(33.33))
    p3x = p3x + d
    p3y = p3y + d
    p3z = p3z + d
    return _fract((p3x + p3y) * p3z)


def rgb_to_hsv(r, g, b):
    """MSL rgbToHsv (h:71-78) translated branch-for-branch."""
    e = F32(1.0e-10)
    # p = mix((b, g, -1, 2/3), (g, b, 0, -1/3), step(b, g))
    gb = g >= b
    px = jnp.where(gb, g, b)
    py = jnp.where(gb, b, g)
    pz = jnp.where(gb, F32(0.0), F32(-1.0))
    pw = jnp.where(gb, F32(-1.0 / 3.0), F32(2.0 / 3.0))
    # q = mix((p.x, p.y, p.w, r), (r, p.y, p.z, p.x), step(p.x, r))
    rp = r >= px
    qx = jnp.where(rp, r, px)
    qy = py
    qz = jnp.where(rp, pz, pw)
    qw = jnp.where(rp, px, r)
    d = qx - jnp.minimum(qw, qy)
    h = jnp.abs(qz + (qw - qy) / (6.0 * d + e))
    s = d / (qx + e)
    v = qx
    return h, s, v


def hsv_to_rgb(h, s, v):
    """MSL hsvToRgb (h:80-84)."""
    def channel(offset):
        p = jnp.abs(_fract(h + F32(offset)) * 6.0 - 3.0)
        return v * ((1.0 - s) + s * jnp.clip(p - 1.0, 0.0, 1.0))

    return channel(1.0), channel(2.0 / 3.0), channel(1.0 / 3.0)


def apply_color_adjustments(rgba, p, frame_index, width, height, gates=None):
    """rgba (..., 4, H, W) f32 -> same, the canonical op order (h:88-155).

    p: dict of traced f32 scalars {brightness, contrast, saturation, hue
    (radians), gamma, sepia, invert, chroma_key_enabled, key_r, key_g,
    key_b, key_tolerance, key_smoothness, vignette, noise}.

    gates: optional dict of *static* bools {hue, gamma, sepia, invert,
    chroma_key, vignette, noise} — when False the stage is omitted from the
    program entirely (jnp.where evaluates both sides, so without gates a
    disabled hue rotation still costs a full HSV round trip per pixel).
    Output is identical: each gate mirrors the shader's own uniform branch
    (or, for gamma, pow(x, 1) == x after the clamp).  Toggling an effect
    recompiles; magnitude changes stay traced.
    """
    chans = (rgba[..., 0, :, :], rgba[..., 1, :, :], rgba[..., 2, :, :],
             rgba[..., 3, :, :])
    out = apply_color_adjustments_t(chans, p, frame_index, width, height,
                                    gates=gates)
    return jnp.stack(out, axis=-3)


def apply_color_adjustments_t(chans, p, frame_index, width, height,
                              gates=None, x_index=None, y_index=None):
    """Per-channel-tuple variant of apply_color_adjustments: channels stay
    separate (r, g, b, a) so XLA fuses the whole chain without the
    (4, H, W) stack materializations (1.66x end-to-end at 4K).

    x_index: optional 1-D array of the true pixel x positions of the plane
    columns (for column-phase half-width planes: arange(W/2)*2 + phase);
    `width` stays the FULL frame width for texcoord normalization.  Defaults
    to arange(width).

    y_index: optional 1-D array of the true pixel y positions of the plane
    rows (for ROW-phase half-height planes: arange(H/2)*2 + phase);
    `height` stays the FULL frame height.  Defaults to the spatial-sharding
    -aware global row index."""
    if gates is None:
        gates = dict.fromkeys(
            ("hue", "gamma", "sepia", "invert", "chroma_key", "vignette",
             "noise"), True)
    if x_index is None:
        x_index = np.arange(width, dtype=np.float32)
    x_index = jnp.asarray(x_index, F32)
    r, g, b, alpha = chans

    import os

    if os.environ.get("TPUVF_NO_BCS_FOLD"):
        # Sequential reference form (the shader's literal op order)
        # Brightness
        r, g, b = r + p["brightness"], g + p["brightness"], b + p["brightness"]

        # Contrast
        c = p["contrast"]
        r = (r - 0.5) * c + 0.5
        g = (g - 0.5) * c + 0.5
        b = (b - 0.5) * c + 0.5

        # Saturation (Rec.709 luma of the current rgb)
        lum = REC709_LUMA[0] * r + REC709_LUMA[1] * g + REC709_LUMA[2] * b
        s = p["saturation"]
        r = lum + (r - lum) * s
        g = lum + (g - lum) * s
        b = lum + (b - lum) * s
    else:
        # Brightness -> Contrast -> Saturation folded into ONE shared-luma
        # affine (round 4): the shader applies the three stages back to
        # back in f32 with no intermediate clamp (h:88-110), so they
        # compose exactly:
        #   x'   = c*x + k0,            k0 = (brightness - 0.5)*c + 0.5
        #   lum' = L.x' = c*(L.x) + k0  (Rec.709 weights sum to 1)
        #   out  = lum' + (x' - lum')*s = (c*s)*x + ((1-s)*c)*(L.x) + k0
        # Per-frame scalar coefficients; ~13 ops/pixel vs ~26 sequential —
        # the hot emit fusion is VPU-bound (BENCH.md round-3e: op-count
        # reduction via affine folding is the designated lever).  Float
        # association differs (<= 1-2 ulp), so quantized knife-edge pixels
        # may flip 1 LSB vs the sequential form — the same contract class
        # as blockband matmuls and grid links, inside the 2-LSB oracle
        # tolerance.  TPUVF_NO_BCS_FOLD restores the sequential stages.
        c = p["contrast"]
        s = p["saturation"]
        cs_ = c * s
        m = (F32(1.0) - s) * c
        k0 = (p["brightness"] - F32(0.5)) * c + F32(0.5)
        lum0 = REC709_LUMA[0] * r + REC709_LUMA[1] * g + REC709_LUMA[2] * b
        base = m * lum0 + k0
        r = cs_ * r + base
        g = cs_ * g + base
        b = cs_ * b + base

    # Hue rotation — gated exactly like the uniform branch (|hue| > 0.001)
    if gates["hue"]:
        do_hue = jnp.abs(p["hue"]) > 0.001
        hh, hs, hv = rgb_to_hsv(
            jnp.clip(r, 0.0, 1.0), jnp.clip(g, 0.0, 1.0), jnp.clip(b, 0.0, 1.0)
        )
        hh = _fract(hh + p["hue"] / F32(2.0 * np.pi))
        hr, hg, hb = hsv_to_rgb(hh, hs, hv)
        r = jnp.where(do_hue, hr, r)
        g = jnp.where(do_hue, hg, g)
        b = jnp.where(do_hue, hb, b)

    # Gamma (the shader always pows; pow(clamp(x),1) == clamp(x), so a
    # static gamma==1 reduces to the clamp)
    if gates["gamma"]:
        inv_gamma = 1.0 / p["gamma"]
        r = jnp.power(jnp.clip(r, 0.0001, 1.0), inv_gamma)
        g = jnp.power(jnp.clip(g, 0.0001, 1.0), inv_gamma)
        b = jnp.power(jnp.clip(b, 0.0001, 1.0), inv_gamma)
    else:
        r = jnp.clip(r, 0.0001, 1.0)
        g = jnp.clip(g, 0.0001, 1.0)
        b = jnp.clip(b, 0.0001, 1.0)

    # Sepia
    if gates["sepia"]:
        do_sepia = p["sepia"] > 0.001
        sep = p["sepia"]
        sr = SEPIA[0, 0] * r + SEPIA[0, 1] * g + SEPIA[0, 2] * b
        sg = SEPIA[1, 0] * r + SEPIA[1, 1] * g + SEPIA[1, 2] * b
        sb = SEPIA[2, 0] * r + SEPIA[2, 1] * g + SEPIA[2, 2] * b
        r = jnp.where(do_sepia, r + (sr - r) * sep, r)
        g = jnp.where(do_sepia, g + (sg - g) * sep, g)
        b = jnp.where(do_sepia, b + (sb - b) * sep, b)

    # Invert
    if gates["invert"]:
        inv = p["invert"] > 0.5
        r = jnp.where(inv, 1.0 - r, r)
        g = jnp.where(inv, 1.0 - g, g)
        b = jnp.where(inv, 1.0 - b, b)

    # Chroma key: alpha *= smoothstep(tol, tol+smooth, distance(rgb, key))
    if gates["chroma_key"]:
        ck = p["chroma_key_enabled"] > 0.5
        dist = jnp.sqrt(
            (r - p["key_r"]) ** 2 + (g - p["key_g"]) ** 2 + (b - p["key_b"]) ** 2
        )
        mask = _smoothstep(
            p["key_tolerance"], p["key_tolerance"] + p["key_smoothness"], dist
        )
        alpha = jnp.where(ck, alpha * mask, alpha)

    # Vignette (texcoord-based radial falloff).  Row coordinates are GLOBAL
    # under spatial sharding: the plane may hold only a row shard, but the
    # falloff/grain depend on the frame-space position (parallel.spctx).
    from tpuvf.parallel import spctx

    if y_index is not None:
        y_rows = jnp.asarray(y_index, F32)
    else:
        local_rows = (r.shape[-2] if hasattr(r, "shape") and r.ndim >= 2
                      else height)
        y_rows = spctx.global_rows(local_rows, height)
    tx = (x_index + 0.5) / F32(width)
    ty = (y_rows + 0.5) / F32(height)
    if gates["vignette"]:
        cx = tx[None, :] - 0.5
        cy = ty[:, None] - 0.5
        do_vig = p["vignette"] > 0.001
        vdist = jnp.sqrt(cx * cx + cy * cy) * F32(1.414)
        vig = 1.0 - _smoothstep(F32(0.5), F32(1.0), vdist) * p["vignette"]
        r = jnp.where(do_vig, r * vig, r)
        g = jnp.where(do_vig, g * vig, g)
        b = jnp.where(do_vig, b * vig, b)

    # Film grain
    if gates["noise"]:
        do_noise = p["noise"] > 0.001
        pxc = x_index + 0.5
        pyc = y_rows + 0.5
        n = hash12(pxc[None, :], pyc[:, None], frame_index)
        n = (n - 0.5) * p["noise"] * 0.5
        r = jnp.where(do_noise, r + n, r)
        g = jnp.where(do_noise, g + n, g)
        b = jnp.where(do_noise, b + n, b)

    if not (gates["sepia"] or gates["noise"]):
        # the gamma-stage clamp bounded r/g/b to [1e-4, 1] and every later
        # active stage preserves [0, 1] (invert: 1-x; chroma key: alpha
        # only; vignette: x*vig with vig in [0,1]) — the final clip is a
        # no-op, elided bit-identically (clip idempotence; ~8 us/frame of
        # the 4K quad emit, scripts/bench_rowphase.py B2).  Sepia's matrix
        # rows sum past 1 and grain adds +-0.25*noise, so those gates keep
        # the clip.
        return (r, g, b, alpha)
    return (jnp.clip(r, 0.0, 1.0), jnp.clip(g, 0.0, 1.0),
            jnp.clip(b, 0.0, 1.0), alpha)


LUT_U16_SCALE = 65535.0
LUT_U8_SCALE = 255.0


def pack_lut_corners(lut: np.ndarray, dtype=np.float32) -> np.ndarray:
    """(S, S, S, 3) [b][g][r] table -> corner-packed (S^3, 24).

    Cell (b, g, r) stores the 8 trilinear corner values (with +1 neighbors
    clamped at the edges) contiguously, so `apply_lut` needs ONE gather per
    pixel instead of eight — on TPU a 2M-index gather costs ~16 ms at 1080p
    regardless of row width, so this is a straight 8x reduction of the
    dominant cost.

    dtype: np.float32 (exact) or np.uint16 (fixed-point x65535).  The TPU
    gather is partly BANDWIDTH-bound on its (24, H, W) corner output
    (measured: full-res 1080p LUT stage 5.0 ms f32 -> 4.1 ms at half the
    payload bytes), so the element stores u16 — max quantization error
    0.5/65535 = 0.3% of one 8-bit LSB, invisible after the RGBA8 write.
    """
    size = lut.shape[0]
    i0 = np.arange(size)
    i1 = np.minimum(i0 + 1, size - 1)
    packed = np.empty((size, size, size, 8, 3), np.float32)
    for k in range(8):
        db, dg, dr = (k >> 2) & 1, (k >> 1) & 1, k & 1
        bb = i1 if db else i0
        gg = i1 if dg else i0
        rr = i1 if dr else i0
        packed[..., k, :] = lut[bb[:, None, None], gg[None, :, None],
                                rr[None, None, :]]
    packed = packed.reshape(size ** 3, 24)
    if np.dtype(dtype) == np.uint16:
        return np.round(
            np.clip(packed, 0.0, 1.0) * LUT_U16_SCALE).astype(np.uint16)
    if np.dtype(dtype) == np.uint8:
        return np.round(
            np.clip(packed, 0.0, 1.0) * LUT_U8_SCALE).astype(np.uint8)
    return packed.astype(dtype)


def apply_lut(rgba, lut_packed, size: int):
    """Stacked-array wrapper around apply_lut_t."""
    chans = (rgba[..., 0, :, :], rgba[..., 1, :, :], rgba[..., 2, :, :],
             rgba[..., 3, :, :])
    return jnp.stack(apply_lut_t(chans, lut_packed, size), axis=-3)


_GATHER_SPLITS = 1  # measured on v5e (round 2, bf16 table, per-phase LUT):
                    # the even/odd phases already give two independent
                    # gather sites that overlap; further row-splitting is
                    # slower (s1 232.7 fps vs s2 224.7 on config 3)
_GATHER_FLAT = True  # flatten pixel dims to 1-D lane-dense indices before
                     # the gather (measured 234 vs 228 fps on config 3; the
                     # (24, n) -> (24, h, w) reshape is free when w % 128
                     # == 0, and apply_lut_t falls back to shaped otherwise)


def _gather_corners_t(lut_packed, cell):
    """Gather corner rows TRANSPOSED: output (24,) + cell.shape keeps the
    pixel axes in their native 2-D tiling (a flat (n, 24) output is
    lane-padded to (n, 128) by the TPU layout — ~5x wasted write traffic at
    1080p: the round-1 LUT stage cost 8.8 ms of which only 3.9 ms was the
    gather).  Index batch dims carry cell's shape straight through, so no
    relayout-reshape follows the gather."""
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(0,), collapsed_slice_dims=(0,), start_index_map=(0,))
    return jax.lax.gather(
        lut_packed, cell[..., None], dn,
        slice_sizes=(1, lut_packed.shape[1]),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)


def apply_lut_t(chans, lut_packed, size: int):
    """3D LUT lookup with trilinear filtering (h:188-194).

    lut_packed: corner-packed (S^3, 24) table from pack_lut_corners.
    coord = rgb*(s-1)/s + 0.5/s in normalized texture space; since the
    texture has S texels per axis, the texel-space coordinate is exactly
    rgb*(S-1).

    TPU shape (v5e, measured): the 2M-index gather is index-bound at
    ~1.9 ns/idx; two overlapped gathers over index halves run at ~1.4
    ns/idx; a transposed (24, n) output avoids lane-padding the result;
    the trilinear reduce runs as row-slice FMAs that fuse with the gather
    output read.  Together: ~8.8 ms -> ~5-6 ms for the 1080p LUT stage.
    """
    r, g, b, alpha = chans
    s1 = F32(size - 1)
    pr, pg, pb = r * s1, g * s1, b * s1
    r0 = jnp.clip(jnp.floor(pr), 0, size - 1).astype(jnp.int32)
    g0 = jnp.clip(jnp.floor(pg), 0, size - 1).astype(jnp.int32)
    b0 = jnp.clip(jnp.floor(pb), 0, size - 1).astype(jnp.int32)
    fr = pr - jnp.floor(pr)
    fg = pg - jnp.floor(pg)
    fb = pb - jnp.floor(pb)

    # Everything stays 2-D: a flat (P,) plane lays out as a single sublane
    # row on TPU — 8x padded traffic on every elementwise op.  The gather
    # splits by IMAGE ROWS so each half and all weights keep (H, W) tiling.
    cell = (b0 * size + g0) * size + r0
    shape = r.shape
    if _GATHER_FLAT and shape[-1] % 128 == 0:
        # flatten the pixel dims into one lane-dense axis; (24, n) and
        # (24, h, w) share the same contiguous layout when w % 128 == 0 so
        # the final reshape is free
        flat = shape[:-2] + (shape[-2] * shape[-1],)
        cell = cell.reshape(flat)
        fr, fg, fb = (x.reshape(flat) for x in (fr, fg, fb))
    flat_mode = cell.ndim < 2 or cell.shape != shape
    hdim = cell.shape[-1] if flat_mode else cell.shape[-2]
    splits = (_GATHER_SPLITS
              if hdim % _GATHER_SPLITS == 0 and cell.size >= 1024 else 1)
    hq = hdim // splits

    def part(x, i):
        if flat_mode:
            return x[..., i * hq:(i + 1) * hq]
        return x[..., i * hq:(i + 1) * hq, :]

    # integer (fixed-point) tables dequantize once on the accumulated sum
    if lut_packed.dtype == jnp.uint16:
        post_scale = F32(1.0 / LUT_U16_SCALE)
    elif lut_packed.dtype == jnp.uint8:
        post_scale = F32(1.0 / LUT_U8_SCALE)
    else:
        post_scale = None

    res = [[] for _ in range(3)]
    for i in range(splits):
        cell_i = part(cell, i)
        corners = _gather_corners_t(lut_packed, cell_i)  # (24, ..., hq, W)
        w_fr = [1.0 - part(fr, i), part(fr, i)]
        w_fg = [1.0 - part(fg, i), part(fg, i)]
        w_fb = [1.0 - part(fb, i), part(fb, i)]
        acc = [None, None, None]
        for k in range(8):
            db, dg, dr = (k >> 2) & 1, (k >> 1) & 1, k & 1
            wk = w_fb[db] * w_fg[dg] * w_fr[dr]
            for c in range(3):
                t = wk * corners[3 * k + c].astype(jnp.float32)
                acc[c] = t if acc[c] is None else acc[c] + t
        for c in range(3):
            res[c].append(acc[c] * post_scale if post_scale is not None
                          else acc[c])
    cat_axis = -1 if flat_mode else -2
    out = [
        res[c][0] if splits == 1 else jnp.concatenate(res[c], axis=cat_axis)
        for c in range(3)
    ]
    if flat_mode:
        out = [x.reshape(shape) for x in out]
    return (out[0], out[1], out[2], alpha)


def blur9_h_split(e: jnp.ndarray, o: jnp.ndarray):
    """Horizontal 9-tap blur on even/odd column-phase planes -> (be, bo).

    BIT-exact vs blur9(interleaved, axis=-1): tap i of output column c
    reads clip(c-4+i, 0, W-1); for even output columns 2k the even-i taps
    live on the e phase at j = k-2+i/2 and odd-i taps on the o phase at
    j = k + (i-5)//2 (odd outputs symmetrically).  The accumulation runs
    in the same i order, and edge clamping CROSSES phases: a tap clipped
    to column 0 reads e[0] regardless of its natural phase, and one
    clipped to W-1 (odd, W even) reads o[W/2-1] — handled with lane-iota
    selects on the border columns."""
    import jax

    from tpuvf.kernels.convert import _shift_edge

    half = e.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, e.shape[-2:], 1)
    lane = jnp.broadcast_to(lane, e.shape)
    first_e = jax.lax.slice_in_dim(e, 0, 1, axis=-1)
    last_o = jax.lax.slice_in_dim(o, half - 1, half, axis=-1)

    def tap(base, j_off):
        """base phase plane shifted so lane k reads base[k + j_off], with
        cross-phase edge clamping to column 0 (e[0]) / column W-1
        (o[half-1])."""
        shifted = _shift_edge(base, -1, j_off)
        if j_off < 0:
            # lanes k < -j_off have k+j_off < 0: true clipped value e[0]
            shifted = jnp.where(lane < -j_off, first_e, shifted)
        elif j_off > 0:
            # lanes k >= half - j_off run past the end: clipped to o[-1]
            shifted = jnp.where(lane >= half - j_off, last_o, shifted)
        return shifted

    be = None
    bo = None
    for i, w in enumerate(BLUR_WEIGHTS):
        wf = F32(w)
        if i % 2 == 0:
            te = tap(e, i // 2 - 2)          # col 2(k-2+i/2)
            to = tap(o, i // 2 - 2)          # col 2(k-2+i/2)+1
        else:
            te = tap(o, (i - 5) // 2)        # col 2k-4+i (odd)
            to = tap(e, (i - 3) // 2)        # col 2k+1-4+i (even)
        be = te * wf if be is None else be + te * wf
        bo = to * wf if bo is None else bo + to * wf
    return be, bo


def blur9_v_split(e: jnp.ndarray, o: jnp.ndarray):
    """Vertical 9-tap blur on even/odd ROW-phase planes -> (be, bo).

    The sublane-axis mirror of blur9_h_split, for the QUAD dataflow:
    BIT-exact vs blur9(row-interleaved, axis=-2).  Tap i of output row r
    reads clip(r-4+i, 0, H-1); for even output rows 2k the even-i taps
    live on the e phase at j = k-2+i/2 and odd-i taps on the o phase at
    j = k+(i-5)//2 (odd outputs symmetrically).  Edge clamping CROSSES
    phases: a tap clipped to row 0 reads e[0] and one clipped to H-1
    (odd, H even) reads o[H/2-1].

    sp-safe (round 4): row indices and the first/last clamp rows are
    FRAME-global under spctx — _shift_edge exchanges halos, the clamp
    conditions compare global phase rows, and the conditions only hold
    on the first/last shard where the local edge rows ARE the global
    ones.  Identical program on one device."""
    import jax

    from tpuvf.kernels.convert import _shift_edge
    from tpuvf.parallel import spctx

    half = e.shape[-2]
    half_g = spctx.total_rows(half)  # TRUE phase rows under host row pad
    row = spctx.global_row_iota(e.shape)
    first_e = jax.lax.slice_in_dim(e, 0, 1, axis=-2)
    last_o = spctx.frame_last_row(o)

    def tap(base, j_off):
        shifted = _shift_edge(base, -2, j_off)
        if j_off < 0:
            shifted = jnp.where(row < -j_off, first_e, shifted)
        elif j_off > 0:
            shifted = jnp.where(row >= half_g - j_off, last_o, shifted)
        return shifted

    be = None
    bo = None
    for i, w in enumerate(BLUR_WEIGHTS):
        wf = F32(w)
        if i % 2 == 0:
            te = tap(e, i // 2 - 2)          # row 2(k-2+i/2)
            to = tap(o, i // 2 - 2)          # row 2(k-2+i/2)+1
        else:
            te = tap(o, (i - 5) // 2)        # row 2k-4+i (odd)
            to = tap(e, (i - 3) // 2)        # row 2k+1-4+i (even)
        be = te * wf if be is None else be + te * wf
        bo = to * wf if bo is None else bo + to * wf
    return be, bo


def blur9_grid4(phases, axis: int):
    """9-tap blur across FOUR mod-4 phase planes (see blur9_gridk)."""
    return blur9_gridk(phases, axis, 4)


def blur9_gridk(phases, axis: int, period: int):
    """9-tap blur across `period` mod-`period` phase planes along `axis`
    (the GRID16/GRID64 dataflows' blur: horizontal crosses the column
    phases per row phase with axis=-1; vertical the row phases per
    column phase with axis=-2).

    Expression mirror of blur9(interleaved, axis): output phase p index
    j (full coordinate period*j+p) accumulates tap i at full coordinate
    clip(period*j+p-4+i, 0, N-1) — phase (p-4+i) mod period shifted by
    floor((p-4+i)/period), in the same i order with the same weights.
    Edge clamping CROSSES phases: a tap clipped to coordinate 0 reads
    phases[0][0] and one clipped to N-1 reads phases[period-1][n-1]
    (N a multiple of period).

    sp-safe on axis=-2 (round 4): indices/extents are frame-global under
    spctx (same pattern as blur9_v_split); the lane axis is never
    sharded."""
    import jax

    from tpuvf.kernels.convert import _shift_edge
    from tpuvf.parallel import spctx

    axis = -1 if axis in (-1, phases[0].ndim - 1) else -2
    n = phases[0].shape[axis]
    iota_dim = 1 if axis == -1 else 0
    if axis == -2:
        n_g = spctx.total_rows(n)
        idx = spctx.global_row_iota(phases[0].shape)
    else:
        n_g = n
        idx = jax.lax.broadcasted_iota(jnp.int32, phases[0].shape[-2:],
                                       iota_dim)
        idx = jnp.broadcast_to(idx, phases[0].shape)
    first = jax.lax.slice_in_dim(phases[0], 0, 1, axis=axis)
    last = (spctx.frame_last_row(phases[period - 1]) if axis == -2
            else jax.lax.slice_in_dim(phases[period - 1], n - 1, n,
                                      axis=axis))

    def tap(q, s):
        shifted = _shift_edge(phases[q], axis, s)
        if s < 0:
            shifted = jnp.where(idx < -s, first, shifted)
        elif s > 0:
            shifted = jnp.where(idx >= n_g - s, last, shifted)
        return shifted

    out = []
    for p in range(period):
        acc = None
        for i, w in enumerate(BLUR_WEIGHTS):
            dd = p - 4 + i
            q = dd % period
            s = (dd - q) // period
            t = tap(q, s) * F32(w)
            acc = t if acc is None else acc + t
        out.append(acc)
    return out


def blur9(img, axis: int):
    """9-tap Gaussian along one axis with edge clamping (blurHorizontal /
    blurVertical, h:265-299).  img: (..., 4, H, W) float32.

    Edge-pad + shifted slices (never gather — TPU-hostile); XLA fuses the
    9 weighted adds into one VPU pass.
    """
    axis = axis % img.ndim
    n = img.shape[axis]
    if axis == img.ndim - 2:
        # row axis: halo-aware under spatial sharding (4-row reach,
        # metalvideofilter_shaders.h:257-299 -> parallel.spctx)
        from tpuvf.parallel import spctx

        p = spctx.pad_rows_edge(img, 4, 4)
    else:
        pad = [(0, 0)] * img.ndim
        pad[axis] = (4, 4)
        p = jnp.pad(img, pad, mode="edge")
    out = None
    for i, w in enumerate(BLUR_WEIGHTS):
        tap = jax.lax.slice_in_dim(p, i, i + n, axis=axis) * F32(w)
        out = tap if out is None else out + tap
    return out


def unsharp_mask(original, blurred, amount):
    """unsharpMask kernel (h:302-328): amount>0 sharpens, <0 mixes toward
    the blur; alpha always preserved from the original."""
    sharpened = jnp.clip(original + (original - blurred) * amount, 0.0, 1.0)
    mixed = original + (blurred - original) * jnp.abs(amount)
    out = jnp.where(amount > 0, sharpened, mixed)
    # alpha preserved
    alpha = original[..., 3:4, :, :]
    return jnp.concatenate([out[..., :3, :, :], alpha], axis=-3)
