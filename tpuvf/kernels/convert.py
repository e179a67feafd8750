"""Shared input-sampling and output-packing paths (the L0 common layer).

`sample_rgba` is the analog of every element's fragment stage: sample the
input planes at the output grid's texcoords (Metal sampler semantics) and
convert to RGBA float.  `pack_rgba` is the analog of VfMetalYUVOutput
(/root/reference/src/common/vfmetalyuvoutput.m) plus the packed-YUV output
kernels (metalconvertscale_shaders.h:202-269): quantized RGBA -> output
format planes, with 4:2:0 chroma produced by a 2x2 box average and 4:2:2
chroma by a 2-pixel average.

Fast paths replace the dense sampling matmuls where they would be wasteful:
identity (same size) sampling is a no-op and 2x linear chroma upsampling is a
fixed 2-tap stencil — both exact under the sampler math.
"""

from __future__ import annotations

import jax
import numpy as np
import jax.numpy as jnp

from tpuvf.core.formats import (
    PACKED_YUV_FORMATS,
    RGB_FORMATS,
    VideoFormat,
    chroma_dims_420,
)
from tpuvf.core.spec import FrameSpec
from tpuvf.kernels import color, sample
from tpuvf.kernels.color import dequant, quant
from tpuvf.kernels.sample import LINEAR, NEAREST


def _upsample2x_linear(img: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Exact 2x linear upsample along `axis` (half-texel phase).

    Output 2k   = 0.25*c[k-1] + 0.75*c[k]   (clamped at the edge)
    Output 2k+1 = 0.75*c[k]   + 0.25*c[k+1]
    which is sample_matrix(texcoords(2n), n, linear) in closed form.
    """
    axis = axis % img.ndim
    prev = _shift_edge(img, axis, -1)
    nxt = _shift_edge(img, axis, +1)
    even = 0.25 * prev + 0.75 * img
    odd = 0.75 * img + 0.25 * nxt
    stacked = jnp.stack([even, odd], axis=axis + 1)
    new_shape = list(img.shape)
    new_shape[axis] = img.shape[axis] * 2
    return stacked.reshape(new_shape)


def _downsample_int_ok(in_size: int, out_size: int, filter: str,
                       axis: int = -2) -> bool:
    """Integer-factor downscales with a closed tap form: src texcoords sit
    at k*j + (k-1)/2, so every LINEAR sampling-matrix row at EVEN k is
    exactly (0.5, 0.5) at taps k*j + (k/2-1, k/2) and every NEAREST row a
    single 1.0 at tap k*j + k//2 (half rounds up).  ODD-k LINEAR rows are
    a single 1.0 in exact arithmetic but texcoords carry ~1e-15 float
    noise onto a second tap (measured at k=5), so they keep the matrix
    path to preserve bitwise parity.

    TPUVF_DOWN2X selects which axes take the closed form: "rows"
    (DEFAULT — sublane strided tap slices are near free), "both",
    "cols", or "off" (TPUVF_NO_DOWN2X=1 is an alias; unrecognized
    values fall back to "rows").  The lane-axis
    (cols) form is default-OFF by measurement, not oversight: the mod-k
    trailing-reshape taps turn every downstream consumer load strided,
    and the standalone 4K->1080p NV12 element measured 3,148-3,631 fps
    with cols closed vs 4,130-4,328 rows-only in the same windows,
    while the 8K->4K chain read the same within noise for rows-only vs
    both (scripts/bench_down2x_axes_ab.py) — the blockband column
    matmul keeps consumers lane-dense and is never worse.

    NEAREST is gated on the dense matrix AGREEING with the closed form:
    the dense tap is floor(texcoords*in) where the f64 texcoords carry
    rounding noise, and at many sizes (e.g. 2160->1080) the true value
    (j+0.5)*k is an exact integer so the noise lands just BELOW the
    boundary and the dense tap is k*j + k//2 - 1 for some outputs.  The
    closed form must stay bitwise-equal to the dense/oracle path, so
    those sizes keep the matrix (round-4 advisor finding)."""
    import os

    mode = os.environ.get("TPUVF_DOWN2X", "rows")
    if mode == "off" or os.environ.get("TPUVF_NO_DOWN2X"):
        return False
    if mode not in ("both", "cols", "rows"):
        mode = "rows"  # unknown values must not silently enable "both"
    if mode == "rows" and axis == -1:
        return False
    if mode == "cols" and axis == -2:
        return False
    if out_size < 1 or in_size % out_size:
        return False
    k = in_size // out_size
    if k < 2:
        return False
    if filter == NEAREST:
        dense = np.clip(
            np.floor(sample.texcoords(out_size) * in_size).astype(np.int64),
            0, in_size - 1)
        return bool(np.array_equal(dense, k * np.arange(out_size) + k // 2))
    return filter == LINEAR and k % 2 == 0


def _downsample_int(img: jnp.ndarray, axis: int, k: int,
                    filter: str) -> jnp.ndarray:
    """Exact k:1 downsample along `axis` (see _downsample_int_ok for the
    tap derivation).  (a+b)*0.5 is bitwise equal to the HIGHEST-precision
    dense dot: scaling by 0.5 is exact (exponent shift), so both forms
    round once at the add.  Rows ride sublane strided slices, columns a
    trailing mod-k reshape — the formulation measured fastest on TPU
    (color.rgb_to_chroma_downsampled)."""
    axis = axis % img.ndim
    half = np.float32(0.5)
    if axis == img.ndim - 2:
        if filter == NEAREST:
            return img[..., k // 2::k, :]
        return (img[..., k // 2 - 1::k, :] + img[..., k // 2::k, :]) * half
    if axis == img.ndim - 1:
        s = img.shape
        q = img.reshape(*s[:-1], s[-1] // k, k)
        if filter == NEAREST:
            return q[..., k // 2]
        return (q[..., k // 2 - 1] + q[..., k // 2]) * half
    raise ValueError("downsample supports the last two axes only")


def _rational_rows_taps(in_size: int, out_size: int, filter: str):
    """Phase-periodic closed form of a RATIONAL-factor downscale, or None.

    With out/in = q/p in lowest terms, the sampling texcoords
    s_j = (j+0.5)*(p/q) - 0.5 satisfy s_{j+q} = s_j + p exactly: the
    dense sampling matrix is q-phase periodic with input stride p, so
    each output phase r is ONE fixed 2-tap stencil (LINEAR: base
    b_r = floor(s_r), weights (1-f_r, f_r)) or ONE fixed tap (NEAREST)
    over the stride-p row slices img[b_r::p] / img[b_r+1::p] — the
    rational generalization of the k:1 integer form (_downsample_int,
    q=1).  Strict downscale keeps every tap strictly in range
    (s_0 = 0.5*p/q - 0.5 >= 0 and s_last <= in - 1 - (p/q - 1) < in-1
    for p > q), so no clamp folds exist; checked numerically anyway.

    The gate is EMPIRICAL like _upsample_int_taps: the f64 texcoords
    carry ~1e-15 rounding noise, so every phase's (tap offset, f32
    fractional weight) must be constant across its rows IN THE DENSE
    MATRIX's own arithmetic, else the matrix path stands.  That also
    keeps odd-k integer LINEAR (q=1) on the matrix automatically — the
    noise varies the second tap across rows at many sizes.

    PARITY CONTRACT: <= 1 ulp vs the dense HIGHEST-precision matmul
    (NOT bitwise — the dense dot's FMA keeps the first product
    unrounded, the repo K-decomposition rule); NEAREST phases are
    slice-exact (bitwise).  Post-quantize this can flip knife-edge
    pixels by 1 LSB, the same class as blockband / kx-upsample plans.
    Reference bilinear semantics:
    /root/reference/src/convertscale/metalconvertscale_shaders.h:71-148.

    Returns (p, q, taps) — taps a list of q (b_r, w0, w1) tuples
    (w0/w1 None for NEAREST) — or None.
    """
    import math

    if in_size <= out_size or out_size < 1:
        return None  # strict downscale only (upscales have clamp folds)
    g = math.gcd(in_size, out_size)
    p, q = in_size // g, out_size // g
    if q > 8:
        return None  # phase count bound: q slices+FMAs and a q-way interleave
    s = sample.texcoords(out_size) * in_size
    if filter == NEAREST:
        idx = np.clip(np.floor(s).astype(np.int64), 0, in_size - 1)
        taps = []
        for r in range(q):
            base = idx[r::q] - p * np.arange(idx[r::q].size)
            if not np.all(base == base[0]):
                return None
            b = int(base[0])
            if b < 0 or b + p * (idx[r::q].size - 1) > in_size - 1:
                return None
            taps.append((b, None, None))
        return p, q, taps
    if filter != LINEAR:
        return None
    s = s - 0.5
    x0 = np.floor(s).astype(np.int64)
    f = (s - np.floor(s)).astype(np.float32)
    taps = []
    for r in range(q):
        xr, fr = x0[r::q], f[r::q]
        base = xr - p * np.arange(xr.size)
        if not (np.all(base == base[0]) and np.all(fr == fr[0])):
            return None
        b = int(base[0])
        if b < 0 or b + p * (xr.size - 1) + 1 > in_size - 1:
            return None  # a clamp fold somewhere: keep the matrix
        w1 = fr[0]
        taps.append((b, np.float32(1.0) - w1, w1))
    return p, q, taps


def _rational_ok(in_size: int, out_size: int, filter: str,
                 axis: int = -2) -> bool:
    """Env gate for the rational-phase closed form.  TPUVF_RATPHASE
    selects axes like TPUVF_DOWN2X: "rows" (DEFAULT — sublane strided
    tap slices are near free; the lane form makes downstream loads
    strided, the repo axis-asymmetry rule), "both", "cols", "off";
    unknown values fall back to "rows"."""
    import os

    mode = os.environ.get("TPUVF_RATPHASE", "rows")
    if mode not in ("rows", "both", "cols", "off"):
        mode = "rows"
    if mode == "off":
        return False
    if mode == "rows" and axis == -1:
        return False
    if mode == "cols" and axis == -2:
        return False
    return _rational_rows_taps(in_size, out_size, filter) is not None


def _rational_apply(img: jnp.ndarray, axis: int, p: int, taps,
                    out_size: int) -> jnp.ndarray:
    """Apply _rational_rows_taps stencils along `axis`: q strided
    2-tap FMAs (or slices for NEAREST) + one stack/reshape interleave.
    Every tap is strictly in range (gated), so no edge fixes.  Requires
    the full (unsharded) axis — plan wrappers fall back to the dense
    path under spctx row sharding."""
    axis = axis % img.ndim
    q = len(taps)
    m = out_size // q

    def strided(b):
        return jax.lax.slice_in_dim(
            img, b, b + p * (m - 1) + 1, stride=p, axis=axis)

    phases = []
    for b, w0, w1 in taps:
        if w0 is None:
            phases.append(strided(b))
        else:
            phases.append(w0 * strided(b) + w1 * strided(b + 1))
    stacked = jnp.stack(phases, axis=axis + 1)
    shape = list(img.shape)
    shape[axis] = out_size
    return stacked.reshape(shape)


def _upsample_int_taps(in_size: int, out_size: int, filter: str):
    """Per-phase closed-form stencils of an integer-factor (k >= 3)
    LINEAR upsample, or None when the dense sampling matrix does not
    reduce to them.

    At out = k*in, output row k*m+q has texcoord s = m + (2q+1-k)/(2k):
    a fixed 2-tap stencil (floor offset d0 in {-1, 0}, weights (1-f, f))
    shared by every m of phase q — so the whole resample is k cheap
    shifted FMAs + a stack/reshape interleave instead of a sampling
    matmul (the kx analog of _upsample2x_linear; the 2x path keeps its
    dedicated form).  The gate is EMPIRICAL, mirroring the round-4
    NEAREST downscale fix: the f64 texcoords of odd k carry ~1e-15 noise
    that varies the fractional weight across m at many sizes (measured:
    k=3/5 at in=540) — any phase whose (d0, f32 frac) isn't constant
    keeps the matrix path.  Clamp-folded edge rows (phase tap m-1 at
    m=0, or m+1 at m=in-1) accumulate both weights on one texel in the
    dense matrix; the closed form emits the exact source row there,
    which equals the dense product only when f32(w0)+f32(w1) == 1.0
    exactly — checked, else None.

    PARITY CONTRACT: <= 1 ulp vs the dense matmul (NOT bitwise — the
    dense dot's FMA keeps the first product unrounded, the repo-wide
    K-decomposition rule from round 3b; measured 1-ulp flips on interior
    rows at several sizes).  Edge rows are exact.  Post-quantize this
    can flip knife-edge pixels by 1 LSB, like every other <=1-ulp
    resampling plan (blockband, scaled-split phases).  TPUVF_UPKX gates
    axes: "rows" (DEFAULT — the k-phase LANE interleave measured the
    worst arm of the 4x A/B: both 544-677 vs rows 784-1472 vs matrix
    617-1009 fps on the 540p->4K chain, scripts/bench_upkx_ab.py — the
    axis-asymmetry rule again; rows beat the matrix in 3/4 interleaved
    reps, up to +78%), "both", "off".

    Returns a list of k (d0, w0, w1) tuples (numpy f32 weights).
    Reference bilinear semantics:
    /root/reference/src/convertscale/metalconvertscale_shaders.h:71-148.
    """
    if (filter != LINEAR or in_size < 2 or out_size <= in_size
            or out_size % in_size):
        return None
    k = out_size // in_size
    if k == 2:
        return None  # the dedicated 2x fast path stands
    s = sample.texcoords(out_size) * in_size - 0.5
    x0 = np.floor(s).astype(np.int64)
    f = (s - np.floor(s)).astype(np.float32)
    m = np.arange(in_size, dtype=np.int64)
    taps = []
    for q in range(k):
        d = x0[q::k] - m
        fq = f[q::k]
        if not (np.all(d == d[0]) and np.all(fq == fq[0])):
            return None
        d0 = int(d[0])
        if d0 not in (-1, 0):
            return None
        w1 = fq[0]
        w0 = np.float32(1.0) - w1
        if np.float32(w0 + w1) != np.float32(1.0):
            return None  # edge fold would not match the dense product
        taps.append((d0, w0, w1))
    return taps


def _upsample_int_ok(in_size: int, out_size: int, filter: str,
                     axis: int = -2) -> bool:
    import os

    mode = os.environ.get("TPUVF_UPKX", "rows")
    if mode not in ("both", "rows", "off"):
        mode = "rows"
    if mode == "off" or (mode == "rows" and axis == -1):
        return False
    return _upsample_int_taps(in_size, out_size, filter) is not None


def _upsample_int(img: jnp.ndarray, axis: int, taps) -> jnp.ndarray:
    """Apply _upsample_int_taps stencils along `axis` (<= 1 ulp vs the
    dense sampling matmul — see the parity contract in
    _upsample_int_taps; clamp-folded edge rows emit the exact source
    row, which the dense product also yields since the accumulated
    weight is exactly 1.0).  Row-axis stencils are
    halo-aware under spctx sharding (_shift_edge + global-row edge fix —
    phase outputs are row-local, so each shard's k-times-taller band
    reads only its own rows plus the 1-row halos)."""
    from tpuvf.parallel import spctx

    axis = axis % img.ndim
    n = img.shape[axis]
    prev = _shift_edge(img, axis, -1)
    nxt = _shift_edge(img, axis, +1)
    sharded_rows = (axis == img.ndim - 2
                    and spctx.active_axis() is not None)

    def fix_edge(body, at_last):
        # the clamp-folded frame-edge output is the EXACT source row
        # (w0*x + w1*x would round; the dense row is one accumulated
        # 1.0 tap)
        if not sharded_rows:
            if axis == img.ndim - 2:
                edge = (img[..., -1:, :] if at_last else img[..., :1, :])
                return (jnp.concatenate([body[..., :-1, :], edge], axis=axis)
                        if at_last else
                        jnp.concatenate([edge, body[..., 1:, :]], axis=axis))
            edge = (img[..., -1:] if at_last else img[..., :1])
            return (jnp.concatenate([body[..., :-1], edge], axis=axis)
                    if at_last else
                    jnp.concatenate([edge, body[..., 1:]], axis=axis))
        grow = spctx.global_row_iota(img.shape)
        tgt = spctx.total_rows(n) - 1 if at_last else 0
        return jnp.where(grow == tgt, img, body)

    phases = []
    for d0, w0, w1 in taps:
        if w1 == 0.0 and w0 == 1.0:
            phases.append(img)  # exact-integer phase (odd k center)
        elif d0 == -1:
            phases.append(fix_edge(w0 * prev + w1 * img, at_last=False))
        else:
            phases.append(fix_edge(w0 * img + w1 * nxt, at_last=True))
    stacked = jnp.stack(phases, axis=axis + 1)
    shape = list(img.shape)
    shape[axis] = n * len(taps)
    return stacked.reshape(shape)


def shift_rows_cross_phase(x: jnp.ndarray, offset: int,
                           edge_src: jnp.ndarray) -> jnp.ndarray:
    """Row shift of phase plane `x` by offset (+-1) whose out-of-frame
    clamp reads the FRAME-edge row of PARTNER phase plane `edge_src`
    instead of x's own edge — the interleaved-row stencil clamp pattern
    (deinterlace interp taps, the grid16 2x row stencils): full row -1
    clamps to full row 0, which lives on the OTHER parity plane.

    One device: the plain concatenate expression (no select — these
    land in VPU-bound emit fusions).  Under spctx row sharding:
    _shift_edge exchanges halos and the clamp compares GLOBAL phase
    rows, which only hold on the first/last shard where the local edge
    row IS the frame's.  Values identical in both forms."""
    from tpuvf.parallel import spctx

    if spctx.active_axis() is None:
        if offset == -1:
            return jnp.concatenate(
                [edge_src[..., :1, :], x[..., :-1, :]], axis=-2)
        if offset == +1:
            return jnp.concatenate(
                [x[..., 1:, :], edge_src[..., -1:, :]], axis=-2)
        raise ValueError(f"offset {offset} not supported")
    shifted = _shift_edge(x, -2, offset)
    grow = spctx.global_row_iota(shifted.shape)
    if offset == -1:
        return jnp.where(grow == 0, edge_src[..., :1, :], shifted)
    if offset == +1:
        # total_rows/frame_last_row are TRUE-frame under host row padding
        # (spctx row_pad): the clamp fires at the true frame edge and
        # reads the true edge row, so pad-row content is don't-care
        last = spctx.total_rows(x.shape[-2]) - 1
        return jnp.where(grow == last, spctx.frame_last_row(edge_src),
                         shifted)
    raise ValueError(f"offset {offset} not supported")


def _shift_edge(img: jnp.ndarray, axis: int, offset: int) -> jnp.ndarray:
    """img shifted by `offset` along axis with edge replication (pad+slice,
    no gather).  Row-axis shifts are halo-aware under spatial sharding
    (parallel.spctx): the pad reads the neighbor shard's boundary rows."""
    if offset == 0:
        return img

    axis = axis % img.ndim
    n = img.shape[axis]
    if axis == img.ndim - 2:
        from tpuvf.parallel import spctx

        p = spctx.pad_rows_edge(img, max(-offset, 0), max(offset, 0))
        start = max(offset, 0)
        return jax.lax.slice_in_dim(p, start, start + n, axis=axis)
    pad = [(0, 0)] * img.ndim
    pad[axis] = (max(-offset, 0), max(offset, 0))
    p = jnp.pad(img, pad, mode="edge")
    start = max(offset, 0)
    return jax.lax.slice_in_dim(p, start, start + n, axis=axis)


def sample_axis(
    img: jnp.ndarray,
    axis: int,
    out_size: int,
    filter: str = LINEAR,
    scale: float = 1.0,
) -> jnp.ndarray:
    """Sample one axis of a float plane at output-grid texcoords."""
    in_size = img.shape[axis]
    if scale == 1.0:
        if out_size == in_size:
            return img  # identity under both filters
        if filter == LINEAR and out_size == 2 * in_size:
            return _upsample2x_linear(img, axis)
        if filter == NEAREST and out_size == 2 * in_size:
            return jnp.repeat(img, 2, axis=axis)
        if _upsample_int_ok(in_size, out_size, filter, axis):
            return _upsample_int(
                img, axis, _upsample_int_taps(in_size, out_size, filter))
        if _downsample_int_ok(in_size, out_size, filter, axis):
            return _downsample_int(img, axis, in_size // out_size, filter)
        if _rational_ok(in_size, out_size, filter, axis):
            from tpuvf.parallel import spctx

            if (spctx.active_axis() is None
                    and img.shape[axis % img.ndim] == in_size):
                p_, _q, rtaps = _rational_rows_taps(in_size, out_size, filter)
                return _rational_apply(img, axis, p_, rtaps, out_size)
    t = sample.texcoords(out_size, scale)
    mask = sample.coverage_mask(out_size, scale)
    w = sample.sample_matrix(t, in_size, filter, mask)
    w = jnp.asarray(w)
    axis = axis % img.ndim
    if axis == img.ndim - 2:
        return jnp.einsum(
            "oh,...hw->...ow", w, img,
            preferred_element_type=jnp.float32, precision=sample.MATMUL_PRECISION,
        )
    if axis == img.ndim - 1:
        return jnp.einsum(
            "...hw,ow->...ho", img, w,
            preferred_element_type=jnp.float32, precision=sample.MATMUL_PRECISION,
        )
    raise ValueError("sample_axis supports the last two axes only")


def sample_plane(
    plane: jnp.ndarray,
    out_w: int,
    out_h: int,
    filter: str = LINEAR,
    scale_x: float = 1.0,
    scale_y: float = 1.0,
) -> jnp.ndarray:
    p = sample_axis(plane, -2, out_h, filter, scale_y)
    return sample_axis(p, -1, out_w, filter, scale_x)


def sample_rgba(
    planes: dict,
    in_spec: FrameSpec,
    out_w: int,
    out_h: int,
    filter: str = LINEAR,
    scale_x: float = 1.0,
    scale_y: float = 1.0,
    border: tuple | None = None,
    matrix_index: int | None = None,
) -> jnp.ndarray:
    """Input planes -> (..., 4, out_h, out_w) float RGBA in [0,1].

    Reproduces the convertscale fragment stage (metalconvertscale_shaders.h:
    71-198): RGB inputs are sampled directly; planar YUV samples each plane
    at the shared texcoord then converts; packed 4:2:2 always uses nearest
    (metalconvertscalerenderer.m:180-185).  `border` (r,g,b,a floats) fills
    pixels outside the letterbox quad (the render pass clear color).
    """
    if matrix_index is None:
        matrix_index = in_spec.matrix_index
    fmt = in_spec.format
    if fmt in RGB_FORMATS:
        rgba = sample_plane(dequant(planes["rgba"]), out_w, out_h, filter, scale_x, scale_y)
    else:
        if fmt in PACKED_YUV_FORMATS:
            filter = NEAREST  # packed inputs always decode with nearest
        y = sample_plane(dequant(planes["y"]), out_w, out_h, filter, scale_x, scale_y)
        u = sample_plane(dequant(planes["u"]), out_w, out_h, filter, scale_x, scale_y)
        v = sample_plane(dequant(planes["v"]), out_w, out_h, filter, scale_x, scale_y)
        r, g, b = color.yuv_to_rgb(y, u, v, matrix_index)
        a = jnp.ones_like(r)
        rgba = jnp.stack([r, g, b, a], axis=-3)
    if border is not None:
        mx = sample.coverage_mask(out_w, scale_x)
        my = sample.coverage_mask(out_h, scale_y)
        if not (mx.all() and my.all()):
            mask = jnp.asarray(np.logical_and.outer(my, mx))
            bcol = jnp.asarray(np.asarray(border, np.float32)).reshape(
                (4,) + (1,) * 2
            )
            rgba = jnp.where(mask, rgba, bcol)
    return rgba


# ---------------------------------------------------------------------------
# Planned samplers: weight matrices as runtime buffers, not HLO constants
# ---------------------------------------------------------------------------


def _use_pallas_banded(in_size, axis, filter, scale) -> bool:
    """Row-axis dense resampling goes through the Pallas banded kernel on
    TPU (1.2-2.4x faster than the dense matmul, numerically identical);
    columns stay on the MXU.  Non-8-multiple heights (540-row 1080p
    chroma) ride the same kernel over a bottom-padded operand
    (sample_rows keeps the logical clamp-to-edge semantics)."""
    import os

    if os.environ.get("TPUVF_NO_PALLAS"):
        return False
    from tpuvf.parallel import spctx

    if spctx.active_axis() is not None:
        return False  # row-sharded: the halo-aware XLA upsample runs instead
    if axis != -2 or filter != LINEAR or scale != 1.0:
        return False
    if in_size < 2:
        return False  # banded_resample_rows needs >= 2 logical rows
    if in_size % 8 != 0 and os.environ.get("TPUVF_NO_PALLAS_PAD"):
        return False  # A/B knob: re-gate the padded-operand variant
    try:

        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


_blockband_plan = sample.blockband_plan  # shared planner (kernels.sample)


def _letterbox2x_rows_offset(w, mask, in_size):
    """y0 of a letterboxed exactly-2x rows band, or None.

    Accepts only sampling matrices whose covered rows form ONE
    contiguous [y0, y0+2*in) band that equals the plain 2x sampling
    matrix bitwise — then the dense product over those rows is exactly
    the 2x product, _upsample2x_linear is bitwise to THAT (including
    the clamp-folded edge rows: 0.25x+0.75x == x holds in f32), and the
    masked rows are exact +0.0 either way (zero matrix rows vs pad)."""
    idx = np.nonzero(mask)[0]
    if idx.size != 2 * in_size or idx.size == 0:
        return None
    y0 = int(idx[0])
    if int(idx[-1]) - y0 + 1 != idx.size:
        return None  # covered rows not contiguous
    t2 = sample.texcoords(2 * in_size)
    w2 = sample.sample_matrix(t2, in_size, LINEAR)
    expect = np.zeros_like(w)
    expect[y0:y0 + 2 * in_size] = w2
    return y0 if np.array_equal(w, expect) else None


def plan_axis_sampler(in_size, out_size, axis, filter, scale, bufs):
    """Plan sampling of one axis; matrices are registered on `bufs` and
    fetched from params at call time."""
    if scale == 1.0:
        if out_size == in_size:
            return lambda img, params: img
        if filter == LINEAR and out_size == 2 * in_size:
            return lambda img, params: _upsample2x_linear(img, axis)
        if filter == NEAREST and out_size == 2 * in_size:
            return lambda img, params: jnp.repeat(img, 2, axis=axis)
        if _upsample_int_ok(in_size, out_size, filter, axis):
            # kx (k >= 3) integer-factor upsample closed form: k shifted
            # 2-tap FMAs + one stack/reshape interleave — no sampling
            # matrix, no matmul; <= 1 ulp vs dense (gated empirically at
            # plan time, see _upsample_int_taps).  Rows under sp: each
            # shard's k-times-taller output band reads only its own input
            # band plus the _shift_edge halos, which pad_rows_edge
            # exchanges — phase stencils are row-local.
            kx_taps = _upsample_int_taps(in_size, out_size, filter)
            return lambda img, params: _upsample_int(img, axis, kx_taps)
        if _downsample_int_ok(in_size, out_size, filter, axis):
            # integer-factor closed form — no weight matrix, no matmul;
            # both axes fuse into the surrounding elementwise program.
            # Rows: under sp row sharding any dispatchable config has
            # k-multiple per-shard rows (each shard's output band is a
            # 1/k band of its input band, and out rows must split
            # evenly), so the tap slices are shard-local — no halo, no
            # all-gather.  A misaligned shard would fail loudly at trace
            # time (strided-slice shape mismatch), never compute wrong
            # values — and the guard below catches the k>2 corner where
            # misaligned slice shapes could coincide.
            k = in_size // out_size
            if axis == -1:
                return lambda img, params: _downsample_int(
                    img, -1, k, filter)

            def run_int_rows(img, params):
                if img.shape[-2] != in_size and img.shape[-2] % k:
                    raise ValueError(
                        f"k={k} downscale needs k-multiple per-shard rows; "
                        f"got {img.shape[-2]} (in_size {in_size})")
                return _downsample_int(img, -2, k, filter)

            return run_int_rows
    rational = None
    if scale == 1.0 and _rational_ok(in_size, out_size, filter, axis):
        # rational-factor (q-phase, stride-p) closed form: q strided
        # 2-tap FMAs fused into the surrounding program — no weight
        # matrix fetch, no matmul, no separate Pallas launch (and no
        # bottom-pad for non-8-multiple heights like 540-row chroma).
        # <= 1 ulp vs dense (see _rational_rows_taps); sharded operands
        # fall through to the dense all-gather path below.
        rational = _rational_rows_taps(in_size, out_size, filter)
    t = sample.texcoords(out_size, scale)
    mask = sample.coverage_mask(out_size, scale)
    w = sample.sample_matrix(t, in_size, filter, mask)
    fetch = bufs.add(w, f"ax{axis}_")
    import os

    cols_plan = None
    if axis == -1 and not os.environ.get("TPUVF_NO_BLOCKBAND"):
        cols_plan = _blockband_plan(w)
    # LETTERBOXED exactly-2x rows (round 4): when the covered rows are a
    # contiguous [y0, y0+2*in) band whose dense rows ARE the 2x stencil
    # taps (checked bitwise against the matrix structure, like every
    # closed form), the rows pass is the 2x stencil + a zero pad — the
    # border mask downstream fills the bars exactly as it fills the
    # dense matmul's zero rows.  Unsharded only (the dense path keeps
    # its all-gather form under sp).
    lb2x_y0 = None
    if (axis == -2 and filter == LINEAR and scale != 1.0
            and not os.environ.get("TPUVF_NO_LB2X")):
        lb2x_y0 = _letterbox2x_rows_offset(w, mask, in_size)

    def run_dense(img, params):
        wm = fetch(params)
        a = axis % img.ndim
        if a == img.ndim - 2:
            from tpuvf.parallel import spctx

            if (lb2x_y0 is not None and spctx.active_axis() is None
                    and img.shape[-2] == in_size):
                up = _upsample2x_linear(img, -2)
                pad = [(0, 0)] * img.ndim
                pad[img.ndim - 2] = (
                    lb2x_y0, out_size - lb2x_y0 - 2 * in_size)
                return jnp.pad(up, pad)
            if (spctx.active_axis() is not None
                    and img.shape[-2] != in_size):
                # row-sharded operand: the contraction is frame-global —
                # gather the input rows once (ICI all-gather), keep the
                # OUTPUT rows sharded by slicing this shard's weight rows
                n = spctx.axis_size()
                img = spctx.all_rows(img)
                wm = spctx.shard_rows(wm, out_size // n)
            return jnp.einsum(
                "oh,...hw->...ow", wm, img,
                preferred_element_type=jnp.float32,
                precision=sample.MATMUL_PRECISION,
            )
        if cols_plan is not None:
            # block-banded scale: each 128-column output tile contracts
            # only its nonzero input span (sample.blockband_plan)
            return sample._blockband_cols(img, wm, cols_plan)
        return jnp.einsum(
            "...hw,ow->...ho", img, wm,
            preferred_element_type=jnp.float32,
            precision=sample.MATMUL_PRECISION,
        )

    if _use_pallas_banded(in_size, axis, filter, scale) and rational is None:
        from tpuvf.kernels.pallas import resample as pres

        t_np = sample.texcoords(out_size, scale)

        row_pad = (-in_size) % 8  # Mosaic band slices need 8-aligned rows

        def one_plane(img2d):
            if row_pad:
                img2d = jnp.pad(img2d, ((0, row_pad), (0, 0)))
                return pres.banded_resample_rows(
                    img2d, t_np, sample_rows=in_size)
            return pres.banded_resample_rows(img2d, t_np)

        def run_banded(img, params):
            from tpuvf.parallel import spctx

            if spctx.active_axis() is not None:
                # plan-time backend checks can't see the trace-time sp
                # scope: the banded kernel is not shard-aware, so sharded
                # traces take the dense gather+slice path instead
                return run_dense(img, params)
            if img.ndim == 2:
                return one_plane(img)
            # leading channel axes: one kernel call per channel
            flat = img.reshape((-1,) + img.shape[-2:])
            outs = [one_plane(flat[c]) for c in range(flat.shape[0])]
            out = jnp.stack(outs, axis=0)
            return out.reshape(img.shape[:-2] + out.shape[-2:])

        return run_banded
    if rational is not None:
        p_, _q, rtaps = rational

        def run_rational(img, params):
            from tpuvf.parallel import spctx

            if (spctx.active_axis() is not None
                    or img.shape[axis % img.ndim] != in_size):
                # row-sharded operand: phase rows of a shard are not
                # global phase rows — the dense all-gather path stands
                return run_dense(img, params)
            return _rational_apply(img, axis, p_, rtaps, out_size)

        return run_rational
    return run_dense


def plan_plane_sampler(in_w, in_h, out_w, out_h, filter, scale_x, scale_y, bufs):
    fy = plan_axis_sampler(in_h, out_h, -2, filter, scale_y, bufs)
    fx = plan_axis_sampler(in_w, out_w, -1, filter, scale_x, bufs)
    return lambda img, params: fx(fy(img, params), params)


def plan_rgba_sampler(
    in_spec: FrameSpec,
    out_w: int,
    out_h: int,
    bufs,
    filter: str = LINEAR,
    scale_x: float = 1.0,
    scale_y: float = 1.0,
    border: tuple | None = None,
    matrix_index: int | None = None,
):
    """Planned version of sample_rgba (same semantics)."""
    if matrix_index is None:
        matrix_index = in_spec.matrix_index
    fmt = in_spec.format
    if fmt in PACKED_YUV_FORMATS:
        filter = NEAREST
    if fmt in RGB_FORMATS:
        run_rgba = plan_plane_sampler(
            in_spec.width, in_spec.height, out_w, out_h, filter,
            scale_x, scale_y, bufs)
        planes_fn = None
    else:
        if fmt in (VideoFormat.NV12, VideoFormat.I420):
            cw, ch = (in_spec.width + 1) // 2, (in_spec.height + 1) // 2
        else:  # packed 4:2:2
            cw, ch = in_spec.width // 2, in_spec.height
        run_y = plan_plane_sampler(
            in_spec.width, in_spec.height, out_w, out_h, filter,
            scale_x, scale_y, bufs)
        run_c = plan_plane_sampler(
            cw, ch, out_w, out_h, filter, scale_x, scale_y, bufs)
        planes_fn = (run_y, run_c)

    fetch_mask = None
    bcol = None
    if border is not None:
        mx = sample.coverage_mask(out_w, scale_x)
        my = sample.coverage_mask(out_h, scale_y)
        if not (mx.all() and my.all()):
            fetch_mask = bufs.add(
                np.logical_and.outer(my, mx), "border_mask")
            bcol = np.asarray(border, np.float32).reshape(4, 1, 1)

    def run_t(planes, params):
        """-> (r, g, b, a) tuple of (..., H, W) float planes.

        Per-channel dataflow: stacking channels into a (4, H, W) array
        breaks XLA fusion and materializes 132 MB f32 intermediates at 4K —
        measured 1.66x slower end to end.  Channels stay separate until the
        element boundary (uint8) or a consumer that truly needs the stack.
        """
        if fmt in RGB_FORMATS:
            x = planes["rgba"]
            chans = tuple(  # slice uint8 first, dequant per channel
                run_rgba(dequant(x[..., c, :, :]), params) for c in range(4)
            )
        else:
            run_y, run_c = planes_fn
            y = run_y(dequant(planes["y"]), params)
            u = run_c(dequant(planes["u"]), params)
            v = run_c(dequant(planes["v"]), params)
            r, g, b = color.yuv_to_rgb(y, u, v, matrix_index)
            chans = (r, g, b, jnp.ones_like(r))
        if fetch_mask is not None:
            from tpuvf.parallel import spctx

            # full-height border mask sliced to this shard's rows under
            # spatial sharding (no-op otherwise)
            mask = spctx.shard_rows(fetch_mask(params), chans[0].shape[-2])
            chans = tuple(
                jnp.where(mask, chans[c], np.float32(bcol[c, 0, 0]))
                for c in range(4)
            )
        return chans

    def run(planes, params):
        return jnp.stack(run_t(planes, params), axis=-3)

    run.tuple = run_t
    return run


# ---------------------------------------------------------------------------
# Even/odd column-phase dataflow (420 input at identity size)
#
# The 2x chroma upsample's LANE interleave is the dominant residual cost of
# the NV12->RGB(A) chain on TPU: XLA materializes full-width f32 planes at
# every interleave and the layout shuffles run far below HBM bandwidth.
# Keeping even/odd COLUMN phases as separate half-width planes makes every
# elementwise stage layout-agnostic; the single interleave happens once on
# uint8 at the element/pipeline edge.  Measured at 4K NV12->BGRA+filter:
# 502 -> 672 fps, bit-exact vs the interleaving path.
# ---------------------------------------------------------------------------


_DEINT_U16 = False  # u16-view y deinterleave: measured NO better than the
                    # u8 reshape on v5e (median-of-5 A/B,
                    # scripts/bench_chain_ab.py); kept as a knob


def can_split_420(in_spec: FrameSpec, out_w: int, out_h: int,
                  scale_x: float, scale_y: float, border) -> bool:
    """The column-phase fast path applies to 4:2:0 inputs sampled at
    identity geometry (the convertscale fragment degenerates to the 2x
    chroma upsample) with even dimensions and no letterbox."""
    return (
        in_spec.format in (VideoFormat.NV12, VideoFormat.I420)
        and out_w == in_spec.width and out_h == in_spec.height
        and scale_x == 1.0 and scale_y == 1.0 and border is None
        and in_spec.width % 2 == 0 and in_spec.height % 2 == 0
    )


def can_split_422(in_spec: FrameSpec, out_w: int, out_h: int,
                  scale_x: float, scale_y: float, border) -> bool:
    """Column-phase fast path for packed 4:2:2 inputs at identity geometry
    (round 4).  4:2:2 chroma is column-subsampled only, and the canonical
    path forces NEAREST sampling for packed formats (plan_rgba_sampler,
    mirroring the reference's per-macro-pixel chroma reuse in
    rgbaFromUYVY/rgbaFromYUY2, metalconvertscale_shaders.h:150-200), so
    the 2x column upsample reads source column c//2 — BOTH output column
    phases read the half-width plane unchanged (u_e = u_o = u).  The
    split path therefore has zero chroma work: no lane repeat, no row
    stencils (chroma is full height), and the only interleave left is
    the u8/u16-word edge emit.  Height parity is irrelevant (nothing
    pairs rows)."""
    return (
        in_spec.format in PACKED_YUV_FORMATS
        and out_w == in_spec.width and out_h == in_spec.height
        and scale_x == 1.0 and scale_y == 1.0 and border is None
        and in_spec.width % 2 == 0
    )


def plan_rgba_sampler_split(in_spec: FrameSpec, filter: str = LINEAR,
                            matrix_index: int | None = None,
                            presplit: bool = False):
    """420 planes at identity size -> (even_chans, odd_chans), each a
    (r, g, b, a) tuple of (H, W/2) float planes holding the even/odd output
    COLUMNS.  Bit-exact vs plan_rgba_sampler: the luma deinterleave runs on
    uint8 (one strided read), the chroma column phases come straight off the
    half-width plane (taps 0.25/0.75 match _upsample2x_linear), and no f32
    lane interleave ever happens.

    presplit: the upstream link already delivers {"y_e","y_o","u","v"}
    (a split-mode boundary: f32 quant_sim values) — skip the luma
    deinterleave and the dequant."""
    from tpuvf.kernels.color import as_unit_float

    if matrix_index is None:
        matrix_index = in_spec.matrix_index

    def run_split(planes, params):
        if presplit:
            y_e = as_unit_float(planes["y_e"])
            y_o = as_unit_float(planes["y_o"])
        elif _DEINT_U16:
            # u16-view deinterleave: one aligned u16 load + mask/shift per
            # column pair instead of two strided u8 loads; the f32 converts
            # are exact so values match dequant(u8) bit-for-bit

            y8 = planes["y"]
            w = y8.shape[-1]
            yp = y8.reshape(y8.shape[:-1] + (w // 2, 2))
            x = jax.lax.bitcast_convert_type(yp, jnp.uint16)
            inv = np.float32(1.0 / 255.0)
            y_e = (x & 0xFF).astype(jnp.float32) * inv
            y_o = (x >> 8).astype(jnp.float32) * inv
        else:
            y8 = planes["y"]
            w = y8.shape[-1]
            yp = y8.reshape(y8.shape[:-1] + (w // 2, 2))
            y_e = dequant(yp[..., 0])
            y_o = dequant(yp[..., 1])

        def chroma(name):
            import os

            c8 = planes[name]
            cf = as_unit_float(c8)
            if in_spec.format in PACKED_YUV_FORMATS:
                # packed 4:2:2: chroma is column-subsampled only and the
                # canonical path forces NEAREST (plan_rgba_sampler), whose
                # 2x column upsample reads src col c//2 — both output
                # column phases ARE the half-width plane.  Full height, so
                # no row stencil and no repeat/barrier either.
                return cf, cf
            if (filter == LINEAR and f"{name}_m" in planes
                    and not os.environ.get("TPUVF_NO_CHROMA_PAIR")):
                # host PAIR provisioning (round 5, frame.chroma_pair_rows):
                # full-height u8 (main, adj) planes make the row upsample
                # the pure elementwise 0.25*adj + 0.75*main — bitwise equal
                # to the stencil forms below (addition commutes; the muls
                # are identical), but with no relayout to pin, so it FUSES
                # into every consumer instead of materializing a
                # multi-consumer full-height f32 plane (the config-5
                # compositor residual).
                cf = (0.25 * as_unit_float(planes[f"{name}_a"])
                      + 0.75 * as_unit_float(planes[f"{name}_m"]))
                prev = _shift_edge(cf, -1, -1)
                nxt = _shift_edge(cf, -1, +1)
                return 0.25 * prev + 0.75 * cf, 0.75 * cf + 0.25 * nxt
            if filter == LINEAR:
                # rows: three formulations of the same 0.25/0.75 taps —
                #   "pair":   row-pair broadcast-select (..., H/2, 2, W/2)
                #             + free bitcast reshape: no custom call, no
                #             sublane-interleave relayout — the whole
                #             upsample stays inside the consumer fusion
                #   "pallas": banded manual-DMA kernel (round 2; a custom
                #             call, which BREAKS the chain fusion into
                #             extra passes — device trace round 3)
                #   "xla":    _upsample2x_linear stack+reshape (a ~43-65 us
                #             relayout copy per 4K plane)
                # All three are bit-exact; TPUVF_CHROMA_ROWS picks.
                # Round-3 4K-chain A/B (4 reps, heavy tunnel noise):
                # pallas median ~3,340 fps, xla ~2,710, pair ~2,420 — the
                # fusion-break cost of the pallas custom call is smaller
                # than the select/relayout forms' overhead, so "pallas"
                # stays the default ("pair" did not deliver the hoped
                # single-fusion chain; XLA still fragments it).
                mode = os.environ.get("TPUVF_CHROMA_ROWS", "pallas")
                ch = cf.shape[-2]
                if mode == "pair":
                    prev_r = _shift_edge(cf, -2, -1)
                    nxt_r = _shift_edge(cf, -2, +1)
                    top = 0.25 * prev_r + 0.75 * cf  # even luma rows
                    bot = 0.75 * cf + 0.25 * nxt_r   # odd luma rows
                    pair = jax.lax.broadcasted_iota(
                        jnp.int32, (1, 2, 1), 1)
                    up = jnp.where(pair == 0, top[..., :, None, :],
                                   bot[..., :, None, :])
                    cf = up.reshape(cf.shape[:-2] + (2 * ch, cf.shape[-1]))
                elif (mode == "pallas" and cf.ndim == 2 and ch % 8 == 0
                        and _use_pallas_banded(ch, -2, LINEAR, 1.0)):
                    from tpuvf.kernels.pallas import resample as pres

                    t = sample.texcoords(2 * ch, 1.0)
                    cf = pres.banded_resample_rows(cf, t)
                else:
                    cf = _upsample2x_linear(cf, -2)
                prev = _shift_edge(cf, -1, -1)
                nxt = _shift_edge(cf, -1, +1)
                return 0.25 * prev + 0.75 * cf, 0.75 * cf + 0.25 * nxt
            cf = jnp.repeat(cf, 2, axis=-2)  # nearest
            # Barrier the repeat: without it XLA sinks the yuv_to_rgb
            # coefficient muls to half-res and re-materializes the
            # sublane-interleave relayout once PER CONSUMER — the
            # deinterlace trace showed six (1080,960) f32 copies
            # (~58 us/frame) where one per chroma plane suffices.
            cf = jax.lax.optimization_barrier(cf)
            return cf, cf

        u_e, u_o = chroma("u")
        v_e, v_o = chroma("v")
        re, ge, be = color.yuv_to_rgb(y_e, u_e, v_e, matrix_index)
        ro, go, bo = color.yuv_to_rgb(y_o, u_o, v_o, matrix_index)
        return ((re, ge, be, jnp.ones_like(re)),
                (ro, go, bo, jnp.ones_like(ro)))

    return run_split


QUAD_PHASES = ("ee", "eo", "oe", "oo")  # "<row><col>" phase: e=even, o=odd


def plan_rgba_sampler_quad(in_spec: FrameSpec, filter: str = LINEAR,
                           matrix_index: int | None = None):
    """420 planes at identity size -> {phase: (r, g, b, a)} QUAD planes,
    each (H/2, W/2), holding the (row, column) output phases.

    The row-phase extension of plan_rgba_sampler_split (round 3d): with the
    OUTPUT row-split too, the chroma row 2x-upsample never interleaves —
    each row phase is one of the _upsample2x_linear 2-tap stencil
    expressions verbatim (0.25*prev + 0.75*cur / 0.75*cur + 0.25*next),
    so the whole chain fuses into per-phase emits with no full-height f32
    intermediate (the column-split path materialized two (2160,1920) f32
    chroma planes at 4K — ~77 us/frame of the 254 us headline trace;
    scripts/bench_rowphase.py measured the quad at 190-198).

    Values are BIT-identical to the canonical path per phase: luma is a
    dequant passthrough and the chroma taps match sample_axis's 2x fast
    path expression for expression (reference sampler semantics:
    metalconvertscale_shaders.h:91-148, half-texel linear chroma).

    Inputs are always quad-provisioned: {"y_ee","y_eo","y_oe","y_oo"}
    (u8 from the host upload repack, or f32 quant_sim from a quad
    boundary) plus full {"u","v"} chroma."""
    from tpuvf.kernels.color import as_unit_float

    if matrix_index is None:
        matrix_index = in_spec.matrix_index

    def run_quad(planes, params):
        ys = {ph: as_unit_float(planes[f"y_{ph}"]) for ph in QUAD_PHASES}
        uf = as_unit_float(planes["u"])
        vf = as_unit_float(planes["v"])
        out = {}
        for rp in ("e", "o"):
            if filter == LINEAR:
                if rp == "e":  # output rows 2k: 0.25*c[k-1] + 0.75*c[k]
                    u_r = 0.25 * _shift_edge(uf, -2, -1) + 0.75 * uf
                    v_r = 0.25 * _shift_edge(vf, -2, -1) + 0.75 * vf
                else:          # output rows 2k+1: 0.75*c[k] + 0.25*c[k+1]
                    # +1 row taps clamp at the TRUE frame bottom (the
                    # cross-phase shift with the plane as its own edge
                    # source — identical values unpadded; exact under
                    # spctx row padding where the local bottom is a pad)
                    u_r = 0.75 * uf + 0.25 * shift_rows_cross_phase(
                        uf, +1, uf)
                    v_r = 0.75 * vf + 0.25 * shift_rows_cross_phase(
                        vf, +1, vf)
                u_e = 0.25 * _shift_edge(u_r, -1, -1) + 0.75 * u_r
                u_o = 0.75 * u_r + 0.25 * _shift_edge(u_r, -1, +1)
                v_e = 0.25 * _shift_edge(v_r, -1, -1) + 0.75 * v_r
                v_o = 0.75 * v_r + 0.25 * _shift_edge(v_r, -1, +1)
            else:  # NEAREST: every output pixel reads chroma (y//2, x//2)
                u_e = u_o = uf
                v_e = v_o = vf
            for cp, uu, vv in (("e", u_e, v_e), ("o", u_o, v_o)):
                y = ys[rp + cp]
                r, g, b = color.yuv_to_rgb(y, uu, vv, matrix_index)
                out[rp + cp] = (r, g, b, jnp.ones_like(r))
        return out

    return run_quad


def split_rgb_chans_quad(planes):
    """Quad-boundary RGB planes {"r_ee",...} -> {phase: (r, g, b, a)}
    dequantized f32 tuples (planes are f32 quant_sim values from
    pack_rgba_quad, or u8 from a quad-provisioned RGB upload)."""
    from tpuvf.kernels.color import as_unit_float

    return {
        ph: tuple(as_unit_float(planes[f"{n}_{ph}"])
                  for n in ("r", "g", "b", "a"))
        for ph in QUAD_PHASES
    }


def pack_rgba_quad(chans: dict, out_format: VideoFormat, matrix_index: int,
                   mode: str, unit_range: bool = False) -> dict:
    """pack_rgba_split from QUAD (row x column) phase planes.

    chans: {phase: (r, g, b, a) float planes}, phases in QUAD_PHASES.
    Modes:
    - "quad":     f32 quant_sim boundary planes {"r_ee",...} (RGB out) or
                  {"y_ee",..., "u","v"} (4:2:0 out — the 2x2 chroma box
                  average consumes the phases directly: row pairs are the
                  cross-ROW-phase average, column pairs the cross-COLUMN
                  -phase average, the same float ops in the same order as
                  rgb_to_chroma_downsampled, so values are bit-identical
                  and chroma needs NO interleave at all)
    - "packed32q": {"w_q": (4, H/2, W/2)} u32 pixel words, QUAD phases
                  stacked (ee, eo, oe, oo) along a leading axis (RGB
                  out); the host interleaves rows+columns in one repack
                  pass (core.frame.planes_to_host).  ONE stacked output:
                  separate per-phase scan outputs defeat in-place
                  lax.scan stacking — the 4K headline's scan trace
                  showed two 85.4 us/frame full-buffer DUS copies on the
                  197 us program (same pathology as grid16's 16-output
                  form, see pack_rgba_grid16)
    - "packed16q": {"y_q": (2, H/2, W/2) u16} word planes (column phases
                  joined per row phase, row phases stacked) + {"uv_q":
                  (2, ch, cw) u8} (4:2:0 out).  Stacked for the same
                  lax.scan in-place-stacking reason as packed32q

    unit_range: the producer guarantees [0,1] values (yuv_to_rgb output /
    the gate-bounded filter chain), so the RGB quantize elides its
    redundant clip — bit-identical by clip idempotence (measured 8
    us/frame of the 4K quad emit, scripts/bench_rowphase.py B2)."""
    from tpuvf.kernels.color import quant_sim, quant_sim_unit, quant_unit

    if mode == "quad":
        sim = quant_sim_unit if unit_range else quant_sim
        f = {ph: tuple(sim(c) for c in chans[ph]) for ph in QUAD_PHASES}
        if out_format in RGB_FORMATS:
            names = ("r", "g", "b", "a")
            return {f"{n}_{ph}": v
                    for ph in QUAD_PHASES for n, v in zip(names, f[ph])}
        if out_format in (VideoFormat.NV12, VideoFormat.I420):
            out = {}
            for ph in QUAD_PHASES:
                yph, _, _ = color.rgb_to_yuv(*f[ph][:3], matrix_index)
                out[f"y_{ph}"] = quant_sim(yph)
            half = np.float32(0.5)

            def box(ci):
                # row pairs first (cross row phases), then column pairs —
                # matching rgb_to_chroma_downsampled / pack_rgba_split
                ae = (f["ee"][ci] + f["oe"][ci]) * half
                ao = (f["eo"][ci] + f["oo"][ci]) * half
                return (ae + ao) * half

            _, u, v = color.rgb_to_yuv(box(0), box(1), box(2), matrix_index)
            out["u"] = quant_sim(u)
            out["v"] = quant_sim(v)
            return out
        raise ValueError("quad links support RGB and 4:2:0 outputs only")
    qfn = quant_unit if unit_range else quant
    if mode == "packed32q":
        if out_format not in RGB_FORMATS:
            raise ValueError("packed32q applies to RGB output formats only")
        return {"w_q": jnp.stack(
            [pack_words_u32(tuple(qfn(c) for c in chans[ph]), out_format)
             for ph in QUAD_PHASES],
            axis=-3)}
    if mode == "packed16q":
        if out_format not in (VideoFormat.NV12, VideoFormat.I420):
            raise ValueError("packed16q applies to 4:2:0 output formats")
        q = {ph: tuple(quant(c) for c in chans[ph]) for ph in QUAD_PHASES}
        d = {ph: tuple(dequant(c) for c in q[ph][:3]) for ph in QUAD_PHASES}
        yq = {}
        for ph in QUAD_PHASES:
            yph, _, _ = color.rgb_to_yuv(*d[ph], matrix_index)
            yq[ph] = quant(yph)
        half = np.float32(0.5)

        def box(ci):
            ae = (d["ee"][ci] + d["oe"][ci]) * half
            ao = (d["eo"][ci] + d["oo"][ci]) * half
            return (ae + ao) * half

        _, u, v = color.rgb_to_yuv(box(0), box(1), box(2), matrix_index)
        return {"y_q": jnp.stack([pack_words_u16(yq["ee"], yq["eo"]),
                                  pack_words_u16(yq["oe"], yq["oo"])],
                                 axis=-3),
                "uv_q": jnp.stack([quant(u), quant(v)], axis=-3)}
    raise ValueError(f"unknown quad pack mode {mode}")


# "<row phase><col phase>" of the OUTPUT grid, row-major ("00".."33")
GRID16_PHASES = tuple(f"{qq}{p}" for qq in range(4) for p in range(4))

# Per-grid-phase 2-tap chroma stencil weights for the 4x upsample
# (half-texel bilinear: src = (4m+qq+0.5)/4 - 0.5 = m + (qq-1.5)/4);
# phases 0-1 tap (prev, cur), phases 2-3 tap (cur, next).
_GRID16_CHROMA_W = ((0.375, 0.625), (0.125, 0.875),
                    (0.875, 0.125), (0.625, 0.375))


def can_grid16(in_spec: FrameSpec, out_w: int, out_h: int,
               scale_x: float = 1.0, scale_y: float = 1.0,
               border=None, filter: str = LINEAR) -> bool:
    """GRID16 (4x4 row x col phase) dataflow at EXACTLY 2x/2x 4:2:0
    upscale geometry (round 3e).

    At 2x both axes every bilinear tap is phase-fixed: the luma 2x taps
    are the _upsample2x_linear weights (.25/.75) and the chroma 4x taps
    are the half-texel quarter-phase weights (.375/.625, .125/.875) —
    so decomposing the OUTPUT into a (row mod 4) x (col mod 4) grid makes
    the whole upscale a per-phase 2-tap stencil chain that fuses into the
    downstream per-phase emits with ZERO resampling materialization.
    (The 2-phase column-split path materializes full-resolution f32
    chroma via matmul tiles + row interleaves — ~280 us of its 421 us
    4K trace; the grid measured 233 us, scripts/bench_upscale_p44.py.)"""
    import os

    if os.environ.get("TPUVF_NO_SPLIT_SCALED"):
        return False
    return (in_spec.format in (VideoFormat.NV12, VideoFormat.I420)
            and filter == LINEAR
            and scale_x == 1.0 and scale_y == 1.0 and border is None
            and out_w == 2 * in_spec.width and out_h == 2 * in_spec.height
            and in_spec.width % 2 == 0 and in_spec.height % 2 == 0)


def plan_rgba_sampler_grid16(in_spec: FrameSpec, filter: str = LINEAR,
                             matrix_index: int | None = None):
    """2x/2x 4:2:0 upscale -> {grid phase: (r, g, b, a)} planes, each
    (H_out/4, W_out/4) = (H_in/2, W_in/2) — the same shape as the chroma
    planes, so every phase emit is one homogeneous fusion.

    Inputs are QUAD-provisioned ({"y_ee","y_eo","y_oe","y_oo"} u8 from
    the host upload repack plus full {"u","v"}): the four luma row x col
    parity planes are exactly the stencil operands — output luma rows
    4m+qq read luma rows {2m-1, 2m, 2m+1, 2m+2}, which are rows m-1/m/m+1
    of the y_e*/y_o* planes, and output cols 4j+p read luma cols
    {2j-1 .. 2j+2} = cols j-1/j/j+1 of the col-parity planes.  No lane
    or sublane interleave anywhere.

    Tap weights are the half-texel bilinear sampler's (reference sampler
    semantics: metalconvertscale_shaders.h:91-148): luma .25/.75 per
    parity (the _upsample2x_linear expressions regrouped by output col
    mod 4 — the same float expressions as the shipped 2-phase stencils),
    chroma the quarter-phase 4x weights.  The 2-term stencil products may
    contract differently from the canonical matmul FMA -> knife-edge
    pixels can flip 1 LSB vs the canonical path (the scaled-split rule,
    can_split_scaled docstring)."""
    from tpuvf.kernels.color import as_unit_float

    if matrix_index is None:
        matrix_index = in_spec.matrix_index
    if filter != LINEAR:
        raise NotImplementedError("grid16 links are bilinear-only")

    def run_grid(planes, params):
        ys = {ph: as_unit_float(planes[f"y_{ph}"]) for ph in QUAD_PHASES}
        uf = as_unit_float(planes["u"])
        vf = as_unit_float(planes["v"])
        out = {}
        for qq in range(4):
            e = _grid2x_rows(ys["ee"], ys["oe"], qq)
            o = _grid2x_rows(ys["eo"], ys["oo"], qq)
            u_r = _grid4x_phase(uf, qq, -2)
            v_r = _grid4x_phase(vf, qq, -2)
            for p in range(4):
                y = _grid2x_cols(e, o, p)
                u = _grid4x_phase(u_r, p, -1)
                v = _grid4x_phase(v_r, p, -1)
                r, g, b = color.yuv_to_rgb(y, u, v, matrix_index)
                out[f"{qq}{p}"] = (r, g, b, jnp.ones_like(r))
        return out

    return run_grid


def _grid2x_rows(y0, y1, qq):
    """Output row phase qq of a 2x row upsample whose source rows 2m/2m+1
    live in parity planes y0/y1 (the half-texel bilinear taps, weights
    .25/.75; edge rows clamp)."""
    f32 = np.float32
    if qq == 0:  # taps 2m-1 (.25), 2m (.75); clamp row -1 -> 0
        ym1 = shift_rows_cross_phase(y1, -1, y0)
        return f32(0.25) * ym1 + f32(0.75) * y0
    if qq == 1:  # 2m (.75), 2m+1 (.25)
        return f32(0.75) * y0 + f32(0.25) * y1
    if qq == 2:  # 2m (.25), 2m+1 (.75)
        return f32(0.25) * y0 + f32(0.75) * y1
    # qq == 3: 2m+1 (.75), 2m+2 (.25); clamp row H -> H-1
    y2 = shift_rows_cross_phase(y0, +1, y1)
    return f32(0.75) * y1 + f32(0.25) * y2


def _grid2x_cols(e, o, p):
    """Column mirror of _grid2x_rows (source cols 2j/2j+1 in e/o)."""
    f32 = np.float32
    if p == 0:  # taps 2j-1 (.25), 2j (.75); clamp col -1 -> 0
        om1 = jnp.concatenate([e[..., :, :1], o[..., :, :-1]], axis=-1)
        return f32(0.25) * om1 + f32(0.75) * e
    if p == 1:  # 2j (.75), 2j+1 (.25)
        return f32(0.75) * e + f32(0.25) * o
    if p == 2:  # 2j (.25), 2j+1 (.75)
        return f32(0.25) * e + f32(0.75) * o
    # p == 3: 2j+1 (.75), 2j+2 (.25); clamp col W -> W-1
    e2 = jnp.concatenate([e[..., :, 1:], o[..., :, -1:]], axis=-1)
    return f32(0.75) * o + f32(0.25) * e2


def _grid4x_phase(c, idx, axis):
    """Phase idx of a 4x upsample along `axis` from the full plane
    (half-texel quarter-phase 2-tap weights, _GRID16_CHROMA_W).  Row-axis
    +1 taps clamp at the TRUE frame bottom (see shift_rows_cross_phase —
    identical values unpadded; exact under spctx row padding)."""
    f32 = np.float32
    wlo, whi = _GRID16_CHROMA_W[idx]
    if idx < 2:  # taps (prev, cur)
        return f32(wlo) * _shift_edge(c, axis, -1) + f32(whi) * c
    nxt = (shift_rows_cross_phase(c, +1, c) if axis in (-2, c.ndim - 2)
           else _shift_edge(c, axis, +1))
    return f32(wlo) * c + f32(whi) * nxt


def plan_rgba_sampler_grid420(matrix_index: int):
    """Grid420 boundary planes ({"y_00",...} + 2x2-phase {"u_ab","v_ab"})
    -> {grid phase: (r, g, b, a)}: luma is a per-phase passthrough and
    chroma 2x-upsamples from its 2x2 phase planes via the same .25/.75
    half-texel stencils as the luma grid (identity 4:2:0 read semantics,
    metalconvertscale_shaders.h:91-148 — out row 4k+qq maps to chroma
    row 2k + (qq-0.5)/2, i.e. _grid2x_rows over the chroma row-parity
    phases; columns mirror)."""
    from tpuvf.kernels.color import as_unit_float

    def run_grid420(planes, params):
        ys = {ph: as_unit_float(planes[f"y_{ph}"])
              for ph in GRID16_PHASES}
        u = {ab: as_unit_float(planes[f"u_{ab}"])
             for ab in ("00", "01", "10", "11")}
        v = {ab: as_unit_float(planes[f"v_{ab}"])
             for ab in ("00", "01", "10", "11")}
        out = {}
        for qq in range(4):
            u_r = [_grid2x_rows(u[f"0{b}"], u[f"1{b}"], qq)
                   for b in range(2)]
            v_r = [_grid2x_rows(v[f"0{b}"], v[f"1{b}"], qq)
                   for b in range(2)]
            for p in range(4):
                u_ph = _grid2x_cols(u_r[0], u_r[1], p)
                v_ph = _grid2x_cols(v_r[0], v_r[1], p)
                y = ys[f"{qq}{p}"]
                r, g, b = color.yuv_to_rgb(y, u_ph, v_ph, matrix_index)
                out[f"{qq}{p}"] = (r, g, b, jnp.ones_like(r))
        return out

    return run_grid420


def split_rgb_chans_grid16(planes):
    """Grid-boundary RGB planes {"r_00",...} -> {phase: (r, g, b, a)}
    dequantized f32 tuples (planes are f32 quant_sim values from
    pack_rgba_grid16)."""
    from tpuvf.kernels.color import as_unit_float

    return {
        ph: tuple(as_unit_float(planes[f"{n}_{ph}"])
                  for n in ("r", "g", "b", "a"))
        for ph in GRID16_PHASES
    }


def pack_rgba_grid16(chans: dict, out_format: VideoFormat,
                     matrix_index: int, mode: str,
                     unit_range: bool = False) -> dict:
    """pack_rgba_quad's 16-phase analog (RGB outputs only).

    chans: {grid phase: (r, g, b, a) float planes}.  Modes:
    - "grid":      f32 quant_sim boundary planes — {"r_00",...} for RGB
                   formats; for 4:2:0 formats {"y_00",...} luma per grid
                   phase plus {"u_ab","v_ab"} chroma as a 2x2 phase grid
                   (the 2x2 box average consumes grid phases directly,
                   row pairs then column pairs before the matrix — same
                   float ops in the same order as
                   rgb_to_chroma_downsampled, and the consumer
                   re-upsamples via plan_rgba_sampler_grid420)
    - "packed32g": {"w_g": (16, H/4, W/4)} u32 pixel words, phases
                   stacked row-major along a leading axis; the host
                   interleaves rows+columns mod 4 in one repack pass
                   (core.frame.planes_to_host / native vf_interleave16_u32).
                   ONE stacked output, not 16 planes, on purpose: inside
                   a lax.scan (run_batched / measure_fps) XLA stacks each
                   scan output with a dynamic-update-slice, and with 16
                   small outputs those DUS ops are NOT in-place — each
                   measured ~73 us/frame of full-buffer copies (~1.17
                   ms/frame total, 5x the 231 us program; the stacked
                   form measured 5,251-6,162 fps vs the 16-output form's
                   647-956, scripts/bench_upscale_grid_ab.py)
    """
    from tpuvf.kernels.color import quant_sim, quant_sim_unit, quant_unit

    if mode == "grid":
        sim = quant_sim_unit if unit_range else quant_sim
        if out_format in RGB_FORMATS:
            names = ("r", "g", "b", "a")
            return {f"{n}_{ph}": sim(c)
                    for ph in GRID16_PHASES
                    for n, c in zip(names, chans[ph])}
        if out_format in (VideoFormat.NV12, VideoFormat.I420):
            f = {ph: tuple(sim(c) for c in chans[ph][:3])
                 for ph in GRID16_PHASES}
            out = {}
            for ph in GRID16_PHASES:
                yph, _, _ = color.rgb_to_yuv(*f[ph], matrix_index)
                out[f"y_{ph}"] = quant_sim(yph)
            half = np.float32(0.5)
            for a in range(2):
                for b in range(2):
                    def box(ci):
                        ae = (f[f"{2 * a}{2 * b}"][ci]
                              + f[f"{2 * a + 1}{2 * b}"][ci]) * half
                        ao = (f[f"{2 * a}{2 * b + 1}"][ci]
                              + f[f"{2 * a + 1}{2 * b + 1}"][ci]) * half
                        return (ae + ao) * half

                    _, u, v = color.rgb_to_yuv(box(0), box(1), box(2),
                                               matrix_index)
                    out[f"u_{a}{b}"] = quant_sim(u)
                    out[f"v_{a}{b}"] = quant_sim(v)
            return out
        raise ValueError("grid16 links support RGB and 4:2:0 outputs only")
    if out_format not in RGB_FORMATS:
        raise ValueError(
            "grid16 packed32g applies to RGB output formats only")
    if mode == "packed32g":
        qfn = quant_unit if unit_range else quant
        return {"w_g": jnp.stack(
            [pack_words_u32(tuple(qfn(c) for c in chans[ph]), out_format)
             for ph in GRID16_PHASES],
            axis=-3)}
    raise ValueError(f"unknown grid16 pack mode {mode}")


def pack_420_grid16(chans: dict, out_format: VideoFormat,
                    matrix_index: int, unit_range: bool = False) -> dict:
    """GRID16 phases -> the "packed420g" 4:2:0 sink edge (2x NV12/I420
    upscale chains, e.g. the format-preserving default fixation).

    Value path mirrors pack_rgba_quad's packed16q: quantize each phase's
    RGB (the RGBA8 render-target write), dequantize, RGB->YUV per phase
    for luma, and the 2x2 box average BEFORE the matrix for chroma
    (vfmetalshaders.m:104-124 via color.rgb_to_chroma_downsampled's
    order: row pairs then column pairs).  The box's 2x2 output pixels
    are grid phases: chroma pixel (2k+a, 2l+b) averages grid row phases
    {2a, 2a+1} x col phases {2b, 2b+1} at (k, l) — so chroma is a 2x2
    phase grid of (H/4, W/4)-shaped planes with NO interleave on device.

    Outputs (single stacked arrays — the lax.scan in-place-stacking
    rule, see pack_rgba_grid16):
    - "y_g":  (4, H/4, W/4) u32 — row phase qq's luma cols packed four
              per word (p0 | p1<<8 | p2<<16 | p3<<24): little-endian
              bytes are output row 4r+qq's bytes.  Host interleaves the
              four row-phase planes by contiguous row copies.
    - "uv_g": (2, H/4, W/4) u32 — chroma row phase a, words
              u[b=0] | v[b=0]<<8 | u[b=1]<<16 | v[b=1]<<24: bytes equal
              NV12's interleaved uv rows.  I420 hosts deinterleave.
    """
    from tpuvf.kernels.color import quant_unit

    if out_format not in (VideoFormat.NV12, VideoFormat.I420):
        raise ValueError("packed420g applies to 4:2:0 output formats")
    qfn = quant_unit if unit_range else quant
    q = {ph: tuple(qfn(c) for c in chans[ph]) for ph in GRID16_PHASES}
    d = {ph: tuple(dequant(c) for c in q[ph][:3]) for ph in GRID16_PHASES}

    def u32(x):
        return x.astype(jnp.uint32)

    y_rows = []
    for qq in range(4):
        yq = []
        for p in range(4):
            yph, _, _ = color.rgb_to_yuv(*d[f"{qq}{p}"], matrix_index)
            yq.append(quant(yph))
        y_rows.append(u32(yq[0]) | (u32(yq[1]) << np.uint32(8))
                      | (u32(yq[2]) << np.uint32(16))
                      | (u32(yq[3]) << np.uint32(24)))

    half = np.float32(0.5)

    def chroma(a, b):
        def box(ci):
            ae = (d[f"{2 * a}{2 * b}"][ci]
                  + d[f"{2 * a + 1}{2 * b}"][ci]) * half
            ao = (d[f"{2 * a}{2 * b + 1}"][ci]
                  + d[f"{2 * a + 1}{2 * b + 1}"][ci]) * half
            return (ae + ao) * half

        _, uu, vv = color.rgb_to_yuv(box(0), box(1), box(2), matrix_index)
        return quant(uu), quant(vv)

    uv_rows = []
    for a in range(2):
        u0, v0 = chroma(a, 0)
        u1, v1 = chroma(a, 1)
        uv_rows.append(u32(u0) | (u32(v0) << np.uint32(8))
                       | (u32(u1) << np.uint32(16))
                       | (u32(v1) << np.uint32(24)))
    return {"y_g": jnp.stack(y_rows, axis=-3),
            "uv_g": jnp.stack(uv_rows, axis=-3)}


GRID64_PHASES = tuple(f"{qr}{qc}" for qr in range(8) for qc in range(8))

# Per-phase 2-tap stencil weights for the 8x chroma upsample at 4x
# 4:2:0 geometry (half-texel bilinear: src = (8n+q+0.5)/8 - 0.5 =
# n + (q-3.5)/8, the same mapping the dense sampler's texcoords produce
# for an 8x axis — metalconvertscale_shaders.h:71-148); phases 0-3 tap
# (prev, cur), 4-7 (cur, next).  All sixteenths: exact in f32.
_GRID64_CHROMA_W = (
    (0.4375, 0.5625), (0.3125, 0.6875), (0.1875, 0.8125), (0.0625, 0.9375),
    (0.9375, 0.0625), (0.8125, 0.1875), (0.6875, 0.3125), (0.5625, 0.4375),
)


def can_grid64(in_spec: FrameSpec, out_w: int, out_h: int,
               scale_x: float = 1.0, scale_y: float = 1.0,
               border=None, filter: str = LINEAR) -> bool:
    """GRID64 (8x8 row x col phase) dataflow at EXACTLY 4x/4x 4:2:0
    upscale geometry (round 5, VERDICT r4 item 5).

    The mod-8 resolution of the round-3f gap note: at 4x the luma taps
    are phase-fixed only mod 4 ON THE SOURCE index (output col 4m+p
    reads src m + (p-1.5)/4), but writing the output col as 8n+q makes
    the source index 2n + (q>=4) — a COLUMN-PARITY slice of the
    quad-provisioned luma — with quarter-phase weights
    (_GRID16_CHROMA_W[q%4]); the 4:2:0 chroma's 8x taps are then
    phase-fixed too (src n + (q-3.5)/8, _GRID64_CHROMA_W).  So a mod-8
    output grid makes the whole 4x upscale per-phase 2-tap stencil
    chains with zero resampling materialization, exactly like grid16
    at 2x."""
    import os

    if os.environ.get("TPUVF_NO_SPLIT_SCALED"):
        return False
    return (in_spec.format in (VideoFormat.NV12, VideoFormat.I420)
            and filter == LINEAR
            and scale_x == 1.0 and scale_y == 1.0 and border is None
            and out_w == 4 * in_spec.width and out_h == 4 * in_spec.height
            and in_spec.width % 2 == 0 and in_spec.height % 2 == 0)


def plan_rgba_sampler_grid64(in_spec: FrameSpec, filter: str = LINEAR,
                             matrix_index: int | None = None):
    """4x/4x 4:2:0 upscale -> {grid phase: (r, g, b, a)} planes, each
    (H_out/8, W_out/8) = (H_in/2, W_in/2) — the same shape as the
    quad luma parity planes AND the chroma planes, so every phase emit
    is one homogeneous fusion.

    Inputs are QUAD-provisioned ({"y_ee","y_eo","y_oe","y_oo"} u8 plus
    full {"u","v"}).  Luma: output rows 8m+qr read source rows
    2m + (qr>=4) with quarter-phase 2-tap weights — rows m-1/m/m+1 of
    the row-parity planes (_grid4x_rows); columns mirror on the
    col-parity planes (_grid4x_cols).  Chroma: eighth-phase 2-tap
    stencils straight off the half-res planes (_grid8x_phase).  Tap
    weights equal the dense half-texel bilinear sampler's bitwise (all
    sixteenths); the 2-term stencil products may contract differently
    from the canonical matmul FMA -> knife-edge pixels can flip 1 LSB
    vs the canonical path (the scaled-split rule)."""
    if matrix_index is None:
        matrix_index = in_spec.matrix_index
    if filter != LINEAR:
        raise NotImplementedError("grid64 links are bilinear-only")
    from tpuvf.kernels.color import as_unit_float

    def run_grid(planes, params):
        ys = {ph: as_unit_float(planes[f"y_{ph}"]) for ph in QUAD_PHASES}
        uf = as_unit_float(planes["u"])
        vf = as_unit_float(planes["v"])
        out = {}
        for qr in range(8):
            e = _grid4x_rows(ys["ee"], ys["oe"], qr)
            o = _grid4x_rows(ys["eo"], ys["oo"], qr)
            u_r = _grid8x_phase(uf, qr, -2)
            v_r = _grid8x_phase(vf, qr, -2)
            for qc in range(8):
                y = _grid4x_cols(e, o, qc)
                u = _grid8x_phase(u_r, qc, -1)
                v = _grid8x_phase(v_r, qc, -1)
                r, g, b = color.yuv_to_rgb(y, u, v, matrix_index)
                out[f"{qr}{qc}"] = (r, g, b, jnp.ones_like(r))
        return out

    return run_grid


def _grid4x_rows(y0, y1, qr):
    """Output row phase qr (mod 8) of a 4x row upsample whose source
    rows 2m/2m+1 live in parity planes y0/y1: source row 2m + (qr>=4),
    quarter-phase 2-tap weights _GRID16_CHROMA_W[qr % 4]; edge rows
    clamp to the true frame edge (shift_rows_cross_phase)."""
    f32 = np.float32
    wlo, whi = _GRID16_CHROMA_W[qr % 4]
    if qr < 2:  # src 2m, taps 2m-1 (y1 rows m-1), 2m; clamp row -1 -> 0
        ym1 = shift_rows_cross_phase(y1, -1, y0)
        return f32(wlo) * ym1 + f32(whi) * y0
    if qr < 6:  # taps 2m, 2m+1 (qr 2-3 anchor 2m; qr 4-5 anchor 2m+1)
        return f32(wlo) * y0 + f32(whi) * y1
    # qr 6-7: src 2m+1, taps 2m+1, 2m+2 (y0 rows m+1); clamp H -> H-1
    y2 = shift_rows_cross_phase(y0, +1, y1)
    return f32(wlo) * y1 + f32(whi) * y2


def _grid4x_cols(e, o, qc):
    """Column mirror of _grid4x_rows (source cols 2j/2j+1 in e/o)."""
    f32 = np.float32
    wlo, whi = _GRID16_CHROMA_W[qc % 4]
    if qc < 2:  # taps 2j-1, 2j; clamp col -1 -> 0
        om1 = jnp.concatenate([e[..., :, :1], o[..., :, :-1]], axis=-1)
        return f32(wlo) * om1 + f32(whi) * e
    if qc < 6:  # taps 2j, 2j+1
        return f32(wlo) * e + f32(whi) * o
    # qc 6-7: taps 2j+1, 2j+2; clamp col W -> W-1
    e2 = jnp.concatenate([e[..., :, 1:], o[..., :, -1:]], axis=-1)
    return f32(wlo) * o + f32(whi) * e2


def _grid8x_phase(c, idx, axis):
    """Phase idx of an 8x upsample along `axis` from the full plane
    (half-texel eighth-phase 2-tap weights, _GRID64_CHROMA_W).  Row-axis
    +1 taps clamp at the TRUE frame bottom (shift_rows_cross_phase)."""
    f32 = np.float32
    wlo, whi = _GRID64_CHROMA_W[idx]
    if idx < 4:  # taps (prev, cur)
        return f32(wlo) * _shift_edge(c, axis, -1) + f32(whi) * c
    nxt = (shift_rows_cross_phase(c, +1, c) if axis in (-2, c.ndim - 2)
           else _shift_edge(c, axis, +1))
    return f32(wlo) * c + f32(whi) * nxt


def pack_rgba_grid64(chans: dict, out_format: VideoFormat,
                     matrix_index: int, mode: str,
                     unit_range: bool = False) -> dict:
    """pack_rgba_grid16's 64-phase analog (RGB outputs only).

    Modes:
    - "grid8":      f32 quant_sim boundary planes {"r_00",...,"a_77"}
                    (a downstream grid64-capable consumer reads them
                    with convert.split_rgb_chans_grid64)
    - "packed32g8": {"w_g8": (64, H/8, W/8)} u32 pixel words, phases
                    stacked row-major on a leading axis (ONE stacked
                    scan output — the lax.scan in-place-stacking rule,
                    see pack_rgba_grid16); the host interleaves
                    rows+columns mod 8 in one repack pass
                    (core.frame.planes_to_host)."""
    from tpuvf.kernels.color import quant_sim, quant_sim_unit, quant_unit

    if out_format not in RGB_FORMATS:
        raise ValueError("grid64 links support RGB output formats only")
    if mode == "grid8":
        sim = quant_sim_unit if unit_range else quant_sim
        names = ("r", "g", "b", "a")
        return {f"{n}_{ph}": sim(c)
                for ph in GRID64_PHASES
                for n, c in zip(names, chans[ph])}
    if mode == "packed32g8":
        qfn = quant_unit if unit_range else quant
        return {"w_g8": jnp.stack(
            [pack_words_u32(tuple(qfn(c) for c in chans[ph]), out_format)
             for ph in GRID64_PHASES],
            axis=-3)}
    raise ValueError(f"unknown grid64 pack mode {mode}")


def pack_420_grid64(chans: dict, out_format: VideoFormat,
                    matrix_index: int, unit_range: bool = False) -> dict:
    """GRID64 phases -> the "packed420g8" 4:2:0 sink edge (4x NV12/I420
    upscale chains — the format-preserving default fixation at 4x, e.g.
    NV12 540p -> NV12 4K).  pack_420_grid16's mod-8 analog.

    Value path (identical order to pack_420_grid16 / the canonical
    pack): quantize each phase's RGB (the RGBA8 render-target write,
    vfmetalshaders.m:104-124), dequantize, RGB->YUV per phase for luma,
    and the 2x2 box average BEFORE the matrix for chroma (row pairs
    then column pairs, color.rgb_to_chroma_downsampled's order).  The
    box's 2x2 output pixels are adjacent grid phases: chroma pixel
    (4k+ca, 4l+cb) averages grid row phases {2ca, 2ca+1} x col phases
    {2cb, 2cb+1} at block (k, l) — chroma is a 4x4 phase grid of
    (H_out/8, W_out/8) planes with NO interleave on device.

    Outputs (single stacked arrays — the lax.scan in-place-stacking
    rule, see pack_rgba_grid16):
    - "y_g8":  (16, H_out/8, W_out/8) u32 — entry 2*qr+h packs row
               phase qr's col phases 4h..4h+3 one byte each
               (little-endian byte j = output col 8c+4h+j); the host
               interleaves the two half-words per block column then
               copies rows mod 8.
    - "uv_g8": (8, H_out/8, W_out/8) u32 — entry 2*ca+h packs chroma
               row phase ca, words u[2h] | v[2h]<<8 | u[2h+1]<<16 |
               v[2h+1]<<24: bytes equal NV12's interleaved uv rows.
               I420 hosts deinterleave."""
    from tpuvf.kernels.color import quant_unit

    if out_format not in (VideoFormat.NV12, VideoFormat.I420):
        raise ValueError("packed420g8 applies to 4:2:0 output formats")
    qfn = quant_unit if unit_range else quant
    q = {ph: tuple(qfn(c) for c in chans[ph]) for ph in GRID64_PHASES}
    d = {ph: tuple(dequant(c) for c in q[ph][:3]) for ph in GRID64_PHASES}

    def u32(x):
        return x.astype(jnp.uint32)

    def word4(b):
        return (u32(b[0]) | (u32(b[1]) << np.uint32(8))
                | (u32(b[2]) << np.uint32(16))
                | (u32(b[3]) << np.uint32(24)))

    y_words = []
    for qr in range(8):
        yq = []
        for p in range(8):
            yph, _, _ = color.rgb_to_yuv(*d[f"{qr}{p}"], matrix_index)
            yq.append(quant(yph))
        y_words.append(word4(yq[0:4]))
        y_words.append(word4(yq[4:8]))

    half = np.float32(0.5)

    def chroma(ca, cb):
        def box(ci):
            ae = (d[f"{2 * ca}{2 * cb}"][ci]
                  + d[f"{2 * ca + 1}{2 * cb}"][ci]) * half
            ao = (d[f"{2 * ca}{2 * cb + 1}"][ci]
                  + d[f"{2 * ca + 1}{2 * cb + 1}"][ci]) * half
            return (ae + ao) * half

        _, uu, vv = color.rgb_to_yuv(box(0), box(1), box(2), matrix_index)
        return quant(uu), quant(vv)

    uv_words = []
    for ca in range(4):
        uvs = [chroma(ca, cb) for cb in range(4)]
        for h in range(2):
            (u0, v0), (u1, v1) = uvs[2 * h], uvs[2 * h + 1]
            uv_words.append(word4((u0, v0, u1, v1)))
    return {"y_g8": jnp.stack(y_words, axis=-3),
            "uv_g8": jnp.stack(uv_words, axis=-3)}


def split_rgb_chans_grid64(planes):
    """{"r_00",...} grid64 boundary planes -> {phase: (r, g, b, a)}."""
    from tpuvf.kernels.color import as_unit_float

    names = ("r", "g", "b", "a")
    return {ph: tuple(as_unit_float(planes[f"{n}_{ph}"]) for n in names)
            for ph in GRID64_PHASES}


GRID36_PHASES = tuple(f"{qr}{qc}" for qr in range(6) for qc in range(6))


def _phase_stencil_table(out_size: int, in_size: int, period: int):
    """Per-output-phase (mod `period`) tap stencils of an integer-factor
    LINEAR upsample, derived from the dense sampler's own f32 weights at
    the ACTUAL geometry (sample.sample_matrix — same f64 texcoord math,
    same f32 cast), so every stencil product multiplies the exact f32
    values the canonical matmul would.

    Exact-integer phases can pick up a stray ~1e-15 second tap from f64
    rounding that varies across rows (the round-4 "odd k noisy" finding);
    taps below 1e-3 are DROPPED — genuine k=3 weights are >= 1/12, and
    the dropped term perturbs values by ~1e-12 of a quantization step,
    inside the grid plans' <= 1 LSB knife-edge contract.  Any REAL
    cross-row inconsistency (tap positions or retained f32 weights)
    returns None and the caller keeps the matrix path.

    Returns [(rels, ws)] * period — taps at source index n*step + rel —
    or None.  Edge rows (clamped taps) are excluded from the check; the
    stencil readers clamp-to-edge like the dense sampler."""
    from tpuvf.kernels.sample import texcoords

    step = in_size * period // out_size
    if step * out_size != in_size * period:
        return None
    # the dense sampler's own tap math, vectorized (sample_matrix
    # builds the same s/x0/f in f64 and casts weights to f32; f32
    # subtraction is correctly rounded, so 1.0 - f matches bitwise)
    t = texcoords(out_size)
    s = t * in_size - 0.5
    x0 = np.floor(s)
    f = (s - x0).astype(np.float32)
    w0 = np.float32(1.0) - f
    i0 = x0.astype(np.int64)
    n = np.arange(out_size, dtype=np.int64) // period
    rel0 = i0 - n * step
    # canonical retained-tap form per row (sub-eps stray taps dropped
    # BEFORE the cross-row constancy check, so rows whose f64 noise
    # differs only in a ~1e-15 tap — or in an x0 shift with a
    # complementary ~1 weight — still compare equal)
    k0 = w0 >= np.float32(1e-3)
    k1 = f >= np.float32(1e-3)
    nt = k0.astype(np.int64) + k1.astype(np.int64)
    first_rel = np.where(k0, rel0, rel0 + 1)
    wa = np.where(k0, w0, f)
    wb = np.where(k0 & k1, f, np.float32(0.0))
    table = []
    for q in range(period):
        rows = np.arange(q, out_size, period)
        rows = rows[(rows >= period) & (rows < out_size - period)]
        if rows.size == 0 or nt[rows[0]] == 0:
            return None
        r = rows[0]
        if not (np.all(nt[rows] == nt[r])
                and np.all(first_rel[rows] == first_rel[r])
                and np.all(wa[rows] == wa[r])
                and np.all(wb[rows] == wb[r])):
            return None
        taps = [(int(first_rel[r]), np.float32(wa[r]))]
        if nt[r] == 2:
            taps.append((int(first_rel[r]) + 1, np.float32(wb[r])))
        table.append((tuple(rr for rr, _ in taps),
                      tuple(wv for _, wv in taps)))
    return table


def can_grid36(in_spec: FrameSpec, out_w: int, out_h: int,
               scale_x: float = 1.0, scale_y: float = 1.0,
               border=None, filter: str = LINEAR) -> bool:
    """GRID36 (6x6 row x col phase) dataflow at EXACTLY 3x/3x 4:2:0
    upscale geometry (round 5 — covers 720p -> 4K, the classic HD
    upscale).  Writing the output coordinate as 6n+q makes the luma
    taps column/row-PARITY slices of the quad-provisioned planes (src
    2n + rel) and the chroma 6x taps phase-fixed 2-tap stencils, like
    grid16/grid64 at 2x/4x — but the third/twelfth weights are not
    exact in f32, so the stencils are derived from (and gated on) the
    dense sampler's own per-geometry f32 weights
    (_phase_stencil_table)."""
    return _can_gridp(in_spec, out_w, out_h, 6, "TPUVF_NO_GRID36",
                      scale_x, scale_y, border, filter)


def can_grid9(in_spec: FrameSpec, out_w: int, out_h: int,
              scale_x: float = 1.0, scale_y: float = 1.0,
              border=None, filter: str = LINEAR) -> bool:
    """GRID9 (3x3 row x col phase) dataflow at EXACTLY 1.5x/1.5x 4:2:0
    upscale geometry (round 5 — covers 720p -> 1080p, the most common
    HD upscale).  period=3 with luma step 2: the mod-3 output phases
    tap the quad parity planes at rel in [-1, 2] and the chroma taps
    are a 3x upsample of the half-res planes (step 1) — the exact
    grid36 machinery at period 3."""
    return _can_gridp(in_spec, out_w, out_h, 3, "TPUVF_NO_GRID9",
                      scale_x, scale_y, border, filter)


def _can_gridp(in_spec: FrameSpec, out_w: int, out_h: int, period: int,
               env_gate: str, scale_x: float, scale_y: float,
               border, filter: str) -> bool:
    """Shared gate for the period-parametrized stencil grids (grid36 at
    period 6 = 3x, grid9 at period 3 = 1.5x): 4:2:0 input, bilinear,
    no letterbox, out = (period/2) * in exactly on both axes, and the
    dense-weight consistency check passes per geometry."""
    import os

    if os.environ.get("TPUVF_NO_SPLIT_SCALED") or os.environ.get(env_gate):
        return False
    if not (in_spec.format in (VideoFormat.NV12, VideoFormat.I420)
            and filter == LINEAR
            and scale_x == 1.0 and scale_y == 1.0 and border is None
            and 2 * out_w == period * in_spec.width
            and 2 * out_h == period * in_spec.height
            and in_spec.width % 2 == 0 and in_spec.height % 2 == 0):
        return False
    return _gridp_tables(in_spec, period) is not None


def _grid36_tables(in_spec: FrameSpec):
    return _gridp_tables(in_spec, 6)


def _gridp_tables(in_spec: FrameSpec, period: int):
    """(luma rows, luma cols, chroma rows, chroma cols) phase stencil
    tables for the exactly-(period/2)x geometry, or None when any axis
    fails the dense-weight consistency gate."""
    h, w = in_spec.height, in_spec.width
    oh, ow = period * h // 2, period * w // 2
    t = (_phase_stencil_table(oh, h, period),
         _phase_stencil_table(ow, w, period),
         _phase_stencil_table(oh, h // 2, period),
         _phase_stencil_table(ow, w // 2, period))
    if any(x is None for x in t):
        return None
    # luma tables address parity planes (step 2): rels within [-1, 2];
    # chroma tables address the half-res planes directly (step 1)
    if any(r < -1 or r > 2 for q in t[0] + t[1] for r in q[0]):
        return None
    if any(r < -1 or r > 1 for q in t[2] + t[3] for r in q[0]):
        return None
    return t


def _read_parity_rows(y0, y1, rel):
    """Source row 2n + rel from row-parity planes y0 (even) / y1 (odd),
    rel in [-1, 2]; out-of-frame taps clamp to the TRUE frame edge
    (shift_rows_cross_phase handles sp halos + global clamps)."""
    if rel == 0:
        return y0
    if rel == 1:
        return y1
    if rel == -1:
        return shift_rows_cross_phase(y1, -1, y0)
    return shift_rows_cross_phase(y0, +1, y1)  # rel == 2


def _read_parity_cols(e, o, rel):
    """Column mirror of _read_parity_rows (source col 2j + rel)."""
    if rel == 0:
        return e
    if rel == 1:
        return o
    if rel == -1:
        return jnp.concatenate([e[..., :, :1], o[..., :, :-1]], axis=-1)
    # rel == 2: src col 2j+2 = e[j+1]; clamp j = w2-1 -> col W-1 = o[-1]
    return jnp.concatenate([e[..., :, 1:], o[..., :, -1:]], axis=-1)


def _tap_parity(y0, y1, tap, axis):
    """Apply a parity-plane phase stencil (one or two taps)."""
    rels, ws = tap
    read = _read_parity_rows if axis == -2 else _read_parity_cols
    if len(rels) == 1 and float(ws[0]) == 1.0:
        return read(y0, y1, rels[0])  # exact-integer phase: passthrough
    acc = None
    for rel, wv in zip(rels, ws):
        t = read(y0, y1, rel) * wv
        acc = t if acc is None else acc + t
    return acc


def _tap_full(c, tap, axis):
    """Apply a full-plane phase stencil (chroma 6x; rels in [-1, 1]).
    Row-axis +1 taps clamp at the TRUE frame bottom."""
    rels, ws = tap
    acc = None
    for rel, wv in zip(rels, ws):
        if rel == 0:
            t = c
        elif rel == -1:
            t = _shift_edge(c, axis, -1)
        else:
            t = (shift_rows_cross_phase(c, +1, c)
                 if axis in (-2, c.ndim - 2) else _shift_edge(c, axis, +1))
        tt = t * wv
        acc = tt if acc is None else acc + tt
    return acc


def plan_rgba_sampler_grid36(in_spec: FrameSpec, filter: str = LINEAR,
                             matrix_index: int | None = None):
    """3x/3x 4:2:0 upscale -> {grid phase: (r, g, b, a)} planes, each
    (H_out/6, W_out/6) = (H_in/2, W_in/2) — the same shape as the quad
    luma parity planes AND the chroma planes (homogeneous per-phase
    emits, like plan_rgba_sampler_grid64).

    Inputs are QUAD-provisioned.  Stencil weights come from the dense
    sampler's own f32 weights at this geometry (_phase_stencil_table)
    so products match the canonical matmul's; sums may contract
    differently (FMA) and exact-integer phases drop a ~1e-15 stray tap
    -> <= 1 LSB knife-edge flips vs canonical (the grid contract).
    Bilinear sample semantics: /root/reference/src/convertscale/
    metalconvertscale_shaders.h:71-148."""
    return _plan_rgba_sampler_gridp(in_spec, 6, "grid36", filter,
                                    matrix_index)


def plan_rgba_sampler_grid9(in_spec: FrameSpec, filter: str = LINEAR,
                            matrix_index: int | None = None):
    """1.5x/1.5x 4:2:0 upscale -> {grid phase: (r, g, b, a)} planes,
    each (H_out/3, W_out/3) = (H_in/2, W_in/2) — plan_rgba_sampler_
    grid36 at period 3 (the 720p -> 1080p classic)."""
    return _plan_rgba_sampler_gridp(in_spec, 3, "grid9", filter,
                                    matrix_index)


def _plan_rgba_sampler_gridp(in_spec: FrameSpec, period: int, tag: str,
                             filter: str, matrix_index: int | None):
    if matrix_index is None:
        matrix_index = in_spec.matrix_index
    if filter != LINEAR:
        raise NotImplementedError(f"{tag} links are bilinear-only")
    tables = _gridp_tables(in_spec, period)
    if tables is None:
        raise NotImplementedError(
            f"{tag} dense-weight consistency gate failed at this geometry")
    t_rows, t_cols, ct_rows, ct_cols = tables
    from tpuvf.kernels.color import as_unit_float

    def run_grid(planes, params):
        ys = {ph: as_unit_float(planes[f"y_{ph}"]) for ph in QUAD_PHASES}
        uf = as_unit_float(planes["u"])
        vf = as_unit_float(planes["v"])
        out = {}
        for qr in range(period):
            e = _tap_parity(ys["ee"], ys["oe"], t_rows[qr], -2)
            o = _tap_parity(ys["eo"], ys["oo"], t_rows[qr], -2)
            u_r = _tap_full(uf, ct_rows[qr], -2)
            v_r = _tap_full(vf, ct_rows[qr], -2)
            for qc in range(period):
                y = _tap_parity(e, o, t_cols[qc], -1)
                u = _tap_full(u_r, ct_cols[qc], -1)
                v = _tap_full(v_r, ct_cols[qc], -1)
                r, g, b = color.yuv_to_rgb(y, u, v, matrix_index)
                out[f"{qr}{qc}"] = (r, g, b, jnp.ones_like(r))
        return out

    return run_grid


def pack_rgba_grid36(chans: dict, out_format: VideoFormat,
                     matrix_index: int, mode: str,
                     unit_range: bool = False) -> dict:
    """pack_rgba_grid64's 36-phase analog (RGB outputs only).

    Modes: "grid6" (f32 quant_sim boundary planes {"r_00",...,"a_55"})
    and "packed32g6" ({"w_g6": (36, H/6, W/6)} u32 pixel words, one
    stacked scan output — the lax.scan in-place-stacking rule; host
    interleave via native vf_interleave_grid_u32 at g=6)."""
    from tpuvf.kernels.color import quant_sim, quant_sim_unit, quant_unit

    if out_format not in RGB_FORMATS:
        raise ValueError("grid36 links support RGB output formats only")
    if mode == "grid6":
        sim = quant_sim_unit if unit_range else quant_sim
        names = ("r", "g", "b", "a")
        return {f"{n}_{ph}": sim(c)
                for ph in GRID36_PHASES
                for n, c in zip(names, chans[ph])}
    if mode == "packed32g6":
        qfn = quant_unit if unit_range else quant
        return {"w_g6": jnp.stack(
            [pack_words_u32(tuple(qfn(c) for c in chans[ph]), out_format)
             for ph in GRID36_PHASES],
            axis=-3)}
    raise ValueError(f"unknown grid36 pack mode {mode}")


def split_rgb_chans_grid36(planes):
    """{"r_00",...} grid36 boundary planes -> {phase: (r, g, b, a)}."""
    from tpuvf.kernels.color import as_unit_float

    names = ("r", "g", "b", "a")
    return {ph: tuple(as_unit_float(planes[f"{n}_{ph}"]) for n in names)
            for ph in GRID36_PHASES}


GRID9_PHASES = tuple(f"{qr}{qc}" for qr in range(3) for qc in range(3))


def pack_rgba_grid9(chans: dict, out_format: VideoFormat,
                    matrix_index: int, mode: str,
                    unit_range: bool = False) -> dict:
    """pack_rgba_grid36's 9-phase analog (RGB outputs only; 1.5x).

    Modes: "grid3" (f32 quant_sim boundary planes {"r_00",...,"a_22"})
    and "packed32g3" ({"w_g3": (9, H/3, W/3)} u32 pixel words, one
    stacked scan output; host interleave via native
    vf_interleave_grid_u32 at g=3)."""
    from tpuvf.kernels.color import quant_sim, quant_sim_unit, quant_unit

    if out_format not in RGB_FORMATS:
        raise ValueError("grid9 links support RGB output formats only")
    if mode == "grid3":
        sim = quant_sim_unit if unit_range else quant_sim
        names = ("r", "g", "b", "a")
        return {f"{n}_{ph}": sim(c)
                for ph in GRID9_PHASES
                for n, c in zip(names, chans[ph])}
    if mode == "packed32g3":
        qfn = quant_unit if unit_range else quant
        return {"w_g3": jnp.stack(
            [pack_words_u32(tuple(qfn(c) for c in chans[ph]), out_format)
             for ph in GRID9_PHASES],
            axis=-3)}
    raise ValueError(f"unknown grid9 pack mode {mode}")


def split_rgb_chans_grid9(planes):
    """{"r_00",...} grid9 boundary planes -> {phase: (r, g, b, a)}."""
    from tpuvf.kernels.color import as_unit_float

    names = ("r", "g", "b", "a")
    return {ph: tuple(as_unit_float(planes[f"{n}_{ph}"]) for n in names)
            for ph in GRID9_PHASES}


def pack_420_grid36(chans: dict, out_format: VideoFormat,
                    matrix_index: int, unit_range: bool = False) -> dict:
    """GRID36 phases -> the "packed420g6" 4:2:0 sink edge (3x NV12/I420
    upscale chains — the format-preserving default fixation at 3x, e.g.
    NV12 720p -> NV12 4K).  pack_420_grid64's mod-6 analog.

    Value path (identical order to pack_420_grid16/grid64 and the
    canonical pack): quantize each phase's RGB (the RGBA8 render-target
    write, vfmetalshaders.m:104-124), dequantize, RGB->YUV per phase
    for luma, and the 2x2 box average BEFORE the matrix for chroma
    (row pairs then column pairs, color.rgb_to_chroma_downsampled's
    order).  The box's 2x2 output pixels are adjacent grid phases:
    chroma pixel (3k+ca, 3l+cb) averages grid row phases {2ca, 2ca+1}
    x col phases {2cb, 2cb+1} at block (k, l) — chroma is a 3x3 phase
    grid of the SAME (H_out/6, W_out/6) shape as the luma phases.

    Six bytes per phase-block column don't fill u32 words evenly, so
    each stream splits into a u32 (first four bytes) + u16 (last two)
    pair the host re-joins with one 6-byte-period interleave
    (native vf_interleave_6byte; output cols 6c+{0..3} then 6c+{4,5}).
    Outputs (TWO stacked arrays — the lax.scan in-place-stacking rule,
    see pack_rgba_grid16):
    - "a_g6": (9, H_out/6, W_out/6) u32 — entries 0-5: luma row phase
              qr's col phases 0-3 one byte each (little-endian byte j
              = output col 6c+j); entries 6-8: chroma row phase ca,
              words u[cb=0] | v[0]<<8 | u[1]<<16 | v[1]<<24 (bytes
              equal NV12's interleaved uv rows).
    - "b_g6": (9, H_out/6, W_out/6) u16 — same indexing: luma col
              phases {4, 5}; chroma u[cb=2] | v[2]<<8."""
    from tpuvf.kernels.color import quant_unit

    if out_format not in (VideoFormat.NV12, VideoFormat.I420):
        raise ValueError("packed420g6 applies to 4:2:0 output formats")
    qfn = quant_unit if unit_range else quant
    q = {ph: tuple(qfn(c) for c in chans[ph]) for ph in GRID36_PHASES}
    d = {ph: tuple(dequant(c) for c in q[ph][:3]) for ph in GRID36_PHASES}

    def u32(x):
        return x.astype(jnp.uint32)

    def word4(b):
        return (u32(b[0]) | (u32(b[1]) << np.uint32(8))
                | (u32(b[2]) << np.uint32(16))
                | (u32(b[3]) << np.uint32(24)))

    def word2(b):
        return (u32(b[0]) | (u32(b[1]) << np.uint32(8))).astype(jnp.uint16)

    a_words, b_words = [], []
    for qr in range(6):
        yq = []
        for p in range(6):
            yph, _, _ = color.rgb_to_yuv(*d[f"{qr}{p}"], matrix_index)
            yq.append(quant(yph))
        a_words.append(word4(yq[0:4]))
        b_words.append(word2(yq[4:6]))

    half = np.float32(0.5)

    def chroma(ca, cb):
        def box(ci):
            ae = (d[f"{2 * ca}{2 * cb}"][ci]
                  + d[f"{2 * ca + 1}{2 * cb}"][ci]) * half
            ao = (d[f"{2 * ca}{2 * cb + 1}"][ci]
                  + d[f"{2 * ca + 1}{2 * cb + 1}"][ci]) * half
            return (ae + ao) * half

        _, uu, vv = color.rgb_to_yuv(box(0), box(1), box(2), matrix_index)
        return quant(uu), quant(vv)

    for ca in range(3):
        (u0, v0), (u1, v1), (u2, v2) = [chroma(ca, cb) for cb in range(3)]
        a_words.append(word4((u0, v0, u1, v1)))
        b_words.append(word2((u2, v2)))
    return {"a_g6": jnp.stack(a_words, axis=-3),
            "b_g6": jnp.stack(b_words, axis=-3)}


def can_split_scaled(in_spec: FrameSpec, out_w: int, out_h: int) -> bool:
    """Column-phase dataflow at SCALED geometry (round 3b).

    Output phases are ROW-SLICES of the dense sampling matrix — each
    output element contracts the same weight row against the same
    operand.  Results sit within 1 ulp of the canonical product
    (backends may group the K-reduction differently for the half-width
    output shape; PRESPLIT inputs additionally decompose the K axis by
    phase) — knife-edge pixels may flip 1 LSB after quantization, which
    the parity tests assert.  Applies to 4:2:0 and RGB inputs (packed
    4:2:2 joined in round 4: NEAREST forced like the canonical path,
    chroma at half width / full height); needs even output width for
    equal phases, and even input dims for 4:2:0 chroma (even input
    width only for packed 4:2:2 — nothing pairs rows).  Letterbox masks
    slice per phase."""
    import os

    if os.environ.get("TPUVF_NO_SPLIT_SCALED"):
        return False
    if out_w % 2:
        return False
    if in_spec.format in (VideoFormat.NV12, VideoFormat.I420):
        return in_spec.width % 2 == 0 and in_spec.height % 2 == 0
    if in_spec.format in PACKED_YUV_FORMATS:
        return in_spec.width % 2 == 0
    # identity columns slice (exact); 2x-upsample columns are phase-clean
    # stencils (the _upsample2x_linear expressions — bitwise); everything
    # else is a row-slice of the dense sampling matrix
    return in_spec.format in RGB_FORMATS


def plan_cols_phase_sampler(in_w, out_w, filter, scale, bufs, prefix=""):
    """Phase-decomposed column sampling from a FULL-width operand.

    Returns [run_e, run_o]; run_p(img, params) computes the output's
    even/odd columns as `img @ w[p::2].T` — a row-slice of the dense
    sampling matrix: the identical dot product mathematically, <= 1 ulp
    in practice (backend K-reduction grouping can differ for the
    half-width output shape).

    Identity columns (the chroma case of every 2x downscale: the phase
    matrix degenerates to a column selection) skip the matmul and slice
    — trivially exact.  2x-upsample columns are PHASE-CLEAN: output col
    2k depends only on input cols k-1,k and col 2k+1 on k,k+1, so each
    phase is the corresponding _upsample2x_linear stencil expression
    verbatim (0.25*prev + 0.75*cur / 0.75*cur + 0.25*next) — the same
    float ops as the canonical fast path with no lane interleave."""
    if scale == 1.0 and out_w == in_w and filter in (LINEAR, NEAREST):
        return [lambda img, params: img[..., 0::2],
                lambda img, params: img[..., 1::2]]
    if scale == 1.0 and out_w == 2 * in_w:
        if filter == LINEAR:
            return [
                lambda img, params:
                    0.25 * _shift_edge(img, -1, -1) + 0.75 * img,
                lambda img, params:
                    0.75 * img + 0.25 * _shift_edge(img, -1, +1),
            ]
        if filter == NEAREST:
            # out[2k] and out[2k+1] both sample input col k
            return [lambda img, params: img, lambda img, params: img]
    if (scale == 1.0 and out_w and in_w % out_w == 0 and out_w % 2 == 0
            and _downsample_int_ok(in_w, out_w, filter, -1)):
        # k:1 columns are phase-clean: output phase p col j taps the
        # mod-2k block at k*p + (k//2-1, k//2) (LINEAR, 0.5/0.5 — the
        # exact dense weights, see _downsample_int_ok) or k*p + k//2
        # (NEAREST) — a trailing mod-2k reshape, no matmul and no
        # weight matrix
        k = in_w // out_w
        half = np.float32(0.5)

        def make(p):
            def run(img, params):
                s = img.shape
                q = img.reshape(*s[:-1], s[-1] // (2 * k), 2 * k)
                if filter == NEAREST:
                    return q[..., k * p + k // 2]
                return (q[..., k * p + k // 2 - 1]
                        + q[..., k * p + k // 2]) * half

            return run

        return [make(0), make(1)]
    t = sample.texcoords(out_w, scale)
    mask = sample.coverage_mask(out_w, scale)
    w = sample.sample_matrix(t, in_w, filter, mask)
    runs = []
    for p in (0, 1):
        wp = np.ascontiguousarray(w[p::2])
        fetch = bufs.add(wp, f"{prefix}colsP{p}_")
        plan = sample.blockband_plan(wp)

        def run(img, params, fetch=fetch, plan=plan):
            wm = fetch(params)
            if plan is not None:
                return sample._blockband_cols(img, wm, plan)
            return jnp.einsum(
                "...hw,ow->...ho", img, wm,
                preferred_element_type=jnp.float32,
                precision=sample.MATMUL_PRECISION,
            )
        runs.append(run)
    return runs


def plan_cols_phase_sampler_presplit(in_w, out_w, filter, scale, bufs,
                                     prefix=""):
    """Phase-decomposed column sampling from PHASE-SPLIT operands.

    Returns [run_e, run_o]; run_p(img_e, img_o, params) contracts
    w[p::2][:, 0::2] with the even input phase and w[p::2][:, 1::2]
    with the odd.  Bilinear rows have <= 2 nonzero taps on CONSECUTIVE
    input columns (one per phase; edge-clamped taps collapse into a
    single accumulated weight), so each output element is a two-term
    sum.  NOT quite bitwise vs the dense contraction: the dense dot's
    FMA adds w1*y to the UNROUNDED product w0*x, while this sum rounds
    each product first — <= 1 ulp apart, so knife-edge pixels can flip
    1 LSB after quantization (tests assert <= 1).

    Identity columns pass each input phase straight through (exact)."""
    if scale == 1.0 and out_w == in_w and filter in (LINEAR, NEAREST):
        return [lambda img_e, img_o, params: img_e,
                lambda img_e, img_o, params: img_o]
    if (scale == 1.0 and out_w and in_w % out_w == 0 and out_w % 2 == 0
            and _downsample_int_ok(in_w, out_w, filter, -1)):
        # k:1 from split inputs: output phase p col j taps full-input
        # cols 2kj + t for t = k*p + (k//2-1, k//2) (LINEAR) or
        # k*p + k//2 (NEAREST); full col 2m lives in the EVEN plane at
        # index m, col 2m+1 in the ODD plane — so each tap is a mod-k
        # trailing reshape of one input phase.  The 0.5 scales are
        # exact, so this is BITWISE vs the canonical closed form
        # (better than the generic <= 1 ulp presplit contract).
        k = in_w // out_w
        half = np.float32(0.5)

        def make(p):
            def tap(img_e, img_o, t):
                img = img_o if t % 2 else img_e
                s = img.shape
                q = img.reshape(*s[:-1], s[-1] // k, k)
                return q[..., t // 2]

            def run(img_e, img_o, params):
                if filter == NEAREST:
                    return tap(img_e, img_o, k * p + k // 2)
                return (tap(img_e, img_o, k * p + k // 2 - 1)
                        + tap(img_e, img_o, k * p + k // 2)) * half

            return run

        return [make(0), make(1)]
    t = sample.texcoords(out_w, scale)
    mask = sample.coverage_mask(out_w, scale)
    w = sample.sample_matrix(t, in_w, filter, mask)
    runs = []
    for p in (0, 1):
        wp = w[p::2]
        parts = []
        for q in (0, 1):
            wq = np.ascontiguousarray(wp[:, q::2])
            parts.append((bufs.add(wq, f"{prefix}colsP{p}K{q}_"),
                          sample.blockband_plan(wq)))

        def run(img_e, img_o, params, parts=parts):
            out = None
            for (fetch, plan), img in zip(parts, (img_e, img_o)):
                wm = fetch(params)
                if plan is not None:
                    term = sample._blockband_cols(img, wm, plan)
                else:
                    term = jnp.einsum(
                        "...hw,ow->...ho", img, wm,
                        preferred_element_type=jnp.float32,
                        precision=sample.MATMUL_PRECISION,
                    )
                out = term if out is None else out + term
            return out
        runs.append(run)
    return runs


def plan_rgba_sampler_split_scaled(
    in_spec: FrameSpec,
    out_w: int,
    out_h: int,
    bufs,
    filter: str = LINEAR,
    scale_x: float = 1.0,
    scale_y: float = 1.0,
    border=None,
    matrix_index: int | None = None,
    presplit: bool = False,
):
    """Split-output sampler at SCALED geometry: -> (even_chans, odd_chans),
    each (r, g, b, a) tuples of (out_h, out_w/2) float planes holding the
    even/odd output COLUMNS.

    Mirrors plan_rgba_sampler's dataflow exactly (rows then columns per
    plane, yuv_to_rgb after sampling, border fill last): column phases
    are row-slices of the dense sampling matrices — BITWISE equal to
    slicing the canonical result (plan_cols_phase_sampler) — and
    presplit inputs contract one tap per input phase, <= 1 ulp from
    canonical (plan_cols_phase_sampler_presplit; FMA rounding).  Rows
    ride plan_axis_sampler
    (identity/2x/Pallas fast paths, sp all-gather) per plane —
    column-independent, so per-phase rows match full-width rows."""
    from tpuvf.kernels.color import as_unit_float

    if matrix_index is None:
        matrix_index = in_spec.matrix_index
    fmt = in_spec.format
    if fmt in PACKED_YUV_FORMATS:
        filter = NEAREST  # packed inputs always decode with nearest
                          # (canonical parity, metalconvertscalerenderer.m:
                          # 180-185 via plan_rgba_sampler)
    run_rows_y = plan_axis_sampler(
        in_spec.height, out_h, -2, filter, scale_y, bufs)
    if fmt not in RGB_FORMATS:
        # chroma geometry: 4:2:0 subsamples both axes; packed 4:2:2 is
        # column-subsampled only (full-height chroma rows)
        cw = in_spec.width // 2
        ch2 = (in_spec.height if fmt in PACKED_YUV_FORMATS
               else in_spec.height // 2)
        run_rows_c = plan_axis_sampler(ch2, out_h, -2, filter, scale_y, bufs)
        cols_c = plan_cols_phase_sampler(
            cw, out_w, filter, scale_x, bufs, "c")
    if presplit:
        cols_y = plan_cols_phase_sampler_presplit(
            in_spec.width, out_w, filter, scale_x, bufs, "y")
    else:
        cols_y = plan_cols_phase_sampler(
            in_spec.width, out_w, filter, scale_x, bufs, "y")

    fetch_masks = None
    bcol = None
    if border is not None:
        mx = sample.coverage_mask(out_w, scale_x)
        my = sample.coverage_mask(out_h, scale_y)
        if not (mx.all() and my.all()):
            full = np.logical_and.outer(my, mx)
            fetch_masks = (bufs.add(np.ascontiguousarray(full[:, 0::2]),
                                    "border_mask_e"),
                           bufs.add(np.ascontiguousarray(full[:, 1::2]),
                                    "border_mask_o"))
            bcol = np.asarray(border, np.float32).reshape(4)

    def run_split(planes, params):
        if fmt in RGB_FORMATS:
            if presplit:
                names = ("r", "g", "b", "a")
                phases = ([], [])
                for n in names:
                    ve = run_rows_y(as_unit_float(planes[f"{n}_e"]), params)
                    vo = run_rows_y(as_unit_float(planes[f"{n}_o"]), params)
                    phases[0].append(cols_y[0](ve, vo, params))
                    phases[1].append(cols_y[1](ve, vo, params))
                ch_e, ch_o = tuple(phases[0]), tuple(phases[1])
            else:
                x = planes["rgba"]
                rows = [run_rows_y(dequant(x[..., c, :, :]), params)
                        for c in range(4)]
                ch_e = tuple(cols_y[0](r, params) for r in rows)
                ch_o = tuple(cols_y[1](r, params) for r in rows)
        else:
            if presplit:
                ye = run_rows_y(as_unit_float(planes["y_e"]), params)
                yo = run_rows_y(as_unit_float(planes["y_o"]), params)
                y_ph = (cols_y[0](ye, yo, params),
                        cols_y[1](ye, yo, params))
            else:
                yr = run_rows_y(dequant(planes["y"]), params)
                y_ph = (cols_y[0](yr, params), cols_y[1](yr, params))
            ur = run_rows_c(as_unit_float(planes["u"]), params)
            vr = run_rows_c(as_unit_float(planes["v"]), params)
            chans = []
            for p in (0, 1):
                u_p = cols_c[p](ur, params)
                v_p = cols_c[p](vr, params)
                r, g, b = color.yuv_to_rgb(y_ph[p], u_p, v_p, matrix_index)
                chans.append((r, g, b, jnp.ones_like(r)))
            ch_e, ch_o = chans
        if fetch_masks is not None:
            from tpuvf.parallel import spctx

            out = []
            for chs, fm in zip((ch_e, ch_o), fetch_masks):
                mask = spctx.shard_rows(fm(params), chs[0].shape[-2])
                out.append(tuple(
                    jnp.where(mask, chs[c], np.float32(bcol[c]))
                    for c in range(4)))
            ch_e, ch_o = out
        return ch_e, ch_o

    return run_split


def split_rgb_chans(planes: dict) -> tuple:
    """Split-mode RGB boundary planes {"r_e","g_e",...,"a_o"} -> (even_chans,
    odd_chans) f32 tuples.  Boundary planes are f32 quant_sim values from
    pack_rgba_split(mode="split") (bf16 quant_units were measured slower and
    dropped), or u8 for host-provisioned source uploads; as_unit_float
    normalizes either."""
    from tpuvf.kernels.color import as_unit_float

    names = ("r", "g", "b", "a")
    return (tuple(as_unit_float(planes[f"{n}_e"]) for n in names),
            tuple(as_unit_float(planes[f"{n}_o"]) for n in names))


def interleave_cols_u8(e: jnp.ndarray, o: jnp.ndarray) -> jnp.ndarray:
    """(.., H, W/2) x2 uint8 -> (.., H, W): THE one lane interleave, on u8."""
    return jnp.stack([e, o], axis=-1).reshape(e.shape[:-1] + (2 * e.shape[-1],))


def pack_words_u16(e: jnp.ndarray, o: jnp.ndarray) -> jnp.ndarray:
    """(.., H, W/2) x2 uint8 -> (.., H, W/2) uint16 words `even | odd << 8`.

    Little-endian byte layout == the column-interleaved u8 plane, so this is
    the pipeline-edge replacement for interleave_cols_u8: pure-u8 fusions run
    at ~284 GB/s on v5e while the u16 combine fuses into the upstream f32
    quantize at full HBM bandwidth (measured 770 GB/s,
    scripts/bench_interleave2.py).  The host views the bytes as u8
    (core.frame.planes_to_host)."""
    return e.astype(jnp.uint16) | (o.astype(jnp.uint16) << 8)


def _join_phases(e: jnp.ndarray, o: jnp.ndarray, mode: str) -> jnp.ndarray:
    """Combine quantized column phases per the negotiated boundary layout."""
    if mode == "packed16":
        return pack_words_u16(e, o)
    return interleave_cols_u8(e, o)


def pack_words_u32(chans_q, out_format: VideoFormat) -> jnp.ndarray:
    """One column phase's quantized (r, g, b, a) u8 planes -> (.., H, W/2)
    uint32 PIXEL words in the output format's byte order (BGRA: b | g<<8 |
    r<<16 | a<<24).  Little-endian byte layout == this phase's pixels of the
    interleaved host frame, so the edge emit is ONE fusion with a single
    u32 output per phase instead of four per-channel u16 planes — the
    per-channel layout made XLA split the emit into two fusions with six
    f32 4K intermediates materialized between them (~190 us/frame of the
    round-3 headline's 364 us; HLO dump scripts/dump_hlo.py).  The host
    interleaves the two phase word streams (core.frame.planes_to_host)."""
    r, g, b, a = chans_q
    order = ((b, g, r, a) if out_format == VideoFormat.BGRA
             else (r, g, b, a))
    w = order[0].astype(jnp.uint32)
    w = w | (order[1].astype(jnp.uint32) << np.uint32(8))
    w = w | (order[2].astype(jnp.uint32) << np.uint32(16))
    return w | (order[3].astype(jnp.uint32) << np.uint32(24))


def pack_rgba_split(chans_e, chans_o, out_format: VideoFormat,
                    matrix_index: int, mode: str = "interleave") -> dict:
    """pack_rgba_t from column-phase planes.  Quantization happens per phase
    (identical values); for 4:2:0 outputs the 2x2 box average consumes the
    phases directly — the same float ops in the same order as
    rgb_to_chroma_downsampled's row-pairs-then-lane-pairs, so outputs are
    bit-identical — and only the Y plane interleaves (on uint8).

    mode: "interleave" (canonical u8 planes), "packed16" (u16 words with
    identical bytes, for the pipeline edge), or "split" (keep phases as
    separate per-channel planes for a split-linked consumer — FLOAT32 with
    color.quant_sim applied: the quantized values without the u8 dtype, so
    XLA fuses straight through the element boundary; u8 loads run at ~90
    GB/s on v5e while f32 chains fuse at full HBM bandwidth).  Split RGB
    layout: {"r_e","g_e","b_e","a_e","r_o",...}; split 4:2:0:
    {"y_e","y_o","u","v"} (all f32 quantized values)."""
    if mode == "split":
        # boundary storage is f32 quant_sim: bf16 quant_units (half the
        # bytes, still bit-exact) measured SLOWER end to end on v5e
        # (headline 1709 vs 2028 fps — the bf16 store's tile repack breaks
        # the producer fusion)
        from tpuvf.kernels.color import quant_sim

        fe = tuple(quant_sim(c) for c in chans_e)
        fo = tuple(quant_sim(c) for c in chans_o)
        if out_format in RGB_FORMATS:
            names = ("r", "g", "b", "a")
            out = {f"{n}_e": v for n, v in zip(names, fe)}
            out.update({f"{n}_o": v for n, v in zip(names, fo)})
            return out
        if out_format in (VideoFormat.NV12, VideoFormat.I420):
            ye, _, _ = color.rgb_to_yuv(*fe[:3], matrix_index)
            yo, _, _ = color.rgb_to_yuv(*fo[:3], matrix_index)
            half = np.float32(0.5)

            def avg_phase(x):
                return (x[..., 0::2, :] + x[..., 1::2, :]) * half

            ra = (avg_phase(fe[0]) + avg_phase(fo[0])) * half
            ga = (avg_phase(fe[1]) + avg_phase(fo[1])) * half
            ba = (avg_phase(fe[2]) + avg_phase(fo[2])) * half
            _, u, v = color.rgb_to_yuv(ra, ga, ba, matrix_index)
            return {"y_e": quant_sim(ye), "y_o": quant_sim(yo),
                    "u": quant_sim(u), "v": quant_sim(v)}
        if out_format in PACKED_YUV_FORMATS:
            # 4:2:2 split boundary (round 4): y phases carry straight
            # through; chroma = mean of the two macro-pixel phases after
            # the RGB->YUV matrix — exactly the canonical pack's
            # uf[0::2]/uf[1::2] average (the lane-strided slices become
            # direct phase reads), full height.  Layout
            # {"y_e","y_o","u","v"} like 4:2:0, chroma (H, W/2).
            ye, ue, ve = color.rgb_to_yuv(*fe[:3], matrix_index)
            yo, uo, vo = color.rgb_to_yuv(*fo[:3], matrix_index)
            half = np.float32(0.5)
            return {"y_e": quant_sim(ye), "y_o": quant_sim(yo),
                    "u": quant_sim((ue + uo) * half),
                    "v": quant_sim((ve + vo) * half)}
        raise ValueError(f"split links not supported for {out_format}")
    qe = tuple(quant(c) for c in chans_e)
    qo = tuple(quant(c) for c in chans_o)
    if out_format in RGB_FORMATS:
        if mode == "packed32":
            # ONE stacked (2, H, W/2) output: separate w_e/w_o scan
            # outputs defeated in-place lax.scan stacking — the 8K->4K
            # scan trace showed 161 us/frame of full-buffer DUS copies
            # (the quad/grid stacking rule, see pack_rgba_grid16)
            return {"w_c": jnp.stack(
                [pack_words_u32(qe, out_format),
                 pack_words_u32(qo, out_format)], axis=-3)}
        rgba = jnp.stack(
            [_join_phases(a, b, mode) for a, b in zip(qe, qo)], axis=-3)
        return {"rgba": rgba}
    if mode == "packed32":
        raise ValueError("packed32 links apply to RGB output formats only")
    de = tuple(dequant(q) for q in qe[:3])
    do = tuple(dequant(q) for q in qo[:3])
    ye, _, _ = color.rgb_to_yuv(*de, matrix_index)
    yo, _, _ = color.rgb_to_yuv(*do, matrix_index)
    if out_format in (VideoFormat.NV12, VideoFormat.I420):
        half = np.float32(0.5)

        def avg_phase(x):  # rows pairs first, matching rgb_to_chroma...
            return (x[..., 0::2, :] + x[..., 1::2, :]) * half

        ra = (avg_phase(de[0]) + avg_phase(do[0])) * half
        ga = (avg_phase(de[1]) + avg_phase(do[1])) * half
        ba = (avg_phase(de[2]) + avg_phase(do[2])) * half
        _, u, v = color.rgb_to_yuv(ra, ga, ba, matrix_index)
        y_out = _join_phases(quant(ye), quant(yo), mode)
        if mode == "packed16":
            # sink-edge form: stack u+v into ONE scan output (separate
            # planes pay non-in-place lax.scan stacking DUS copies — the
            # quad/grid stacking rule, see pack_rgba_grid16)
            return {"y": y_out,
                    "uv_s": jnp.stack([quant(u), quant(v)], axis=-3)}
        return {"y": y_out, "u": quant(u), "v": quant(v)}
    if out_format in PACKED_YUV_FORMATS:
        # 4:2:2: chroma = mean of the two pixels of each macro-pixel, i.e.
        # exactly mean(even_phase, odd_phase) after the RGB->YUV matrix
        _, ue, ve = color.rgb_to_yuv(*de, matrix_index)
        _, uo, vo = color.rgb_to_yuv(*do, matrix_index)
        half = np.float32(0.5)
        y_out = _join_phases(quant(ye), quant(yo), mode)
        if mode == "packed16":
            return {"y": y_out,
                    "uv_s": jnp.stack([quant((ue + uo) * half),
                                       quant((ve + vo) * half)], axis=-3)}
        return {
            # the 4:2:2 y plane rides full-width through pack_422 on the
            # host, so the edge packing applies to it as well
            "y": y_out,
            "u": quant((ue + uo) * half),
            "v": quant((ve + vo) * half),
        }
    raise ValueError(f"unknown output format {out_format}")


def pack_rgba(rgba_q: jnp.ndarray, out_format: VideoFormat, matrix_index: int) -> dict:
    """Quantized RGBA (..., 4, H, W) uint8 -> output planes dict (uint8).

    The reference's output stage reads the RGBA8 render target, so the input
    here must already be quantized; chroma averaging happens on dequantized
    texel values exactly like rgbaToNV12/rgbaToI420 (vfmetalshaders.m:90-168)
    and rgbaToUYVY/rgbaToYUY2 (metalconvertscale_shaders.h:202-269).
    """
    if out_format in RGB_FORMATS:
        return {"rgba": rgba_q}
    rgbaf = dequant(rgba_q)
    r, g, b = rgbaf[..., 0, :, :], rgbaf[..., 1, :, :], rgbaf[..., 2, :, :]
    return _pack_yuv_channels(r, g, b, out_format, matrix_index)


def pack_rgba_t(chans, out_format: VideoFormat, matrix_index: int) -> dict:
    """Per-channel variant: chans = (r, g, b, a) float planes NOT yet
    quantized.  Applies the RGBA8 render-target quantization per channel
    (identical values, no (4, H, W) stack) then packs."""
    rq = tuple(quant(c) for c in chans)
    if out_format in RGB_FORMATS:
        return {"rgba": jnp.stack(rq, axis=-3)}
    r, g, b = (dequant(rq[0]), dequant(rq[1]), dequant(rq[2]))
    return _pack_yuv_channels(r, g, b, out_format, matrix_index)


def _pack_yuv_channels(r, g, b, out_format, matrix_index):
    h, w = r.shape[-2], r.shape[-1]
    yf, uf, vf = color.rgb_to_yuv(r, g, b, matrix_index)
    if out_format in (VideoFormat.NV12, VideoFormat.I420):
        cw, ch = chroma_dims_420(w, h)
        u, v = color.rgb_to_chroma_downsampled(r, g, b, matrix_index, cw, ch)
        return {"y": quant(yf), "u": quant(u), "v": quant(v)}
    if out_format in PACKED_YUV_FORMATS:
        # one output macro-pixel per 2 source pixels; chroma = mean of both
        # pixels' U/V after the RGB->YUV matrix (shaders h:202-269)
        u0, u1 = uf[..., 0::2], uf[..., 1::2]
        v0, v1 = vf[..., 0::2], vf[..., 1::2]
        return {
            "y": quant(yf),
            "u": quant((u0 + u1) * 0.5),
            "v": quant((v0 + v1) * 0.5),
        }
    raise ValueError(f"unknown output format {out_format}")
