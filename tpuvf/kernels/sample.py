"""Texture sampling as separable weight-matrix matmuls (the MXU sampler).

The reference scales/converts by rasterizing a full-screen quad and sampling
input planes with a normalized-coordinate Metal sampler
(metalconvertscale_shaders.h:48-148).  The TPU-native equivalent: for each
output axis build a dense (out, in) weight matrix encoding exactly the
sampler's coordinate math — half-texel centers (s = t*size - 0.5),
clamp-to-edge addressing, bilinear or nearest filtering — and contract the
input plane with the row matrix and column matrix.  Two matmuls on the MXU
replace per-pixel gathers, which TPUs are bad at; XLA fuses surrounding
elementwise work into the same program.

Letterboxing (add-borders) becomes zero rows in the weight matrices plus a
coverage mask (_computeViewportWithAddBorders, metalconvertscalerenderer.m:
137-166: the viewport is always centered, so only the scale factors matter).
"""

from __future__ import annotations

import jax
import numpy as np
import jax.numpy as jnp

LINEAR = "linear"
NEAREST = "nearest"

# Sampling contractions must not round weights/texels to bf16 (JAX's default
# matmul precision) — bilinear weight error of ~2^-8 shows up as >1 LSB in
# 8-bit output.  HIGHEST keeps full f32 accumulation on both CPU and MXU.
MATMUL_PRECISION = jax.lax.Precision.HIGHEST


def texcoords(out_size: int, scale: float = 1.0) -> np.ndarray:
    """Normalized texcoords of output pixel centers along one axis.

    Output pixel p center in NDC maps through a centered quad of half-extent
    `scale` (metalconvertscalerenderer.m:149-166).  For scale=1 this is the
    plain (p + 0.5)/out mapping of a full-screen quad; pixels outside the
    quad get out-of-[0,1] coords (masked separately).
    """
    t = (np.arange(out_size, dtype=np.float64) + 0.5) / out_size  # in [0,1]
    if scale != 1.0:
        # quad occupies [0.5 - scale/2, 0.5 + scale/2] of the output axis
        t = (t - 0.5) / scale + 0.5
    return t


def coverage_mask(out_size: int, scale: float) -> np.ndarray:
    """Bool mask of output pixels whose centers fall inside the quad."""
    t = texcoords(out_size, scale)
    return (t >= 0.0) & (t <= 1.0)


def sample_matrix(
    t: np.ndarray,
    in_size: int,
    filter: str = LINEAR,
    mask: np.ndarray | None = None,
) -> np.ndarray:
    """Dense (len(t), in_size) sampling matrix for normalized texcoords `t`.

    linear : Metal linear sampler — s = t*in - 0.5; weights (1-f, f) on
             floor(s), floor(s)+1 with clamp-to-edge index clamping.
    nearest: Metal nearest sampler — texel floor(t*in), clamped.

    Rows where mask is False (outside the letterbox quad) are all-zero.
    """
    out_size = len(t)
    w = np.zeros((out_size, in_size), np.float32)
    rows = np.arange(out_size)
    if mask is None:
        mask = np.ones(out_size, bool)
    if filter == NEAREST:
        idx = np.clip(np.floor(t * in_size).astype(np.int64), 0, in_size - 1)
        w[rows[mask], idx[mask]] = 1.0
        return w
    if filter != LINEAR:
        raise ValueError(f"unknown filter {filter!r}")
    s = t * in_size - 0.5
    x0 = np.floor(s)
    f = (s - x0).astype(np.float32)
    i0 = np.clip(x0.astype(np.int64), 0, in_size - 1)
    i1 = np.clip(x0.astype(np.int64) + 1, 0, in_size - 1)
    np.add.at(w, (rows[mask], i0[mask]), (1.0 - f)[mask])
    np.add.at(w, (rows[mask], i1[mask]), f[mask])
    return w


def resize_matrices(
    in_w: int,
    in_h: int,
    out_w: int,
    out_h: int,
    filter: str = LINEAR,
    scale_x: float = 1.0,
    scale_y: float = 1.0,
):
    """(Wy (out_h, in_h), Wx (out_w, in_w), mask (out_h, out_w) or None)."""
    tx = texcoords(out_w, scale_x)
    ty = texcoords(out_h, scale_y)
    mx = coverage_mask(out_w, scale_x)
    my = coverage_mask(out_h, scale_y)
    wy = sample_matrix(ty, in_h, filter, my)
    wx = sample_matrix(tx, in_w, filter, mx)
    if mx.all() and my.all():
        mask = None
    else:
        mask = np.logical_and.outer(my, mx)
    return wy, wx, mask


def blockband_plan(w: np.ndarray, tile: int = 128):
    """Static output-tile -> nonzero input span decomposition of a banded
    sampling matrix, or None when tiling would not drop enough MACs.

    Bilinear/nearest sampling matrices have <= 2 nonzeros per output row,
    so a scaled (or rotated/cropped) matmul wastes most of its MACs on
    exact zeros; slicing each `tile`-output block to its nonzero input
    span keeps the MXU shapes dense while skipping the dead work.
    Dropped terms are exact f32 zeros; results agree with the dense
    product to <= 1 ulp (MXU K-tile accumulation boundaries can shift by
    the slice offset), inside the quantization parity budget.  Works for
    any row-banded structure incl. the transform's reversed (rotate-180)
    and crop-scaled matrices — only per-tile span width matters."""
    import os

    if os.environ.get("TPUVF_NO_BLOCKBAND"):
        return None  # A/B knob
    out_n, in_n = w.shape
    plan = []
    dense_macs = out_n * in_n
    macs = 0
    for o0 in range(0, out_n, tile):
        o1 = min(o0 + tile, out_n)
        nz = np.nonzero(w[o0:o1].any(axis=0))[0]
        if len(nz) == 0:
            plan.append((o0, o1, 0, 0))  # masked void tile: emit zeros
            continue
        lo, hi = int(nz.min()), int(nz.max()) + 1
        plan.append((o0, o1, lo, hi))
        macs += (o1 - o0) * (hi - lo)
    if macs > 0.6 * dense_macs or len(plan) < 2:
        return None
    return plan


def _blockband_rows(img: jnp.ndarray, wy: jnp.ndarray, plan) -> jnp.ndarray:
    """Rows contraction "oh,...hw->...ow" over a blockband_plan."""
    outs = []
    for (o0, o1, lo, hi) in plan:
        if hi == lo:
            outs.append(jnp.zeros(
                img.shape[:-2] + (o1 - o0, img.shape[-1]), jnp.float32))
            continue
        seg = jax.lax.slice_in_dim(img, lo, hi, axis=-2)
        blk = jax.lax.slice(wy, (o0, lo), (o1, hi))
        outs.append(jnp.einsum(
            "oh,...hw->...ow", blk, seg,
            preferred_element_type=jnp.float32, precision=MATMUL_PRECISION,
        ))
    return jnp.concatenate(outs, axis=-2)


def _blockband_cols(img: jnp.ndarray, wx: jnp.ndarray, plan) -> jnp.ndarray:
    """Cols contraction "...ow,pw->...op" over a blockband_plan."""
    outs = []
    for (o0, o1, lo, hi) in plan:
        if hi == lo:
            outs.append(jnp.zeros(
                img.shape[:-1] + (o1 - o0,), jnp.float32))
            continue
        seg = jax.lax.slice_in_dim(img, lo, hi, axis=-1)
        blk = jax.lax.slice(wx, (o0, lo), (o1, hi))
        outs.append(jnp.einsum(
            "...ow,pw->...op", seg, blk,
            preferred_element_type=jnp.float32, precision=MATMUL_PRECISION,
        ))
    return jnp.concatenate(outs, axis=-1)


def apply_separable(img: jnp.ndarray, wy: np.ndarray, wx: np.ndarray,
                    wy_plan=None, wx_plan=None) -> jnp.ndarray:
    """Contract (..., H, W) float32 with row/col sampling matrices on the MXU.

    `wy_plan`/`wx_plan` are optional blockband_plan decompositions of the
    matrices (computed at plan time from the static numpy weights): each
    output tile then contracts only its nonzero input span.  Plans are
    dropped on sharded operands — the sharded weight slice is traced, so
    the static spans no longer line up.

    Under spatial row sharding (parallel.spctx) a row-sharded operand is
    first all-gathered (the contraction over H/W is frame-global), and the
    OUTPUT rows stay sharded: wy's rows are sliced to this shard's output
    band, so each shard computes 1/n of the matmul.  A transposed operand
    (the transform's anti-diagonal path) carries the sharded axis in the
    LAST position — detected by the wx contraction size and gathered along
    that axis instead.  Fully replicated operands (compositor pad branches)
    pass through untouched."""
    if wy_plan is None and isinstance(wy, np.ndarray):
        wy_plan = blockband_plan(wy)
    if wx_plan is None and isinstance(wx, np.ndarray):
        wx_plan = blockband_plan(wx)
    wy = jnp.asarray(wy, jnp.float32)
    wx = jnp.asarray(wx, jnp.float32)
    from tpuvf.parallel import spctx

    if spctx.active_axis() is not None:
        n = spctx.axis_size()
        sharded = False
        if img.shape[-2] != wy.shape[1]:
            if img.shape[-2] * n != wy.shape[1]:
                raise ValueError(
                    f"row-sharded operand rows {img.shape[-2]} x {n} != "
                    f"wy contraction size {wy.shape[1]}")
            img = spctx.all_rows(img, axis=-2)
            sharded = True
        if img.shape[-1] != wx.shape[1]:
            if img.shape[-1] * n != wx.shape[1]:
                raise ValueError(
                    f"row-sharded operand cols {img.shape[-1]} x {n} != "
                    f"wx contraction size {wx.shape[1]}")
            img = spctx.all_rows(img, axis=-1)
            sharded = True
        if sharded:
            if wy.shape[0] % n:
                raise ValueError(
                    f"output rows {wy.shape[0]} not divisible by sp={n}")
            wy = spctx.shard_rows(wy, wy.shape[0] // n)
            wy_plan = wx_plan = None  # shard slice offsets are traced
    # (..., H, W) -> (..., oH, W) -> (..., oH, oW)
    if wy_plan is not None:
        tmp = _blockband_rows(img, wy, wy_plan)
    else:
        tmp = jnp.einsum(
            "oh,...hw->...ow", wy, img,
            preferred_element_type=jnp.float32, precision=MATMUL_PRECISION,
        )
    if wx_plan is not None:
        return _blockband_cols(tmp, wx, wx_plan)
    return jnp.einsum(
        "...ow,pw->...op", tmp, wx,
        preferred_element_type=jnp.float32, precision=MATMUL_PRECISION,
    )


def letterbox_scales(in_w: int, in_h: int, out_w: int, out_h: int):
    """Centered aspect-fit quad scales (metalconvertscalerenderer.m:148-160)."""
    src_aspect = in_w / in_h
    dst_aspect = out_w / out_h
    if src_aspect > dst_aspect:
        return 1.0, dst_aspect / src_aspect  # pillarbox top/bottom bars
    return src_aspect / dst_aspect, 1.0  # letterbox left/right bars


class WeightBuffers:
    """Collects large trace-time arrays (sampling matrices, masks, canvases)
    that must be fed to the jitted program as *arguments* instead of being
    baked into the HLO as constants.

    Closure constants bloat the executable (a 4K compositor carries tens of
    MB of weight matrices) and break the remote-compile path; registered
    buffers ride inside the per-element params dict instead, device_put once
    by the runtime and reused every frame.
    """

    def __init__(self, prefix: str = "w"):
        self.prefix = prefix
        self.buffers: dict = {}
        self._n = 0

    def add(self, arr, name: str = ""):
        key = f"__buf/{self.prefix}/{name}{self._n}"
        self._n += 1
        self.buffers[key] = np.asarray(arr)

        def fetch(params):
            return params[key]

        return fetch


def upsample_chroma_to(
    c: jnp.ndarray,
    out_w: int,
    out_h: int,
    filter: str = LINEAR,
    scale_x: float = 1.0,
    scale_y: float = 1.0,
) -> jnp.ndarray:
    """Sample a (sub-resolution) chroma plane at the output grid's texcoords.

    The reference samples half-res chroma planes with the *same* normalized
    texcoord as luma (convertScaleFragmentNV12, metalconvertscale_shaders.h:
    91-105) — so the weight matrices are simply built against the chroma
    plane's own dimensions.
    """
    ch, cw = c.shape[-2], c.shape[-1]
    wy = sample_matrix(texcoords(out_h, scale_y), ch, filter)
    wx = sample_matrix(texcoords(out_w, scale_x), cw, filter)
    return apply_separable(c, wy, wx)
