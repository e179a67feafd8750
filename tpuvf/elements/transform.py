"""vftransform — flip / rotate (8 methods) / crop.

Rebuild of vfmetaltransform (/root/reference/src/transform/):
- formats BGRA, RGBA, NV12, I420
- method enum {none, clockwise, rotate-180, counterclockwise,
  horizontal-flip, vertical-flip, upper-left-diagonal, upper-right-diagonal}
  (gstvfmetaltransform.m:79-100) and crop-top/bottom/left/right pixels
- no transform_caps override: output caps == input caps, rotation resamples
  into a same-sized target (SURVEY §2.5)
- passthrough iff method==none and all crops 0 (m:113-127)

The UV transform is tc' = M*(tc-0.5)+0.5+offset where M folds the crop scale
*before* the rotation (metaltransformrenderer.m:265-293).  Every method's M
is diagonal or anti-diagonal, so sampling stays separable: diagonal methods
reuse the row/column weight-matrix sampler directly; anti-diagonal methods
(90° rotations, transposes) transpose the input plane first.  Out-of-[0,1]
texcoords produce opaque black (metaltransform_shaders.h:67-111).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from tpuvf.core.element import Element
from tpuvf.core.formats import CORE_FORMATS, RGB_FORMATS
from tpuvf.core.properties import PropertyDescriptor
from tpuvf.core.registry import register
from tpuvf.core.spec import FrameSpec
from tpuvf.kernels import color as kcolor, convert, sample
from tpuvf.kernels.color import dequant, quant
from tpuvf.kernels.sample import LINEAR

METHODS = (
    ("none", 0),
    ("clockwise", 1),
    ("rotate-180", 2),
    ("counterclockwise", 3),
    ("horizontal-flip", 4),
    ("vertical-flip", 5),
    ("upper-left-diagonal", 6),
    ("upper-right-diagonal", 7),
)

# Column-major [m00, m10, m01, m11] from build_uv_transform
# (metaltransformrenderer.m:44-104); here stored row-major 2x2.
_UV_MATS = {
    0: np.array([[1, 0], [0, 1]], np.float64),
    1: np.array([[0, 1], [-1, 0]], np.float64),   # 90R: srcU=f(v), srcV=f(u)
    2: np.array([[-1, 0], [0, -1]], np.float64),  # 180
    3: np.array([[0, -1], [1, 0]], np.float64),   # 90L
    4: np.array([[-1, 0], [0, 1]], np.float64),   # horizontal flip
    5: np.array([[1, 0], [0, -1]], np.float64),   # vertical flip
    6: np.array([[0, 1], [1, 0]], np.float64),    # transpose
    7: np.array([[0, -1], [-1, 0]], np.float64),  # anti-transpose
}


def uv_transform_params(method, crop_l, crop_r, crop_t, crop_b, w, h):
    """Combined 2x2 matrix (row-major) + offset, crop folded before rotation
    (metaltransformrenderer.m:265-293)."""
    cl, cr = crop_l / w, crop_r / w
    ct, cb = crop_t / h, crop_b / h
    scale = np.array([1.0 - cl - cr, 1.0 - ct - cb])
    coff = np.array([(cl - cr) * 0.5, (ct - cb) * 0.5])
    m = _UV_MATS[method]
    combined = m * scale[None, :]  # columns scaled: M @ diag(scale)
    offset = m @ coff
    return combined, offset


@register
class Transform(Element):
    ELEMENT_NAME = "vftransform"
    ALIASES = ("vfmetaltransform", "transform")
    KLASS = "Filter/Effect/Video"
    DESCRIPTION = "Rotates, flips and crops video frames"
    IN_FORMATS = CORE_FORMATS
    OUT_FORMATS = CORE_FORMATS
    PROPERTIES = (
        PropertyDescriptor("method", "enum", 0, "Transform method",
                           enum_values=METHODS),
        PropertyDescriptor("crop-top", "int", 0, "Pixels to crop from top",
                           0, 2**31 - 1),
        PropertyDescriptor("crop-bottom", "int", 0, "Pixels to crop from bottom",
                           0, 2**31 - 1),
        PropertyDescriptor("crop-left", "int", 0, "Pixels to crop from left",
                           0, 2**31 - 1),
        PropertyDescriptor("crop-right", "int", 0, "Pixels to crop from right",
                           0, 2**31 - 1),
    )

    def is_passthrough(self, in_spec, out_spec):
        return (
            self.props.get("method") == 0
            and self.props.get("crop-top") == 0
            and self.props.get("crop-bottom") == 0
            and self.props.get("crop-left") == 0
            and self.props.get("crop-right") == 0
        )

    def sp_row_shardable(self, in_spec, out_spec):
        """Every path handles row-sharded planes: flips/rotations that
        permute GLOBAL rows gather + re-slice (spctx.all_rows in
        apply_fast), the dense UV samplers gather their frame-global
        contraction operand and keep output rows sharded
        (sample.apply_separable), the crop-void mask slices per shard,
        and the 4:2:0 output pack is row-pair local."""
        return True

    def _fast_layout_op(self, method: int, w: int, h: int):
        """Pure layout equivalents (flip/transpose) when the sampled
        texcoords land exactly on the pixel grid: flips always do; 90-degree
        rotations/diagonals do when the frame is square.  Returns a function
        over (..., C, H, W) arrays or None."""
        if method in (4,):  # horizontal flip
            return lambda a: jnp.flip(a, axis=-1)
        if method in (5,):  # vertical flip
            return lambda a: jnp.flip(a, axis=-2)
        if method == 2:  # 180
            return lambda a: jnp.flip(jnp.flip(a, axis=-1), axis=-2)
        if w != h:
            return None
        if method == 1:  # 90 clockwise: out(r,c) = in(N-1-c, r)
            return lambda a: jnp.flip(jnp.swapaxes(a, -1, -2), axis=-1)
        if method == 3:  # 90 counter-clockwise
            return lambda a: jnp.flip(jnp.swapaxes(a, -1, -2), axis=-2)
        if method == 6:  # transpose
            return lambda a: jnp.swapaxes(a, -1, -2)
        if method == 7:  # anti-transpose
            return lambda a: jnp.flip(
                jnp.flip(jnp.swapaxes(a, -1, -2), axis=-1), axis=-2)
        return None

    def make_process(self, in_spec: FrameSpec, out_spec: FrameSpec, static):
        cfg = dict(static)
        method = cfg["method"]
        w, h = in_spec.width, in_spec.height

        no_crop = all(
            cfg[k] == 0
            for k in ("crop-left", "crop-right", "crop-top", "crop-bottom")
        )
        fast = self._fast_layout_op(method, w, h) if no_crop else None
        if fast is not None:
            from tpuvf.kernels.sample import WeightBuffers

            bufs = WeightBuffers(self.name)
            sampler = convert.plan_rgba_sampler(
                in_spec, w, h, bufs, matrix_index=in_spec.matrix_index)
            self._buffers = bufs.buffers
            matrix_out = out_spec.matrix_index
            out_fmt = out_spec.format
            row_global = method != 4  # every fast op but h-flip moves rows

            def apply_fast(rgba):
                from tpuvf.parallel import spctx

                if spctx.active_axis() is None or not row_global:
                    return fast(rgba)
                # row-sharded: the op permutes GLOBAL rows (v-flip, 180,
                # rotations) — gather rows, apply, keep this shard's band
                rows_local = rgba.shape[-2]
                return spctx.shard_rows(
                    fast(spctx.all_rows(rgba)), rows_local)

            def process(planes, state, params):
                rgba = apply_fast(sampler(planes, params))
                q = quant(rgba)
                return convert.pack_rgba(q, out_fmt, matrix_out), state

            return process
        mat, off = uv_transform_params(
            method, cfg["crop-left"], cfg["crop-right"],
            cfg["crop-top"], cfg["crop-bottom"], w, h,
        )
        anti = mat[0, 0] == 0 and (mat[0, 1] != 0 or mat[1, 0] != 0)
        # output-grid texcoords
        u = (np.arange(w, dtype=np.float64) + 0.5) / w
        v = (np.arange(h, dtype=np.float64) + 0.5) / h

        if not anti:
            src_u = mat[0, 0] * (u - 0.5) + 0.5 + off[0]  # per output column
            src_v = mat[1, 1] * (v - 0.5) + 0.5 + off[1]  # per output row
        else:
            src_u = mat[0, 1] * (v - 0.5) + 0.5 + off[0]  # per output row
            src_v = mat[1, 0] * (u - 0.5) + 0.5 + off[1]  # per output column

        # fragment black-out condition: transformed texcoord outside [0,1]
        in_u = (src_u >= 0.0) & (src_u <= 1.0)
        in_v = (src_v >= 0.0) & (src_v <= 1.0)
        if not anti:
            mask = np.logical_and.outer(in_v, in_u)  # (h, w)
        else:
            mask = np.logical_and.outer(in_u, in_v)  # rows=src_u(v-index)
        matrix_in = in_spec.matrix_index
        matrix_out = out_spec.matrix_index
        fmt = in_spec.format

        from tpuvf.kernels.sample import WeightBuffers

        bufs = WeightBuffers(self.name)
        fetch_mask = None if mask.all() else bufs.add(mask, "mask")

        def build_plane_sampler(pw, ph):
            """Weight matrices to sample one input plane of size (ph, pw)."""
            # rotate/crop matrices are 2-tap banded, so each 128-output
            # tile touches a narrow input span: precompute blockband
            # plans (sample.blockband_plan) and skip the dead MACs —
            # same-size rotates drop ~80% of the matmul work
            if not anti:
                wx_np = sample.sample_matrix(src_u, pw, LINEAR)
                wy_np = sample.sample_matrix(src_v, ph, LINEAR)
                fwx = bufs.add(wx_np, "wx")
                fwy = bufs.add(wy_np, "wy")
                wx_plan = sample.blockband_plan(wx_np)
                wy_plan = sample.blockband_plan(wy_np)

                def run(p, params):
                    return sample.apply_separable(
                        p, fwy(params), fwx(params), wy_plan, wx_plan)
            else:
                # out(r,c) = in(y=src_v(c)*ph, x=src_u(r)*pw)
                wr_np = sample.sample_matrix(src_u, pw, LINEAR)
                wc_np = sample.sample_matrix(src_v, ph, LINEAR)
                fwr = bufs.add(wr_np, "wr")
                fwc = bufs.add(wc_np, "wc")
                wr_plan = sample.blockband_plan(wr_np)
                wc_plan = sample.blockband_plan(wc_np)

                def run(p, params):
                    pt = jnp.swapaxes(p, -1, -2)  # (pw, ph)
                    return sample.apply_separable(
                        pt, fwr(params), fwc(params), wr_plan, wc_plan)
            return run

        if fmt in RGB_FORMATS:
            sample_rgba_plane = build_plane_sampler(w, h)

            def to_rgba(planes, params):
                return sample_rgba_plane(dequant(planes["rgba"]), params)
        else:
            ph = (h + 1) // 2
            pw = (w + 1) // 2
            sample_y = build_plane_sampler(w, h)
            sample_c = build_plane_sampler(pw, ph)

            def to_rgba(planes, params):
                y = sample_y(dequant(planes["y"]), params)
                uu = sample_c(dequant(planes["u"]), params)
                vv = sample_c(dequant(planes["v"]), params)
                r, g, b = kcolor.yuv_to_rgb(y, uu, vv, matrix_in)
                a = jnp.ones_like(r)
                return jnp.stack([r, g, b, a], axis=-3)

        self._buffers = bufs.buffers
        black = np.array([0, 0, 0, 1], np.float32).reshape(4, 1, 1)

        def process(planes, state, params):
            from tpuvf.parallel import spctx

            rgba = to_rgba(planes, params)
            if fetch_mask is not None:
                # full-height void mask sliced to this shard's rows under
                # spatial sharding (no-op otherwise)
                m = spctx.shard_rows(fetch_mask(params), rgba.shape[-2])
                rgba = jnp.where(m, rgba, jnp.asarray(black))
            q = quant(rgba)
            return convert.pack_rgba(q, out_spec.format, matrix_out), state

        return process
