"""vfcompositor — N-input mixed-format alpha/z-order compositor.

Rebuild of vfmetalcompositor (/root/reference/src/compositor/):

- request pads ``sink_%u`` with props xpos/ypos (int, full range),
  width/height (-1 = input size; 0 unscaled too when zero-size-is-unscaled),
  alpha [0,1]=1, operator {source, over, add}=over, sizing-policy {none,
  keep-aspect-ratio}, zorder (pads composited in zorder order)
- element props background {checker, black, white, transparent},
  zero-size-is-unscaled, ignore-inactive-pads
- geometry: pad_get_output_size (gstvfmetalcompositor.m:202-325) — DAR
  correction per sizing-policy, keep-aspect-ratio centering offsets
- caps: output = bounding box of (pad rect + max(pos,0)) over pads,
  max input fps (default 25/1), PAR 1/1, BGRA preferred
  (update_caps m:394-458, fixate m:460-540)
- per-pad skip rules: alpha==0, zero clamped rect, obscured by a
  higher-zorder opaque pad (compositorpad.m:179-246); fully obscured
  background becomes transparent (m:360-385)
- blending (metalcomprenderer.m): fragments multiply uniform alpha then
  premultiply rgb; fixed-function blend SOURCE=(one,zero),
  OVER=(one,one-minus-src-alpha), ADD=(one,one); checker background is
  8x8-px 0.75/0.5 gray

TPU shape: each pad's scale-into-rect is a pair of masked sampling matrices
over the output grid (MXU matmuls); blending is an elementwise fold over
pads in zorder order with a quantize after every draw (the RGBA8 render
target).  Pad topology/geometry are static per compiled variant; the
executable cache absorbs position changes.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
import jax.numpy as jnp

from tpuvf.core.element import Element
from tpuvf.core.formats import CORE_FORMATS, RGB_FORMATS, VideoFormat
from tpuvf.core.properties import PropertyBag, PropertyDescriptor
from tpuvf.core.registry import register
from tpuvf.core.spec import CapsFilter, Fraction, FrameSpec
from tpuvf.kernels import color as kcolor, convert, sample
from tpuvf.kernels.color import dequant, quant

BG_CHECKER, BG_BLACK, BG_WHITE, BG_TRANSPARENT = 0, 1, 2, 3
OP_SOURCE, OP_OVER, OP_ADD = 0, 1, 2
SIZING_NONE, SIZING_KEEP_ASPECT = 0, 1

PAD_PROPERTIES = (
    PropertyDescriptor("xpos", "int", 0, "X position",
                       -(2**31), 2**31 - 1, controllable=True),
    PropertyDescriptor("ypos", "int", 0, "Y position",
                       -(2**31), 2**31 - 1, controllable=True),
    PropertyDescriptor("width", "int", -1, "Width (-1 = input width)",
                       -1, 2**31 - 1, controllable=True),
    PropertyDescriptor("height", "int", -1, "Height (-1 = input height)",
                       -1, 2**31 - 1, controllable=True),
    PropertyDescriptor("alpha", "float", 1.0, "Alpha", 0.0, 1.0,
                       controllable=True),
    PropertyDescriptor("operator", "enum", OP_OVER, "Blending operator",
                       enum_values=(("source", 0), ("over", 1), ("add", 2)),
                       controllable=True),
    PropertyDescriptor("sizing-policy", "enum", SIZING_NONE, "Sizing policy",
                       enum_values=(("none", 0), ("keep-aspect-ratio", 1))),
    PropertyDescriptor("zorder", "uint", 0, "Z order", 0, 2**32 - 1,
                       controllable=True),
)


def _center_rect(src_w, src_h, dst_w, dst_h):
    """gst_video_center_rect with scaling=TRUE: aspect-fit src into dst,
    centered; returns (x, y, w, h)."""
    src_ratio = src_w / src_h
    dst_ratio = dst_w / dst_h
    if src_ratio > dst_ratio:
        w = dst_w
        h = int(round(dst_w / src_ratio))
    elif src_ratio < dst_ratio:
        h = dst_h
        w = int(round(dst_h * src_ratio))
    else:
        w, h = dst_w, dst_h
    return (dst_w - w) // 2, (dst_h - h) // 2, w, h


class CompositorPadConfig:
    """Resolved geometry of one pad for a given output spec."""

    def __init__(self, name, spec, bag):
        self.name = name
        self.spec = spec
        self.bag = bag

    def output_size(self, comp, out_par: Fraction):
        """pad_get_output_size (m:202-325): (width, height, x_off, y_off)."""
        bag, spec = self.bag, self.spec
        zero_unscaled = comp.props.get("zero-size-is-unscaled")
        pw, ph = bag.get("width"), bag.get("height")
        if zero_unscaled:
            pad_w = spec.width if pw <= 0 else pw
            pad_h = spec.height if ph <= 0 else ph
        else:
            pad_w = spec.width if pw < 0 else pw
            pad_h = spec.height if ph < 0 else ph
        if pad_w == 0 or pad_h == 0:
            return 0, 0, 0, 0
        # display ratio: dar = (w * par_in) / (h * par_out)
        dar = Fraction(pad_w, pad_h) * spec.par / out_par
        x_off = y_off = 0
        if bag.get("sizing-policy") == SIZING_NONE:
            if pad_h % dar.num == 0:
                pad_w = pad_h * dar.num // dar.den
            elif pad_w % dar.den == 0:
                pad_h = pad_w * dar.den // dar.num
            else:
                pad_w = pad_h * dar.num // dar.den
        else:  # keep-aspect-ratio
            from_dar = Fraction(spec.width, spec.height) * spec.par
            to_dar = Fraction(pad_w, pad_h) * out_par
            if from_dar != to_dar:
                num_den = from_dar / out_par  # from_dar * par_d/par_n
                src_h = pad_w * num_den.den // num_den.num
                if src_h == 0:
                    return 0, 0, 0, 0
                x_off, y_off, pad_w, pad_h = _center_rect(
                    pad_w, src_h, pad_w, pad_h
                )
        return pad_w, pad_h, x_off, y_off


@register
class Compositor(Element):
    ELEMENT_NAME = "vfcompositor"
    ALIASES = ("vfmetalcompositor", "compositor", "comp")
    KLASS = "Filter/Editor/Video/Compositor"
    DESCRIPTION = "Composites multiple video streams on the MXU"
    IN_FORMATS = CORE_FORMATS
    OUT_FORMATS = CORE_FORMATS
    PROPERTIES = (
        PropertyDescriptor("background", "enum", BG_CHECKER, "Background type",
                           enum_values=(("checker", 0), ("black", 1),
                                        ("white", 2), ("transparent", 3))),
        PropertyDescriptor("zero-size-is-unscaled", "bool", True,
                           "0 pad width/height means unscaled"),
        PropertyDescriptor("ignore-inactive-pads", "bool", False,
                           "Ignore pads without buffers"),
    )

    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.pads: Dict[str, PropertyBag] = {}
        self._pad_insert_order: Dict[str, int] = {}
        self._last_pad_specs: Dict[str, FrameSpec] = {}

    # -- GstChildProxy analog: request pads ------------------------------

    def get_pad(self, name: str) -> PropertyBag:
        if name not in self.pads:
            self.pads[name] = PropertyBag(PAD_PROPERTIES)
            self._pad_insert_order[name] = len(self._pad_insert_order)
        return self.pads[name]

    def _sorted_pads(self, pad_specs):
        """Pads in composite order: zorder, then pad index (the element keeps
        sinkpads zorder-sorted, m:850-879; sink_%u index breaks ties)."""

        def pad_index(name):
            digits = "".join(ch for ch in name if ch.isdigit())
            return int(digits) if digits else self._pad_insert_order.get(name, 0)

        items = []
        for name, spec in pad_specs.items():
            bag = self.get_pad(name)
            items.append((bag.get("zorder"), pad_index(name), name, spec, bag))
        items.sort(key=lambda t: (t[0], t[1]))
        return [CompositorPadConfig(n, s, b) for _, _, n, s, b in items]

    # -- negotiation (update_caps m:394-458 + fixate m:460-540) ----------

    def aggregate_spec(
        self, pad_specs: Dict[str, FrameSpec], out_filter: Optional[CapsFilter]
    ) -> FrameSpec:
        if not pad_specs:
            raise ValueError("compositor has no sink pads")
        for spec in pad_specs.values():
            if spec.format not in self.IN_FORMATS:
                raise ValueError(f"unsupported input format {spec.format}")
        out_par = ((out_filter.fixate("par", Fraction(1, 1)) if out_filter
                    else None) or Fraction(1, 1))
        best_w = best_h = -1
        best_fps = None
        for pad in self._sorted_pads(pad_specs):
            w, h, x_off, y_off = pad.output_size(self, out_par)
            if w == 0 or h == 0:
                continue
            this_w = w + max(pad.bag.get("xpos") + 2 * x_off, 0)
            this_h = h + max(pad.bag.get("ypos") + 2 * y_off, 0)
            best_w = max(best_w, this_w)
            best_h = max(best_h, this_h)
            fps = pad.spec.fps
            if best_fps is None or float(fps) > float(best_fps):
                best_fps = fps
        if best_w <= 0 or best_h <= 0:
            raise ValueError("compositor could not determine output size")
        if best_fps is None or float(best_fps) == 0.0:
            best_fps = Fraction(25, 1)
        # fixate against the offered constraints: format prefers BGRA
        # (m:533), dims/fps prefer the bounding-box/max-fps picks
        filt = out_filter or CapsFilter()
        fmt = filt.fixate("format", VideoFormat.BGRA) or VideoFormat.BGRA
        w = filt.fixate("width", best_w) or best_w
        h = filt.fixate("height", best_h) or best_h
        fps = filt.fixate("fps", best_fps) or best_fps
        return FrameSpec(format=fmt, width=w, height=h, fps=fps, par=out_par)

    # -- static config covers the STRUCTURAL pad props only ---------------
    # xpos/ypos/alpha/operator are GST_PARAM_CONTROLLABLE in the reference
    # (gstvfmetalcompositorpad.m:282-315): they are traced per frame, so
    # animating them triggers ZERO rebuilds.  width/height/sizing-policy
    # change rect shapes (compiled sizes) and zorder changes draw order —
    # those stay static and rebuild.

    _TRACED_PAD_PROPS = ("xpos", "ypos", "alpha", "operator")

    def static_config(self, in_spec, out_spec):
        base = super().static_config(in_spec, out_spec)
        pads = tuple(
            (name, tuple(sorted(
                (k, v) for k, v in bag.snapshot().items()
                if k not in self._TRACED_PAD_PROPS
            )))
            for name, bag in sorted(self.pads.items())
        )
        return base + (("pads", pads),)

    # -- pad property schedules ("sink_0::xpos", GstController-on-pad
    # analog: the reference marks every pad prop GST_PARAM_CONTROLLABLE,
    # gstvfmetalcompositorpad.m:282-315).  Element.control/sync_frame
    # route through these hooks, so pad ramps ride the same per-frame
    # snapshot machinery (incl. run_batched's scanned schedule stacks).

    def _ctl_has(self, name):
        if "::" in name:
            pad, prop = name.split("::", 1)
            return self.get_pad(pad).has(prop)
        return super()._ctl_has(name)

    def _ctl_get(self, name):
        if "::" in name:
            pad, prop = name.split("::", 1)
            return self.get_pad(pad).get(prop)
        return super()._ctl_get(name)

    def _ctl_set(self, name, value):
        if "::" in name:
            pad, prop = name.split("::", 1)
            self.get_pad(pad).set(prop, value)
            return
        super()._ctl_set(name, value)

    def traced_params(self):
        out = super().traced_params()
        for name, bag in self.pads.items():
            out[f"pad.{name}.xpos"] = np.int32(bag.get("xpos"))
            out[f"pad.{name}.ypos"] = np.int32(bag.get("ypos"))
            out[f"pad.{name}.alpha"] = np.float32(bag.get("alpha"))
            out[f"pad.{name}.operator"] = np.int32(bag.get("operator"))
        # folded overlays' controllable alpha rides this element's params
        for ov in getattr(self, "_fold_elems", ()):
            out[f"fold.{ov.name}.alpha"] = np.float32(ov.props.get("alpha"))
        return out

    def init_state(self, in_spec, out_spec):
        return ()

    # -- navigation (src-pad events hit-tested per pad, m:705-787) --------

    def navigation_event(self, x: float, y: float, pad_specs=None,
                         out_par: Fraction = Fraction(1, 1)):
        """Map an output-space pointer position to (pad_name, pad_x, pad_y)
        for the topmost pad whose rect contains it, rescaled into that pad's
        input coordinates; None when no pad is hit."""
        pad_specs = pad_specs or self._last_pad_specs
        if not pad_specs:
            return None
        for pad in reversed(self._sorted_pads(pad_specs)):  # top-down
            w, h, x_off, y_off = pad.output_size(self, out_par)
            if w == 0 or h == 0:
                continue
            px = pad.bag.get("xpos") + x_off
            py = pad.bag.get("ypos") + y_off
            if px <= x < px + w and py <= y < py + h:
                ix = (x - px) * pad.spec.width / w
                iy = (y - py) * pad.spec.height / h
                return pad.name, ix, iy
        return None

    # -- compilation ------------------------------------------------------

    def _draw_geometry(self, pad_specs, out_spec):
        """(pad, spec, w, h, x_off, y_off) per drawn pad, zorder order."""
        out_par = out_spec.par
        out = []
        for pad in self._sorted_pads(pad_specs):
            w, h, x_off, y_off = pad.output_size(self, out_par)
            if w == 0 or h == 0:
                continue
            out.append((pad, pad.spec, w, h, x_off, y_off))
        return out

    def aggregate_split_ok(self, pad_specs: Dict[str, FrameSpec],
                           out_spec: FrameSpec) -> bool:
        """Column-phase output is available when every drawn pad renders at
        its native size (identity sampling keeps columns phase-separable)
        and the output format has a split layout.

        MEASURED (round 3b, scripts/bench_comp_scaled_ab*.py): letting
        SCALED pads join via the phase-matrix sampler is a 4K loss in
        BOTH split bodies — split-fast 556-678 / split-cells 472-524 vs
        interleaved 873-1043 fps (two 1080p/720p pads upscaled to half-
        canvas).  The per-pad phase sampling (double row-kernel calls +
        two phase matmuls) costs more than the canonical single full-
        width sampling, and cells additionally materialize the pad-sized
        phase planes when slicing.  Scaled pads therefore keep the
        interleaved renderer."""
        from tpuvf.core.formats import PACKED_YUV_FORMATS

        if out_spec.width % 2 or out_spec.format in PACKED_YUV_FORMATS:
            return False
        draws = self._draw_geometry(pad_specs, out_spec)
        for pad, spec, w, h, _, _ in draws:
            if (w, h) != (spec.width, spec.height):
                return False
            if spec.format in RGB_FORMATS:
                if spec.width % 2:
                    return False
            elif not convert.can_split_420(spec, w, h, 1.0, 1.0, None):
                return False
        return True

    def split_output_ok(self, in_spec, out_spec):  # pragma: no cover
        """Linear-element API stub: the pipeline consults
        aggregate_split_ok with pad specs instead."""
        return False


    def sp_row_shardable(self, in_spec, out_spec):
        """The masked sp render body handles any BAKED geometry on the
        row-sharded canvas: draws become pad-to-canvas + shard_rows +
        global-row/col rect masks.  Pad INPUT branches enter replicated
        (the pipeline's sp plan), so pad heights need no divisibility."""
        return True

    def edge_packed16_ok(self, in_spec=None, out_spec=None) -> bool:
        """The canvas is u8 phases; a u16-word edge would be a pure
        u8->u16 relayout (the slow path) — keep the canonical edge."""
        return False

    def make_aggregate(self, pad_specs: Dict[str, FrameSpec],
                       out_spec: FrameSpec, out_mode: str = "full",
                       split_pads: frozenset = frozenset(),
                       fold_overlays: tuple = ()):
        """Compile the aggregate.  Pad GEOMETRY is traced: xpos/ypos/alpha/
        operator enter as per-frame params (GST_PARAM_CONTROLLABLE,
        gstvfmetalcompositorpad.m:282-315), placement uses dynamic slices at
        traced offsets, and the reference's per-frame CPU prepare decisions
        (alpha-0 skip, clamped-empty skip, obscured-by-opaque skip,
        background-obscured transparency, prepare_frame_start m:159-246 +
        _should_draw_background m:360-385) become traced scalar flags — so
        animating any controllable pad property recompiles NOTHING.

        Per-pad buffer availability arrives in params["__pad_meta__"] from
        the runtime clock: 'active' (stream started) and 'eos' (past the
        last buffer — frozen last frame unless ignore-inactive-pads)."""
        self._last_pad_specs = dict(pad_specs)
        out_w, out_h = out_spec.width, out_spec.height
        out_par = out_spec.par
        pads = self._sorted_pads(pad_specs)
        ignore_inactive = bool(self.props.get("ignore-inactive-pads"))

        # background canvas (quantized, the cleared target)
        bg_mode = self.props.get("background")
        if bg_mode == BG_CHECKER:
            ys, xs = np.mgrid[0:out_h, 0:out_w]
            checker = ((xs // 8) + (ys // 8)) % 2
            gray = np.where(checker == 1, np.float32(0.75), np.float32(0.5))
            bg = np.stack([gray, gray, gray, np.ones_like(gray)], axis=0)
        elif bg_mode == BG_BLACK:
            bg = np.zeros((4, out_h, out_w), np.float32)
            bg[3] = 1.0
        elif bg_mode == BG_WHITE:
            bg = np.ones((4, out_h, out_w), np.float32)
        else:
            bg = np.zeros((4, out_h, out_w), np.float32)
        bg_q = np.round(np.clip(bg, 0, 1) * 255).astype(np.uint8)

        from tpuvf.kernels.sample import WeightBuffers

        split_out = out_mode != "full"
        if split_out and not self.aggregate_split_ok(pad_specs, out_spec):
            raise NotImplementedError(
                "split/packed16 output requires full-identity pad draws")

        bufs = WeightBuffers(self.name)
        fetch_bg = bufs.add(bg_q, "bg")
        if split_out:
            fetch_bg_e = bufs.add(
                np.ascontiguousarray(bg_q[..., 0::2]), "bg_e")
            fetch_bg_o = bufs.add(
                np.ascontiguousarray(bg_q[..., 1::2]), "bg_o")

        # Per-draw plan.  Rect SIZE (w, h) and centering offsets are static
        # (width/height/sizing-policy props); each draw resamples the input
        # to the PAD size (identity/2x fast paths apply; dense matmuls are
        # pad-sized, not canvas-sized).  The window is (min(h,out_h),
        # min(w,out_w)) placed by dynamic slices at the traced position.
        compiled_draws = []
        for pad in pads:
            w, h, x_off, y_off = pad.output_size(self, out_par)
            if w == 0 or h == 0:
                continue  # zero-size rect: statically skipped
            spec = pad.spec
            if spec.format in RGB_FORMATS:
                samplers = {"rgba": convert.plan_plane_sampler(
                    spec.width, spec.height, w, h, sample.LINEAR, 1.0, 1.0,
                    bufs)}
            else:
                cw, ch2 = (spec.width + 1) // 2, (spec.height + 1) // 2
                samplers = {
                    "y": convert.plan_plane_sampler(
                        spec.width, spec.height, w, h, sample.LINEAR, 1.0,
                        1.0, bufs),
                    "c": convert.plan_plane_sampler(
                        cw, ch2, w, h, sample.LINEAR, 1.0, 1.0, bufs),
                }
            split_reader = None
            if split_out and spec.format not in RGB_FORMATS:
                # (scaled pads never reach the split canvas: the phase-
                # matrix sampler measured SLOWER than the interleaved
                # renderer — see aggregate_split_ok)
                split_reader = convert.plan_rgba_sampler_split(
                    spec, matrix_index=spec.matrix_index,
                    presplit=pad.name in split_pads)
            compiled_draws.append(
                dict(
                    pad=pad,
                    size=(w, h),
                    offsets=(x_off, y_off),
                    window=(min(h, out_h), min(w, out_w)),
                    samplers=samplers,
                    split_reader=split_reader,
                    matrix=spec.matrix_index,
                    fmt=spec.format,
                    # obscuring requires an opaque format (no alpha channel),
                    # pad_obscures_rectangle m:328-358
                    opaque_fmt=spec.format not in RGB_FORMATS,
                )
            )

        # -- folded overlays: downstream vfoverlay rect blends absorbed as
        # final 'mix' draws of THIS render pass (the pipeline detects the
        # adjacency; the overlay element's stage is then elided).  Removes
        # the overlay's full-canvas read+write round trip — the analog of
        # drawing the overlay quad in the same command buffer as the
        # composite (metalcomprenderer.m single-pass model).  The mix
        # matches vfoverlay exactly: rgb = rgb*(1-a) + ov_premul*a inside
        # the rect, alpha channel untouched, quantize at the write.
        fold_draws = []
        for i, ov in enumerate(fold_overlays):
            cfg = ov.fold_draw_config(out_spec)
            fx0, fx1, fy0, fy1 = cfg["rect"]
            if fx1 <= fx0 or fy1 <= fy0:
                continue
            planes = cfg["planes"]  # (4, rh, rw) f32 premultiplied
            fd = dict(rect=(fx0, fx1, fy0, fy1), name=ov.name,
                      fetch=bufs.add(planes, f"fold{i}"))
            # phase slices for the split canvases (same mapping as the
            # overlay element's split path)
            pe0, pe1 = (fx0 + 1) // 2, (fx1 + 1) // 2
            po0, po1 = fx0 // 2, fx1 // 2
            fd["e"] = (bufs.add(np.ascontiguousarray(
                planes[:, :, (2 * pe0 - fx0)::2]), f"fold{i}_e"),
                pe0, pe1) if pe1 > pe0 else None
            fd["o"] = (bufs.add(np.ascontiguousarray(
                planes[:, :, (2 * po0 + 1 - fx0)::2]), f"fold{i}_o"),
                po0, po1) if po1 > po0 else None
            fold_draws.append(fd)
        self._fold_elems = list(fold_overlays)

        self._buffers = bufs.buffers
        matrix_out = out_spec.matrix_index

        def pad_param(params, name, prop):
            return params[f"pad.{name}.{prop}"]

        def pad_meta_flags(params, name):
            meta = (params.get("__pad_meta__") or {}).get(name) or {}
            started = meta.get("active")
            eos = meta.get("eos")
            started = jnp.float32(1.0) if started is None else started
            eos = jnp.float32(0.0) if eos is None else eos
            # eos pads hold their frozen last buffer unless ignored
            has_buffer = started * (1.0 - eos) if ignore_inactive else started
            return has_buffer

        # baked geometry for the FAST branch: dynamic placement ops (cond /
        # dynamic_slice / dynamic_update_slice) are fusion barriers that cost
        # ~3x at 4K, so the process compiles TWO render bodies — a static-
        # slicing one specialized to the build-time positions/operators
        # (full XLA fusion, round-1 speed) and the general traced one — and
        # a lax.cond picks per frame.  Animating any controllable pad prop
        # still triggers ZERO rebuilds: the animated frames just run the
        # general branch.
        for d in compiled_draws:
            bag = d["pad"].bag
            d["baked_x"] = int(bag.get("xpos")) + d["offsets"][0]
            d["baked_y"] = int(bag.get("ypos")) + d["offsets"][1]
            d["baked_op"] = int(bag.get("operator"))

        def process_impl(pad_inputs, state, params, force_fast=False,
                         cells=False):
            # -- per-frame prepare pass (traced scalars) ------------------
            prep = []
            for d in compiled_draws:
                name = d["pad"].name
                w, h = d["size"]
                x_off, y_off = d["offsets"]
                x = pad_param(params, name, "xpos").astype(jnp.int32) + x_off
                y = pad_param(params, name, "ypos").astype(jnp.int32) + y_off
                alpha = pad_param(params, name, "alpha")
                has_buffer = pad_meta_flags(params, name)
                # clamped rect (prepare_frame_start m:159-173, 208-215)
                vx0 = jnp.clip(x, 0, out_w)
                vy0 = jnp.clip(y, 0, out_h)
                vx1 = jnp.clip(x + w, 0, out_w)
                vy1 = jnp.clip(y + h, 0, out_h)
                nonempty = ((vx1 - vx0) > 0) & ((vy1 - vy0) > 0)
                visible = (has_buffer * (alpha > 0) *
                           nonempty.astype(jnp.float32))
                # does this pad obscure a rect? (alpha==1, opaque format,
                # has a buffer; containment checked against the UNCLAMPED
                # pad rect, m:328-358)
                obscuring = (has_buffer * (alpha >= 1.0)
                             if d["opaque_fmt"] else jnp.float32(0.0))
                prep.append(dict(d=d, x=x, y=y, alpha=alpha, visible=visible,
                                 obscuring=obscuring,
                                 rect=(vx0, vy0, vx1, vy1)))

            def contains(p_outer, x0, y0, x1, y1):
                """outer pad's unclamped rect contains [x0,y0,x1,y1]."""
                w, h = p_outer["d"]["size"]
                return ((p_outer["x"] <= x0) & (p_outer["y"] <= y0) &
                        (p_outer["x"] + w >= x1) & (p_outer["y"] + h >= y1))

            # draw flag: visible and not obscured by a LATER (higher-zorder)
            # obscuring pad containing this pad's clamped rect (m:219-246)
            for i, p in enumerate(prep):
                vx0, vy0, vx1, vy1 = p["rect"]
                not_obscured = jnp.float32(1.0)
                for q in prep[i + 1:]:
                    occ = q["obscuring"] * contains(
                        q, vx0, vy0, vx1, vy1).astype(jnp.float32)
                    not_obscured = not_obscured * (1.0 - occ)
                p["draw"] = p["visible"] * not_obscured

            # background: transparent when any pad obscures the full canvas
            # (_should_draw_background m:360-385)
            bg_drawn = jnp.float32(1.0)
            for p in prep:
                occ = p["obscuring"] * p["visible"] * contains(
                    p, 0, 0, out_w, out_h).astype(jnp.float32)
                bg_drawn = bg_drawn * (1.0 - occ)

            def sample_draw(p):
                """Premultiplied (r, g, b, a) source planes at pad size.

                Pad planes are REPLICATED under sp (Pipeline._sp_plan), so
                sampling must trace UNSHARDED: with the spatial axis live,
                the 4:2:0 chroma row-upsample's halo exchange would
                ppermute an unsharded operand and interior shards would
                read the plane's OPPOSITE edge row instead of the clamped
                edge row."""
                from tpuvf.parallel import spctx

                with spctx.spatial_axis(None):
                    return _sample_draw(p)

            def _sample_draw(p):
                d = p["d"]
                planes = pad_inputs[d["pad"].name]
                if d["pad"].name in split_pads:
                    # animated/general branch with a split-provisioned
                    # upload: re-interleave on u8 (rare frames only)
                    if d["fmt"] in RGB_FORMATS:
                        names = ("r", "g", "b", "a")
                        planes = {"rgba": jnp.stack(
                            [convert.interleave_cols_u8(
                                planes[f"{n}_e"], planes[f"{n}_o"])
                             for n in names], axis=-3)}
                    else:
                        planes = dict(planes)
                        planes["y"] = convert.interleave_cols_u8(
                            planes.pop("y_e"), planes.pop("y_o"))
                if d["fmt"] in RGB_FORMATS:
                    rgba8 = planes["rgba"]
                    srcs = [
                        d["samplers"]["rgba"](
                            dequant(rgba8[..., c, :, :]), params)
                        for c in range(4)
                    ]
                    s_r, s_g, s_b, s_a = srcs
                else:
                    yv = d["samplers"]["y"](dequant(planes["y"]), params)
                    uv = d["samplers"]["c"](dequant(planes["u"]), params)
                    vv = d["samplers"]["c"](dequant(planes["v"]), params)
                    s_r, s_g, s_b = kcolor.yuv_to_rgb(
                        yv, uv, vv, d["matrix"])
                    s_a = jnp.ones_like(s_r)
                # fragment: alpha *= pad alpha; premultiply.  The draw flag
                # folds into the alpha so skipped draws contribute nothing
                # under OVER/ADD with no extra select pass (SOURCE handles
                # the flag in its mask).
                s_a = s_a * (p["alpha"] * p["draw"])
                return [s_r * s_a, s_g * s_a, s_b * s_a, s_a]

            def blend(op, mask, src_v, dst_v, a_v, draw):
                return jax.lax.switch(
                    op,
                    (
                        # SOURCE = (one, zero) inside the drawn quad
                        lambda s, dv, av: jnp.where(
                            mask & (draw > 0), s, dv),
                        # OVER = (one, one-minus-src-alpha) premultiplied
                        # (skipped draws have av == 0 -> dv)
                        lambda s, dv, av: s + dv * (1.0 - av),
                        # ADD = (one, one)
                        lambda s, dv, av: s + dv,
                    ),
                    src_v, dst_v, a_v,
                )

            def make_dst():
                """Per-channel UINT8 canvas planes — literally the RGBA8
                render target between draws.  XLA materializes the canvas at
                every draw of the fold (measured ~0.32 ms/draw at 4K for a
                f32 canvas regardless of at[].set vs where-fold form), so
                the inter-draw storage dtype is the traffic knob: u8 cuts it
                4x, and the quantize-per-draw is the reference's semantics
                anyway."""
                bg = jnp.asarray(fetch_bg(params))
                zero = jnp.zeros((), jnp.uint8)
                return [jnp.where(bg_drawn > 0, bg[c], zero)
                        for c in range(4)]

            def _baked_rect(p):
                """Static clamped rect at baked geometry, or None."""
                d = p["d"]
                w, h = d["size"]
                x, y = d["baked_x"], d["baked_y"]
                vx0, vy0 = min(max(x, 0), out_w), min(max(y, 0), out_h)
                vx1 = min(max(x + w, 0), out_w)
                vy1 = min(max(y + h, 0), out_h)
                if vx1 - vx0 == 0 or vy1 - vy0 == 0:
                    return None
                return x, y, vx0, vy0, vx1, vy1

            def _blend_static(op, draw, src_v, dst_v, a_v):
                if op == OP_SOURCE:
                    return jnp.where(draw > 0, src_v, dst_v)
                if op == OP_ADD:
                    return src_v + dst_v  # skipped: src == 0
                return src_v + dst_v * (1.0 - a_v)

            def apply_folds(dst):
                """Folded overlay mix draws on the full u8 canvas."""
                for fd in fold_draws:
                    fx0, fx1, fy0, fy1 = fd["rect"]
                    ov = jnp.asarray(fd["fetch"](params))
                    a = ov[3] * params[f"fold.{fd['name']}.alpha"]
                    for c in range(3):  # alpha channel untouched
                        v = dequant(dst[c][fy0:fy1, fx0:fx1])
                        dst[c] = dst[c].at[fy0:fy1, fx0:fx1].set(
                            quant(v * (1.0 - a) + ov[c] * a))
                return dst

            def apply_folds_split(dst_e, dst_o):
                for fd in fold_draws:
                    _, _, fy0, fy1 = fd["rect"]
                    alpha = params[f"fold.{fd['name']}.alpha"]
                    for dstl, ph in ((dst_e, fd["e"]), (dst_o, fd["o"])):
                        if ph is None:
                            continue
                        fetch, c0, c1 = ph
                        ov = jnp.asarray(fetch(params))
                        a = ov[3] * alpha
                        for c in range(3):
                            v = dequant(dstl[c][fy0:fy1, c0:c1])
                            dstl[c] = dstl[c].at[fy0:fy1, c0:c1].set(
                                quant(v * (1.0 - a) + ov[c] * a))
                return dst_e, dst_o

            def _fold_sp(dst_like, fetch_pads, rows_local):
                """Folded overlay mixes on row-sharded canvas planes:
                pad-to-canvas + shard_rows; outside the rect alpha == 0
                makes the mix (and its re-quantize) an exact identity, so
                no rect mask is needed (the overlay element's own
                semantics)."""
                from tpuvf.parallel import spctx

                for fd, pads_of in fetch_pads:
                    alpha = params[f"fold.{fd['name']}.alpha"]
                    for dstl, ph in pads_of(fd):
                        if ph is None:
                            continue
                        fetch, padding = ph
                        ov = jnp.asarray(fetch(params))
                        a = spctx.shard_rows(
                            jnp.pad(ov[3] * alpha, padding), rows_local)
                        for c in range(3):
                            ovc = spctx.shard_rows(
                                jnp.pad(ov[c], padding), rows_local)
                            v = dequant(dstl[c])
                            dstl[c] = quant(v * (1.0 - a) + ovc * a)
                return dst_like

            def render_masked(_):
                """Row-sharded (sp) render body: each draw becomes a
                full-canvas masked blend — zero-pad the source to canvas
                size, slice THIS shard's rows (spctx.shard_rows; the
                pad+slice fuses), and select inside the global-row/col
                rect mask with the RGBA8 quantize applied only in-rect.
                Rect DUS offsets are global rows, which a row shard cannot
                address directly; masks can.  BAKED geometry only (the
                runtime picks the steady-state variant under sp)."""
                from tpuvf.parallel import spctx

                n = spctx.axis_size()
                rows_local = out_h // n
                grow = spctx.global_rows(rows_local, out_h)
                zero = jnp.zeros((), jnp.uint8)
                bg = jnp.asarray(fetch_bg(params))
                dst = [spctx.shard_rows(
                    jnp.where(bg_drawn > 0, bg[c], zero), rows_local)
                    for c in range(4)]
                cols = np.arange(out_w, dtype=np.float32)
                for p in prep:
                    r = _baked_rect(p)
                    if r is None:
                        continue
                    xb, yb, vx0, vy0, vx1, vy1 = r
                    src_p = sample_draw(p)
                    sy = slice(vy0 - yb, vy1 - yb)
                    sx = slice(vx0 - xb, vx1 - xb)
                    pads = ((vy0, out_h - vy1), (vx0, out_w - vx1))

                    def place(pl, sy=sy, sx=sx, pads=pads,
                              rows_local=rows_local):
                        return spctx.shard_rows(
                            jnp.pad(pl[sy, sx], pads), rows_local)

                    a_v = place(src_p[3])
                    in_rect = ((grow[:, None] >= vy0) & (grow[:, None] < vy1)
                               & (cols[None, :] >= vx0)
                               & (cols[None, :] < vx1))
                    op = p["d"]["baked_op"]
                    for c in range(4):
                        s_v = place(src_p[c])
                        blended = _blend_static(
                            op, p["draw"], s_v, dequant(dst[c]), a_v)
                        dst[c] = jnp.where(in_rect, quant(blended), dst[c])
                return _fold_sp(
                    dst,
                    [(fd, lambda fd: [(dst, (fd["fetch"], (
                        (fd["rect"][2], out_h - fd["rect"][3]),
                        (fd["rect"][0], out_w - fd["rect"][1]))))])
                     for fd in fold_draws],
                    rows_local)

            def render_masked_split(_):
                """Column-phase variant of render_masked (split canvases
                under sp row sharding)."""
                from tpuvf.parallel import spctx

                n = spctx.axis_size()
                rows_local = out_h // n
                grow = spctx.global_rows(rows_local, out_h)
                wp = out_w // 2
                zero = jnp.zeros((), jnp.uint8)
                bg_e = jnp.asarray(fetch_bg_e(params))
                bg_o = jnp.asarray(fetch_bg_o(params))
                dst_e = [spctx.shard_rows(
                    jnp.where(bg_drawn > 0, bg_e[c], zero), rows_local)
                    for c in range(4)]
                dst_o = [spctx.shard_rows(
                    jnp.where(bg_drawn > 0, bg_o[c], zero), rows_local)
                    for c in range(4)]
                pcols = np.arange(wp, dtype=np.float32)
                for p in prep:
                    r = _baked_rect(p)
                    if r is None:
                        continue
                    x, y, vx0, vy0, vx1, vy1 = r
                    se, so = sample_draw_split(p)
                    sy = slice(vy0 - y, vy1 - y)
                    ce0, ce1 = (vx0 + 1) // 2, (vx1 + 1) // 2
                    co0, co1 = vx0 // 2, vx1 // 2
                    off_ceil = (x + (x & 1)) // 2
                    off_floor = x // 2
                    phases = (
                        (dst_e, se if x % 2 == 0 else so, ce0, ce1, off_ceil),
                        (dst_o, so if x % 2 == 0 else se, co0, co1, off_floor),
                    )
                    op = p["d"]["baked_op"]
                    for dstl, src_ph, c0, c1, off in phases:
                        if c1 - c0 <= 0:
                            continue
                        sx = slice(c0 - off, c1 - off)
                        pads = ((vy0, out_h - vy1), (c0, wp - c1))

                        def place(pl, sy=sy, sx=sx, pads=pads,
                                  rows_local=rows_local):
                            return spctx.shard_rows(
                                jnp.pad(pl[sy, sx], pads), rows_local)

                        a_v = place(src_ph[3])
                        in_rect = ((grow[:, None] >= vy0)
                                   & (grow[:, None] < vy1)
                                   & (pcols[None, :] >= c0)
                                   & (pcols[None, :] < c1))
                        for c in range(4):
                            s_v = place(src_ph[c])
                            blended = _blend_static(
                                op, p["draw"], s_v, dequant(dstl[c]), a_v)
                            dstl[c] = jnp.where(
                                in_rect, quant(blended), dstl[c])

                def pads_of(fd):
                    out = []
                    fy0, fy1 = fd["rect"][2], fd["rect"][3]
                    for dstl, ph in ((dst_e, fd["e"]), (dst_o, fd["o"])):
                        if ph is None:
                            out.append((dstl, None))
                            continue
                        fetch, c0, c1 = ph
                        out.append((dstl, (fetch, ((fy0, out_h - fy1),
                                                   (c0, wp - c1)))))
                    return out

                _fold_sp(dst_e, [(fd, pads_of) for fd in fold_draws],
                         rows_local)
                return dst_e, dst_o

            def render_fast(_):
                """Static body specialized to the BAKED positions and
                operators (the cond guarantees they equal the traced values
                at runtime).  Rect-sliced updates on the u8 canvas:
                zero-padding sources to the canvas materializes ~5
                full-frame f32 pads PER DRAW (measured ~0.4 ms/draw at 4K),
                while the functional u8 canvas copy is ~0.1 ms.  The RGBA8
                render-target write quantizes each drawn rect."""
                dst = make_dst()
                for p in prep:
                    r = _baked_rect(p)
                    if r is None:
                        continue  # statically offscreen at baked geometry
                    x, y, vx0, vy0, vx1, vy1 = r
                    src_p = sample_draw(p)
                    ry = slice(vy0 - y, vy1 - y)
                    rx = slice(vx0 - x, vx1 - x)
                    a_v = src_p[3][ry, rx]
                    full = (vy0 == 0 and vy1 == out_h
                            and vx0 == 0 and vx1 == out_w)
                    for c in range(4):
                        src_v = src_p[c][ry, rx]
                        dst_v = dequant(dst[c][vy0:vy1, vx0:vx1])
                        blended = _blend_static(
                            p["d"]["baked_op"], p["draw"], src_v, dst_v, a_v)
                        if full:
                            # full-canvas draw: plain value, no DUS pass
                            dst[c] = quant(blended)
                        else:
                            dst[c] = dst[c].at[vy0:vy1, vx0:vx1].set(
                                quant(blended))
                return apply_folds(dst)

            def sample_draw_split(p):
                """(even_chans, odd_chans) premultiplied column-phase source
                planes at pad size (full-identity draws only).  Suspends
                the spatial context like sample_draw: pad planes are
                replicated, so the split readers' chroma row-upsample must
                edge-clamp, not halo-exchange."""
                from tpuvf.parallel import spctx

                with spctx.spatial_axis(None):
                    return _sample_draw_split(p)

            def _sample_draw_split(p):
                d = p["d"]
                planes = pad_inputs[d["pad"].name]
                if d["pad"].name in split_pads:
                    # source-provisioned split upload (no device relayout)
                    if d["fmt"] in RGB_FORMATS:
                        ch_e, ch_o = convert.split_rgb_chans(planes)
                    else:
                        ch_e, ch_o = d["split_reader"](planes, params)
                elif d["fmt"] in RGB_FORMATS:
                    x8 = planes["rgba"]
                    wp = x8.shape[-1]
                    rp = x8.reshape(x8.shape[:-1] + (wp // 2, 2))
                    ch_e = tuple(dequant(rp[..., c, :, :, 0])
                                 for c in range(4))
                    ch_o = tuple(dequant(rp[..., c, :, :, 1])
                                 for c in range(4))
                else:
                    ch_e, ch_o = d["split_reader"](planes, params)
                k = p["alpha"] * p["draw"]

                def prem(ch):
                    a = ch[3] * k
                    return [ch[0] * a, ch[1] * a, ch[2] * a, a]

                return prem(ch_e), prem(ch_o)

            def make_dst_split():
                zero = jnp.zeros((), jnp.uint8)
                bg_e = jnp.asarray(fetch_bg_e(params))
                bg_o = jnp.asarray(fetch_bg_o(params))
                return ([jnp.where(bg_drawn > 0, bg_e[c], zero)
                         for c in range(4)],
                        [jnp.where(bg_drawn > 0, bg_o[c], zero)
                         for c in range(4)])

            def render_fast_split(_):
                """Column-phase variant of render_fast: the canvas is a pair
                of half-width u8 phase planes per channel, pad sources come
                from the split samplers (no f32 lane interleave — a 1080p
                NV12 draw source measured 0.207 ms interleaved vs 0.048
                split, scripts/bench_nv12draw.py), and the x parity of each
                draw statically maps source phases onto canvas phases."""
                dst_e, dst_o = make_dst_split()
                for p in prep:
                    r = _baked_rect(p)
                    if r is None:
                        continue
                    x, y, vx0, vy0, vx1, vy1 = r
                    se, so = sample_draw_split(p)
                    ry = slice(vy0 - y, vy1 - y)
                    # canvas-even cols 2k, k in [ce0, ce1): source col 2k-x
                    # -> phase e (x even) / o (x odd) at index k - ceil(x/2);
                    # canvas-odd cols 2k+1: phase o/e at index k - floor(x/2)
                    ce0, ce1 = (vx0 + 1) // 2, (vx1 + 1) // 2
                    co0, co1 = vx0 // 2, vx1 // 2
                    off_ceil = (x + (x & 1)) // 2
                    off_floor = x // 2
                    phases = (
                        (dst_e, se if x % 2 == 0 else so, ce0, ce1, off_ceil),
                        (dst_o, so if x % 2 == 0 else se, co0, co1, off_floor),
                    )
                    op = p["d"]["baked_op"]
                    wp = out_w // 2
                    for dstl, src_ph, c0, c1, off in phases:
                        if c1 - c0 <= 0:
                            continue
                        sx = slice(c0 - off, c1 - off)
                        a_v = src_ph[3][ry, sx]
                        full = (vy0 == 0 and vy1 == out_h
                                and c0 == 0 and c1 == wp)
                        for c in range(4):
                            src_v = src_ph[c][ry, sx]
                            dst_v = dequant(dstl[c][vy0:vy1, c0:c1])
                            blended = _blend_static(
                                op, p["draw"], src_v, dst_v, a_v)
                            if full:
                                # full-canvas draw: emit the value directly
                                # — the .at[:].set DUS would re-write every
                                # canvas byte AFTER the init select pass
                                # (the two passes measured ~0.3 ms/frame in
                                # the config-5 trace); as a plain value the
                                # init select fuses into this blend
                                dstl[c] = quant(blended)
                            else:
                                dstl[c] = dstl[c].at[vy0:vy1, c0:c1].set(
                                    quant(blended))
                return apply_folds_split(dst_e, dst_o)

            def render_cells_split(_):
                """Cell-partition variant of render_fast_split: the STATIC
                draw rects partition each phase canvas into a grid of cells
                (edges = all draw column/row boundaries); each cell is ONE
                fused expression — the per-draw blend+quantize fold of its
                covering draws over the background — and the canvas
                assembles by concatenation.  Identical per-pixel op
                sequence to render_fast_split (bit-exact), but the canvas
                is written ONCE: no per-draw dynamic-update-slice chain
                re-materializing untouched canvas bytes (the DUS chain
                measured ~0.29 ms/frame of the 0.82 ms config-5 fast
                variant, scripts/profile_comp5.py)."""
                zero_u8 = jnp.zeros((), jnp.uint8)
                wp = out_w // 2

                def lazy_phase_readers(p):
                    """Per-phase window readers for split-provisioned
                    pads, or None.  Cells partition the canvas, so each
                    source pixel lands in exactly one cell: slicing the raw
                    u8 input planes per cell and premultiplying inside the
                    cell's blend+quantize fold computes the same values
                    (identical op order as sample_draw_split's prem) while
                    skipping the full-size premultiplied f32 planes — the
                    config-5 trace showed those materializing ~100 us/frame
                    because the per-cell slices made them multi-consumer.
                    4:2:0 pads go lazy only when the upload carries the
                    host PAIR chroma (u_m/u_a full-height u8,
                    frame.chroma_pair_rows): the round-4 in-XLA lazy
                    variant (chroma row-interleave recomputed per cell
                    via pair broadcast-select) measured 670.6 vs 567.7
                    us/frame because the interleave's broadcast
                    materializes once per consumer fusion
                    (scripts/probe_comp_cellforms.py); with the host
                    pair planes the row upsample is pure elementwise-
                    from-u8, so each cell fold fuses its own chroma
                    decode and nothing materializes."""
                    from tpuvf.kernels.color import as_unit_float

                    d = p["d"]
                    if d["pad"].name not in split_pads:
                        return None
                    planes = pad_inputs[d["pad"].name]
                    k = p["alpha"] * p["draw"]
                    if d["fmt"] not in RGB_FORMATS:
                        return lazy_420_readers(d, planes, k)
                    names = ("r", "g", "b", "a")

                    def make(suffix):
                        def read(c, sy, sx):
                            a = as_unit_float(
                                planes[f"a_{suffix}"][sy, sx]) * k
                            if c == 3:
                                return a
                            v = as_unit_float(
                                planes[f"{names[c]}_{suffix}"][sy, sx])
                            return v * a
                        return read

                    return make("e"), make("o")

                def lazy_420_readers(d, planes, k):
                    """Lazy per-cell readers for a split-provisioned
                    4:2:0 pad with host PAIR chroma, or None.  Bitwise
                    equal to sample_draw_split + prem: luma dequant,
                    chroma = the same 0.25/0.75 row (pair elementwise)
                    and column (clamped-window) taps, yuv_to_rgb, then
                    * (1*k) premultiply — identical mul/add order, only
                    sliced to the cell BEFORE the math so every input
                    is a window of a raw u8 parameter and the whole
                    decode fuses into the cell's blend+quantize fold."""
                    import os as _os2

                    from tpuvf.kernels.color import as_unit_float

                    if ("u_m" not in planes
                            or _os2.environ.get("TPUVF_NO_CHROMA_PAIR")
                            or not _os2.environ.get("TPUVF_LAZY420")):
                        # Default is EAGER sample_draw_split (which
                        # still rides the pair chroma): the round-5
                        # 3-way device A/B read pair+eager 540.9
                        # us/frame vs pair+lazy 596.3 vs no-pair 569.2
                        # (scripts/bench_comp_pair3_ab.py) — the lazy
                        # per-cell decode re-reads the pad chroma per
                        # cell fold and loses more than fusion saves.
                        # TPUVF_LAZY420=1 re-enables it for A/Bs.
                        return None
                    mi = d["matrix"]

                    def cwin(name, sy, lo, hi):
                        # clamped column window [lo, hi) of the row-
                        # upsampled chroma (edge cols duplicate, matching
                        # _shift_edge)
                        m8 = planes[f"{name}_m"]
                        a8 = planes[f"{name}_a"]
                        w2 = m8.shape[-1]
                        lo_c, hi_c = max(lo, 0), min(hi, w2)
                        v = (0.25 * as_unit_float(a8[sy, lo_c:hi_c])
                             + 0.75 * as_unit_float(m8[sy, lo_c:hi_c]))
                        parts = []
                        if lo < 0:
                            parts.append(jnp.repeat(v[:, :1], -lo, axis=1))
                        parts.append(v)
                        if hi > w2:
                            parts.append(
                                jnp.repeat(v[:, -1:], hi - w2, axis=1))
                        return (jnp.concatenate(parts, axis=1)
                                if len(parts) > 1 else v)

                    def make(suffix):
                        def read(c, sy, sx):
                            c0, c1 = sx.start, sx.stop
                            if c == 3:
                                return jnp.full(
                                    (sy.stop - sy.start, c1 - c0), 1.0,
                                    jnp.float32) * k
                            y = as_unit_float(
                                planes[f"y_{suffix}"][sy, sx])
                            if suffix == "e":
                                u = (0.25 * cwin("u", sy, c0 - 1, c1 - 1)
                                     + 0.75 * cwin("u", sy, c0, c1))
                                v = (0.25 * cwin("v", sy, c0 - 1, c1 - 1)
                                     + 0.75 * cwin("v", sy, c0, c1))
                            else:
                                u = (0.75 * cwin("u", sy, c0, c1)
                                     + 0.25 * cwin("u", sy, c0 + 1, c1 + 1))
                                v = (0.75 * cwin("v", sy, c0, c1)
                                     + 0.25 * cwin("v", sy, c0 + 1, c1 + 1))
                            rgb = kcolor.yuv_to_rgb(y, u, v, mi)
                            return rgb[c] * (jnp.ones_like(rgb[c]) * k)
                        return read

                    return make("e"), make("o")

                def eager_phase_readers(planes_pair):
                    def make(ph):
                        return lambda c, sy, sx: ph[c][sy, sx]
                    return make(planes_pair[0]), make(planes_pair[1])

                sampled = []
                for p in prep:
                    r = _baked_rect(p)
                    if r is None:
                        continue
                    readers = lazy_phase_readers(p)
                    if readers is None:
                        readers = eager_phase_readers(sample_draw_split(p))
                    sampled.append((p, r, readers))
                out_e, out_o = [], []
                for phase_i in (0, 1):
                    bg_fetch = fetch_bg_e if phase_i == 0 else fetch_bg_o
                    bg_ph = jnp.asarray(bg_fetch(params))
                    # per-draw phase geometry (same mapping math as
                    # render_fast_split)
                    entries = []
                    for p, r, (se, so) in sampled:
                        x, y, vx0, vy0, vx1, vy1 = r
                        if phase_i == 0:
                            c0, c1 = (vx0 + 1) // 2, (vx1 + 1) // 2
                            off = (x + (x & 1)) // 2
                            src_ph = se if x % 2 == 0 else so
                        else:
                            c0, c1 = vx0 // 2, vx1 // 2
                            off = x // 2
                            src_ph = so if x % 2 == 0 else se
                        if c1 - c0 <= 0 or vy1 - vy0 <= 0:
                            continue
                        entries.append(dict(
                            y0=vy0, y1=vy1, c0=c0, c1=c1, off=off,
                            ry0=vy0 - y, src=src_ph,
                            op=p["d"]["baked_op"], draw=p["draw"]))
                    ys = sorted({0, out_h} | {e["y0"] for e in entries}
                                | {e["y1"] for e in entries})
                    # NOTE (measured, round 3): folding the overlay mixes
                    # INTO the cell grid (rect edges as extra cuts, mix
                    # applied per covered cell) was tried and is ~80 us
                    # SLOWER at 4K — the extra edges fragment the big
                    # cells into lane-unaligned concat pieces.  The
                    # post-pass apply_folds_split DUS stands.
                    ys = [v for v in ys if 0 <= v <= out_h]
                    # column cuts PER ROW BAND (round 4): only the edges of
                    # draws covering the band cut it — a draw no longer
                    # gets sliced by a disjoint draw's column edge, so its
                    # (eager) source decode stays single-consumer and fuses
                    # into its one cell fold instead of materializing
                    # full-size premultiplied f32 phase planes (the 1080p
                    # NV12 pad in BASELINE config 5 paid ~100 us/frame for
                    # that round trip).  ys cuts include every entry's
                    # y0/y1, so within a band each entry covers all of the
                    # band's rows or none.
                    import os as _os

                    all_xs = None
                    if _os.environ.get("TPUVF_NO_BANDXS"):
                        # A/B escape hatch: the round-3 global column cuts
                        all_xs = sorted(
                            {0, wp} | {e["c0"] for e in entries}
                            | {e["c1"] for e in entries})
                        all_xs = [v for v in all_xs if 0 <= v <= wp]

                    def band_xs(cy0, cy1):
                        if all_xs is not None:
                            return all_xs
                        cuts = {0, wp}
                        for e in entries:
                            if e["y0"] <= cy0 and cy1 <= e["y1"]:
                                cuts |= {e["c0"], e["c1"]}
                        return [v for v in sorted(cuts) if 0 <= v <= wp]

                    chans = []
                    for c in range(4):
                        rows = []
                        for yi in range(len(ys) - 1):
                            cy0, cy1 = ys[yi], ys[yi + 1]
                            if cy1 <= cy0:
                                continue
                            xs = band_xs(cy0, cy1)
                            cols = []
                            for xi in range(len(xs) - 1):
                                cc0, cc1 = xs[xi], xs[xi + 1]
                                if cc1 <= cc0:
                                    continue
                                cell_q = jnp.where(
                                    bg_drawn > 0,
                                    bg_ph[c][cy0:cy1, cc0:cc1], zero_u8)
                                for e in entries:
                                    if not (e["c0"] <= cc0 and cc1 <= e["c1"]
                                            and e["y0"] <= cy0
                                            and cy1 <= e["y1"]):
                                        continue
                                    sy = slice(cy0 - e["y0"] + e["ry0"],
                                               cy1 - e["y0"] + e["ry0"])
                                    sx = slice(cc0 - e["off"],
                                               cc1 - e["off"])
                                    src_v = e["src"](c, sy, sx)
                                    a_v = e["src"](3, sy, sx)
                                    blended = _blend_static(
                                        e["op"], e["draw"], src_v,
                                        dequant(cell_q), a_v)
                                    cell_q = quant(blended)
                                cols.append(cell_q)
                            rows.append(jnp.concatenate(cols, axis=-1)
                                        if len(cols) > 1 else cols[0])
                        chans.append(jnp.concatenate(rows, axis=-2)
                                     if len(rows) > 1 else rows[0])
                    (out_e if phase_i == 0 else out_o).extend([chans])
                return apply_folds_split(out_e[0], out_o[0])

            def render_general(_):
                """Traced placement: clamp position, then shift the source
                inside a zero-padded rect so cropping at canvas edges falls
                out of the dynamic slice (no lane gathers)."""
                dst = make_dst()
                for p in prep:
                    d = p["d"]
                    w, h = d["size"]
                    wh, ww = d["window"]
                    src_p = sample_draw(p)
                    xc = jnp.clip(p["x"], -w, out_w)
                    yc = jnp.clip(p["y"], -h, out_h)
                    sxr = jnp.clip(xc, 0, max(out_w - ww, 0))
                    syr = jnp.clip(yc, 0, max(out_h - wh, 0))
                    shift_x = sxr - xc + ww
                    shift_y = syr - yc + wh

                    def window(arr):
                        padded = jnp.pad(arr, ((wh, wh), (ww, ww)))
                        return jax.lax.dynamic_slice(
                            padded, (shift_y, shift_x), (wh, ww))

                    win_p = [window(c) for c in src_p]
                    # source-validity mask from iotas: window cell (i, j)
                    # reads src (syr+i-y, sxr+j-x)
                    ii = jax.lax.broadcasted_iota(jnp.int32, (wh, ww), 0)
                    jj = jax.lax.broadcasted_iota(jnp.int32, (wh, ww), 1)
                    si = ii + (syr - p["y"])
                    sj = jj + (sxr - p["x"])
                    mask = ((si >= 0) & (si < h) & (sj >= 0) & (sj < w))
                    a_v = win_p[3]
                    op = jnp.clip(
                        pad_param(params, d["pad"].name, "operator"), 0, 2)
                    draw = p["draw"]
                    for c in range(4):
                        dst_v = dequant(jax.lax.dynamic_slice(
                            dst[c], (syr, sxr), (wh, ww)))
                        blended = blend(op, mask, win_p[c], dst_v, a_v, draw)
                        dst[c] = jax.lax.dynamic_update_slice(
                            dst[c], quant(blended), (syr, sxr))
                return apply_folds(dst)

            def render_general_sp(_):
                """Traced (animating) geometry on a row-sharded canvas:
                rect DUS offsets are GLOBAL rows a shard cannot address,
                but a traced dynamic-slice READ of the canvas-zero-padded
                source can — start = (out_h + r0 - y, out_w - x) aligns
                the source to this shard's rows with zeros outside, so
                OVER/ADD see alpha 0 there and SOURCE selects on the
                traced rect mask.  Full-width blends per draw (no
                windowing): animated frames are the rare path under sp."""
                from tpuvf.parallel import spctx

                n = spctx.axis_size()
                rows_local = out_h // n
                r0 = (jax.lax.axis_index(spctx.active_axis())
                      * np.int32(rows_local))
                zero = jnp.zeros((), jnp.uint8)
                bg = jnp.asarray(fetch_bg(params))
                dst = [spctx.shard_rows(
                    jnp.where(bg_drawn > 0, bg[c], zero), rows_local)
                    for c in range(4)]
                grow = (jax.lax.broadcasted_iota(
                    jnp.int32, (rows_local, 1), 0) + r0)
                cols = jax.lax.broadcasted_iota(jnp.int32, (1, out_w), 1)
                for p in prep:
                    d = p["d"]
                    w, h = d["size"]
                    src_p = sample_draw(p)
                    xc = jnp.clip(p["x"], -w, out_w)
                    yc = jnp.clip(p["y"], -h, out_h)

                    def place(arr, xc=xc, yc=yc):
                        padded = jnp.pad(arr, ((out_h, out_h),
                                               (out_w, out_w)))
                        return jax.lax.dynamic_slice(
                            padded, (out_h + r0 - yc, out_w - xc),
                            (rows_local, out_w))

                    vx0, vy0, vx1, vy1 = p["rect"]
                    in_rect = ((grow >= vy0) & (grow < vy1)
                               & (cols >= vx0) & (cols < vx1))
                    a_v = place(src_p[3])
                    op = jnp.clip(
                        pad_param(params, d["pad"].name, "operator"), 0, 2)
                    for c in range(4):
                        s_v = place(src_p[c])
                        dst_v = dequant(dst[c])
                        blended = blend(op, in_rect, s_v, dst_v, a_v,
                                        p["draw"])
                        dst[c] = jnp.where(in_rect, quant(blended), dst[c])
                return _fold_sp(
                    dst,
                    [(fd, lambda fd: [(dst, (fd["fetch"], (
                        (fd["rect"][2], out_h - fd["rect"][3]),
                        (fd["rect"][0], out_w - fd["rect"][1]))))])
                     for fd in fold_draws],
                    rows_local)

            def _pack_canvas(dst):
                """u8 canvas -> output planes (values already quantized, so
                this matches pack_rgba_t on the float canvas exactly)."""
                if out_spec.format in RGB_FORMATS:
                    return {"rgba": jnp.stack(dst, axis=-3)}
                return convert._pack_yuv_channels(
                    dequant(dst[0]), dequant(dst[1]), dequant(dst[2]),
                    out_spec.format, matrix_out)

            def emit_phases(dst_e, dst_o):
                """u8 phase canvases -> the negotiated output layout."""
                if out_spec.format in RGB_FORMATS:
                    if out_mode == "split":
                        names = ("r", "g", "b", "a")
                        out = {f"{n}_e": v for n, v in zip(names, dst_e)}
                        out.update(
                            {f"{n}_o": v for n, v in zip(names, dst_o)})
                        return out
                    return {"rgba": jnp.stack(
                        [convert.pack_words_u16(e, o)
                         for e, o in zip(dst_e, dst_o)], axis=-3)}
                return convert.pack_rgba_split(
                    tuple(dequant(c) for c in dst_e),
                    tuple(dequant(c) for c in dst_o),
                    out_spec.format, matrix_out,
                    mode="split" if out_mode == "split" else "packed16")

            def emit_full(dst):
                """u8 interleaved canvas -> the negotiated output layout
                (the general/animated branch deinterleaves on u8 first)."""
                if out_mode == "full":
                    return _pack_canvas(dst)
                rp = [d.reshape(d.shape[:-1] + (out_w // 2, 2)) for d in dst]
                return emit_phases([r[..., 0] for r in rp],
                                   [r[..., 1] for r in rp])

            # -- render ---------------------------------------------------
            from tpuvf.parallel import spctx as _spctx

            sp_live = (_spctx.active_axis() is not None
                       and _spctx.axis_size() > 1)
            if not prep:
                if sp_live:
                    # no draws: the masked bodies reduce to the row-sharded
                    # background + sp-aware folds (the full-height canvas
                    # below would be n_sp times too tall per shard)
                    if split_out:
                        return emit_phases(*render_masked_split(0)), state
                    return emit_full(render_masked(0)), state
                if split_out:
                    return emit_phases(
                        *apply_folds_split(*make_dst_split())), state
                return _pack_canvas(apply_folds(make_dst())), state
            at_baked = jnp.bool_(True)
            for p in prep:
                d = p["d"]
                x_off, y_off = d["offsets"]
                at_baked = (at_baked
                            & (p["x"] == d["baked_x"])
                            & (p["y"] == d["baked_y"])
                            & (pad_param(params, d["pad"].name, "operator")
                               == d["baked_op"]))
            if split_out:
                body = (render_masked_split if sp_live
                        else render_cells_split if cells
                        else render_fast_split)
                fast = lambda _: emit_phases(*body(0))
            else:
                body = render_masked if sp_live else render_fast
                fast = lambda _: emit_full(body(0))
            if sp_live and not force_fast:
                out = jax.lax.cond(
                    at_baked, fast,
                    lambda _: emit_full(render_general_sp(0)), 0)
                return out, state
            if force_fast:
                # fast-only variant: the runtime guarantees the traced
                # geometry equals the baked values (variant_select), so the
                # cond — whose branch-output copies cost ~0.3 ms/frame at 4K
                # — is omitted from this program entirely
                return fast(0), state
            out = jax.lax.cond(
                at_baked, fast, lambda _: emit_full(render_general(0)), 0)
            return out, state

        def process(pad_inputs, state, params):
            return process_impl(pad_inputs, state, params)

        def process_fast(pad_inputs, state, params):
            return process_impl(pad_inputs, state, params, force_fast=True)

        def variant_select(elem_params) -> str:
            """HOST-side per-frame variant pick: the pipeline compiles both
            variants once and runs 'fast' whenever the controllable pad
            geometry sits at its baked (build-time) values — animation
            switches to 'general' with zero recompiles."""
            for d in compiled_draws:
                name = d["pad"].name
                x_off, y_off = d["offsets"]
                if (int(elem_params[f"pad.{name}.xpos"]) + x_off
                        != d["baked_x"]
                        or int(elem_params[f"pad.{name}.ypos"]) + y_off
                        != d["baked_y"]
                        or int(elem_params[f"pad.{name}.operator"])
                        != d["baked_op"]):
                    return "general"
            return "fast"

        process.variants = {"general": process, "fast": process_fast}
        if split_out:
            # cells wins ONLY where draws are identity (the split path's
            # guarantee): with scaled matmul-sampled draws, per-cell source
            # slicing makes the sampled sources materialize — measured 2x
            # SLOWER on the interleaved path (1,144-1,197 vs 2,169-2,873
            # fps, round-3 A/B with a 960x540-scaled pad at 4K), so the
            # full path keeps the DUS body.
            def process_cells(pad_inputs, state, params):
                return process_impl(pad_inputs, state, params,
                                    force_fast=True, cells=True)

            process.variants["cells"] = process_cells
        process.variant_select = variant_select
        return process
