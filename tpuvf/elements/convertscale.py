"""vfconvertscale — format conversion + scaling in one fused pass.

Rebuild of vfmetalconvertscale (/root/reference/src/convertscale/):
- formats BGRA, RGBA, NV12, I420, UYVY, YUY2 (gstvfmetalconvertscale.m:48)
- props: method {bilinear=0, nearest=1}, add-borders (letterbox, default
  FALSE), border-color ARGB default 0xFF000000 (m:70-72)
- fixate: preserve input format; fix output dims preserving display aspect
  ratio given the output PAR (m:160-248)
- passthrough iff same format and dims (m:272-280)

TPU shape: one jitted function = sample input planes at the output grid
(separable MXU matmuls with letterbox baked into the weight matrices) ->
quantize to the RGBA8 intermediate -> pack to the output format.  Packed
4:2:2 inputs always use nearest decode (metalconvertscalerenderer.m:180-185).
"""

from __future__ import annotations

from tpuvf.core.element import Element
from tpuvf.core.formats import ALL_FORMATS, RGB_FORMATS
from tpuvf.core.properties import PropertyDescriptor, argb_to_rgba_floats
from tpuvf.core.registry import register
from tpuvf.core.spec import CapsFilter, Fraction, FrameSpec
from tpuvf.kernels import convert
from tpuvf.kernels.color import quant
from tpuvf.kernels.sample import LINEAR, NEAREST, letterbox_scales

METHOD_BILINEAR = 0
METHOD_NEAREST = 1


@register
class ConvertScale(Element):
    ELEMENT_NAME = "vfconvertscale"
    # videoconvert/videoscale: the reference positions vfmetalconvertscale
    # as the drop-in replacement for both (README.md:3,20); with
    # passthrough elision the superset behaves identically under the same
    # caps, so the stock names resolve here too.
    ALIASES = ("vfmetalconvertscale", "convertscale",
               "videoconvert", "videoscale")
    KLASS = "Filter/Converter/Video/Scaler"
    DESCRIPTION = "Converts video format and scales using the MXU"
    IN_FORMATS = ALL_FORMATS
    OUT_FORMATS = ALL_FORMATS
    PROPERTIES = (
        PropertyDescriptor(
            "method", "enum", METHOD_BILINEAR,
            "Scaling interpolation method",
            enum_values=(("bilinear", 0), ("nearest", 1)),
        ),
        PropertyDescriptor(
            "add-borders", "bool", False,
            "Add letterbox/pillarbox borders to preserve aspect ratio",
        ),
        PropertyDescriptor(
            "border-color", "color", 0xFF000000,
            "Border color in ARGB format",
        ),
    )

    def transform_spec(self, in_spec: FrameSpec, out_filter=None) -> FrameSpec:
        """transform_caps offers any format/size (m:105-158); fixate preserves
        input format and fixes output dims preserving display aspect ratio
        given the output PAR, nearest against offered ranges/lists
        (m:160-248: gst_structure_fixate_field_string for format,
        fixate_field_nearest_int for the DAR-derived dimension)."""
        if not self.accepts_format(in_spec.format):
            raise ValueError(f"unsupported input format {in_spec.format}")
        filt = out_filter or CapsFilter()
        # preserve input format when the offer allows it, else nearest/first
        fmt = filt.fixate("format", in_spec.format) or in_spec.format
        par = filt.fixate("par", Fraction(1, 1)) or Fraction(1, 1)
        # input DAR = from_w*par_n / from_h*par_d
        dar = Fraction(in_spec.width, in_spec.height) * in_spec.par

        def dar_h(w):
            return max(1, (w * dar.den * par.num) // (dar.num * par.den))

        def dar_w(h):
            return max(1, (h * dar.num * par.den) // (dar.den * par.num))

        w_fixed, h_fixed = filt.is_fixed("width"), filt.is_fixed("height")
        if w_fixed and h_fixed:
            w, h = filt.width, filt.height
        elif w_fixed:
            w = filt.width
            h = filt.fixate("height", dar_h(w)) or dar_h(w)
        elif h_fixed:
            h = filt.height
            w = filt.fixate("width", dar_w(h)) or dar_w(h)
        else:
            # neither fixed: keep input width (nearest in the offered
            # range), DAR-derive the height
            w = filt.fixate("width", in_spec.width) or in_spec.width
            h = filt.fixate("height", dar_h(w)) or dar_h(w)
        fps = filt.fixate("fps", in_spec.fps) or in_spec.fps
        return FrameSpec(
            format=fmt, width=w, height=h,
            fps=fps, par=par,
            matrix=in_spec.matrix,
            interlaced=in_spec.interlaced, tff=in_spec.tff,
        )

    def is_passthrough(self, in_spec, out_spec):
        # m:272-280 — same format and dimensions => passthrough
        return (
            in_spec.format == out_spec.format
            and in_spec.width == out_spec.width
            and in_spec.height == out_spec.height
        )

    def _split_geometry(self, in_spec: FrameSpec, out_spec: FrameSpec):
        """(scale_x, scale_y, border, filt) for the current props."""
        method = self.props.get("method")
        filt = NEAREST if method == METHOD_NEAREST else LINEAR
        scale_x = scale_y = 1.0
        border = None
        if self.props.get("add-borders"):
            scale_x, scale_y = letterbox_scales(
                in_spec.width, in_spec.height, out_spec.width, out_spec.height
            )
            if scale_x != 1.0 or scale_y != 1.0:
                border = argb_to_rgba_floats(self.props.get("border-color"))
        return scale_x, scale_y, border, filt

    def _split_scaled_ok(self, in_spec, out_spec):
        """Column-phase dataflow at SCALED geometry (round 3b): output
        phases are row-slices of the dense sampling matrices — <= 1 LSB
        from the canonical path (convert.can_split_scaled; backend
        K-grouping / presplit FMA rounding).  Packed 4:2:2 joined both
        sides in round 4 (NEAREST forced on input like canonical; the
        phase-mean chroma pack is geometry-independent).  4:2:0 OUTPUT
        additionally needs even height (pack_rgba_split row pairs);
        4:2:2 output pairs columns only — the phases themselves."""
        from tpuvf.core.formats import PACKED_YUV_FORMATS, VideoFormat as _VF

        if not convert.can_split_scaled(in_spec, out_spec.width,
                                        out_spec.height):
            return False
        if out_spec.format in (_VF.NV12, _VF.I420):
            return out_spec.height % 2 == 0
        return (out_spec.format in RGB_FORMATS
                or out_spec.format in PACKED_YUV_FORMATS)

    def _split_identity_ok(self, in_spec, out_spec) -> bool:
        """Identity-geometry column-phase eligibility: 4:2:0 (round 2) or
        packed 4:2:2 (round 4) input.  4:2:0 OUTPUT additionally needs
        even height for the pack's 2x2 box-average row pairs (free when
        the input is 4:2:0 — identity keeps its even dims — but a 4:2:2
        input only guarantees even width)."""
        from tpuvf.core.formats import VideoFormat as _VF

        scale_x, scale_y, border, _ = self._split_geometry(in_spec, out_spec)
        ok = (convert.can_split_420(in_spec, out_spec.width,
                                    out_spec.height, scale_x, scale_y,
                                    border)
              or convert.can_split_422(in_spec, out_spec.width,
                                       out_spec.height, scale_x, scale_y,
                                       border))
        if ok and out_spec.format in (_VF.NV12, _VF.I420):
            ok = out_spec.height % 2 == 0
        return ok

    def edge_packed16_ok(self, in_spec=None, out_spec=None) -> bool:
        """Sink-edge packed16 pays only on the IDENTITY phase paths
        (4:2:0 or packed 4:2:2 input — it avoids the canonical path's
        f32 lane interleaves / chroma lane repeat).  At scaled geometry
        the canonical matmul path has no interleave to avoid — the phase
        formulation just doubles the row-kernel calls (device trace:
        60.3 vs 76.4 us/frame on config 1) — so the scaled split engages
        only on element links, never for the sink edge."""
        if in_spec is None or out_spec is None:
            return True
        return self._split_identity_ok(in_spec, out_spec)

    def edge_packed32_ok(self, in_spec=None, out_spec=None) -> bool:
        """RGB sink edges emit u32 pixel words (one fusion; the
        per-channel u16 emit split into two fusions with six f32 4K
        intermediates — kernels.convert.pack_words_u32)."""
        return True

    def source_split_worth_it(self, in_spec, out_spec, out_mode) -> bool:
        """Split source uploads always pay on the identity path; at
        scaled geometry they only pay when the output is also split
        (otherwise the canonical sampler reads interleaved planes
        directly and the phase formulation just adds work).  At
        2x-UPSAMPLE columns the interleaved upload wins even with a split
        output: the non-presplit phase stencils read the full-width plane
        directly (the _upsample2x_linear expressions, no matmul), while a
        presplit upload would force the two-term phase matmuls."""
        if self._split_identity_ok(in_spec, out_spec):
            return True
        scale_x, scale_y, border, _ = self._split_geometry(in_spec, out_spec)
        if out_mode == "full":
            return False
        from tpuvf.core.formats import PACKED_YUV_FORMATS

        if in_spec.format in PACKED_YUV_FORMATS:
            # packed inputs decode NEAREST, so the 2x-upsample exception
            # below (a LINEAR-stencil argument) does not apply: NEAREST
            # 2x columns from a presplit upload are per-phase passthrough
            # reads.  UYVY 1080p->4K chain A/B: presplit 1,902-5,722 fps
            # every rep vs interleaved-split 275-5,193 and canonical
            # 812-1,497 (scripts/bench_422_scaled_ab.py)
            return True
        return not (scale_x == 1.0
                    and out_spec.width == 2 * in_spec.width)

    def split_output_ok(self, in_spec, out_spec):
        """Column-phase output: the identity fast paths (4:2:0 round 2,
        packed 4:2:2 round 4 — any output format pack_rgba_split
        supports), or the scaled phase-matrix path (RGB / 4:2:0 outputs
        only)."""
        return (self._split_identity_ok(in_spec, out_spec)
                or self._split_scaled_ok(in_spec, out_spec))

    def quad_output_ok(self, in_spec, out_spec):
        """QUAD (row x col phase) dataflow: the 4:2:0 identity fast path
        with a non-packed output — the chroma row 2x-upsample becomes
        phase-local 2-tap stencils fused into the emit (no full-height f32
        intermediates; headline device 254 -> 190 us/frame,
        scripts/bench_rowphase.py)."""
        from tpuvf.core.formats import PACKED_YUV_FORMATS

        scale_x, scale_y, border, _ = self._split_geometry(in_spec, out_spec)
        return (convert.can_split_420(in_spec, out_spec.width,
                                      out_spec.height, scale_x, scale_y,
                                      border)
                and out_spec.format not in PACKED_YUV_FORMATS)

    def quad_input_ok(self, in_spec, out_spec):
        """Consume quad planes: 4:2:0 identity only (the quad sampler's
        luma is a per-phase passthrough)."""
        return (self.quad_output_ok(in_spec, out_spec)
                and in_spec.format not in RGB_FORMATS)

    def grid_head_ok(self, in_spec, out_spec):
        """GRID16 head: exactly-2x/2x bilinear 4:2:0 upscale with no
        letterbox — every sampling tap is a phase-fixed 2-tap stencil
        over the quad-provisioned source planes, so the whole upscale
        fuses per output phase with zero resampling materialization
        (convert.can_grid16; 421 -> 231 us/frame at 1080p->4K,
        scripts/bench_upscale_grid_ab.py).  RGB outputs feed grid
        boundaries/packed32g edges; 4:2:0 outputs (the format-preserving
        default fixation, e.g. NV12 1080p -> NV12 4K) emit the
        packed420g sink edge directly."""
        from tpuvf.core.formats import VideoFormat as _VF

        scale_x, scale_y, border, filt = self._split_geometry(
            in_spec, out_spec)
        return ((out_spec.format in RGB_FORMATS
                 or out_spec.format in (_VF.NV12, _VF.I420))
                and convert.can_grid16(in_spec, out_spec.width,
                                       out_spec.height, scale_x, scale_y,
                                       border, filt))

    def grid64_head_ok(self, in_spec, out_spec):
        """GRID64 head: exactly-4x/4x bilinear 4:2:0 upscale — the
        mod-8 output grid makes every luma tap a quarter-phase 2-tap
        stencil over the quad-provisioned col/row parity planes and
        every chroma tap an eighth-phase 2-tap stencil off the half-res
        planes (convert.can_grid64, round 5 — the round-3f mod-8 gap).
        RGB outputs feed grid8 boundaries/packed32g8 edges; 4:2:0
        outputs (the format-preserving default fixation, e.g. NV12
        540p -> NV12 4K) emit the packed420g8 sink edge directly."""
        from tpuvf.core.formats import VideoFormat as _VF

        scale_x, scale_y, border, filt = self._split_geometry(
            in_spec, out_spec)
        return ((out_spec.format in RGB_FORMATS
                 or out_spec.format in (_VF.NV12, _VF.I420))
                and convert.can_grid64(in_spec, out_spec.width,
                                       out_spec.height, scale_x, scale_y,
                                       border, filt))

    def grid36_head_ok(self, in_spec, out_spec):
        """GRID36 head: exactly-3x/3x bilinear 4:2:0 upscale (720p ->
        4K) — stencils derived from (and plan-time gated on) the dense
        sampler's own per-geometry f32 weights (convert.can_grid36,
        round 5).  RGB outputs feed grid6 boundaries/packed32g6 edges;
        4:2:0 outputs (the format-preserving default fixation, e.g.
        NV12 720p -> NV12 4K) emit the packed420g6 sink edge directly."""
        from tpuvf.core.formats import VideoFormat as _VF

        scale_x, scale_y, border, filt = self._split_geometry(
            in_spec, out_spec)
        return ((out_spec.format in RGB_FORMATS
                 or out_spec.format in (_VF.NV12, _VF.I420))
                and convert.can_grid36(in_spec, out_spec.width,
                                       out_spec.height, scale_x, scale_y,
                                       border, filt))

    def grid9_head_ok(self, in_spec, out_spec):
        """GRID9 head: exactly-1.5x/1.5x bilinear 4:2:0->RGB upscale
        (720p -> 1080p, the most common HD upscale) — the grid36
        stencil machinery at period 3 (convert.can_grid9, round 5).
        RGB outputs only: a 1.5x 4:2:0 chroma output would need
        column-parity reads of the half-res planes (lane-strided)."""
        scale_x, scale_y, border, filt = self._split_geometry(
            in_spec, out_spec)
        return (out_spec.format in RGB_FORMATS
                and convert.can_grid9(in_spec, out_spec.width,
                                      out_spec.height, scale_x, scale_y,
                                      border, filt))

    def make_process(self, in_spec: FrameSpec, out_spec: FrameSpec, static):
        return self.make_process_linked(in_spec, out_spec, static)

    def sp_row_shardable(self, in_spec, out_spec):
        """Row-shardable at ANY geometry and EVERY format: identity and
        2x row paths are row-local / halo-aware (spctx.pad_rows_edge),
        dense resampling matmuls gather their frame-global row operand
        over ICI then compute only this shard's output rows
        (convert.plan_axis_sampler / sample.apply_separable), and
        letterbox border masks slice per shard.  Packed 4:2:2 is
        row-structured on device: macro-pixels live only at the HOST edge
        (core.frame unpack_422/pack_422) — device planes are planar with
        FULL-height chroma, the nearest decode samples them per row, and
        the 4:2:2 output pack is a horizontal pair average
        (convert._pack_yuv_channels).  QUAD/GRID-linked builds shard too
        (round 4): a phase-plane row shard is a contiguous frame band,
        the chroma/luma row stencils (_shift_edge, _grid2x_rows,
        _grid4x_phase) exchange spctx halos with frame-global cross-phase
        edge clamps, and Pipeline._validate_sp aligns shard boundaries
        to the phase granularity (falls back to column-split links when
        phase rows don't divide)."""
        return True

    def split_input_ok(self, in_spec, out_spec):
        """Consume pre-split planes: 4:2:0 or packed 4:2:2 at identity
        (the fast paths), or any split-capable input at scaled geometry
        (the phase-matrix sampler contracts one tap per input phase —
        <= 1 ulp from canonical; knife-edge pixels may flip 1 LSB)."""
        return ((self._split_identity_ok(in_spec, out_spec)
                 and in_spec.format not in RGB_FORMATS)
                or (self._split_scaled_ok(in_spec, out_spec)
                    and in_spec.width % 2 == 0))

    def make_process_linked(self, in_spec: FrameSpec, out_spec: FrameSpec,
                            static, in_split: bool = False,
                            out_mode: str = "full"):
        if out_mode in ("grid", "packed32g", "packed420g"):
            # sp opt-out rides the quad flag: grid phases aren't row shards
            self._linked_quad = True
            return self._make_process_grid(in_spec, out_spec, static,
                                           out_mode)
        if out_mode in ("grid8", "packed32g8", "packed420g8"):
            self._linked_quad = True
            return self._make_process_grid64(in_spec, out_spec, static,
                                             out_mode)
        if out_mode in ("grid6", "packed32g6", "packed420g6"):
            self._linked_quad = True
            return self._make_process_grid36(in_spec, out_spec, static,
                                             out_mode)
        if out_mode in ("grid3", "packed32g3"):
            self._linked_quad = True
            return self._make_process_grid9(in_spec, out_spec, static,
                                            out_mode)
        quad = (in_split == "quad"
                or out_mode in ("quad", "packed32q", "packed16q"))
        self._linked_quad = quad
        if quad:
            return self._make_process_quad(in_spec, out_spec, static,
                                           out_mode)
        if in_split and not self.split_input_ok(in_spec, out_spec):
            raise NotImplementedError(
                "convertscale consumes split input only on the 4:2:0 "
                "identity fast path")
        cfg = dict(static)
        method = cfg["method"]
        add_borders = cfg["add-borders"]
        border_argb = cfg["border-color"]
        filt = NEAREST if method == METHOD_NEAREST else LINEAR
        scale_x = scale_y = 1.0
        border = None
        if add_borders:
            scale_x, scale_y = letterbox_scales(
                in_spec.width, in_spec.height, out_spec.width, out_spec.height
            )
            if scale_x != 1.0 or scale_y != 1.0:
                border = argb_to_rgba_floats(border_argb)
        matrix_in = in_spec.matrix_index
        matrix_out = out_spec.matrix_index
        from tpuvf.kernels.sample import WeightBuffers

        bufs = WeightBuffers(self.name)
        from tpuvf.core.formats import VideoFormat as _VF

        ident_split = (
            convert.can_split_420(in_spec, out_spec.width, out_spec.height,
                                  scale_x, scale_y, border)
            or convert.can_split_422(in_spec, out_spec.width,
                                     out_spec.height, scale_x, scale_y,
                                     border))
        if (ident_split and out_spec.format in (_VF.NV12, _VF.I420)
                and out_spec.height % 2):
            ident_split = False  # 4:2:0 pack needs row pairs
        if ident_split:
            # even/odd column-phase dataflow: no f32 lane interleave (the 2x
            # chroma upsample happens per phase for 4:2:0; 4:2:2 chroma is
            # a per-phase passthrough); bit-exact, ~1.34x at 4K
            split_sampler = convert.plan_rgba_sampler_split(
                in_spec, filter=filt, matrix_index=matrix_in,
                presplit=in_split)
            self._buffers = bufs.buffers
            pack_mode = {"full": "interleave", "split": "split",
                         "packed16": "packed16",
                         "packed32": "packed32"}[out_mode]

            def process_split(planes, state, params):
                ch_e, ch_o = split_sampler(planes, params)
                out = convert.pack_rgba_split(
                    ch_e, ch_o, out_spec.format, matrix_out, mode=pack_mode)
                return out, state

            return process_split
        if ((in_split or out_mode != "full")
                and self._split_scaled_ok(in_spec, out_spec)
                and (not in_split or in_spec.width % 2 == 0)):
            # scaled column-phase path: output phases are row-slices of
            # the dense sampling matrices (<= 1 LSB from canonical);
            # elected only when a boundary is split (canonical is the
            # cheapest full/full form — no phase interleave at the edge)
            split_sampler = convert.plan_rgba_sampler_split_scaled(
                in_spec, out_spec.width, out_spec.height, bufs,
                filter=filt, scale_x=scale_x, scale_y=scale_y,
                border=border, matrix_index=matrix_in, presplit=in_split)
            self._buffers = bufs.buffers
            pack_mode = {"full": "interleave", "split": "split",
                         "packed16": "packed16",
                         "packed32": "packed32"}[out_mode]

            def process_split_scaled(planes, state, params):
                ch_e, ch_o = split_sampler(planes, params)
                out = convert.pack_rgba_split(
                    ch_e, ch_o, out_spec.format, matrix_out, mode=pack_mode)
                return out, state

            return process_split_scaled
        if out_mode != "full":
            raise NotImplementedError(
                "split/packed16 output requires a split-capable geometry "
                "(4:2:0 identity or the scaled phase-matrix path)")

        sampler = convert.plan_rgba_sampler(
            in_spec, out_spec.width, out_spec.height, bufs,
            filter=filt, scale_x=scale_x, scale_y=scale_y,
            border=border, matrix_index=matrix_in,
        )
        self._buffers = bufs.buffers

        def process(planes, state, params):
            chans = sampler.tuple(planes, params)
            # pack_rgba_t applies the RGBA8 render-target quantization
            return convert.pack_rgba_t(chans, out_spec.format, matrix_out), state

        return process

    def _make_process_grid(self, in_spec, out_spec, static, out_mode):
        """GRID16 head: quad-provisioned 4:2:0 source planes in, sixteen
        (row mod 4, col mod 4) output phases out — the 2x luma and 4x
        chroma bilinear taps are phase-fixed 2-tap stencils that fuse
        into the per-phase emits (convert.plan_rgba_sampler_grid16)."""
        cfg = dict(static)
        filt = NEAREST if cfg["method"] == METHOD_NEAREST else LINEAR
        if not self.grid_head_ok(in_spec, out_spec):
            raise NotImplementedError(
                "convertscale grid16 links require the exactly-2x bilinear "
                "4:2:0 upscale geometry")
        matrix_in = in_spec.matrix_index
        sampler_g = convert.plan_rgba_sampler_grid16(
            in_spec, filter=filt, matrix_index=matrix_in)
        matrix_out = out_spec.matrix_index
        self._buffers = {}

        if out_mode == "packed420g":
            def process_grid_420(planes, state, params):
                chg = sampler_g(planes, params)
                out = convert.pack_420_grid16(
                    chg, out_spec.format, matrix_out, unit_range=True)
                return out, state

            return process_grid_420

        def process_grid(planes, state, params):
            chg = sampler_g(planes, params)
            out = convert.pack_rgba_grid16(
                chg, out_spec.format, matrix_out, mode=out_mode,
                unit_range=True)
            return out, state

        return process_grid

    def _make_process_grid64(self, in_spec, out_spec, static, out_mode):
        """GRID64 head: quad-provisioned 4:2:0 source planes in,
        sixty-four (row mod 8, col mod 8) output phases out — the 4x
        luma and 8x chroma bilinear taps are phase-fixed 2-tap stencils
        that fuse into the per-phase emits
        (convert.plan_rgba_sampler_grid64, round 5)."""
        cfg = dict(static)
        filt = NEAREST if cfg["method"] == METHOD_NEAREST else LINEAR
        if not self.grid64_head_ok(in_spec, out_spec):
            raise NotImplementedError(
                "convertscale grid64 links require the exactly-4x "
                "bilinear 4:2:0->RGB upscale geometry")
        sampler_g = convert.plan_rgba_sampler_grid64(
            in_spec, filter=filt, matrix_index=in_spec.matrix_index)
        matrix_out = out_spec.matrix_index
        self._buffers = {}

        if out_mode == "packed420g8":
            def process_grid64_420(planes, state, params):
                chg = sampler_g(planes, params)
                out = convert.pack_420_grid64(
                    chg, out_spec.format, matrix_out, unit_range=True)
                return out, state

            return process_grid64_420

        def process_grid64(planes, state, params):
            chg = sampler_g(planes, params)
            out = convert.pack_rgba_grid64(
                chg, out_spec.format, matrix_out, mode=out_mode,
                unit_range=True)
            return out, state

        return process_grid64

    def _make_process_grid36(self, in_spec, out_spec, static, out_mode):
        """GRID36 head: quad-provisioned 4:2:0 source planes in,
        thirty-six (row mod 6, col mod 6) output phases out — stencil
        weights derived from the dense sampler's own f32 weights at
        this geometry (convert.plan_rgba_sampler_grid36, round 5)."""
        cfg = dict(static)
        filt = NEAREST if cfg["method"] == METHOD_NEAREST else LINEAR
        if not self.grid36_head_ok(in_spec, out_spec):
            raise NotImplementedError(
                "convertscale grid36 links require the exactly-3x "
                "bilinear 4:2:0->RGB upscale geometry")
        sampler_g = convert.plan_rgba_sampler_grid36(
            in_spec, filter=filt, matrix_index=in_spec.matrix_index)
        matrix_out = out_spec.matrix_index
        self._buffers = {}

        if out_mode == "packed420g6":
            def process_grid36_420(planes, state, params):
                chg = sampler_g(planes, params)
                out = convert.pack_420_grid36(
                    chg, out_spec.format, matrix_out, unit_range=True)
                return out, state

            return process_grid36_420

        def process_grid36(planes, state, params):
            chg = sampler_g(planes, params)
            out = convert.pack_rgba_grid36(
                chg, out_spec.format, matrix_out, mode=out_mode,
                unit_range=True)
            return out, state

        return process_grid36

    def _make_process_grid9(self, in_spec, out_spec, static, out_mode):
        """GRID9 head: quad-provisioned 4:2:0 source planes in, nine
        (row mod 3, col mod 3) output phases out — the grid36 stencil
        machinery at period 3 for the exactly-1.5x geometry (720p ->
        1080p; convert.plan_rgba_sampler_grid9, round 5)."""
        cfg = dict(static)
        filt = NEAREST if cfg["method"] == METHOD_NEAREST else LINEAR
        if not self.grid9_head_ok(in_spec, out_spec):
            raise NotImplementedError(
                "convertscale grid9 links require the exactly-1.5x "
                "bilinear 4:2:0->RGB upscale geometry")
        sampler_g = convert.plan_rgba_sampler_grid9(
            in_spec, filter=filt, matrix_index=in_spec.matrix_index)
        matrix_out = out_spec.matrix_index
        self._buffers = {}

        def process_grid9(planes, state, params):
            chg = sampler_g(planes, params)
            out = convert.pack_rgba_grid9(
                chg, out_spec.format, matrix_out, mode=out_mode,
                unit_range=True)
            return out, state

        return process_grid9

    def _make_process_quad(self, in_spec, out_spec, static, out_mode):
        """QUAD (row x col phase) path: 4:2:0 identity geometry, inputs
        always quad-provisioned ({"y_ee",...,"u","v"} — u8 from the host
        upload or f32 quant_sim from a quad boundary).  yuv_to_rgb clamps
        its output, so the RGB-format quantize elides its redundant clip
        (unit_range, bit-identical)."""
        if not self.quad_output_ok(in_spec, out_spec):
            raise NotImplementedError(
                "convertscale quad links require the 4:2:0 identity fast "
                "path with a non-packed output")
        cfg = dict(static)
        filt = NEAREST if cfg["method"] == METHOD_NEAREST else LINEAR
        matrix_in = in_spec.matrix_index
        matrix_out = out_spec.matrix_index
        sampler_q = convert.plan_rgba_sampler_quad(
            in_spec, filter=filt, matrix_index=matrix_in)
        self._buffers = {}

        def process_quad(planes, state, params):
            chq = sampler_q(planes, params)
            out = convert.pack_rgba_quad(
                chq, out_spec.format, matrix_out, mode=out_mode,
                unit_range=True)
            return out, state

        return process_quad
