"""vfvideofilter — 15-property single-dispatch effect chain.

Rebuild of vfmetalvideofilter (/root/reference/src/videofilter/):
- formats BGRA, RGBA, NV12, I420 (gstvfmetalvideofilter.m:53)
- 15 properties with the reference ranges/defaults (m:67-101, 435-533);
  the 10 color/effect props are controllable => traced scalars here (no
  recompile on change)
- passthrough iff every property is at its default, FLOAT_EQ eps 1e-6
  (m:114-138)
- per-frame monotonically increasing frameIndex drives the grain hash
  (m:183-205); carried as explicit scan state
- GPU phases (metalvideofilterrenderer.m:523-695) reproduced with their
  RGBA8 quantization boundaries: (1) fused adjustment render pass (+LUT),
  (2) separable blur + unsharp iff |sharpness| > 0.001, (3) YUV output.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from tpuvf.core.element import Element
from tpuvf.core.formats import CORE_FORMATS
from tpuvf.core.properties import PropertyDescriptor
from tpuvf.core.registry import register
from tpuvf.core.spec import FrameSpec
from tpuvf.io import lut as lutio
from tpuvf.kernels import convert, filter as kfilter
from tpuvf.kernels.color import dequant, quant

import logging

_log = logging.getLogger("tpuvf.videofilter")


@register
class VideoFilter(Element):
    ELEMENT_NAME = "vfvideofilter"
    ALIASES = ("vfmetalvideofilter", "videofilter")
    KLASS = "Filter/Effect/Video"
    DESCRIPTION = "Color adjustment, effects, chroma key and 3D LUT in one pass"
    IN_FORMATS = CORE_FORMATS
    OUT_FORMATS = CORE_FORMATS
    PROPERTIES = (
        PropertyDescriptor("brightness", "float", 0.0, "Brightness adjustment",
                           -1.0, 1.0, controllable=True, traced=True),
        PropertyDescriptor("contrast", "float", 1.0, "Contrast adjustment",
                           0.0, 2.0, controllable=True, traced=True),
        PropertyDescriptor("saturation", "float", 1.0, "Saturation adjustment",
                           0.0, 2.0, controllable=True, traced=True),
        PropertyDescriptor("hue", "float", 0.0, "Hue rotation",
                           -1.0, 1.0, controllable=True, traced=True),
        PropertyDescriptor("gamma", "float", 1.0, "Gamma correction",
                           0.01, 10.0, controllable=True, traced=True),
        PropertyDescriptor("sharpness", "float", 0.0,
                           "Sharpness (<0 blur, >0 sharpen)",
                           -1.0, 1.0, controllable=True, traced=True),
        PropertyDescriptor("sepia", "float", 0.0, "Sepia tone amount",
                           0.0, 1.0, controllable=True, traced=True),
        PropertyDescriptor("invert", "bool", False, "Invert colors",
                           controllable=True, traced=True),
        PropertyDescriptor("noise", "float", 0.0, "Film grain amount",
                           0.0, 1.0, controllable=True, traced=True),
        PropertyDescriptor("vignette", "float", 0.0, "Vignette amount",
                           0.0, 1.0, controllable=True, traced=True),
        PropertyDescriptor("chroma-key-enabled", "bool", False,
                           "Enable chroma keying", traced=True),
        PropertyDescriptor("chroma-key-color", "color", 0xFF00FF00,
                           "Chroma key color (ARGB)", traced=True),
        PropertyDescriptor("chroma-key-tolerance", "float", 0.2,
                           "Chroma key tolerance", 0.0, 1.0, traced=True),
        PropertyDescriptor("chroma-key-smoothness", "float", 0.1,
                           "Chroma key edge smoothness", 0.0, 1.0, traced=True),
        PropertyDescriptor("lut-file", "string", None,
                           "Path to 3D LUT (.cube or .png)"),
    )

    def __init__(self, *a, **k):
        self._lut = None
        self._lut_path_loaded = None
        super().__init__(*a, **k)

    # -- LUT lifecycle (load on property write, soft-fail keeps passthrough,
    #    gstvfmetalvideofilter.m:281-294) --------------------------------

    def set_property(self, name, value):
        super().set_property(name, value)
        if name == "lut-file":
            self._reload_lut()

    def _reload_lut(self):
        path = self.props.get("lut-file")
        if not path:
            self._lut = None
            self._lut_path_loaded = None
            return
        try:
            table = lutio.load(path)
        except Exception as exc:
            _log.warning("failed to load LUT %s: %s", path, exc)
            self._lut = None
            self._lut_path_loaded = None
            return
        # corner-packed (S^3, 24); the gather's (n, 24) output costs a
        # transpose copy whose bandwidth scales with the table dtype (the
        # device trace showed 0.84 ms/frame of copies at bf16), so in-range
        # tables store as UINT8 fixed point — max corner error 0.5/255
        # (~0.46 LSB measured on random tables), within the 2-LSB parity
        # tolerance, and the config-3 frame drops 4.56 -> 4.0-4.4 ms
        # (219 -> 227-251 fps).  Out-of-range .cube values (legal: the
        # reference stores raw floats in an RGBA32Float texture) keep f32,
        # as does every table when TPUVF_LUT_F32=1 — the exact-parity knob
        # matching the reference's RGBA32Float storage bit-for-bit.
        import os

        exact = os.environ.get("TPUVF_LUT_F32", "") not in ("", "0")
        dtype = (np.uint8 if not exact
                 and table.min() >= 0.0 and table.max() <= 1.0
                 else np.float32)
        self._lut = kfilter.pack_lut_corners(table, dtype=dtype)
        self._lut_size = table.shape[0]
        self._lut_path_loaded = path

    def _sync_lut(self):
        if self.props.get("lut-file") != self._lut_path_loaded:
            self._reload_lut()

    # -- passthrough (m:114-138): every prop at default AND no LUT loaded --

    def is_passthrough(self, in_spec, out_spec):
        self._sync_lut()
        if in_spec.format != out_spec.format:
            return False
        return self.props.at_defaults() and self._lut is None

    def static_config(self, in_spec, out_spec):
        self._sync_lut()
        sharp = self.props.get("sharpness")
        g = self.props
        # static effect gates: a disabled effect is omitted from the program
        # (identical output; toggling recompiles via the executable cache)
        gates = (
            ("hue", abs(g.get("hue") * np.pi) > 0.001),
            ("gamma", g.get("gamma") != 1.0),
            ("sepia", g.get("sepia") > 0.001),
            ("invert", bool(g.get("invert"))),
            ("chroma_key", bool(g.get("chroma-key-enabled"))),
            ("vignette", g.get("vignette") > 0.001),
            ("noise", g.get("noise") > 0.001),
        )
        return (
            ("use_sharpness", abs(sharp) > 0.001),
            ("lut_size", self._lut_size if self._lut is not None else 0),
            ("gates", gates),
        )

    def traced_params(self):
        self._sync_lut()
        ck = self.props.get("chroma-key-color")
        p = {
            "brightness": np.float32(self.props.get("brightness")),
            "contrast": np.float32(self.props.get("contrast")),
            "saturation": np.float32(self.props.get("saturation")),
            # hue [-1,1] -> radians [-pi,pi] (m:189)
            "hue": np.float32(self.props.get("hue") * np.pi),
            "gamma": np.float32(self.props.get("gamma")),
            "sharpness": np.float32(self.props.get("sharpness")),
            "sepia": np.float32(self.props.get("sepia")),
            "invert": np.float32(1.0 if self.props.get("invert") else 0.0),
            "noise": np.float32(self.props.get("noise")),
            "vignette": np.float32(self.props.get("vignette")),
            "chroma_key_enabled": np.float32(
                1.0 if self.props.get("chroma-key-enabled") else 0.0),
            # ARGB -> RGB floats (m:199-201)
            "key_r": np.float32(((ck >> 16) & 0xFF) / 255.0),
            "key_g": np.float32(((ck >> 8) & 0xFF) / 255.0),
            "key_b": np.float32((ck & 0xFF) / 255.0),
            "key_tolerance": np.float32(self.props.get("chroma-key-tolerance")),
            "key_smoothness": np.float32(self.props.get("chroma-key-smoothness")),
        }
        if self._lut is not None:
            p["lut"] = self._lut
        p.update(self._buffers)
        return p

    def init_state(self, in_spec, out_spec):
        # frame counter for grain animation; reset on stop (m:372-381)
        return {"frame_index": np.uint32(0)}

    # -- column-phase link capabilities (core.element docs) -----------------

    def _phase_capable(self, in_spec, out_spec) -> bool:
        """The phase-wise path applies whenever the format keeps columns
        phase-separable; the horizontal blur decomposes into phase-local
        stencils (kfilter.blur9_h_split, bit-exact incl. the cross-phase
        edge clamps), so sharpness no longer forces the interleaved path."""
        if out_spec.format != in_spec.format:
            return False
        from tpuvf.core.formats import RGB_FORMATS

        if in_spec.format in RGB_FORMATS:
            return in_spec.width % 2 == 0
        return convert.can_split_420(
            in_spec, in_spec.width, in_spec.height, 1.0, 1.0, None)

    def split_input_ok(self, in_spec, out_spec):
        return self._phase_capable(in_spec, out_spec)

    def split_output_ok(self, in_spec, out_spec):
        return self._phase_capable(in_spec, out_spec)

    def edge_packed32_ok(self, in_spec=None, out_spec=None) -> bool:
        """RGB sink edges emit u32 pixel words (one fusion; the
        per-channel u16 emit split into two fusions with six f32 4K
        intermediates — kernels.convert.pack_words_u32)."""
        return True

    def dp_shard_safe(self, in_spec, out_spec):
        """The frame counter feeds only the grain hash (m:183-205): with
        noise disabled the output is frame-index-independent and a single
        stream may batch-split across dp shards."""
        return self.props.get("noise") <= 0.001

    def sp_row_shardable(self, in_spec, out_spec):
        """Every stage is row-local or halo-aware: the adjust chain is
        elementwise with global-row coordinate fields (vignette, grain),
        the LUT gather is per-pixel, the blur's 4-row vertical reach and
        the 4:2:0 chroma row-upsample go through spctx.pad_rows_edge.
        QUAD/GRID-linked builds shard too (round 4): a row shard of the
        phase planes is a contiguous frame band, y_index rides
        spctx.global_rows, and blur9_v_split / blur9_grid4 exchange
        halos with frame-global edge clamps; the Pipeline gate aligns
        shard boundaries to the phase granularity."""
        from tpuvf.core.formats import RGB_FORMATS

        if getattr(self, "_linked_quad", False):
            return True
        return (in_spec.format in RGB_FORMATS
                or self._phase_capable(in_spec, out_spec))

    def _quad_capable(self, in_spec, out_spec) -> bool:
        """QUAD (row x col phase) dataflow: phase-capable formats with even
        height and no LUT (the per-phase gather would split the two
        measured-optimal gather sites into four).  Sharpness is fine: the
        9-tap blur decomposes per axis into cross-phase phase-local
        stencils (kfilter.blur9_h_split per row phase, blur9_v_split per
        column phase — both bit-exact incl. the cross-phase edge clamps).
        Vignette/grain are fine: their row coordinates ride y_index."""
        if not self._phase_capable(in_spec, out_spec):
            return False
        if in_spec.height % 2:
            return False
        return self._lut is None

    def quad_input_ok(self, in_spec, out_spec):
        return self._quad_capable(in_spec, out_spec)

    def quad_output_ok(self, in_spec, out_spec):
        return self._quad_capable(in_spec, out_spec)

    def _grid_capable(self, in_spec, out_spec) -> bool:
        """GRID16 (4x4 phase) dataflow: RGB or 4:2:0 planes from a
        grid16 upscale head (RGB boundaries carry {"r_00",...}; 4:2:0
        boundaries the grid420 layout — per-phase luma + 2x2-phase
        chroma, re-upsampled by plan_rgba_sampler_grid420), dims
        divisible by 4, no LUT (the per-phase gather would split the two
        measured-optimal gather sites into sixteen).  Sharpness is fine:
        the 9-tap blur decomposes per axis into mod-4 cross-phase
        stencils (kfilter.blur9_grid4, expression-exact incl. the
        cross-phase edge clamps).  Vignette/grain ride x_index/y_index
        at stride 4."""
        from tpuvf.core.formats import RGB_FORMATS, VideoFormat

        self._sync_lut()
        return ((in_spec.format in RGB_FORMATS
                 or in_spec.format in (VideoFormat.NV12, VideoFormat.I420))
                and out_spec.format == in_spec.format
                and in_spec.width % 4 == 0 and in_spec.height % 4 == 0
                and self._lut is None)

    def grid_input_ok(self, in_spec, out_spec):
        return self._grid_capable(in_spec, out_spec)

    def grid_output_ok(self, in_spec, out_spec):
        return self._grid_capable(in_spec, out_spec)

    def _grid64_capable(self, in_spec, out_spec) -> bool:
        """GRID64 (8x8 phase) dataflow from a grid64 4x-upscale head
        (RGB boundaries {"r_00",...,"a_77"}), dims divisible by 8, no
        LUT (same gather-site rule as grid16).  Sharpness is fine: the
        9-tap blur decomposes into mod-8 cross-phase stencils
        (kfilter.blur9_gridk period=8, expression-exact incl. the
        cross-phase edge clamps).  The pointwise chain rides
        x_index/y_index at stride 8."""
        from tpuvf.core.formats import RGB_FORMATS

        self._sync_lut()
        return (in_spec.format in RGB_FORMATS
                and out_spec.format == in_spec.format
                and in_spec.width % 8 == 0 and in_spec.height % 8 == 0
                and self._lut is None)

    def grid64_input_ok(self, in_spec, out_spec):
        return self._grid64_capable(in_spec, out_spec)

    def grid64_output_ok(self, in_spec, out_spec):
        return self._grid64_capable(in_spec, out_spec)

    def _grid36_capable(self, in_spec, out_spec) -> bool:
        """GRID36 (6x6 phase) dataflow from a grid36 3x-upscale head
        (RGB boundaries {"r_00",...,"a_55"}), dims divisible by 6, no
        LUT (the gather-site rule); sharpness rides blur9_gridk
        period=6.  Same structure as grid64 at stride 6."""
        from tpuvf.core.formats import RGB_FORMATS

        self._sync_lut()
        return (in_spec.format in RGB_FORMATS
                and out_spec.format == in_spec.format
                and in_spec.width % 6 == 0 and in_spec.height % 6 == 0
                and self._lut is None)

    def grid36_input_ok(self, in_spec, out_spec):
        return self._grid36_capable(in_spec, out_spec)

    def grid36_output_ok(self, in_spec, out_spec):
        return self._grid36_capable(in_spec, out_spec)

    def _grid9_capable(self, in_spec, out_spec) -> bool:
        """GRID9 (3x3 phase) dataflow from a grid9 1.5x-upscale head
        (RGB boundaries {"r_00",...,"a_22"}), dims divisible by 3, no
        LUT (the gather-site rule); sharpness rides blur9_gridk
        period=3.  Same structure as grid36 at stride 3."""
        from tpuvf.core.formats import RGB_FORMATS

        self._sync_lut()
        return (in_spec.format in RGB_FORMATS
                and out_spec.format == in_spec.format
                and in_spec.width % 3 == 0 and in_spec.height % 3 == 0
                and self._lut is None)

    def grid9_input_ok(self, in_spec, out_spec):
        return self._grid9_capable(in_spec, out_spec)

    def grid9_output_ok(self, in_spec, out_spec):
        return self._grid9_capable(in_spec, out_spec)

    def make_process(self, in_spec: FrameSpec, out_spec: FrameSpec, static):
        return self.make_process_linked(in_spec, out_spec, static)

    def make_process_linked(self, in_spec: FrameSpec, out_spec: FrameSpec,
                            static, in_split: bool = False,
                            out_mode: str = "full"):
        cfg = dict(static)
        use_sharpness = cfg["use_sharpness"]
        lut_size = cfg["lut_size"]
        gates = dict(cfg["gates"])
        w, h = in_spec.width, in_spec.height
        matrix_in = in_spec.matrix_index
        matrix_out = out_spec.matrix_index
        from tpuvf.core.formats import RGB_FORMATS
        from tpuvf.kernels.sample import WeightBuffers

        bufs = WeightBuffers(self.name)
        grid8 = (in_split == "grid8" or out_mode in ("grid8", "packed32g8"))
        grid6 = (in_split == "grid6" or out_mode in ("grid6", "packed32g6"))
        grid3 = (in_split == "grid3" or out_mode in ("grid3", "packed32g3"))
        grid = grid8 or grid6 or grid3 or (
            in_split == "grid"
            or out_mode in ("grid", "packed32g", "packed420g"))
        if grid:
            # phases per axis
            gp = 8 if grid8 else (6 if grid6 else (3 if grid3 else 4))
            if grid8:
                if not self._grid64_capable(in_spec, out_spec):
                    raise NotImplementedError(
                        "videofilter grid64 links require RGB planes with "
                        "mod-8 dims, no LUT and no sharpness")
            elif grid6:
                if not self._grid36_capable(in_spec, out_spec):
                    raise NotImplementedError(
                        "videofilter grid36 links require RGB planes with "
                        "mod-6 dims and no LUT")
            elif grid3:
                if not self._grid9_capable(in_spec, out_spec):
                    raise NotImplementedError(
                        "videofilter grid9 links require RGB planes with "
                        "mod-3 dims and no LUT")
            elif not self._grid_capable(in_spec, out_spec):
                raise NotImplementedError(
                    "videofilter grid16 links require phase-capable "
                    "planes with mod-4 dims and no LUT")
            # sp opt-out rides the quad flag: grid phases aren't row shards
            self._linked_quad = True
            self._buffers = bufs.buffers
            if grid8:
                reader_g = convert.split_rgb_chans_grid64
            elif grid6:
                reader_g = convert.split_rgb_chans_grid36
            elif grid3:
                reader_g = convert.split_rgb_chans_grid9
            elif in_spec.format in RGB_FORMATS:
                reader_g = lambda planes: \
                    convert.split_rgb_chans_grid16(planes)
            else:
                reader420 = convert.plan_rgba_sampler_grid420(matrix_in)
                reader_g = lambda planes: reader420(planes, {})
            x_base = np.arange(w // gp, dtype=np.float32) * float(gp)

            def process_grid(planes, state, params):
                from tpuvf.parallel import spctx

                chg = reader_g(planes)
                frame_index = state["frame_index"]
                outg = {}
                for ph, ch in chg.items():
                    # GLOBAL frame rows of this phase's plane rows: gp x
                    # the global phase row + the row-phase offset (sp-
                    # aware — plain arange on one device, bitwise the old
                    # y_base)
                    y_idx = (spctx.global_rows(ch[0].shape[-2], h // gp)
                             * np.float32(float(gp))
                             + np.float32(float(ph[0])))
                    outg[ph] = kfilter.apply_color_adjustments_t(
                        ch, params, frame_index, w, h, gates=gates,
                        x_index=x_base + float(ph[1]),
                        y_index=y_idx)
                if use_sharpness:
                    # RGBA8 boundaries between the blur passes, per grid
                    # phase (the reference renders each pass to an RGBA8
                    # texture); H blur crosses the gp COLUMN phases per
                    # row phase, V blur the gp ROW phases per column
                    # phase (kfilter.blur9_gridk, expression-exact incl.
                    # cross-phase edge clamps)
                    q1 = {ph: tuple(quant(c) for c in outg[ph])
                          for ph in outg}
                    bh = {}
                    for qq in range(gp):
                        per_chan = [kfilter.blur9_gridk(
                            [dequant(q1[f"{qq}{p}"][c]) for p in range(gp)],
                            -1, gp) for c in range(4)]
                        for p in range(gp):
                            bh[f"{qq}{p}"] = tuple(
                                quant(per_chan[c][p]) for c in range(4))
                    bv = {}
                    for p in range(gp):
                        per_chan = [kfilter.blur9_gridk(
                            [dequant(bh[f"{qq}{p}"][c]) for qq in range(gp)],
                            -2, gp) for c in range(4)]
                        for qq in range(gp):
                            bv[f"{qq}{p}"] = tuple(
                                quant(per_chan[c][qq]) for c in range(4))
                    amount = params["sharpness"]

                    def unsharp_phase(orig_q, blur_q):
                        res = []
                        for c in range(3):
                            o = dequant(orig_q[c])
                            bl = dequant(blur_q[c])
                            sharp = jnp.clip(o + (o - bl) * amount,
                                             0.0, 1.0)
                            mixed = o + (bl - o) * jnp.abs(amount)
                            res.append(jnp.where(amount > 0, sharp, mixed))
                        res.append(dequant(orig_q[3]))  # alpha preserved
                        return tuple(res)

                    outg = {ph: unsharp_phase(q1[ph], bv[ph])
                            for ph in q1}
                # the adjust chain output is [0,1]-bounded (its tail clip,
                # elided or not) -> the pack quantize skips its clip;
                # the unsharp output is clipped/convex-mixed in [0,1] too
                if out_mode == "packed420g":
                    out = convert.pack_420_grid16(
                        outg, out_spec.format, matrix_out,
                        unit_range=True)
                elif grid8:
                    out = convert.pack_rgba_grid64(
                        outg, out_spec.format, matrix_out, mode=out_mode,
                        unit_range=True)
                elif grid6:
                    out = convert.pack_rgba_grid36(
                        outg, out_spec.format, matrix_out, mode=out_mode,
                        unit_range=True)
                elif grid3:
                    out = convert.pack_rgba_grid9(
                        outg, out_spec.format, matrix_out, mode=out_mode,
                        unit_range=True)
                else:
                    out = convert.pack_rgba_grid16(
                        outg, out_spec.format, matrix_out, mode=out_mode,
                        unit_range=True)
                new_state = {
                    "frame_index":
                        (state["frame_index"]
                         + np.uint32(1)).astype(jnp.uint32)
                }
                return out, new_state

            return process_grid
        quad = (in_split == "quad"
                or out_mode in ("quad", "packed32q", "packed16q"))
        self._linked_quad = quad
        if quad:
            if not self._quad_capable(in_spec, out_spec):
                raise NotImplementedError(
                    "videofilter quad links require a phase-capable format "
                    "with even height and no LUT")
            if in_spec.format in RGB_FORMATS:
                reader_q = lambda planes, params: \
                    convert.split_rgb_chans_quad(planes)
            else:
                reader_q = convert.plan_rgba_sampler_quad(
                    in_spec, matrix_index=matrix_in)
            self._buffers = bufs.buffers
            x_base = np.arange(w // 2, dtype=np.float32) * 2.0

            def process_quad(planes, state, params):
                from tpuvf.parallel import spctx

                chq = reader_q(planes, params)
                frame_index = state["frame_index"]
                outq = {}
                for ph, ch in chq.items():
                    # GLOBAL frame rows of this phase's plane rows (sp-
                    # aware; bitwise the old static y_base on one device)
                    y_idx = (spctx.global_rows(ch[0].shape[-2], h // 2)
                             * np.float32(2.0)
                             + np.float32(0.0 if ph[0] == "e" else 1.0))
                    outq[ph] = kfilter.apply_color_adjustments_t(
                        ch, params, frame_index, w, h, gates=gates,
                        x_index=x_base + (0.0 if ph[1] == "e" else 1.0),
                        y_index=y_idx)
                if use_sharpness:
                    # RGBA8 boundaries between the blur phases, per quad
                    # phase (the reference renders each pass to an RGBA8
                    # texture); H blur crosses COLUMN phases per row
                    # phase, V blur crosses ROW phases per column phase
                    q1 = {ph: tuple(quant(c) for c in outq[ph])
                          for ph in outq}
                    bh = {}
                    for rp in ("e", "o"):
                        pairs = [kfilter.blur9_h_split(
                            dequant(qe), dequant(qo))
                            for qe, qo in zip(q1[rp + "e"], q1[rp + "o"])]
                        bh[rp + "e"] = tuple(quant(p[0]) for p in pairs)
                        bh[rp + "o"] = tuple(quant(p[1]) for p in pairs)
                    bv = {}
                    for cp in ("e", "o"):
                        pairs = [kfilter.blur9_v_split(
                            dequant(qe), dequant(qo))
                            for qe, qo in zip(bh["e" + cp], bh["o" + cp])]
                        bv["e" + cp] = tuple(quant(p[0]) for p in pairs)
                        bv["o" + cp] = tuple(quant(p[1]) for p in pairs)
                    amount = params["sharpness"]

                    def unsharp_phase(orig_q, blur_q):
                        res = []
                        for c in range(3):
                            o = dequant(orig_q[c])
                            bl = dequant(blur_q[c])
                            sharp = jnp.clip(o + (o - bl) * amount,
                                             0.0, 1.0)
                            mixed = o + (bl - o) * jnp.abs(amount)
                            res.append(jnp.where(amount > 0, sharp, mixed))
                        res.append(dequant(orig_q[3]))  # alpha preserved
                        return tuple(res)

                    outq = {ph: unsharp_phase(q1[ph], bv[ph])
                            for ph in q1}
                # the adjust chain output is [0,1]-bounded (its tail clip,
                # elided or not) -> the pack quantize skips its clip; the
                # unsharp output is clipped/convex-mixed in [0,1] too
                out = convert.pack_rgba_quad(
                    outq, out_spec.format, matrix_out, mode=out_mode,
                    unit_range=True)
                new_state = {
                    "frame_index":
                        (state["frame_index"]
                         + np.uint32(1)).astype(jnp.uint32)
                }
                return out, new_state

            return process_quad
        phase_capable = self._phase_capable(in_spec, out_spec)
        if (in_split or out_mode != "full") and not phase_capable:
            raise NotImplementedError(
                "split/packed16 links require the phase-wise path")
        # even/odd column-phase path: 4:2:0 inputs always take it (the
        # NV12/I420 -> RGBA sample and pack avoid f32 lane interleaves);
        # RGB inputs take it when the link layout asks for phases.
        if phase_capable and (in_split or out_mode != "full"
                              or in_spec.format not in RGB_FORMATS):
            if in_spec.format in RGB_FORMATS:
                if in_split:
                    reader = lambda planes, params: \
                        convert.split_rgb_chans(planes)
                else:
                    def reader(planes, params):
                        x = planes["rgba"]
                        p = x.reshape(x.shape[:-1] + (w // 2, 2))
                        from tpuvf.kernels.color import dequant
                        return (
                            tuple(dequant(p[..., c, :, :, 0]) for c in range(4)),
                            tuple(dequant(p[..., c, :, :, 1]) for c in range(4)),
                        )
            else:
                split_sampler = convert.plan_rgba_sampler_split(
                    in_spec, matrix_index=matrix_in, presplit=in_split)
                reader = split_sampler
            self._buffers = bufs.buffers
            x_even = np.arange(w // 2, dtype=np.float32) * 2.0
            x_odd = x_even + 1.0
            pack_mode = {"full": "interleave", "split": "split",
                         "packed16": "packed16",
                         "packed32": "packed32"}[out_mode]

            def process_split(planes, state, params):
                ch_e, ch_o = reader(planes, params)
                frame_index = state["frame_index"]
                ch_e = kfilter.apply_color_adjustments_t(
                    ch_e, params, frame_index, w, h, gates=gates,
                    x_index=x_even)
                ch_o = kfilter.apply_color_adjustments_t(
                    ch_o, params, frame_index, w, h, gates=gates,
                    x_index=x_odd)
                if lut_size:
                    # per-phase LUT (measured: stacking phases into one
                    # gather site costs more than it saves)
                    ch_e = kfilter.apply_lut_t(ch_e, params["lut"], lut_size)
                    ch_o = kfilter.apply_lut_t(ch_o, params["lut"], lut_size)
                if use_sharpness:
                    # RGBA8 boundaries between the blur phases, per phase
                    # (the reference renders each pass to an RGBA8 texture)
                    q1_e = tuple(quant(c) for c in ch_e)
                    q1_o = tuple(quant(c) for c in ch_o)
                    bh = [kfilter.blur9_h_split(dequant(qe), dequant(qo))
                          for qe, qo in zip(q1_e, q1_o)]
                    bh_e = tuple(quant(b[0]) for b in bh)
                    bh_o = tuple(quant(b[1]) for b in bh)
                    bv_e = tuple(quant(kfilter.blur9(dequant(q), axis=-2))
                                 for q in bh_e)
                    bv_o = tuple(quant(kfilter.blur9(dequant(q), axis=-2))
                                 for q in bh_o)
                    amount = params["sharpness"]

                    def unsharp_phase(orig_q, blur_q):
                        res = []
                        for c in range(3):
                            o = dequant(orig_q[c])
                            bl = dequant(blur_q[c])
                            sharp = jnp.clip(o + (o - bl) * amount, 0.0, 1.0)
                            mixed = o + (bl - o) * jnp.abs(amount)
                            res.append(jnp.where(amount > 0, sharp, mixed))
                        res.append(dequant(orig_q[3]))  # alpha preserved
                        return tuple(res)

                    ch_e = unsharp_phase(q1_e, bv_e)
                    ch_o = unsharp_phase(q1_o, bv_o)
                out = convert.pack_rgba_split(
                    ch_e, ch_o, out_spec.format, matrix_out, mode=pack_mode)
                new_state = {
                    "frame_index":
                        (state["frame_index"] + np.uint32(1)).astype(jnp.uint32)
                }
                return out, new_state

            return process_split

        sampler = convert.plan_rgba_sampler(
            in_spec, w, h, bufs, matrix_index=matrix_in)
        self._buffers = bufs.buffers

        def process(planes, state, params):
            chans = sampler.tuple(planes, params)
            frame_index = state["frame_index"]
            chans = kfilter.apply_color_adjustments_t(
                chans, params, frame_index, w, h, gates=gates
            )
            if lut_size:
                chans = kfilter.apply_lut_t(chans, params["lut"], lut_size)
            if use_sharpness:
                # blur phases run on the stacked RGBA8 texture (the reference
                # blurs all 4 channels of one texture)
                q1 = quant(jnp.stack(chans, axis=-3))
                bh = quant(kfilter.blur9(dequant(q1), axis=-1))
                bv = quant(kfilter.blur9(dequant(bh), axis=-2))
                final_q = quant(
                    kfilter.unsharp_mask(
                        dequant(q1), dequant(bv), params["sharpness"]
                    )
                )
                out = convert.pack_rgba(final_q, out_spec.format, matrix_out)
            else:
                out = convert.pack_rgba_t(chans, out_spec.format, matrix_out)
            new_state = {
                "frame_index": (frame_index + np.uint32(1)).astype(jnp.uint32)
            }
            return out, new_state

        return process
