"""vfoverlay — PNG/JPEG image overlay.

Rebuild of vfmetaloverlay (/root/reference/src/overlay/):
- formats BGRA, RGBA, NV12, I420
- props: location (PNG/JPEG), x/y >= 0 px, width/height (0 = native image
  size), alpha [0,1]=1, relative-x/-y in [-1,1] default -1 — relative >= 0
  overrides absolute, resolved per frame as rel*frameW/rel*frameH
  (gstvfmetaloverlay.m:189-200, 374-420)
- passthrough iff no image loaded; a missing/bad file warns and stays
  passthrough (m:94-99, 114-127)
- blending: video.rgb = mix(video.rgb, overlay.rgb, overlay.a * alpha)
  inside the overlay rect (metaloverlay_shaders.h:79-86); the overlay
  texture is decoded premultiplied (CGBitmapContext, renderer m:218-231)
  and resampled with a linear sampler when stretched.

The rect test uses pixel centers (px = texcoord.x * frameW), so on the TPU
side the inside-mask and the overlay-UV sampling matrices are precomputed
per (frame size, rect) — position changes recompile, which the executable
cache absorbs.
"""

from __future__ import annotations

import logging

import numpy as np
import jax.numpy as jnp

from tpuvf.core.element import Element
from tpuvf.core.formats import CORE_FORMATS
from tpuvf.core.properties import PropertyDescriptor
from tpuvf.core.registry import register
from tpuvf.core.spec import FrameSpec
from tpuvf.io import png
from tpuvf.kernels import convert, sample
from tpuvf.kernels.color import quant

_log = logging.getLogger("tpuvf.overlay")


def load_overlay_image(path: str) -> np.ndarray:
    """-> (H, W, 4) uint8 premultiplied RGBA.  PNG via the built-in codec;
    JPEG via the native decoder when available."""
    with open(path, "rb") as fh:
        data = fh.read()
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return png.decode_premultiplied(data)
    if data[:2] == b"\xff\xd8":
        from tpuvf.native import jpeg as njpeg  # may raise if not built

        rgba = njpeg.decode(data)
        return rgba
    raise ValueError(f"unsupported image format in {path}")


@register
class Overlay(Element):
    ELEMENT_NAME = "vfoverlay"
    ALIASES = ("vfmetaloverlay", "overlay")
    KLASS = "Filter/Effect/Video"
    DESCRIPTION = "Blends a PNG/JPEG image over video"
    IN_FORMATS = CORE_FORMATS
    OUT_FORMATS = CORE_FORMATS
    PROPERTIES = (
        PropertyDescriptor("location", "string", None,
                           "Path to overlay image file (PNG or JPEG)"),
        PropertyDescriptor("x", "int", 0, "Overlay X position in pixels",
                           0, 2**31 - 1),
        PropertyDescriptor("y", "int", 0, "Overlay Y position in pixels",
                           0, 2**31 - 1),
        PropertyDescriptor("width", "int", 0,
                           "Overlay width in pixels (0 = original image width)",
                           0, 2**31 - 1),
        PropertyDescriptor("height", "int", 0,
                           "Overlay height in pixels (0 = original image height)",
                           0, 2**31 - 1),
        PropertyDescriptor("alpha", "float", 1.0, "Overlay opacity",
                           0.0, 1.0, controllable=True, traced=True),
        PropertyDescriptor("relative-x", "float", -1.0,
                           "X as fraction of video width (-1 = use pixel x)",
                           -1.0, 1.0),
        PropertyDescriptor("relative-y", "float", -1.0,
                           "Y as fraction of video height (-1 = use pixel y)",
                           -1.0, 1.0),
    )

    def __init__(self, *a, **k):
        self._image = None
        self._image_path_loaded = None
        super().__init__(*a, **k)

    def set_property(self, name, value):
        super().set_property(name, value)
        if name == "location":
            self._reload_image()

    def _reload_image(self):
        path = self.props.get("location")
        if not path:
            self._image = None
            self._image_path_loaded = None
            return
        try:
            self._image = load_overlay_image(path)
            self._image_path_loaded = path
        except Exception as exc:
            # missing file => warning + stay passthrough (m:114-127)
            _log.warning("failed to load overlay image %s: %s", path, exc)
            self._image = None
            self._image_path_loaded = None

    def _sync_image(self):
        if self.props.get("location") != self._image_path_loaded:
            self._reload_image()

    def is_passthrough(self, in_spec, out_spec):
        self._sync_image()
        return self._image is None or in_spec.format != out_spec.format

    def static_config(self, in_spec, out_spec):
        self._sync_image()
        base = super().static_config(in_spec, out_spec)
        shape = None if self._image is None else self._image.shape[:2]
        return base + (("image_shape", shape),)

    def traced_params(self):
        return {"alpha": np.float32(self.props.get("alpha")), **self._buffers}

    # -- column-phase links (core.element docs) -----------------------------

    def _phase_capable(self, in_spec, out_spec) -> bool:
        """The rect blend is per-pixel, so phases split freely; the overlay
        rect's column parity is static.  Non-RGB formats additionally gate on
        can_split_420 (even height, 4:2:0) like videofilter/deinterlace do —
        the split sampler's chroma row upsample needs even plane heights."""
        from tpuvf.core.formats import RGB_FORMATS

        self._sync_image()
        if self._image is None or in_spec.format != out_spec.format:
            return False
        if in_spec.format in RGB_FORMATS:
            return in_spec.width % 2 == 0
        return convert.can_split_420(
            in_spec, in_spec.width, in_spec.height, 1.0, 1.0, None)

    def split_input_ok(self, in_spec, out_spec):
        return self._phase_capable(in_spec, out_spec)

    def split_output_ok(self, in_spec, out_spec):
        return self._phase_capable(in_spec, out_spec)

    # -- QUAD (row x col phase) dataflow: the rect blend partitions freely
    # into (row, col) canvas phases; the overlay rect's quad slices are cut
    # host-side (both parities static per build)

    def _quad_capable(self, in_spec, out_spec) -> bool:
        return (self._phase_capable(in_spec, out_spec)
                and in_spec.height % 2 == 0)

    def quad_input_ok(self, in_spec, out_spec):
        return self._quad_capable(in_spec, out_spec)

    def quad_output_ok(self, in_spec, out_spec):
        return self._quad_capable(in_spec, out_spec)

    def _grid_capable(self, in_spec, out_spec) -> bool:
        """GRID16 (4x4 phase) dataflow: the rect blend slices host-side
        by (row mod 4, col mod 4) — the quad slicing at stride 4."""
        return (self._phase_capable(in_spec, out_spec)
                and in_spec.width % 4 == 0 and in_spec.height % 4 == 0)

    def grid_input_ok(self, in_spec, out_spec):
        return self._grid_capable(in_spec, out_spec)

    def grid_output_ok(self, in_spec, out_spec):
        return self._grid_capable(in_spec, out_spec)

    def _grid64_capable(self, in_spec, out_spec) -> bool:
        """GRID64 (8x8 phase) dataflow: the rect blend slices host-side
        by (row mod 8, col mod 8) — the same slicing at stride 8.  RGB
        boundaries only (grid8 links carry {"r_00",...,"a_77"})."""
        from tpuvf.core.formats import RGB_FORMATS

        return (self._phase_capable(in_spec, out_spec)
                and in_spec.format in RGB_FORMATS
                and in_spec.width % 8 == 0 and in_spec.height % 8 == 0)

    def grid64_input_ok(self, in_spec, out_spec):
        return self._grid64_capable(in_spec, out_spec)

    def grid64_output_ok(self, in_spec, out_spec):
        return self._grid64_capable(in_spec, out_spec)

    def _grid36_capable(self, in_spec, out_spec) -> bool:
        """GRID36 (6x6 phase): mod-6 host rect slicing, RGB boundaries
        only ({"r_00",...,"a_55"})."""
        from tpuvf.core.formats import RGB_FORMATS

        return (self._phase_capable(in_spec, out_spec)
                and in_spec.format in RGB_FORMATS
                and in_spec.width % 6 == 0 and in_spec.height % 6 == 0)

    def grid36_input_ok(self, in_spec, out_spec):
        return self._grid36_capable(in_spec, out_spec)

    def grid36_output_ok(self, in_spec, out_spec):
        return self._grid36_capable(in_spec, out_spec)

    def _grid9_capable(self, in_spec, out_spec) -> bool:
        """GRID9 (3x3 phase): mod-3 host rect slicing, RGB boundaries
        only ({"r_00",...,"a_22"})."""
        from tpuvf.core.formats import RGB_FORMATS

        return (self._phase_capable(in_spec, out_spec)
                and in_spec.format in RGB_FORMATS
                and in_spec.width % 3 == 0 and in_spec.height % 3 == 0)

    def grid9_input_ok(self, in_spec, out_spec):
        return self._grid9_capable(in_spec, out_spec)

    def grid9_output_ok(self, in_spec, out_spec):
        return self._grid9_capable(in_spec, out_spec)

    def edge_packed32_ok(self, in_spec=None, out_spec=None) -> bool:
        """RGB sink edges emit u32 pixel words (one fusion; the
        per-channel u16 emit split into two fusions with six f32 4K
        intermediates — kernels.convert.pack_words_u32)."""
        return True

    def sp_row_shardable(self, in_spec, out_spec):
        """The rect blend is row-local: the padded full-frame overlay
        fields slice down to each shard's rows (spctx.shard_rows); the
        4:2:0 sampler's chroma row-upsample is halo-aware.  QUAD/GRID
        links shard too (round 4): each phase piece pads to the full
        phase plane and shard_rows slices this shard's band."""
        from tpuvf.core.formats import RGB_FORMATS

        self._sync_image()
        if self._image is None or in_spec.format != out_spec.format:
            return False
        if getattr(self, "_linked_quad", False):
            return True
        if in_spec.format in RGB_FORMATS:
            return True
        return self._phase_capable(in_spec, out_spec)

    # -- fold into an upstream compositor (one render pass, like the
    #    reference drawing the overlay quad in the same command buffer) ----

    def fold_into_aggregate_ok(self, in_spec, out_spec) -> bool:
        """True when this overlay can be absorbed as a final 'mix' draw of
        an upstream compositor's render pass: image loaded, same
        format/size in->out (the overlay never converts), static rect.
        The fold removes a full-canvas read+write round trip (the overlay
        otherwise re-reads the composited canvas to blend a small rect)."""
        self._sync_image()
        return (self._image is not None
                and in_spec.format == out_spec.format
                and in_spec.width == out_spec.width
                and in_spec.height == out_spec.height)

    def fold_draw_config(self, spec: FrameSpec):
        """Host-side draw data for the compositor fold: the resampled
        premultiplied overlay rect + geometry.  Returns
        {rect: (x0, x1, y0, y1), planes: (4, rh, rw) f32 premultiplied,
        alpha_prop: property read per frame}."""
        w, h = spec.width, spec.height
        img = self._image
        img_h, img_w = img.shape[:2]
        rel_x = self.props.get("relative-x")
        rel_y = self.props.get("relative-y")
        ox = float(rel_x * w) if rel_x >= 0.0 else float(self.props.get("x"))
        oy = float(rel_y * h) if rel_y >= 0.0 else float(self.props.get("y"))
        ow = float(self.props.get("width") or img_w)
        oh = float(self.props.get("height") or img_h)
        pxs = np.arange(w, dtype=np.float64) + 0.5
        pys = np.arange(h, dtype=np.float64) + 0.5
        xs = np.where((pxs >= ox) & (pxs < ox + ow))[0]
        ys = np.where((pys >= oy) & (pys < oy + oh))[0]
        rx = slice(int(xs[0]), int(xs[-1]) + 1) if len(xs) else slice(0, 0)
        ry = slice(int(ys[0]), int(ys[-1]) + 1) if len(ys) else slice(0, 0)
        tx = (pxs - ox) / ow
        ty = (pys - oy) / oh
        wx = sample.sample_matrix(np.clip(tx, 0.0, 1.0), img_w, sample.LINEAR)
        wy = sample.sample_matrix(np.clip(ty, 0.0, 1.0), img_h, sample.LINEAR)
        img_f = img.astype(np.float32) / np.float32(255.0)
        chans = img_f.transpose(2, 0, 1)
        ov_np = np.ascontiguousarray((wy @ chans) @ wx.T).astype(np.float32)
        return {
            "rect": (rx.start, rx.stop, ry.start, ry.stop),
            "planes": np.ascontiguousarray(ov_np[:, ry, rx]),
            "element": self,
        }

    def _make_process_quad(self, in_spec, out_spec, bufs, cfg, out_mode):
        """QUAD (row x col phase) path: the overlay rect slices into four
        (row, col) parity pieces host-side; each phase blend is the split
        path's expression verbatim (video*(1-a) + overlay*a on the
        premultiplied image), so values are bit-identical per pixel."""
        from tpuvf.core.formats import RGB_FORMATS
        from tpuvf.kernels.convert import QUAD_PHASES

        w, h = in_spec.width, in_spec.height
        rx0, rx1, ry0, ry1 = cfg["rect"]
        ov_rect = cfg["planes"]  # (4, rh, rw) f32 premultiplied

        # column parity spans (phase plane index space)
        ce = ((rx0 + 1) // 2, (rx1 + 1) // 2)   # even canvas columns
        co = (rx0 // 2, rx1 // 2)               # odd canvas columns
        re = ((ry0 + 1) // 2, (ry1 + 1) // 2)   # even canvas rows
        ro = (ry0 // 2, ry1 // 2)               # odd canvas rows
        fetches = {}
        for ph in QUAD_PHASES:
            (r0, r1) = re if ph[0] == "e" else ro
            (c0, c1) = ce if ph[1] == "e" else co
            if r1 <= r0 or c1 <= c0:
                continue
            roff = 2 * r0 - ry0 + (0 if ph[0] == "e" else 1)
            coff = 2 * c0 - rx0 + (0 if ph[1] == "e" else 1)
            piece = np.ascontiguousarray(ov_rect[:, roff::2, coff::2])
            fetches[ph] = (bufs.add(piece, f"overlay_{ph}"),
                           ((r0, h // 2 - r1), (c0, w // 2 - c1)))

        if in_spec.format in RGB_FORMATS:
            reader = lambda planes, params: convert.split_rgb_chans_quad(
                planes)
        else:
            reader = convert.plan_rgba_sampler_quad(
                in_spec, matrix_index=in_spec.matrix_index)
        self._buffers = bufs.buffers
        matrix_out = out_spec.matrix_index

        def process_quad(planes, state, params):
            from tpuvf.parallel import spctx

            chq = {ph: list(t) for ph, t in reader(planes, params).items()}
            for ph, (fetch, pad_hw) in fetches.items():
                ov = jnp.asarray(fetch(params))
                # pad to the FULL phase plane, then slice this shard's
                # rows (no-op unsharded; XLA fuses the slice into the pad)
                rows = chq[ph][0].shape[-2]
                a = spctx.shard_rows(
                    jnp.pad(ov[3] * params["alpha"], pad_hw), rows)
                for c in range(3):
                    ovc = spctx.shard_rows(jnp.pad(ov[c], pad_hw), rows)
                    chq[ph][c] = chq[ph][c] * (1.0 - a) + ovc * a
            out = convert.pack_rgba_quad(
                {ph: tuple(t) for ph, t in chq.items()},
                out_spec.format, matrix_out, mode=out_mode)
            return out, state

        return process_quad

    def _make_process_grid(self, in_spec, out_spec, bufs, cfg, out_mode,
                           period=4):
        """GRID16/GRID64 (period x period phase) path: the overlay rect
        slices into period^2 (row mod g, col mod g) pieces host-side;
        each phase blend is the split path's expression verbatim
        (video*(1-a) + overlay*a on the premultiplied image).  4:2:0
        boundaries (mod-4 only) arrive in the grid420 layout (per-phase
        luma + 2x2-phase chroma) and re-emit it."""
        from tpuvf.core.formats import RGB_FORMATS
        from tpuvf.kernels.convert import (GRID9_PHASES, GRID16_PHASES,
                                           GRID36_PHASES, GRID64_PHASES)

        g = period
        phases = {8: GRID64_PHASES, 6: GRID36_PHASES,
                  4: GRID16_PHASES, 3: GRID9_PHASES}[g]
        w, h = in_spec.width, in_spec.height
        rx0, rx1, ry0, ry1 = cfg["rect"]
        ov_rect = cfg["planes"]  # (4, rh, rw) f32 premultiplied
        n_r, n_c = h // g, w // g
        fetches = {}
        for ph in phases:
            qq, p = int(ph[0]), int(ph[1])
            # plane index k covers canvas row g*k+qq: ry0 <= g*k+qq < ry1
            r0 = max(0, (ry0 - qq + g - 1) // g)
            r1 = max(0, (ry1 - qq + g - 1) // g)
            c0 = max(0, (rx0 - p + g - 1) // g)
            c1 = max(0, (rx1 - p + g - 1) // g)
            if r1 <= r0 or c1 <= c0:
                continue
            roff = g * r0 + qq - ry0
            coff = g * c0 + p - rx0
            piece = np.ascontiguousarray(ov_rect[:, roff::g, coff::g])
            fetches[ph] = (bufs.add(piece, f"overlay_{ph}"),
                           ((r0, n_r - r1), (c0, n_c - c1)))

        if g == 8:
            reader = lambda planes, params: convert.split_rgb_chans_grid64(
                planes)
        elif g == 6:
            reader = lambda planes, params: convert.split_rgb_chans_grid36(
                planes)
        elif g == 3:
            reader = lambda planes, params: convert.split_rgb_chans_grid9(
                planes)
        elif in_spec.format in RGB_FORMATS:
            reader = lambda planes, params: convert.split_rgb_chans_grid16(
                planes)
        else:
            reader420 = convert.plan_rgba_sampler_grid420(
                in_spec.matrix_index)
            reader = lambda planes, params: reader420(planes, params)
        self._buffers = bufs.buffers
        matrix_out = out_spec.matrix_index

        def process_grid(planes, state, params):
            from tpuvf.parallel import spctx

            chg = {ph: list(t) for ph, t in reader(planes, params).items()}
            for ph, (fetch, pad_hw) in fetches.items():
                ov = jnp.asarray(fetch(params))
                # pad to the FULL phase plane, then slice this shard's
                # rows (no-op unsharded; XLA fuses the slice into the pad)
                rows = chg[ph][0].shape[-2]
                a = spctx.shard_rows(
                    jnp.pad(ov[3] * params["alpha"], pad_hw), rows)
                for c in range(3):
                    ovc = spctx.shard_rows(jnp.pad(ov[c], pad_hw), rows)
                    chg[ph][c] = chg[ph][c] * (1.0 - a) + ovc * a
            chans = {ph: tuple(t) for ph, t in chg.items()}
            if g == 8:
                out = convert.pack_rgba_grid64(
                    chans, out_spec.format, matrix_out, mode=out_mode)
            elif g == 6:
                out = convert.pack_rgba_grid36(
                    chans, out_spec.format, matrix_out, mode=out_mode)
            elif g == 3:
                out = convert.pack_rgba_grid9(
                    chans, out_spec.format, matrix_out, mode=out_mode)
            elif out_mode == "packed420g":
                out = convert.pack_420_grid16(
                    chans, out_spec.format, matrix_out)
            else:
                out = convert.pack_rgba_grid16(
                    chans, out_spec.format, matrix_out, mode=out_mode)
            return out, state

        return process_grid

    def make_process(self, in_spec: FrameSpec, out_spec: FrameSpec, static):
        return self.make_process_linked(in_spec, out_spec, static)

    def make_process_linked(self, in_spec: FrameSpec, out_spec: FrameSpec,
                            static, in_split: bool = False,
                            out_mode: str = "full"):
        w, h = in_spec.width, in_spec.height

        # per-frame position resolution + build-time host resample
        # (m:374-420; shared with the compositor fold path)
        cfg = self.fold_draw_config(in_spec)
        rx0, rx1, ry0, ry1 = cfg["rect"]
        rx, ry = slice(rx0, rx1), slice(ry0, ry1)
        ov_rect_np = cfg["planes"]  # (4, rh, rw) f32 premultiplied

        from tpuvf.core.formats import RGB_FORMATS
        from tpuvf.kernels.color import dequant as _dq
        from tpuvf.kernels.sample import WeightBuffers

        bufs = WeightBuffers(self.name)
        matrix_out = out_spec.matrix_index
        grid8 = (in_split == "grid8"
                 or out_mode in ("grid8", "packed32g8"))
        if grid8:
            if not self._grid64_capable(in_spec, out_spec):
                raise NotImplementedError(
                    "overlay grid64 links require mod-8 RGB dimensions")
            self._linked_quad = True
            return self._make_process_grid(in_spec, out_spec, bufs,
                                           cfg, out_mode, period=8)
        grid6 = (in_split == "grid6"
                 or out_mode in ("grid6", "packed32g6"))
        if grid6:
            if not self._grid36_capable(in_spec, out_spec):
                raise NotImplementedError(
                    "overlay grid36 links require mod-6 RGB dimensions")
            self._linked_quad = True
            return self._make_process_grid(in_spec, out_spec, bufs,
                                           cfg, out_mode, period=6)
        grid3 = (in_split == "grid3"
                 or out_mode in ("grid3", "packed32g3"))
        if grid3:
            if not self._grid9_capable(in_spec, out_spec):
                raise NotImplementedError(
                    "overlay grid9 links require mod-3 RGB dimensions")
            self._linked_quad = True
            return self._make_process_grid(in_spec, out_spec, bufs,
                                           cfg, out_mode, period=3)
        grid = (in_split == "grid"
                or out_mode in ("grid", "packed32g", "packed420g"))
        if grid:
            if not self._grid_capable(in_spec, out_spec):
                raise NotImplementedError(
                    "overlay grid16 links require mod-4 dimensions")
            # sp opt-out rides the quad flag: grid phases aren't row shards
            self._linked_quad = True
            return self._make_process_grid(in_spec, out_spec, bufs,
                                           cfg, out_mode)
        quad = (in_split == "quad"
                or out_mode in ("quad", "packed32q", "packed16q"))
        self._linked_quad = quad
        if quad:
            if not self._quad_capable(in_spec, out_spec):
                raise NotImplementedError(
                    "overlay quad links require even dimensions")
            return self._make_process_quad(in_spec, out_spec, bufs,
                                           cfg, out_mode)
        phase_mode = in_split or out_mode != "full"
        if phase_mode and not self._phase_capable(in_spec, out_spec):
            raise NotImplementedError(
                "overlay split links require even width")

        if phase_mode:
            # column-phase path: the rect blend partitions freely into
            # even/odd canvas columns; the overlay rect's phase slices are
            # sliced host-side (parity static per build)
            rx0, rx1 = rx.start, rx.stop
            ry0, ry1 = ry.start, ry.stop
            pe0, pe1 = (rx0 + 1) // 2, (rx1 + 1) // 2
            po0, po1 = rx0 // 2, rx1 // 2
            ov_rect = ov_rect_np
            fetches = {}
            if pe1 > pe0:
                fetches["e"] = (bufs.add(np.ascontiguousarray(
                    ov_rect[:, :, (2 * pe0 - rx0)::2]), "overlay_e"),
                    ((ry0, h - ry1), (pe0, w // 2 - pe1)))
            if po1 > po0:
                fetches["o"] = (bufs.add(np.ascontiguousarray(
                    ov_rect[:, :, (2 * po0 + 1 - rx0)::2]), "overlay_o"),
                    ((ry0, h - ry1), (po0, w // 2 - po1)))

            if in_split:
                if in_spec.format in RGB_FORMATS:
                    reader = lambda planes, params: \
                        convert.split_rgb_chans(planes)
                else:
                    reader = convert.plan_rgba_sampler_split(
                        in_spec, matrix_index=in_spec.matrix_index,
                        presplit=True)
            elif in_spec.format in RGB_FORMATS:
                def reader(planes, params):
                    x8 = planes["rgba"]
                    rp = x8.reshape(x8.shape[:-1] + (w // 2, 2))
                    return (
                        tuple(_dq(rp[..., c, :, :, 0]) for c in range(4)),
                        tuple(_dq(rp[..., c, :, :, 1]) for c in range(4)),
                    )
            else:
                reader = convert.plan_rgba_sampler_split(
                    in_spec, matrix_index=in_spec.matrix_index)
            self._buffers = bufs.buffers
            pack_mode = {"full": "interleave", "split": "split",
                         "packed16": "packed16",
                         "packed32": "packed32"}[out_mode]

            def process_split(planes, state, params):
                from tpuvf.parallel import spctx

                ch_e, ch_o = reader(planes, params)
                chans = {"e": list(ch_e), "o": list(ch_o)}
                rows_local = chans["e"][0].shape[-2]
                for ph, (fetch, pad_hw) in fetches.items():
                    ov = jnp.asarray(fetch(params))
                    # under spatial row sharding the padded full-height
                    # field slices down to THIS shard's rows (spctx; the
                    # pad+slice fuses, nothing full-height materializes)
                    a = spctx.shard_rows(
                        jnp.pad(ov[3] * params["alpha"], pad_hw), rows_local)
                    for c in range(3):
                        ovc = spctx.shard_rows(
                            jnp.pad(ov[c], pad_hw), rows_local)
                        chans[ph][c] = (chans[ph][c] * (1.0 - a) + ovc * a)
                out = convert.pack_rgba_split(
                    tuple(chans["e"]), tuple(chans["o"]),
                    out_spec.format, matrix_out, mode=pack_mode)
                return out, state

            return process_split

        video_sampler = convert.plan_rgba_sampler(
            in_spec, w, h, bufs, matrix_index=in_spec.matrix_index)
        # only the covered rect of the resampled overlay is needed
        fetch_ov = bufs.add(ov_rect_np, "overlay")
        self._buffers = bufs.buffers

        # zero-pad the overlay to frame size inside the graph: outside the
        # rect alpha == 0 makes the blend an EXACT identity
        # (region * 1.0 + 0.0 == region for unit floats), so the whole blend
        # is one fused elementwise pass — the previous rect .at[].set wrote
        # a full-frame copy per channel (measured 2.12 ms for a 256x256
        # overlay on 4K; ~0.2 ms this way).
        pad_hw = ((ry.start, h - ry.stop), (rx.start, w - rx.stop))

        def process(planes, state, params):
            from tpuvf.parallel import spctx

            chans = list(video_sampler.tuple(planes, params))
            rows_local = chans[0].shape[-2]
            ov = jnp.asarray(fetch_ov(params))
            a = spctx.shard_rows(
                jnp.pad(ov[3] * params["alpha"], pad_hw), rows_local)
            for c in range(3):
                ovc = spctx.shard_rows(jnp.pad(ov[c], pad_hw), rows_local)
                chans[c] = chans[c] * (1.0 - a) + ovc * a
            return convert.pack_rgba_t(tuple(chans), out_spec.format,
                                       matrix_out), state

        return process
