"""vfdeinterlace — bob / weave / linear / greedy-H deinterlacing.

Rebuild of vfmetaldeinterlace (/root/reference/src/deinterlace/):
- formats BGRA, RGBA, NV12, I420
- props: method {bob=0, weave=1, linear=2, greedyh=3}, field-layout {auto,
  top-field-first, bottom-field-first}, motion-threshold [0,1]=0.1
  (gstvfmetaldeinterlace.m:73-112)
- field order: explicit, or auto from the per-buffer TFF flag (m:169-185) —
  here from FrameSpec.tff
- the input is converted to an RGBA8 texture first (nearest chroma upsample,
  metaldeinterlacerenderer.m:204-293), kernels run on that, and the *input*
  RGBA is blitted to the prev-frame texture after processing (m:394-405)
- weave/greedyh fall back to bob on the first frame (m:326-338) — the
  has-prev flag is traced state so the fallback needs no recompile
- no passthrough mode

State = {prev: 4-tuple of (H,W) uint8 planes of the previous input,
has_prev: bool} — explicitly carried, scan-friendly; channels stay
SEPARATE planes (a (4,H,W) u8 stack cost a relayout copy on both sides of
the state boundary every frame — ~30% of the config-4 frame time).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from tpuvf.core.element import Element
from tpuvf.core.formats import CORE_FORMATS
from tpuvf.core.properties import PropertyDescriptor
from tpuvf.core.registry import register
from tpuvf.core.spec import FrameSpec
from tpuvf.kernels import convert, deinterlace as kdeint
from tpuvf.kernels.color import dequant, quant
from tpuvf.kernels.sample import NEAREST

METHOD_BOB = 0
METHOD_WEAVE = 1
METHOD_LINEAR = 2
METHOD_GREEDYH = 3

FIELD_AUTO = 0
FIELD_TFF = 1
FIELD_BFF = 2


@register
class Deinterlace(Element):
    ELEMENT_NAME = "vfdeinterlace"
    ALIASES = ("vfmetaldeinterlace", "deinterlace")
    KLASS = "Filter/Effect/Video/Deinterlace"
    DESCRIPTION = "Motion-adaptive GPU deinterlacing"
    IN_FORMATS = CORE_FORMATS
    OUT_FORMATS = CORE_FORMATS
    PROPERTIES = (
        PropertyDescriptor("method", "enum", 0, "Deinterlace method",
                           enum_values=(("bob", 0), ("weave", 1),
                                        ("linear", 2), ("greedyh", 3))),
        PropertyDescriptor("field-layout", "enum", 0, "Field order",
                           enum_values=(("auto", 0), ("top-field-first", 1),
                                        ("bottom-field-first", 2))),
        PropertyDescriptor("motion-threshold", "float", 0.1,
                           "Motion threshold for greedyh", 0.0, 1.0,
                           controllable=True, traced=True),
    )

    def transform_spec(self, in_spec, out_filter=None):
        out = super().transform_spec(in_spec, out_filter)
        # deinterlaced output is progressive
        return out.with_(interlaced=False)

    # -- column-phase links: every method is a pure ROW stencil, so the
    # even/odd column phases process independently; the prev-frame state
    # splits with them (core/element.py docs) -----------------------------

    def _phase_capable(self, in_spec, out_spec) -> bool:
        from tpuvf.core.formats import RGB_FORMATS

        if out_spec.format != in_spec.format:
            return False
        if in_spec.format in RGB_FORMATS:
            return in_spec.width % 2 == 0
        return convert.can_split_420(
            in_spec, in_spec.width, in_spec.height, 1.0, 1.0, None)

    def split_input_ok(self, in_spec, out_spec):
        return self._phase_capable(in_spec, out_spec)

    def split_output_ok(self, in_spec, out_spec):
        return self._phase_capable(in_spec, out_spec)

    # -- QUAD (row x col phase) dataflow: fields ARE row phases, so the
    # kept field becomes a pure passthrough and interpolation/motion run
    # only on the discarded phase (kernels.deinterlace row-phase helpers).
    # The field-layout=auto per-buffer TFF flag is handled with host-
    # selected program variants: the fast body bakes the stream's field
    # order (half the stencil/motion work), the general body keeps the
    # traced select for mid-stream flips (variant_select, same mechanism
    # as the compositor's fast/general render bodies).

    def _quad_capable(self, in_spec, out_spec) -> bool:
        return (self._phase_capable(in_spec, out_spec)
                and in_spec.height % 2 == 0)

    def quad_input_ok(self, in_spec, out_spec):
        return self._quad_capable(in_spec, out_spec)

    def quad_output_ok(self, in_spec, out_spec):
        return self._quad_capable(in_spec, out_spec)

    def edge_packed32_ok(self, in_spec=None, out_spec=None) -> bool:
        """RGB sink edges emit u32 pixel words (one fusion; the
        per-channel u16 emit split into two fusions with six f32 4K
        intermediates — kernels.convert.pack_words_u32)."""
        return True

    def dp_shard_safe(self, in_spec, out_spec):
        """bob/linear ignore the prev-frame carry; weave/greedyh read it, so
        batch-splitting ONE stream across dp shards would give each shard
        its own history (first frames fall back to bob,
        metaldeinterlacerenderer.m:329-338 analog at every shard seam)."""
        return self.props.get("method") in (METHOD_BOB, METHOD_LINEAR)

    def sp_row_shardable(self, in_spec, out_spec):
        """All four methods are ±1-row stencils (halo-aware via
        spctx.pad_rows_edge) over the kept-field parity mask; local parity
        equals global parity because the sp gate enforces even rows per
        shard.  The prev-frame state shards with the planes.  QUAD-linked
        builds shard too (round 4): fields ARE row phases, so a phase-row
        shard is a contiguous band of both fields and the interp taps
        (interp_even_t/interp_odd_t) exchange spctx halos with
        frame-global cross-phase edge clamps."""
        from tpuvf.core.formats import RGB_FORMATS

        if getattr(self, "_linked_quad", False):
            return True
        return (in_spec.format in RGB_FORMATS
                or self._phase_capable(in_spec, out_spec))

    def init_state(self, in_spec, out_spec):
        from tpuvf.kernels.convert import QUAD_PHASES

        if self.props.get("method") in (METHOD_BOB, METHOD_LINEAR):
            # bob/linear never read the previous frame: carrying it would
            # cost a full state round trip per frame for nothing (~8 MB at
            # 1080p).  The reference blits input->prevFrame regardless of
            # method (metaldeinterlacerenderer.m:394-405), so switching to
            # weave/greedyh mid-stream here falls back to bob for ONE
            # frame where the reference would weave against the last
            # bob-era frame — the documented deviation.
            return {}
        if getattr(self, "_linked_quad", False):
            # RGBA8 prev-frame texture as QUAD (row x col) phase planes —
            # per-channel tuples for the same anti-relayout reason as the
            # split state below
            plane = lambda: np.zeros(
                (in_spec.height // 2, in_spec.width // 2), np.uint8)
            state = {f"prev_{ph}": tuple(plane() for _ in range(4))
                     for ph in QUAD_PHASES}
            state["has_prev"] = np.bool_(False)
            return state
        if getattr(self, "_linked_phase", False):
            # per-channel planes (tuple pytree): stacking to (4, H, W/2)
            # u8 cost a relayout copy on BOTH sides of the state boundary
            # every frame (~36 us/frame of reshapes in the config-4 device
            # trace — scripts/profile_config.py deinterlace)
            plane = lambda: np.zeros(
                (in_spec.height, in_spec.width // 2), np.uint8)
            return {"prev_e": tuple(plane() for _ in range(4)),
                    "prev_o": tuple(plane() for _ in range(4)),
                    "has_prev": np.bool_(False)}
        plane = lambda: np.zeros(
            (in_spec.height, in_spec.width), np.uint8)
        return {
            "prev": tuple(plane() for _ in range(4)),
            "has_prev": np.bool_(False),
        }

    def make_process(self, in_spec: FrameSpec, out_spec: FrameSpec, static):
        return self.make_process_linked(in_spec, out_spec, static)

    def make_process_linked(self, in_spec: FrameSpec, out_spec: FrameSpec,
                            static, in_split: bool = False,
                            out_mode: str = "full"):
        quad = (in_split == "quad"
                or out_mode in ("quad", "packed32q", "packed16q"))
        self._linked_quad = quad
        if quad:
            self._linked_phase = False
            if not self._quad_capable(in_spec, out_spec):
                raise NotImplementedError(
                    "deinterlace quad links require a phase-capable format "
                    "with even height")
            return self._make_process_quad(in_spec, out_spec, static,
                                           out_mode)
        self._linked_phase = in_split or out_mode != "full"
        if self._linked_phase:
            if not self._phase_capable(in_spec, out_spec):
                raise NotImplementedError(
                    "deinterlace split links require even width")
            return self._make_process_split(in_spec, out_spec, static,
                                            in_split, out_mode)
        return self._make_process_full(in_spec, out_spec, static)

    def _make_process_split(self, in_spec, out_spec, static, in_split,
                            out_mode):
        from tpuvf.core.formats import RGB_FORMATS

        cfg = dict(static)
        method = cfg["method"]
        layout = cfg["field-layout"]
        w = in_spec.width
        static_tff = in_spec.tff if layout == FIELD_AUTO else (
            layout == FIELD_TFF)

        def resolve_tff(params):
            if layout != FIELD_AUTO:
                return static_tff
            meta = params.get("__meta__") or {}
            tff_flag = meta.get("tff")
            return static_tff if tff_flag is None else (tff_flag != 0)

        matrix_in = in_spec.matrix_index
        matrix_out = out_spec.matrix_index
        if in_split:
            if in_spec.format in RGB_FORMATS:
                reader = lambda planes, params: \
                    convert.split_rgb_chans(planes)
            else:
                reader = convert.plan_rgba_sampler_split(
                    in_spec, filter=NEAREST, matrix_index=matrix_in,
                    presplit=True)
        elif in_spec.format in RGB_FORMATS:
            def reader(planes, params):
                x8 = planes["rgba"]
                rp = x8.reshape(x8.shape[:-1] + (w // 2, 2))
                return (
                    tuple(dequant(rp[..., c, :, :, 0]) for c in range(4)),
                    tuple(dequant(rp[..., c, :, :, 1]) for c in range(4)),
                )
        else:
            reader = convert.plan_rgba_sampler_split(
                in_spec, filter=NEAREST, matrix_index=matrix_in)
        self._buffers = {}
        pack_mode = {"full": "interleave", "split": "split",
                     "packed16": "packed16",
                         "packed32": "packed32"}[out_mode]

        def run_method(cur_t, prev_t, has_prev, tff, params):
            if method in (METHOD_BOB, METHOD_LINEAR):
                return kdeint.bob_t(cur_t, tff)
            if method == METHOD_WEAVE:
                woven = kdeint.weave_t(cur_t, prev_t, tff)
                fallback = kdeint.bob_t(cur_t, tff)
                return tuple(jnp.where(has_prev, wv, fb)
                             for wv, fb in zip(woven, fallback))
            gh = kdeint.greedyh_t(cur_t, prev_t, tff,
                                  params["motion-threshold"])
            fallback = kdeint.bob_t(cur_t, tff)
            return tuple(jnp.where(has_prev, g, fb)
                         for g, fb in zip(gh, fallback))

        stateless = method in (METHOD_BOB, METHOD_LINEAR)

        def process(planes, state, params):
            tff = resolve_tff(params)
            ch_e, ch_o = reader(planes, params)
            # RGBA8 texture boundary per phase (m:204-293)
            cur_q_e = tuple(quant(c) for c in ch_e)
            cur_q_o = tuple(quant(c) for c in ch_o)
            cur_e = tuple(dequant(c) for c in cur_q_e)
            cur_o = tuple(dequant(c) for c in cur_q_o)
            if stateless:  # bob/linear: no prev-frame carry (init_state)
                out_e = run_method(cur_e, None, None, tff, params)
                out_o = run_method(cur_o, None, None, tff, params)
                out = convert.pack_rgba_split(
                    out_e, out_o, out_spec.format, matrix_out,
                    mode=pack_mode)
                return out, state
            prev_e = tuple(dequant(p) for p in state["prev_e"])
            prev_o = tuple(dequant(p) for p in state["prev_o"])
            has_prev = state["has_prev"]
            out_e = run_method(cur_e, prev_e, has_prev, tff, params)
            out_o = run_method(cur_o, prev_o, has_prev, tff, params)
            out = convert.pack_rgba_split(
                out_e, out_o, out_spec.format, matrix_out, mode=pack_mode)
            new_state = {
                "prev_e": cur_q_e,
                "prev_o": cur_q_o,
                "has_prev": jnp.asarray(True),
            }
            return out, new_state

        return process

    def _make_process_quad(self, in_spec, out_spec, static, out_mode):
        """QUAD (row x col phase) path: fields ARE row phases.

        The kept field is a PURE PASSTHROUGH phase; interpolation and
        motion run only on the discarded phase (kernels.deinterlace
        interp_even_t/interp_odd_t/discard_phase_t — the _bob_interp taps
        verbatim, bit-identical per pixel).  With field-layout=auto the
        per-buffer TFF flag is honored via host-selected variants: 'fast'
        bakes the stream's field order (half the stencil/motion work of
        the masked full-height formulation), 'general' keeps the traced
        per-buffer select (both phases computed) for mid-stream flips —
        the pipeline picks per frame from the buffer metadata, so steady
        streams run fast and a flip costs one extra compile, not a wrong
        frame (gstvfmetaldeinterlace.m:169-185 semantics)."""
        from tpuvf.core.formats import RGB_FORMATS
        from tpuvf.kernels.convert import QUAD_PHASES
        from tpuvf.kernels.color import dequant as _dq

        cfg = dict(static)
        method = {METHOD_BOB: "bob", METHOD_WEAVE: "weave",
                  METHOD_LINEAR: "linear", METHOD_GREEDYH: "greedyh"}[
                      cfg["method"]]
        layout = cfg["field-layout"]
        static_tff = bool(in_spec.tff if layout == FIELD_AUTO else (
            layout == FIELD_TFF))
        matrix_in = in_spec.matrix_index
        matrix_out = out_spec.matrix_index
        if in_spec.format in RGB_FORMATS:
            reader = lambda planes, params: convert.split_rgb_chans_quad(
                planes)
        else:
            reader = convert.plan_rgba_sampler_quad(
                in_spec, filter=NEAREST, matrix_index=matrix_in)
        self._buffers = {}
        stateless = method in ("bob", "linear")

        def body(planes, state, params, tff):
            chq = reader(planes, params)
            # RGBA8 texture boundary per phase (m:204-293)
            cur_q = {ph: tuple(quant(c) for c in chq[ph])
                     for ph in QUAD_PHASES}
            cur = {ph: tuple(_dq(c) for c in cur_q[ph])
                   for ph in QUAD_PHASES}
            if stateless:
                prev, has_prev = None, None
            else:
                prev = {ph: tuple(_dq(p) for p in state[f"prev_{ph}"])
                        for ph in QUAD_PHASES}
                has_prev = state["has_prev"]
            thresh = params.get("motion-threshold")

            def discard(ph, interp_t):
                return kdeint.discard_phase_t(
                    method, cur[ph], None if stateless else prev[ph],
                    interp_t, has_prev, thresh)

            outq = {}
            for cp in ("e", "o"):
                e_t, o_t = cur["e" + cp], cur["o" + cp]
                if tff is True:  # kept = even rows: odd phase interpolated
                    outq["e" + cp] = e_t
                    outq["o" + cp] = discard(
                        "o" + cp, kdeint.interp_odd_t(e_t, o_t))
                elif tff is False:  # kept = odd rows
                    outq["o" + cp] = o_t
                    outq["e" + cp] = discard(
                        "e" + cp, kdeint.interp_even_t(e_t, o_t))
                else:  # traced per-buffer flag: both candidates, scalar mix
                    d_e = discard("e" + cp, kdeint.interp_even_t(e_t, o_t))
                    d_o = discard("o" + cp, kdeint.interp_odd_t(e_t, o_t))
                    outq["e" + cp] = tuple(
                        jnp.where(tff, e, d) for e, d in zip(e_t, d_e))
                    outq["o" + cp] = tuple(
                        jnp.where(tff, d, o) for d, o in zip(d_o, o_t))
            out = convert.pack_rgba_quad(outq, out_spec.format, matrix_out,
                                         mode=out_mode)
            if stateless:
                return out, state
            new_state = {f"prev_{ph}": cur_q[ph] for ph in QUAD_PHASES}
            new_state["has_prev"] = jnp.asarray(True)
            return out, new_state

        def process_fast(planes, state, params):
            return body(planes, state, params, static_tff)

        if layout != FIELD_AUTO:
            return process_fast  # field order pinned: one (fast) body

        def resolve_tff(params):
            meta = params.get("__meta__") or {}
            tff_flag = meta.get("tff")
            return static_tff if tff_flag is None else (tff_flag != 0)

        def process_general(planes, state, params):
            return body(planes, state, params, resolve_tff(params))

        def variant_select(elem_params) -> str:
            """'fast' iff this frame's buffer TFF flag matches the baked
            stream field order (or carries none) — checked on the HOST, so
            the baked-order program runs without the traced double-compute;
            a flipped buffer falls back to the general body."""
            meta = elem_params.get("__meta__")
            if not isinstance(meta, dict):
                return "general"  # no host-visible flag (batched path)
            tff_flag = meta.get("tff")
            if tff_flag is None:
                return "fast"
            try:
                return ("fast"
                        if bool(np.asarray(tff_flag).item()) == static_tff
                        else "general")
            except Exception:  # traced/stacked flag: stay on general
                return "general"

        process_general.variants = {"general": process_general,
                                    "fast": process_fast}
        process_general.variant_select = variant_select
        return process_general

    def _make_process_full(self, in_spec: FrameSpec, out_spec: FrameSpec,
                           static):
        cfg = dict(static)
        method = cfg["method"]
        layout = cfg["field-layout"]
        w, h = in_spec.width, in_spec.height
        # auto mode reads the per-BUFFER TFF flag from the frame metadata
        # (gstvfmetaldeinterlace.m:169-185) as a traced select — a stream
        # whose field order flips mid-run needs no recompile; the spec's
        # stream-level flag is the fallback when no metadata flows (e.g.
        # direct make_process callers)
        static_tff = in_spec.tff if layout == FIELD_AUTO else (
            layout == FIELD_TFF)

        def resolve_tff(params):
            if layout != FIELD_AUTO:
                return static_tff
            meta = params.get("__meta__") or {}
            tff_flag = meta.get("tff")
            return static_tff if tff_flag is None else (tff_flag != 0)
        matrix_in = in_spec.matrix_index
        matrix_out = out_spec.matrix_index

        from tpuvf.kernels.sample import WeightBuffers

        bufs = WeightBuffers(self.name)
        sampler = convert.plan_rgba_sampler(
            in_spec, w, h, bufs, filter=NEAREST, matrix_index=matrix_in)
        self._buffers = bufs.buffers

        def process(planes, state, params):
            tff = resolve_tff(params)
            # input -> RGBA8 (nearest sampling for YUV inputs, m:204-293);
            # per-channel tuple dataflow (see CLAUDE.md)
            chans = sampler.tuple(planes, params)
            cur_q_t = tuple(quant(c) for c in chans)
            cur_t = tuple(dequant(c) for c in cur_q_t)
            if method in (METHOD_BOB, METHOD_LINEAR):
                # stateless (init_state returns {}): no prev-frame carry
                out_t = kdeint.bob_t(cur_t, tff)
                return (convert.pack_rgba_t(out_t, out_spec.format,
                                            matrix_out), state)
            prev_t = tuple(dequant(p) for p in state["prev"])
            has_prev = state["has_prev"]

            if method == METHOD_WEAVE:
                woven = kdeint.weave_t(cur_t, prev_t, tff)
                fallback = kdeint.bob_t(cur_t, tff)
                out_t = tuple(jnp.where(has_prev, wv, fb)
                              for wv, fb in zip(woven, fallback))
            else:  # greedyh
                gh = kdeint.greedyh_t(cur_t, prev_t, tff,
                                      params["motion-threshold"])
                fallback = kdeint.bob_t(cur_t, tff)
                out_t = tuple(jnp.where(has_prev, g, fb)
                              for g, fb in zip(gh, fallback))

            out = convert.pack_rgba_t(out_t, out_spec.format, matrix_out)
            new_state = {
                # blit input -> prevFrame (m:394-405); per-channel planes —
                # the u8 channel stack cost a relayout both sides (same
                # finding as the split path, ~30% of the config-4 frame)
                "prev": cur_q_t,
                "has_prev": jnp.asarray(True),
            }
            return out, new_state

        return process
