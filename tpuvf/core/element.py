"""Element base classes.

The reference's L3 (GObject element: caps negotiation, properties,
passthrough) and L2 (renderer: GPU passes) layers collapse into one concept
here: an Element declares its property schema and negotiation rule in
Python, and *compiles* its per-frame GPU work into a pure jittable function
``process(planes, state, params) -> (planes, state)`` for a negotiated
(in_spec, out_spec, static-config) triple.  The runtime fuses consecutive
elements' process functions into a single XLA program, which is the
TPU-native replacement for per-element Metal command queues
(SURVEY.md §2.10).

State is an explicit pytree (deinterlace's previous frame, videofilter's
frame counter) carried through `lax.scan` in batch mode.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np

from tpuvf.core.formats import VideoFormat
from tpuvf.core.properties import PropertyBag, PropertyDescriptor
from tpuvf.core.spec import CapsFilter, FrameSpec

# planes dict -> (planes dict, state) pure function, jit-safe
ProcessFn = Callable[[Dict, Any, Dict], Tuple[Dict, Any]]


class Element:
    """Base for 1-in/1-out transform elements."""

    ELEMENT_NAME: str = ""
    ALIASES: Tuple[str, ...] = ()
    KLASS: str = "Filter/Effect/Video"
    DESCRIPTION: str = ""
    PROPERTIES: Tuple[PropertyDescriptor, ...] = ()
    IN_FORMATS: Tuple[VideoFormat, ...] = ()
    OUT_FORMATS: Tuple[VideoFormat, ...] = ()

    def __init__(self, name: Optional[str] = None, **props):
        self.name = name or f"{self.ELEMENT_NAME}0"
        self.props = PropertyBag(self.PROPERTIES)
        # large trace-time arrays (sampling matrices, masks) registered by
        # make_process; fed through params so they are program *arguments*
        # rather than HLO constants (see kernels.sample.WeightBuffers)
        self._buffers = {}
        # per-frame property animation schedules (GstController analog),
        # name -> callable(frame)->value or sequence indexed by frame
        self._controllers = {}
        for key, value in props.items():
            self.props.set(key.replace("_", "-"), value)

    # -- properties --------------------------------------------------------

    def set_property(self, name: str, value) -> None:
        self.props.set(name, value)

    def get_property(self, name: str):
        return self.props.get(name)

    # -- per-frame property control (GstController analog) ------------------
    #
    # The reference snapshots properties under GST_OBJECT_LOCK every frame
    # (gstvfmetalvideofilter.m:183-205), so a GstController-driven ramp
    # animates frame-by-frame.  tpuvf's offline analog: attach a schedule
    # to a property; Pipeline.run() syncs it before every frame and
    # Pipeline.run_batched() stacks the per-frame traced scalars into
    # arrays scanned alongside the inputs — both paths produce identical
    # frames.

    def control(self, name: str, values,
                allow_structure_change: bool = False) -> None:
        """Attach (or with values=None clear) a per-frame schedule for a
        property.  `values` is a callable(frame_index) -> value or a
        sequence indexed by the pipeline's global frame counter (clamped
        to its last entry once exhausted).

        Sequence schedules are validated HERE (round-5, VERDICT r4 item 7):
        a schedule whose values flip a static effect gate or the
        passthrough state (e.g. gamma crossing 1.0) compiles a different
        program per segment, which run_batched cannot scan — previously
        that error surfaced only at dispatch, so a long job could die
        late.  The gate predicates are plan-time knowable, so control()
        probes every scheduled value and raises immediately with the
        offending frame index.  Pass allow_structure_change=True for
        run()-driven structural animation (run() rebuilds per frame);
        callable schedules cannot be enumerated and keep dispatch-time
        checking."""
        if not self._ctl_has(name):
            raise KeyError(f"no such property {name!r}")
        if values is None:
            self._controllers.pop(name, None)
            return
        if not callable(values):
            values = list(values)
            if not values:
                raise ValueError(f"empty schedule for {name!r}")
            if not allow_structure_change:
                self._ctl_validate_schedule(name, values)
        self._controllers[name] = values

    def _ctl_validate_schedule(self, name: str, values) -> None:
        """Probe the structural fingerprint at every scheduled value and
        raise at the FIRST frame whose structure differs from frame 0's
        (the entry structure run_batched compiles against)."""
        saved = self._ctl_get(name)
        try:
            self._ctl_set(name, values[0])
            base = self._ctl_probe()
            if base is None:  # structure not probeable without specs
                return
            for i, v in enumerate(values[1:], start=1):
                self._ctl_set(name, v)
                if self._ctl_probe() != base:
                    raise ValueError(
                        f"schedule for {name!r} changes pipeline structure "
                        f"at frame {i} (value {v!r} flips a static effect "
                        f"gate or the passthrough state vs frame 0's "
                        f"{values[0]!r}) — one scanned program cannot "
                        f"animate that.  Keep the schedule on one side of "
                        f"the gate, split it across run_batched calls, or "
                        f"pass allow_structure_change=True and use run() "
                        f"(rebuilds per frame)")
        finally:
            self._ctl_set(name, saved)

    def _ctl_probe(self):
        """Spec-free structural fingerprint for control()-time schedule
        validation; None when this element's structure cannot be computed
        without negotiated specs (validation then stays at dispatch)."""
        try:
            static = self.static_config(None, None)
        except Exception:
            return None
        return (static, self.props.at_defaults())

    # schedule-target indirection: subclasses with non-self.props targets
    # (compositor request pads, "sink_0::xpos") override these three

    def _ctl_has(self, name: str) -> bool:
        return self.props.has(name)

    def _ctl_get(self, name: str):
        return self.props.get(name)

    def _ctl_set(self, name: str, value) -> None:
        self.set_property(name, value)

    def sync_frame(self, frame: int) -> None:
        """Apply every controlled property's value for global frame index
        `frame` (the gst_object_sync_values analog)."""
        for name, values in self._controllers.items():
            if callable(values):
                v = values(frame)
            else:
                v = values[min(frame, len(values) - 1)]
            self._ctl_set(name, v)

    # -- negotiation -------------------------------------------------------

    def accepts_format(self, fmt: VideoFormat) -> bool:
        return fmt in self.IN_FORMATS

    def transform_spec(
        self, in_spec: FrameSpec, out_filter: Optional[CapsFilter] = None
    ) -> FrameSpec:
        """Negotiate the output spec for an input spec + downstream filter.

        Default: output == input (GstVideoFilter semantics — no caps change),
        constrained by the downstream filter if it only adjusts format among
        OUT_FORMATS.
        """
        if not self.accepts_format(in_spec.format):
            raise ValueError(
                f"{self.ELEMENT_NAME}: format {in_spec.format} not supported "
                f"(accepts {[f.value for f in self.IN_FORMATS]})"
            )
        out = in_spec
        if out_filter is not None:
            out = out_filter.apply(out)
            if out.width != in_spec.width or out.height != in_spec.height:
                raise ValueError(
                    f"{self.ELEMENT_NAME}: cannot change frame size "
                    f"({in_spec.width}x{in_spec.height} -> {out.width}x{out.height})"
                )
            if out.format != in_spec.format:
                raise ValueError(
                    f"{self.ELEMENT_NAME}: cannot convert {in_spec.format} -> "
                    f"{out.format}"
                )
        return out

    # -- processing --------------------------------------------------------

    def is_passthrough(self, in_spec: FrameSpec, out_spec: FrameSpec) -> bool:
        return False

    def static_config(self, in_spec: FrameSpec, out_spec: FrameSpec):
        """Hashable snapshot of non-traced props (part of the jit key)."""
        items = []
        for n, d in self.props.descriptors.items():
            if not d.traced:
                items.append((n, self.props.get(n)))
        return tuple(sorted(items))

    def traced_params(self) -> Dict[str, np.ndarray]:
        """Per-frame traced parameter values (controllable floats) plus any
        weight buffers registered by make_process (call make_process first)."""
        out = {}
        for n, d in self.props.descriptors.items():
            if d.traced:
                out[n] = np.float32(self.props.get(n))
        out.update(self._buffers)
        return out

    def init_state(self, in_spec: FrameSpec, out_spec: FrameSpec):
        return ()

    def make_process(
        self, in_spec: FrameSpec, out_spec: FrameSpec, static
    ) -> ProcessFn:
        raise NotImplementedError

    # -- even/odd column-phase links (cross-element dataflow) ---------------
    #
    # The u8 column interleave at element boundaries dominates fused 4:2:0
    # chains at 4K: pure-u8 fusions run at ~284 GB/s on v5e (~3x below HBM)
    # and the lane interleave itself at ~180 GB/s, ~0.74 ms of a 0.96 ms
    # frame.  The pipeline therefore negotiates one of three boundary
    # layouts per link (scripts/bench_interleave*.py for the measurements):
    #
    #   "full"     — canonical interleaved planes (default).
    #   "split"    — even/odd column-phase planes as FLOAT32 carrying the
    #                quantized values (color.quant_sim — bit-identical to
    #                the u8 round trip, but u8 loads run at ~90 GB/s on v5e
    #                while f32 chains fuse at full HBM bandwidth):
    #                {"r_e","g_e","b_e","a_e","r_o",...} for RGB formats,
    #                {"y_e","y_o","u","v"} for 4:2:0.  Used when the
    #                downstream element can consume phases directly.
    #   "packed16" — phase pairs combined into uint16 words
    #                (even | odd << 8): byte layout IDENTICAL to the
    #                interleaved u8 plane (little-endian), but the combine
    #                fuses into the quantize at full HBM bandwidth instead
    #                of a separate u8 interleave pass.  Used at the pipeline
    #                edge; the host views the bytes as u8.
    #
    # Quantization still happens per phase at each boundary (same values as
    # the interleaved RGBA8 texture write — bit-exact); only the layout
    # differs.

    def split_output_ok(self, in_spec: FrameSpec, out_spec: FrameSpec) -> bool:
        """True if make_process_linked(out_mode="split"/"packed16") is
        supported for this configuration."""
        return False

    # -- data-parallel stream semantics ------------------------------------

    def dp_shard_safe(self, in_spec: FrameSpec, out_spec: FrameSpec) -> bool:
        """True when this element's output does NOT depend on cross-frame
        state, so a single stream may be batch-split across dp shards
        without changing results.  Elements whose carried state feeds the
        output (deinterlace weave/greedyh prev-frame, grain frame counter)
        return False: each dp shard would see its own history, which is
        correct ONLY when shards map to independent streams —
        run_batched(mesh=...) then requires independent_streams=True
        (prev-frame semantics anchor:
        /root/reference/src/deinterlace/metaldeinterlacerenderer.m:394-405)."""
        return True

    # -- spatial (row) sharding capability ---------------------------------

    def sp_row_shardable(self, in_spec: FrameSpec,
                         out_spec: FrameSpec) -> bool:
        """True when this element's compiled process is correct on a ROW
        SHARD of its planes under `Pipeline.run_batched(mesh, sp_axis=...)`:
        every op is row-local, a halo-aware stencil (parallel.spctx), or a
        global-row-indexed coordinate field.  Elements with frame-global
        row structure (resampling matmuls over H, host-precomputed row
        masks/pads) return False and run_batched rejects the sp request
        with a clear error."""
        return False

    def split_input_ok(self, in_spec: FrameSpec, out_spec: FrameSpec) -> bool:
        """True if make_process_linked(in_split=True) is supported."""
        return False

    def edge_packed16_ok(self, in_spec: FrameSpec | None = None,
                         out_spec: FrameSpec | None = None) -> bool:
        """Whether the sink-edge packed16 layout pays off for this element.
        True when the u16-word combine fuses into an f32 quantize (cs, vf,
        overlay); elements whose phases already live as u8 (the compositor's
        canvas) would pay a pure u8->u16 relayout instead — they keep the
        canonical edge layout.  Specs let geometry-dependent producers
        (convertscale's scaled phase-matrix path) opt out."""
        return True

    def edge_packed32_ok(self, in_spec: FrameSpec | None = None,
                         out_spec: FrameSpec | None = None) -> bool:
        """Whether the sink-edge packed32 layout (u32 PIXEL words per column
        phase, output byte order baked in — kernels.convert.pack_words_u32)
        is supported for RGB output.  Per-channel u16 edges made XLA split
        the 4K emit into two fusions with six f32 plane intermediates
        (~190 us/frame); the single-u32-word emit is ONE fusion and the
        scan-output stack fuses into it (headline device 364 -> 256
        us/frame, scripts/bench_emit_ab.py).  Only consulted when
        edge_packed16_ok already holds and the output format carries RGB."""
        return False

    # -- QUAD (row x column phase) dataflow (round 3d) ----------------------
    # The row-phase extension of the column-split links: planes carry FOUR
    # (row, col) output phases, so row stencils (the 4:2:0 chroma row
    # 2x-upsample, deinterlace fields) never interleave rows on device —
    # the host repack interleaves rows+columns in the same pass that
    # already interleaves columns for packed16/32.  Negotiated only along
    # chains whose head is quad-provisioned by the source upload
    # (Pipeline._link_plan); not composable with sp row sharding (a quad
    # element reports sp_row_shardable False while quad-linked).

    def quad_output_ok(self, in_spec: FrameSpec, out_spec: FrameSpec) -> bool:
        """True if make_process_linked(out_mode="quad"/"packed32q"/
        "packed16q") is supported for this configuration."""
        return False

    def quad_input_ok(self, in_spec: FrameSpec, out_spec: FrameSpec) -> bool:
        """True if make_process_linked(in_split="quad") is supported."""
        return False

    # -- GRID16 (4x4 row x col phase) dataflow (round 3e) --------------------
    # The 2x-upscale extension of the quad links: at EXACTLY 2x/2x
    # 4:2:0 -> RGB geometry every bilinear tap is phase-fixed, so the
    # head element (convertscale) reads the quad-provisioned source and
    # emits SIXTEEN (row mod 4, col mod 4) output-phase planes; downstream
    # elements stay per-phase to a packed32g sink edge, and the entire
    # upscale chain fuses with zero resampling materialization (the
    # 2-phase path materializes full-res f32 chroma: 421 -> 233 us/frame
    # at 1080p->4K, scripts/bench_upscale_p44.py).  Like quad, not
    # composable with sp row sharding.

    def grid_head_ok(self, in_spec: FrameSpec, out_spec: FrameSpec) -> bool:
        """True if this element can HEAD a grid16 chain: consume the
        quad-provisioned 4:2:0 source and emit the 16 output phases
        (make_process_linked(in_split="quad", out_mode="grid"/"packed32g"))."""
        return False

    def grid_output_ok(self, in_spec: FrameSpec, out_spec: FrameSpec) -> bool:
        """True if make_process_linked(out_mode="grid"/"packed32g") is
        supported for this configuration."""
        return False

    def grid_input_ok(self, in_spec: FrameSpec, out_spec: FrameSpec) -> bool:
        """True if make_process_linked(in_split="grid") is supported."""
        return False

    # -- GRID64 (8x8 row x col phase) dataflow (round 5) ---------------------
    # The 4x-upscale extension: writing the output col as 8n+q makes the
    # luma taps quarter-phase stencils over the quad parity planes and
    # the 4:2:0 chroma 8x taps eighth-phase stencils — all phase-fixed
    # (convert.can_grid64).  RGB outputs only; 2.3x device time over the
    # canonical 4x sampler (scripts/bench_grid64_ab.py).

    def grid64_head_ok(self, in_spec: FrameSpec, out_spec: FrameSpec) -> bool:
        """True if this element can HEAD a grid64 chain: consume the
        quad-provisioned 4:2:0 source and emit the 64 output phases
        (make_process_linked(in_split="quad",
        out_mode="grid8"/"packed32g8"))."""
        return False

    def grid64_output_ok(self, in_spec: FrameSpec,
                         out_spec: FrameSpec) -> bool:
        """True if make_process_linked(out_mode="grid8"/"packed32g8") is
        supported for this configuration."""
        return False

    def grid64_input_ok(self, in_spec: FrameSpec,
                        out_spec: FrameSpec) -> bool:
        """True if make_process_linked(in_split="grid8") is supported."""
        return False

    # -- GRID36 (6x6 row x col phase) dataflow (round 5) ---------------------
    # The 3x-upscale extension (720p -> 4K): stencils derived from the
    # dense sampler's own per-geometry f32 weights (convert.can_grid36).
    # RGB outputs only.

    def grid36_head_ok(self, in_spec: FrameSpec, out_spec: FrameSpec) -> bool:
        """True if this element can HEAD a grid36 chain
        (make_process_linked(in_split="quad",
        out_mode="grid6"/"packed32g6"))."""
        return False

    def grid36_output_ok(self, in_spec: FrameSpec,
                         out_spec: FrameSpec) -> bool:
        """True if make_process_linked(out_mode="grid6"/"packed32g6") is
        supported for this configuration."""
        return False

    def grid36_input_ok(self, in_spec: FrameSpec,
                        out_spec: FrameSpec) -> bool:
        """True if make_process_linked(in_split="grid6") is supported."""
        return False

    # -- GRID9 (3x3 row x col phase) dataflow (round 5) ----------------------
    # The 1.5x-upscale extension (720p -> 1080p, the most common HD
    # upscale): the grid36 stencil machinery at period 3
    # (convert.can_grid9).  RGB outputs only.

    def grid9_head_ok(self, in_spec: FrameSpec, out_spec: FrameSpec) -> bool:
        """True if this element can HEAD a grid9 chain
        (make_process_linked(in_split="quad",
        out_mode="grid3"/"packed32g3"))."""
        return False

    def grid9_output_ok(self, in_spec: FrameSpec,
                        out_spec: FrameSpec) -> bool:
        """True if make_process_linked(out_mode="grid3"/"packed32g3") is
        supported for this configuration."""
        return False

    def grid9_input_ok(self, in_spec: FrameSpec,
                       out_spec: FrameSpec) -> bool:
        """True if make_process_linked(in_split="grid3") is supported."""
        return False

    def source_split_worth_it(self, in_spec: FrameSpec, out_spec: FrameSpec,
                              out_mode: str) -> bool:
        """Whether a split-provisioned SOURCE upload pays off for this
        element given its negotiated output layout.  Default yes (identity
        paths avoid device-side u8 relayouts); geometry-dependent
        consumers (convertscale's scaled phase path, which only pays when
        its own output is split) override."""
        return True

    def make_process_linked(
        self, in_spec: FrameSpec, out_spec: FrameSpec, static,
        in_split: bool = False, out_mode: str = "full",
    ) -> ProcessFn:
        """make_process with negotiated boundary layouts.  The pipeline only
        passes in_split=True / out_mode != "full" when split_input_ok /
        split_output_ok agreed for the link."""
        if in_split or out_mode != "full":
            raise NotImplementedError(
                f"{self.ELEMENT_NAME}: split links not supported")
        return self.make_process(in_spec, out_spec, static)

    def __repr__(self):
        return f"<{type(self).__name__} {self.name!r}>"


class SourceElement(Element):
    """Produces frames host-side (numpy, native layout)."""

    KLASS = "Source/Video"

    def output_spec(self, out_filter: Optional[CapsFilter]) -> FrameSpec:
        raise NotImplementedError

    def generate(self, frame_index: int, spec: FrameSpec):
        """-> host-layout frame data (numpy)."""
        raise NotImplementedError

    def num_frames(self) -> Optional[int]:
        """None = unbounded; else the num-buffers limit."""
        n = self.props.get("num-buffers") if self.props.has("num-buffers") else -1
        return None if n is None or int(n) < 0 else int(n)

    # -- per-buffer timing/metadata (the GstBuffer pts + flags analog) -----

    def timestamp_offset(self) -> float:
        """Stream start time in seconds (timestamp-offset property, ns)."""
        if self.props.has("timestamp-offset"):
            return float(self.props.get("timestamp-offset")) / 1e9
        return 0.0

    def buffer_pts(self, frame_index: int, spec: FrameSpec) -> float:
        """Presentation timestamp of buffer `frame_index` in seconds.
        Default: offset + index/fps.  Must be monotonic in frame_index."""
        fps = float(spec.fps) or 25.0
        return self.timestamp_offset() + frame_index / fps

    def buffer_meta(self, frame_index: int, spec: FrameSpec) -> Dict:
        """Per-buffer flags (the GST_VIDEO_BUFFER_FLAG_* analog).  Keys:
        'tff' (field order of THIS buffer, gstvfmetaldeinterlace.m:169-185).
        Sources with real per-buffer flags (appsrc) override."""
        return {"tff": bool(spec.tff)}


class SinkElement(Element):
    """Consumes frames host-side."""

    KLASS = "Sink/Video"

    def accepts_format(self, fmt: VideoFormat) -> bool:
        return not self.IN_FORMATS or fmt in self.IN_FORMATS

    def prepare(self, in_spec: FrameSpec):
        """Called once at negotiation; may allocate files/windows."""

    def consume(self, host_frame, spec: FrameSpec, frame_index: int) -> None:
        raise NotImplementedError

    def finalize(self) -> None:
        """End-of-stream."""
