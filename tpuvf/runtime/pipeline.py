"""Pipeline graph: negotiation, whole-chain compilation, frame loop.

Replaces GStreamer's runtime with a TPU-native design:

- **Negotiation** happens once at graph build: FrameSpecs propagate from
  sources through each element's `transform_spec` rule (the analog of
  transform_caps/fixate_caps), constrained by per-link caps filters.
- **Compilation**: every non-passthrough element contributes a pure
  function; the whole chain is composed and jitted as ONE XLA program, so
  intermediate frames live in HBM only and XLA fuses across element
  boundaries (the reference instead round-trips CPU<->GPU per element,
  metalconvertscalerenderer.m:488-507).
- **Passthrough elision**: elements reporting is_passthrough are dropped
  from the compiled chain entirely — the buffer-donation analog of the
  reference's zero-copy passthrough.
- **State** (deinterlace prev-frame, filter frame counter) is an explicit
  pytree threaded through the jitted step and donated between frames.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Dict, List, Optional

import jax
import numpy as np

from tpuvf.core.element import Element, SinkElement, SourceElement
from tpuvf.core.frame import host_to_planes, planes_to_host
from tpuvf.core.spec import CapsFilter, FrameSpec
from tpuvf.runtime.observability import (
    PipelineError,
    PipelineStats,
    get_logger,
    trace,
)

_log = get_logger("pipeline")


def _pad_rows_host(arr: np.ndarray, row_pad) -> np.ndarray:
    """Bottom-pad a host plane's rows (-2) to the row_pad ratio
    (true_frame_rows, padded_frame_rows) with edge replication.  Leaves
    whose rows aren't proportional to the ratio pass through unchanged
    (non-plane state)."""
    true_r, padded_r = row_pad
    r = arr.shape[-2]
    if (r * padded_r) % true_r:
        return arr
    rp = r * padded_r // true_r
    if rp == r:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[-2] = (0, rp - r)
    return np.pad(arr, widths, mode="edge")


def _crop_rows_host(arr: np.ndarray, row_pad) -> np.ndarray:
    """Inverse of _pad_rows_host: drop the pad rows from a host result."""
    true_r, padded_r = row_pad
    r = arr.shape[-2]
    if (r * true_r) % padded_r:
        return arr
    rt = r * true_r // padded_r
    return arr if rt == r else arr[..., :rt, :]


@dataclass
class Link:
    upstream: Element
    downstream: Element
    caps: Optional[CapsFilter] = None
    sink_pad: Optional[str] = None  # for aggregator request pads
    spec: Optional[FrameSpec] = None  # filled by negotiate()


@dataclass
class CompiledStage:
    element: Element
    in_spec: FrameSpec
    out_spec: FrameSpec
    passthrough: bool
    process: Optional[callable] = None


class _StageFailure(Exception):
    """Internal: tags an exception with the stage (element) that raised it
    while tracing/executing the composed step."""

    def __init__(self, element_name: str, cause: Exception):
        super().__init__(f"{element_name}: {cause}")
        self.element_name = element_name
        self.cause = cause


class Pipeline:
    def __init__(self):
        self.elements: List[Element] = []
        self.links: List[Link] = []
        self._by_name: Dict[str, Element] = {}
        self._stages: List[CompiledStage] = []
        self._step = None
        self._state = None
        self._negotiated = False
        self._source_split = {}
        self._comp_split_pads = {}
        self._sp_replicated = set()
        self._sp_rep_sources = set()
        self._sp_graph_ok = True

    # -- construction ------------------------------------------------------

    def add(self, element: Element) -> Element:
        if element.name in self._by_name:
            raise ValueError(f"duplicate element name {element.name!r}")
        self.elements.append(element)
        self._by_name[element.name] = element
        return element

    def link(self, upstream, downstream, caps=None, sink_pad=None) -> Link:
        ln = Link(upstream, downstream, caps, sink_pad)
        self.links.append(ln)
        return ln

    def __getitem__(self, name: str) -> Element:
        return self._by_name[name]

    # -- graph helpers -----------------------------------------------------

    def _incoming(self, element) -> List[Link]:
        return [l for l in self.links if l.downstream is element]

    def _outgoing(self, element) -> List[Link]:
        return [l for l in self.links if l.upstream is element]

    @property
    def sources(self) -> List[SourceElement]:
        return [e for e in self.elements if isinstance(e, SourceElement)]

    @property
    def sinks(self) -> List[SinkElement]:
        return [e for e in self.elements if isinstance(e, SinkElement)]

    def _topo_order(self) -> List[Element]:
        indeg = {id(e): len(self._incoming(e)) for e in self.elements}
        ready = [e for e in self.elements if indeg[id(e)] == 0]
        order = []
        while ready:
            e = ready.pop(0)
            order.append(e)
            for ln in self._outgoing(e):
                indeg[id(ln.downstream)] -= 1
                if indeg[id(ln.downstream)] == 0:
                    ready.append(ln.downstream)
        if len(order) != len(self.elements):
            raise ValueError("pipeline graph has a cycle or dangling link")
        return order

    # -- negotiation -------------------------------------------------------

    def negotiate(self) -> None:
        from tpuvf.elements.compositor import Compositor  # circular-safe

        for e in self.elements:
            ins, outs = self._incoming(e), self._outgoing(e)
            if isinstance(e, SourceElement):
                if ins:
                    raise ValueError(f"source {e.name} has inputs")
                if len(outs) > 1:
                    raise ValueError(
                        f"source {e.name} has {len(outs)} downstream links; "
                        f"a src pad links once — use a tee to fan out")
            elif isinstance(e, SinkElement):
                if len(ins) != 1:
                    raise ValueError(f"sink {e.name} needs exactly 1 input")
                if outs:
                    raise ValueError(f"sink {e.name} has outputs")
            elif isinstance(e, Compositor):
                if not ins:
                    raise ValueError(f"{e.name} has no inputs")
            elif getattr(e, "FAN_OUT", False):
                # tee: one input, any number of output branches
                if len(ins) != 1 or not outs:
                    raise ValueError(
                        f"tee {e.name} needs exactly one input and at "
                        f"least one output branch")
            else:
                if len(ins) != 1 or len(outs) != 1:
                    raise ValueError(
                        f"element {e.name} must have exactly one input and "
                        f"one output"
                    )

        for e in self._topo_order():
            outs = self._outgoing(e)
            if isinstance(e, SourceElement):
                caps = outs[0].caps if outs else None
                spec = e.output_spec(caps)
                for ln in outs:
                    ln.spec = spec
            elif isinstance(e, SinkElement):
                e.prepare(self._incoming(e)[0].spec)
            elif isinstance(e, Compositor):
                # assign request-pad names to unnamed links in request order
                used = {ln.sink_pad for ln in self._incoming(e) if ln.sink_pad}
                next_idx = 0
                for ln in self._incoming(e):
                    if ln.sink_pad is None:
                        while f"sink_{next_idx}" in used:
                            next_idx += 1
                        ln.sink_pad = f"sink_{next_idx}"
                        used.add(ln.sink_pad)
                    e.get_pad(ln.sink_pad)  # ensure the pad bag exists
                pad_specs = {ln.sink_pad: ln.spec for ln in self._incoming(e)}
                out_caps = outs[0].caps if outs else None
                spec = e.aggregate_spec(pad_specs, out_caps)
                for ln in outs:
                    ln.spec = spec
            elif getattr(e, "FAN_OUT", False):
                # tee never converts: every branch carries the input spec;
                # branch caps filters are pure constraints
                spec = self._incoming(e)[0].spec
                for ln in outs:
                    if ln.caps is not None and not ln.caps.accepts(spec):
                        raise ValueError(
                            f"tee {e.name}: branch caps {ln.caps} reject "
                            f"the stream spec {spec} (tee cannot convert; "
                            f"put a convertscale on the branch)")
                    ln.spec = spec
            else:
                in_spec = self._incoming(e)[0].spec
                out_caps = outs[0].caps if outs else None
                spec = e.transform_spec(in_spec, out_caps)
                for ln in outs:
                    ln.spec = spec
        self._negotiated = True

    # -- compilation -------------------------------------------------------

    def build(self) -> None:
        from tpuvf.elements.compositor import Compositor

        if not self._negotiated:
            self.negotiate()
        order = self._topo_order()
        link_plan, self._source_split, self._comp_split_pads = \
            self._link_plan()
        self.link_plan = link_plan  # exposed for tests/inspection
        folds, folded_ids = self._plan_overlay_folds(link_plan)
        self.overlay_folds = folds  # exposed for tests/inspection
        # spatial-sharding branch plan (consulted when run_batched runs
        # with an sp axis): aggregator-feeding branches stay replicated
        self._sp_replicated, self._sp_rep_sources, self._sp_graph_ok = \
            self._sp_plan()
        stages: List[CompiledStage] = []
        state: Dict[str, object] = {}
        for e in order:
            if isinstance(e, (SourceElement, SinkElement)):
                continue
            if id(e) in folded_ids:
                # overlay folded into the upstream compositor's render pass:
                # its stage forwards the compositor's (already overlaid)
                # output
                in_spec = self._incoming(e)[0].spec
                out_spec = self._outgoing(e)[0].spec
                stages.append(CompiledStage(e, in_spec, out_spec, True))
                continue
            if getattr(e, "HOST_CODEC", False):
                # encoders run host-side at the sink edge; device graph
                # treats them as identity
                in_spec = self._incoming(e)[0].spec
                out_spec = self._outgoing(e)[0].spec
                stages.append(CompiledStage(e, in_spec, out_spec, True))
                continue
            if isinstance(e, Compositor):
                pad_links = sorted(
                    self._incoming(e), key=lambda l: l.sink_pad or ""
                )
                out_spec = self._outgoing(e)[0].spec
                _, comp_mode = link_plan.get(e.name, (False, "full"))
                fold_elems = folds.get(e.name, ())
                if fold_elems:
                    # the compositor takes over the folded overlay's
                    # downstream boundary contract
                    comp_mode = link_plan.get(
                        fold_elems[-1].name, (False, "full"))[1]
                process = e.make_aggregate(
                    {l.sink_pad: l.spec for l in pad_links}, out_spec,
                    out_mode=comp_mode,
                    split_pads=self._comp_split_pads.get(e.name, frozenset()),
                    fold_overlays=tuple(fold_elems),
                )
                st = CompiledStage(e, None, out_spec, False, process)
                stages.append(st)
                state[e.name] = e.init_state(None, out_spec)
                continue
            in_spec = self._incoming(e)[0].spec
            out_spec = self._outgoing(e)[0].spec
            if e.is_passthrough(in_spec, out_spec):
                stages.append(CompiledStage(e, in_spec, out_spec, True))
                continue
            static = e.static_config(in_spec, out_spec)
            in_split, out_mode = link_plan.get(e.name, (False, "full"))
            process = e.make_process_linked(
                in_spec, out_spec, static,
                in_split=in_split, out_mode=out_mode)
            stages.append(CompiledStage(e, in_spec, out_spec, False, process))
            state[e.name] = e.init_state(in_spec, out_spec)

        # preserve per-element carried state across reconfiguration rebuilds
        # (only when the state pytree still has the same structure+shapes —
        # a boundary-layout change can re-shape e.g. the deinterlacer's
        # prev-frame phases, and stale carry must then reset)
        def _same_shape(a, b):
            ta, tb = jax.tree_util.tree_structure(a), \
                jax.tree_util.tree_structure(b)
            if ta != tb:
                return False
            la = jax.tree_util.tree_leaves(a)
            lb = jax.tree_util.tree_leaves(b)
            return all(np.shape(x) == np.shape(y) for x, y in zip(la, lb))

        old_state = getattr(self, "_state", None) or {}
        for name, st in old_state.items():
            if name in state and _same_shape(st, state[name]):
                state[name] = st

        self._stages = stages
        self._state = state
        self._mesh_state = None  # tiled per-shard state is build-specific
        self._built_signature = self._static_signature()
        self.stats = PipelineStats()
        for st in stages:
            self.stats.per_element_active[st.element.name] = not st.passthrough
            if st.passthrough:
                _log.debug("element %s: passthrough (elided)", st.element.name)

        # Build a closure evaluating the DAG on device values.
        incoming = {id(e): self._incoming(e) for e in self.elements}
        stage_by_elem = {id(s.element): s for s in stages}
        sinks = self.sinks  # tee fan-out: every sink reads its branch tail

        def make_step(proc_overrides: Dict[str, callable]):
            """Compose the chain step; proc_overrides swaps an element's
            process fn (used for host-selected program variants, e.g. the
            compositor's fast/general render bodies)."""

            def step(inputs: Dict[str, Dict], state: Dict, params: Dict):
                return _run_step(inputs, state, params, proc_overrides)

            return step

        def _run_step(inputs, state, params, proc_overrides):
            from tpuvf.parallel import spctx

            produced: Dict[int, Dict] = {}

            def value_of(elem) -> Dict:
                if isinstance(elem, SourceElement):
                    return inputs[elem.name]
                return produced[id(elem)]

            new_state = dict(state)
            active_ax = spctx.active_axis()
            for st in stages:
                e = st.element
                if st.passthrough:
                    produced[id(e)] = value_of(incoming[id(e)][0].upstream)
                    continue
                proc = proc_overrides.get(e.name, st.process)
                # per-stage spatial scope: aggregator-feeding branches run
                # REPLICATED under sp (their planes hold full rows), so
                # their kernels must NOT halo-exchange — suspend the axis
                # while tracing them (_sp_plan)
                stage_ax = (None if e.name in self._sp_replicated
                            else active_ax)
                scope = spctx.spatial_axis(stage_ax)
                try:
                    with scope:
                        if isinstance(e, Compositor):
                            # per-pad buffer metadata rides the frame dicts
                            # (the GstBuffer pts/flags analog) and reaches
                            # the aggregate as params["__pad_meta__"]
                            pad_inputs, pad_meta = {}, {}
                            for l in incoming[id(e)]:
                                v = value_of(l.upstream)
                                key = l.sink_pad or ""
                                pad_meta[key] = v.get("__meta__")
                                pad_inputs[key] = {
                                    k: x for k, x in v.items()
                                    if k != "__meta__"
                                }
                            prm = dict(params.get(e.name, {}))
                            prm["__pad_meta__"] = pad_meta
                            out, new_state[e.name] = proc(
                                pad_inputs, state.get(e.name, ()), prm
                            )
                            out = dict(out)
                            out["__meta__"] = None  # new stream from here
                        else:
                            src = value_of(incoming[id(e)][0].upstream)
                            meta = src.get("__meta__")
                            planes = {
                                k: x for k, x in src.items()
                                if k != "__meta__"
                            }
                            prm = params.get(e.name, {})
                            if meta is not None:
                                prm = dict(prm)
                                prm["__meta__"] = meta
                            out, new_state[e.name] = proc(
                                planes, state.get(e.name, ()), prm
                            )
                            if meta is not None:
                                out = dict(out)
                                out["__meta__"] = meta  # flags travel
                except _StageFailure:
                    raise
                except Exception as exc:
                    # tags trace-time failures with the real element; runtime
                    # (post-compile) failures are bisected in _locate_failure
                    raise _StageFailure(e.name, exc) from exc
                produced[id(e)] = out
            # buffer metadata stops at the host boundary
            def strip_meta(d):
                return {k: v for k, v in d.items() if k != "__meta__"}

            if len(sinks) > 1:
                # multi-sink (tee fan-out): one output pytree keyed by sink
                # name; shared subgraphs are deduped by XLA, each sink gets
                # its own host readback
                out = {
                    sk.name: strip_meta(value_of(incoming[id(sk)][0].upstream))
                    for sk in sinks
                }
            elif sinks:
                out = strip_meta(value_of(incoming[id(sinks[0])][0].upstream))
            else:
                last = stages[-1].element if stages else self.sources[0]
                out = strip_meta(value_of(last))
            return out, new_state

        self._step_py = make_step({})  # eager variant for failure bisection
        self._step = jax.jit(make_step({}), donate_argnums=(1,))
        # host-selected program variants: an element's process may expose
        # .variants + .variant_select (the compositor's fast/general render
        # bodies) — each combination compiles ONCE (first use; the all-fast
        # combo is the steady state); run() picks per frame on the host,
        # so steady-state frames skip the lax.cond whose branch-output
        # copies cost ~0.3 ms at 4K while animation still recompiles
        # nothing.  Multiple variant-capable elements (two compositors in
        # one graph) each get their own host pick; the per-combination
        # steps are cached.
        self._variant_stages = [
            st for st in stages
            if not st.passthrough and hasattr(st.process, "variants")
        ]
        # which SOURCE's per-buffer metadata reaches each variant stage
        # (meta rides linear chains unchanged and resets at aggregators) —
        # lets variant_select see the frame's flags (deinterlace TFF)
        self._meta_root = {
            st.element.name: self._meta_source_of(st.element)
            for st in self._variant_stages
        }
        self._make_step = make_step
        self._step_cache: Dict[frozenset, object] = {}
        # legacy single-stage views (tests/introspection)
        self._variant_stage = (self._variant_stages[0]
                               if self._variant_stages else None)
        self._step_fast = None
        if self._variant_stages:
            all_fast = frozenset(
                st.element.name for st in self._variant_stages)
            self._step_fast = self._variant_step(all_fast)
        self._codec_chain = self._collect_codec_chain(stage_by_elem)
        self._wire_navigation()

    def _steady_body(self, st):
        """An element's steady-state render body: the cell-partition
        renderer when available (one canvas write, no per-draw DUS chain —
        measured ~20% faster at 4K than the DUS fold), else the cond-free
        fast body."""
        return st.process.variants.get("cells", st.process.variants["fast"])

    def _variant_step(self, fast_names: frozenset):
        """The jitted step with the given elements on their steady-state
        bodies (compiled once per combination, cached)."""
        step = self._step_cache.get(fast_names)
        if step is None:
            overrides = {
                st.element.name: self._steady_body(st)
                for st in self._variant_stages
                if st.element.name in fast_names
            }
            step = jax.jit(self._make_step(overrides), donate_argnums=(1,))
            self._step_cache[fast_names] = step
        return step

    def _sp_plan(self):
        """Spatial-sharding branch plan: under sp row sharding, branches
        FEEDING aggregator pads run REPLICATED (every shard computes the
        whole pad — pads are small relative to the canvas and their draw
        offsets cross shard boundaries arbitrarily), while the aggregator
        and everything downstream shard rows.  Returns (replicated_names,
        replicated_source_names, ok); ok=False when some node feeds both
        an aggregator branch and a sharded path (un-shardable graph)."""
        from tpuvf.elements.compositor import Compositor

        comps = [e for e in self.elements if isinstance(e, Compositor)]
        if not comps:
            return set(), set(), True
        replicated: set = set()
        stack = []
        for c in comps:
            for ln in self._incoming(c):
                stack.append(ln.upstream)
        while stack:
            n = stack.pop()
            if n.name in replicated:
                continue
            replicated.add(n.name)
            for ln in self._incoming(n):
                stack.append(ln.upstream)
        ok = True
        for e in self.elements:
            if e.name not in replicated:
                continue
            for ln in self._outgoing(e):
                d = ln.downstream
                if d.name in replicated:
                    continue
                if isinstance(d, Compositor):
                    continue  # feeds the (sharded) aggregator itself
                ok = False
        rep_sources = {
            s.name for s in self.sources if s.name in replicated
        }
        return replicated, rep_sources, ok

    def _plan_overlay_folds(self, link_plan):
        """Detect `vfcompositor ! (passthroughs) ! vfoverlay` chains whose
        overlay rect blend can run as a final 'mix' draw of the
        compositor's own render pass (one pass, like the reference drawing
        the overlay quad in the same command buffer).  Measured ~6-15%
        on the 4-pad 4K + overlay config (the overlay's full-canvas
        read+write round trip disappears).  Returns
        ({comp_name: [overlay, ...]}, {id(overlay), ...}).

        Fold conditions: RGB output (for YUV outputs the separate overlay
        mixes after the YUV round trip — different values), the overlay's
        static rect blend is foldable (image loaded, identity spec), and
        the compositor can honor the overlay's negotiated downstream
        boundary layout (split-capable, or the contract is canonical)."""
        from tpuvf.core.formats import RGB_FORMATS
        from tpuvf.elements.compositor import Compositor
        from tpuvf.elements.overlay import Overlay

        folds: Dict[str, list] = {}
        folded_ids: set = set()
        for e in self.elements:
            if not isinstance(e, Compositor):
                continue
            outs = self._outgoing(e)
            if len(outs) != 1 or outs[0].spec is None:
                continue
            out_spec = outs[0].spec
            if out_spec.format not in RGB_FORMATS:
                continue
            chain = []
            node = outs[0].downstream
            while True:
                ins, nouts = self._incoming(node), self._outgoing(node)
                if len(ins) != 1 or len(nouts) != 1:
                    break
                i_s, o_s = ins[0].spec, nouts[0].spec
                if i_s is None or o_s is None:
                    break
                if isinstance(node, Overlay):
                    if not node.fold_into_aggregate_ok(i_s, o_s):
                        break
                    chain.append(node)
                    node = nouts[0].downstream
                    continue
                if (getattr(node, "HOST_CODEC", False)
                        or isinstance(node, (SourceElement, SinkElement))
                        or not node.is_passthrough(i_s, o_s)):
                    break
                node = nouts[0].downstream
            if not chain:
                continue
            # the compositor must be able to emit the LAST overlay's
            # negotiated boundary layout
            ov_mode = link_plan.get(chain[-1].name, (False, "full"))[1]
            if ov_mode != "full":
                pad_specs = {
                    l.sink_pad: l.spec for l in self._incoming(e)
                    if l.spec is not None
                }
                if (len(pad_specs) != len(self._incoming(e))
                        or not e.aggregate_split_ok(pad_specs, out_spec)):
                    continue
            folds[e.name] = chain
            folded_ids.update(id(ov) for ov in chain)
        return folds, folded_ids

    def _wire_navigation(self) -> None:
        """Route navigation events from the videosink upstream, the analog of
        the reference's event flow: the sink transforms pointer coords into
        video space and pushes the event up the pipeline
        (gstvfmetalvideosink.m:407-440); a compositor on the way hit-tests
        its pads, rescales into the hit pad's input coordinates and forwards
        up THAT branch (gstvfmetalcompositor.m:705-787).  Delivery: the
        owning source's `navigation_callback` if set, plus
        `pipeline.navigation_events` for inspection."""
        from tpuvf.elements.compositor import Compositor
        from tpuvf.elements.videosink import VideoSink

        self.navigation_events: List[Dict] = []
        sink = next((s for s in self.sinks if isinstance(s, VideoSink)), None)
        if sink is None:
            return

        def route(ev: Dict) -> None:
            node = self._incoming(sink)[0].upstream
            x, y = ev["pointer_x"], ev["pointer_y"]
            while True:
                if isinstance(node, SourceElement):
                    break
                if isinstance(node, Compositor):
                    pad_specs = {
                        l.sink_pad: l.spec for l in self._incoming(node)
                    }
                    hit = node.navigation_event(x, y, pad_specs)
                    if hit is None:
                        return  # no pad under the pointer: event stops here
                    pad_name, x, y = hit
                    link = next(l for l in self._incoming(node)
                                if l.sink_pad == pad_name)
                    node = link.upstream
                    continue
                ins = self._incoming(node)
                if not ins:
                    break
                outs = self._outgoing(node)
                if (ins[0].spec is not None and outs and
                        outs[0].spec is not None):
                    in_s, out_s = ins[0].spec, outs[0].spec
                    if (in_s.width, in_s.height) != (out_s.width,
                                                     out_s.height):
                        # rescale coords across resizing elements (the
                        # videoscale src_event convention)
                        x = x * in_s.width / out_s.width
                        y = y * in_s.height / out_s.height
                node = ins[0].upstream
            routed = dict(ev)
            routed["pointer_x"], routed["pointer_y"] = x, y
            routed["source"] = node.name
            self.navigation_events.append(routed)
            cb = getattr(node, "navigation_callback", None)
            if cb is not None:
                cb(routed)

        sink.navigation_callback = route

    def _collect_codec_chain(self, stage_by_elem) -> Dict[str, List[Element]]:
        """Host-side encoder chains at each sink edge, walking upstream
        through passthrough-elided elements (so `pngenc ! queue ! filesink`
        encodes).  Multi-sink graphs get one chain per sink; a tee ends the
        walk (codecs upstream of a fan-out would encode every branch).  Any
        HOST_CODEC element NOT reachable this way would silently write
        unencoded bytes — reject the graph instead."""
        chains: Dict[str, List[Element]] = {}
        reachable: set = set()
        for sink in self.sinks:
            codecs: List[Element] = []
            node = self._incoming(sink)[0].upstream
            while node is not None:
                if getattr(node, "FAN_OUT", False):
                    break  # branch-local chains only
                if getattr(node, "HOST_CODEC", False):
                    codecs.append(node)
                else:
                    st = stage_by_elem.get(id(node))
                    if st is None or not st.passthrough:
                        break
                ins = self._incoming(node)
                node = ins[0].upstream if ins else None
            codecs.reverse()
            chains[sink.name] = codecs
            reachable.update(id(c) for c in codecs)
        stray = [
            e.name for e in self.elements
            if getattr(e, "HOST_CODEC", False) and id(e) not in reachable
        ]
        if stray:
            raise ValueError(
                f"host-codec element(s) {stray} must form a contiguous chain "
                f"directly upstream of a sink (only passthrough elements "
                f"in between)")
        return chains

    # -- execution ---------------------------------------------------------

    def params(self) -> Dict[str, Dict]:
        """Snapshot of traced per-frame params for every active element."""
        return {
            st.element.name: st.element.traced_params()
            for st in self._stages
            if not st.passthrough
        }

    def _stage_params(self):
        """device_put the current params once; remember host-array object
        identities so per-frame snapshots can reuse the device copies."""
        host = self.params()
        self._staged_ids = {
            name: {k: id(v) for k, v in d.items() if isinstance(v, np.ndarray)
                   and v.size > 64}
            for name, d in host.items()
        }
        return jax.device_put(host)

    def _frame_params(self, dev_params) -> Dict[str, Dict]:
        """Per-frame snapshot honoring controllable properties: traced
        scalars are re-read from the property bags (the GST_OBJECT_LOCK
        snapshot analog) while unchanged large arrays (weight buffers, LUT
        tables) reuse the device copies staged at run start."""
        merged = {}
        staged_ids = getattr(self, "_staged_ids", {})
        for st in self._stages:
            if st.passthrough:
                continue
            name = st.element.name
            fresh = st.element.traced_params()
            staged = dev_params.get(name, {})
            ids = staged_ids.get(name, {})
            merged[name] = {
                k: (staged[k] if k in staged and ids.get(k) == id(v) else v)
                for k, v in fresh.items()
            }
        return merged

    def _ctl_structure(self):
        """Structural fingerprint of every controlled element: static
        config + passthrough status.  run_batched compiles ONE scanned
        program per call, so a schedule may animate traced scalars freely
        but must not flip structure mid-call (run() handles that case by
        rebuilding per frame)."""
        out = {}
        for st in self._stages:
            el = st.element
            if not getattr(el, "_controllers", None):
                continue
            static = (el.static_config(st.in_spec, st.out_spec)
                      if st.in_spec is not None else None)
            pt = (el.is_passthrough(st.in_spec, st.out_spec)
                  if st.in_spec is not None else False)
            out[el.name] = (static, pt)
        return out

    def _ctl_frame_params(self, frame: int, structure) -> Dict[str, Dict]:
        """Sync controlled elements to `frame` and return their traced
        SCALAR params (weight buffers excluded — schedules animate
        controllable floats only), verifying structure stability."""
        out = {}
        for st in self._stages:
            el = st.element
            if not getattr(el, "_controllers", None):
                continue
            el.sync_frame(frame)
            static = (el.static_config(st.in_spec, st.out_spec)
                      if st.in_spec is not None else None)
            pt = (el.is_passthrough(st.in_spec, st.out_spec)
                  if st.in_spec is not None else False)
            if (static, pt) != structure.get(el.name):
                raise ValueError(
                    f"controlled property schedule on {el.name!r} changes "
                    f"pipeline structure at frame {frame} (static config "
                    f"or passthrough flips) — run_batched compiles one "
                    f"program per call; use run() for structural "
                    f"animation, or split the schedule across calls")
            if st.passthrough:
                continue
            out[el.name] = {
                k: v for k, v in el.traced_params().items()
                if np.ndim(v) == 0
            }
        return out

    def _link_plan(self) -> Dict[str, tuple]:
        """Negotiate per-element boundary layouts for column-phase dataflow
        (core.element docs).  PURE — mutates nothing; returns
        ({element_name: (in_split, out_mode)}, source_split_names,
        {compositor_name: split_pad_names}); build() assigns the fields.

        A producer whose split_output_ok holds gets out_mode "split" when the
        next non-passthrough element downstream consumes phases
        (split_input_ok), or "packed16" when its output reaches the sink —
        the u16-word layout whose bytes equal the interleaved u8 plane, so
        the column interleave never runs as a separate u8 pass (measured
        ~0.74 ms of the 0.96 ms 4K chain frame).

        TPUVF_NO_SPLIT_LINKS forces every boundary canonical (the
        differential link-layout fuzzer's baseline; also an escape hatch
        — outputs stay within 1 LSB of the planned layouts)."""
        import os

        from tpuvf.elements.compositor import Compositor

        if os.environ.get("TPUVF_NO_SPLIT_LINKS"):
            return {}, {}, {}

        info = {}
        producers = []  # (element, can_split_out)
        for e in self.elements:
            if isinstance(e, (SourceElement, SinkElement)):
                continue
            ins, outs = self._incoming(e), self._outgoing(e)
            if isinstance(e, Compositor):
                # aggregators are split PRODUCERS only (pads stay canonical)
                if len(outs) == 1 and outs[0].spec is not None:
                    pad_specs = {
                        l.sink_pad: l.spec for l in ins
                        if l.spec is not None
                    }
                    if pad_specs and len(pad_specs) == len(ins):
                        producers.append(
                            (e, e.aggregate_split_ok(pad_specs,
                                                     outs[0].spec)))
                continue
            if (len(ins) != 1 or len(outs) != 1
                    or ins[0].spec is None or outs[0].spec is None):
                continue
            i_s, o_s = ins[0].spec, outs[0].spec
            pt = (bool(getattr(e, "HOST_CODEC", False))
                  or e.is_passthrough(i_s, o_s))
            info[id(e)] = (e, i_s, o_s, pt)

        plan: Dict[str, list] = {}

        def entry(name):
            return plan.setdefault(name, [False, "full"])

        for e, i_s, o_s, pt in info.values():
            if not pt and e.split_output_ok(i_s, o_s):
                producers.append((e, True))

        for e, ok in producers:
            if not ok:
                continue
            node, consumer = e, None
            while True:
                outs = self._outgoing(node)
                if not outs:
                    break
                node = outs[0].downstream
                d = info.get(id(node))
                if d is None:
                    if isinstance(node, SinkElement):
                        consumer = node
                    break  # compositor or unknown: keep canonical layout
                if d[3]:
                    continue  # passthrough forwards the dict untouched
                consumer = d
                break
            if consumer is None:
                continue
            if isinstance(consumer, SinkElement):
                d = info.get(id(e))
                specs = (d[1], d[2]) if d is not None else (None, None)
                if e.edge_packed16_ok(*specs):
                    from tpuvf.core.formats import RGB_FORMATS

                    mode = "packed16"
                    if (specs[1] is not None
                            and specs[1].format in RGB_FORMATS
                            and e.edge_packed32_ok(*specs)):
                        # RGB edges emit u32 pixel words: one fusion, no
                        # per-channel u16 planes (element.edge_packed32_ok)
                        mode = "packed32"
                    entry(e.name)[1] = mode
            else:
                ce, ci, co, _ = consumer
                if ce.split_input_ok(ci, co):
                    entry(e.name)[1] = "split"
                    entry(ce.name)[0] = True

        # -- source provisioning: device-side u8 deinterleaves cost full-
        # plane relayout copies, so when a split-capable consumer's REAL
        # upstream is a source, the host repack splits the planes during
        # upload instead (core.frame.split_planes_host / quad_planes_host;
        # values: "cols" | "quad") ---------------------------------------
        source_split: Dict[str, str] = {}
        comp_split_pads = {}

        def real_upstream(e):
            node = e
            while True:
                ins = self._incoming(node)
                if not ins:
                    return node
                node = ins[0].upstream
                d = info.get(id(node))
                if d is None:
                    return node
                if not d[3]:
                    return node  # a real producer element

        def quad_upstream_chain(e):
            """Walk upstream from `e` to a single-output Source through
            non-passthrough elements that carry quad links at identity
            (round 5: a deinterlace/filter stage BEFORE a grid upscale
            head rides the quad boundary — its {"y_ee",...,"u","v"}
            f32 quant_sim planes are the same contract as the quad
            source provisioning the grid samplers read).  Returns
            (source, [(elem, in_spec, out_spec) innermost-first]) or
            None."""
            mids = []
            node = e
            while True:
                ins = self._incoming(node)
                if len(ins) != 1:
                    return None
                upn = ins[0].upstream
                if isinstance(upn, SourceElement):
                    if len(self._outgoing(upn)) != 1:
                        return None
                    mids.reverse()  # source-first order
                    return upn, mids
                d = info.get(id(upn))
                if d is None:
                    return None
                if len(self._outgoing(upn)) != 1:
                    return None  # fan-out (tee) would leak quad planes
                ue, ui, uo, upt = d
                if not upt:
                    if not (ue.quad_input_ok(ui, uo)
                            and ue.quad_output_ok(ui, uo)):
                        return None
                    mids.append((ue, ui, uo))
                node = upn

        for e, i_s, o_s, pt in info.values():
            if pt or not e.split_input_ok(i_s, o_s):
                continue
            out_mode = plan.get(e.name, [False, "full"])[1]
            if not e.source_split_worth_it(i_s, o_s, out_mode):
                continue  # e.g. scaled convertscale with a canonical edge
            up = real_upstream(e)
            if (isinstance(up, SourceElement)
                    and len(self._outgoing(up)) == 1):
                entry(e.name)[0] = True
                source_split[up.name] = "cols"
        # compositor pads: the split fast branch reads pad phases directly,
        # so source-fed full-identity pads upload pre-split (the general/
        # animated branch re-interleaves on u8)
        for e in self.elements:
            if not isinstance(e, Compositor):
                continue
            mode = plan.get(e.name, [False, "full"])[1]
            if mode == "full":
                continue
            pads = set()
            for ln in self._incoming(e):
                if ln.spec is None or ln.sink_pad is None:
                    continue
                up = real_upstream(ln.upstream) \
                    if info.get(id(ln.upstream), (None,) * 4)[3] \
                    else ln.upstream
                if (isinstance(up, SourceElement)
                        and len(self._outgoing(up)) == 1):
                    pads.add(ln.sink_pad)
                    # 4:2:0 pads also provision full-height PAIR chroma
                    # (frame.chroma_pair_rows): the LINEAR row upsample
                    # becomes elementwise-from-u8 and fuses into each
                    # cell fold instead of materializing a multi-
                    # consumer f32 plane (round-4's config-5 residual)
                    from tpuvf.core.formats import \
                        PLANAR_YUV_FORMATS as _PLANAR
                    pair = (ln.spec.format in _PLANAR
                            and ln.spec.height % 2 == 0
                            and not os.environ.get("TPUVF_NO_CHROMA_PAIR"))
                    source_split[up.name] = "cols_pair" if pair else "cols"
            if pads:
                comp_split_pads[e.name] = frozenset(pads)

        # -- QUAD (row x col phase) upgrade: a chain whose head reads a
        # quad-provisioned 4:2:0 source and stays quad-capable through
        # every element to the SINK swaps its links for quad layouts —
        # the chroma row 2x-upsample then fuses into the per-phase emits
        # instead of materializing full-height f32 planes (headline 4K
        # device 254 -> 190 us/frame, scripts/bench_rowphase.py).  Not
        # composable with sp row sharding: run_batched(sp_axis=...)
        # disables quad links and rebuilds (self._quad_links_enabled).
        if (not os.environ.get("TPUVF_NO_QUAD_LINKS")
                and getattr(self, "_quad_links_enabled", True)):
            from tpuvf.core.formats import RGB_FORMATS as _RGB
            from tpuvf.core.formats import VideoFormat as _VF

            for e, i_s, o_s, pt in list(info.values()):
                if pt or i_s.format not in (_VF.NV12, _VF.I420):
                    continue  # the win is the chroma row-stencil fusion
                up = real_upstream(e)
                if not (isinstance(up, SourceElement)
                        and len(self._outgoing(up)) == 1):
                    continue
                if not (e.quad_input_ok(i_s, o_s)
                        and e.quad_output_ok(i_s, o_s)):
                    continue
                chain = [(e, i_s, o_s)]
                node, reaches_sink = e, False
                while True:
                    outs = self._outgoing(node)
                    if len(outs) != 1:
                        break
                    node = outs[0].downstream
                    d = info.get(id(node))
                    if d is None:
                        reaches_sink = isinstance(node, SinkElement)
                        break
                    if d[3]:
                        continue  # passthrough forwards the dict untouched
                    ce, ci, co, _ = d
                    if not (ce.quad_input_ok(ci, co)
                            and ce.quad_output_ok(ci, co)):
                        break
                    chain.append((ce, ci, co))
                if not reaches_sink:
                    continue
                tail, t_i, t_o = chain[-1]
                if t_o.format in _RGB:
                    if not (tail.edge_packed16_ok(t_i, t_o)
                            and tail.edge_packed32_ok(t_i, t_o)):
                        continue
                    edge = "packed32q"
                elif t_o.format in (_VF.NV12, _VF.I420):
                    if not tail.edge_packed16_ok(t_i, t_o):
                        continue
                    edge = "packed16q"
                else:
                    continue
                for ce, _, _ in chain[:-1]:
                    plan[ce.name] = ["quad", "quad"]
                plan[tail.name] = ["quad", edge]
                source_split[up.name] = "quad"

        # -- GRID16 (4x4 phase) upgrade for exactly-2x 4:2:0 -> RGB
        # upscale chains: the head reads the quad-provisioned source and
        # emits SIXTEEN (row mod 4, col mod 4) output phases (every
        # bilinear tap is a phase-fixed 2-tap stencil); downstream
        # grid-capable elements stay per-phase to a packed32g sink edge.
        # The whole upscale chain then fuses with zero resampling
        # materialization — the 2-phase plan materializes full-res f32
        # chroma (421 -> 233 us/frame at 1080p->4K,
        # scripts/bench_upscale_p44.py).  Disjoint from the quad upgrade
        # (quad requires identity geometry); shares its gates (env knob,
        # sp row sharding disables and rebuilds via the quad source
        # provisioning).
        if (not os.environ.get("TPUVF_NO_QUAD_LINKS")
                and getattr(self, "_quad_links_enabled", True)):
            from tpuvf.core.formats import RGB_FORMATS as _RGB
            from tpuvf.core.formats import VideoFormat as _VFt

            for e, i_s, o_s, pt in list(info.values()):
                if pt or not e.grid_head_ok(i_s, o_s):
                    continue
                up = real_upstream(e)
                if (isinstance(up, SourceElement)
                        and len(self._outgoing(up)) == 1):
                    mids = []
                else:
                    # round 5: quad-capable identity stages (deinterlace,
                    # filter) may sit between the source and the grid
                    # head — they ride quad links and the head reads the
                    # quad boundary (same contract as the provisioned
                    # source planes)
                    found = quad_upstream_chain(e)
                    if found is None:
                        continue
                    up, mids = found
                chain = [(e, i_s, o_s)]
                node, reaches_sink = e, False
                while True:
                    outs = self._outgoing(node)
                    if len(outs) != 1:
                        break
                    node = outs[0].downstream
                    d = info.get(id(node))
                    if d is None:
                        reaches_sink = isinstance(node, SinkElement)
                        break
                    if d[3]:
                        continue  # passthrough forwards the dict untouched
                    ce, ci, co, _ = d
                    if not (ce.grid_input_ok(ci, co)
                            and ce.grid_output_ok(ci, co)):
                        break
                    chain.append((ce, ci, co))
                if not reaches_sink:
                    continue
                tail, t_i, t_o = chain[-1]
                if t_o.format in _RGB and tail.edge_packed32_ok(t_i, t_o):
                    gedge = "packed32g"
                elif t_o.format in (_VFt.NV12, _VFt.I420):
                    # format-preserving 2x upscale (e.g. NV12 -> NV12 4K):
                    # the head emits the 4:2:0 edge directly
                    # (convert.pack_420_grid16)
                    gedge = "packed420g"
                else:
                    continue
                for me_, _, _ in mids:
                    plan[me_.name] = ["quad", "quad"]
                plan[e.name] = ["quad",
                                gedge if len(chain) == 1 else "grid"]
                for ce, _, _ in chain[1:-1]:
                    plan[ce.name] = ["grid", "grid"]
                if len(chain) > 1:
                    plan[tail.name] = ["grid", gedge]
                source_split[up.name] = "quad"

        # -- GRID64 (8x8 phase) upgrade for exactly-4x 4:2:0 -> RGB
        # upscale chains (round 5): the mod-8 output grid makes every 4x
        # bilinear tap phase-fixed — luma quarter-phase stencils over the
        # quad parity planes, chroma eighth-phase stencils
        # (convert.can_grid64; device 178 vs 414 us/frame on 540p->4K,
        # scripts/bench_grid64_ab.py).  RGB sink edges only.
        if (not os.environ.get("TPUVF_NO_QUAD_LINKS")
                and getattr(self, "_quad_links_enabled", True)):
            from tpuvf.core.formats import RGB_FORMATS as _RGB
            from tpuvf.core.formats import VideoFormat as _VFt

            for e, i_s, o_s, pt in list(info.values()):
                if pt or not e.grid64_head_ok(i_s, o_s):
                    continue
                up = real_upstream(e)
                if (isinstance(up, SourceElement)
                        and len(self._outgoing(up)) == 1):
                    mids = []
                else:
                    found = quad_upstream_chain(e)  # round 5, see grid16
                    if found is None:
                        continue
                    up, mids = found
                chain = [(e, i_s, o_s)]
                node, reaches_sink = e, False
                while True:
                    outs = self._outgoing(node)
                    if len(outs) != 1:
                        break
                    node = outs[0].downstream
                    d = info.get(id(node))
                    if d is None:
                        reaches_sink = isinstance(node, SinkElement)
                        break
                    if d[3]:
                        continue  # passthrough forwards the dict untouched
                    ce, ci, co, _ = d
                    if not (ce.grid64_input_ok(ci, co)
                            and ce.grid64_output_ok(ci, co)):
                        break
                    chain.append((ce, ci, co))
                if not reaches_sink:
                    continue
                tail, t_i, t_o = chain[-1]
                if t_o.format in _RGB and tail.edge_packed32_ok(t_i, t_o):
                    g8edge = "packed32g8"
                elif t_o.format in (_VFt.NV12, _VFt.I420):
                    # format-preserving 4x upscale (e.g. NV12 540p ->
                    # NV12 4K, the default fixation): the head emits
                    # the 4:2:0 edge directly (convert.pack_420_grid64)
                    g8edge = "packed420g8"
                else:
                    continue
                for me_, _, _ in mids:
                    plan[me_.name] = ["quad", "quad"]
                plan[e.name] = ["quad", g8edge
                                if len(chain) == 1 else "grid8"]
                for ce, _, _ in chain[1:-1]:
                    plan[ce.name] = ["grid8", "grid8"]
                if len(chain) > 1:
                    plan[tail.name] = ["grid8", g8edge]
                source_split[up.name] = "quad"

        # -- GRID36 (6x6 phase) upgrade for exactly-3x 4:2:0 -> RGB
        # upscale chains (round 5): covers 720p -> 4K; per-phase
        # stencils derived from the dense sampler's own f32 weights
        # (convert.can_grid36 gates on per-geometry consistency).  RGB
        # sink edges only.
        if (not os.environ.get("TPUVF_NO_QUAD_LINKS")
                and getattr(self, "_quad_links_enabled", True)):
            from tpuvf.core.formats import RGB_FORMATS as _RGB
            from tpuvf.core.formats import VideoFormat as _VFt

            for e, i_s, o_s, pt in list(info.values()):
                if pt or not e.grid36_head_ok(i_s, o_s):
                    continue
                up = real_upstream(e)
                if (isinstance(up, SourceElement)
                        and len(self._outgoing(up)) == 1):
                    mids = []
                else:
                    found = quad_upstream_chain(e)  # see grid16
                    if found is None:
                        continue
                    up, mids = found
                chain = [(e, i_s, o_s)]
                node, reaches_sink = e, False
                while True:
                    outs = self._outgoing(node)
                    if len(outs) != 1:
                        break
                    node = outs[0].downstream
                    d = info.get(id(node))
                    if d is None:
                        reaches_sink = isinstance(node, SinkElement)
                        break
                    if d[3]:
                        continue  # passthrough forwards the dict untouched
                    ce, ci, co, _ = d
                    if not (ce.grid36_input_ok(ci, co)
                            and ce.grid36_output_ok(ci, co)):
                        break
                    chain.append((ce, ci, co))
                if not reaches_sink:
                    continue
                tail, t_i, t_o = chain[-1]
                if t_o.format in _RGB and tail.edge_packed32_ok(t_i, t_o):
                    g6edge = "packed32g6"
                elif t_o.format in (_VFt.NV12, _VFt.I420):
                    # format-preserving 3x upscale (e.g. NV12 720p ->
                    # NV12 4K, the default fixation): the head emits
                    # the 4:2:0 edge directly (convert.pack_420_grid36)
                    g6edge = "packed420g6"
                else:
                    continue
                for me_, _, _ in mids:
                    plan[me_.name] = ["quad", "quad"]
                plan[e.name] = ["quad", g6edge
                                if len(chain) == 1 else "grid6"]
                for ce, _, _ in chain[1:-1]:
                    plan[ce.name] = ["grid6", "grid6"]
                if len(chain) > 1:
                    plan[tail.name] = ["grid6", g6edge]
                source_split[up.name] = "quad"

        # -- GRID9 (3x3 phase) upgrade for exactly-1.5x 4:2:0 -> RGB
        # upscale chains (round 5): covers 720p -> 1080p, the most
        # common HD upscale — the grid36 stencil machinery at period 3
        # (convert.can_grid9).  RGB sink edges only (a 1.5x 4:2:0
        # chroma output would need lane-strided column-parity reads).
        if (not os.environ.get("TPUVF_NO_QUAD_LINKS")
                and getattr(self, "_quad_links_enabled", True)):
            from tpuvf.core.formats import RGB_FORMATS as _RGB

            for e, i_s, o_s, pt in list(info.values()):
                if pt or not e.grid9_head_ok(i_s, o_s):
                    continue
                up = real_upstream(e)
                if (isinstance(up, SourceElement)
                        and len(self._outgoing(up)) == 1):
                    mids = []
                else:
                    found = quad_upstream_chain(e)  # see grid16
                    if found is None:
                        continue
                    up, mids = found
                chain = [(e, i_s, o_s)]
                node, reaches_sink = e, False
                while True:
                    outs = self._outgoing(node)
                    if len(outs) != 1:
                        break
                    node = outs[0].downstream
                    d = info.get(id(node))
                    if d is None:
                        reaches_sink = isinstance(node, SinkElement)
                        break
                    if d[3]:
                        continue  # passthrough forwards the dict untouched
                    ce, ci, co, _ = d
                    if not (ce.grid9_input_ok(ci, co)
                            and ce.grid9_output_ok(ci, co)):
                        break
                    chain.append((ce, ci, co))
                if not reaches_sink:
                    continue
                tail, t_i, t_o = chain[-1]
                if not (t_o.format in _RGB
                        and tail.edge_packed32_ok(t_i, t_o)):
                    continue
                for me_, _, _ in mids:
                    plan[me_.name] = ["quad", "quad"]
                plan[e.name] = ["quad", "packed32g3"
                                if len(chain) == 1 else "grid3"]
                for ce, _, _ in chain[1:-1]:
                    plan[ce.name] = ["grid3", "grid3"]
                if len(chain) > 1:
                    plan[tail.name] = ["grid3", "packed32g3"]
                source_split[up.name] = "quad"
        return ({k: (v[0], v[1]) for k, v in plan.items()},
                source_split, comp_split_pads)

    def _static_signature(self):
        """Per-element static config + passthrough decisions — the analog of
        the reference's reconfigure triggers (property writes that change
        pipeline structure, e.g. gstvfmetalvideofilter.m:296)."""
        sig = []
        for e in self.elements:
            if isinstance(e, (SourceElement, SinkElement)):
                continue
            ins = self._incoming(e)
            outs = self._outgoing(e)
            if not ins or not outs or ins[0].spec is None:
                continue
            try:
                sig.append((
                    e.name,
                    e.static_config(ins[0].spec, outs[0].spec),
                    # passthrough flips (e.g. a videofilter prop leaving its
                    # default) must also reconfigure the chain
                    e.is_passthrough(ins[0].spec, outs[0].spec),
                ))
            except NotImplementedError:  # pragma: no cover
                continue
        # boundary-layout decisions are part of the compiled structure.
        # _link_plan is PURE (no self mutation): the per-frame signature
        # check must not silently rewrite runtime upload decisions — only
        # build() assigns the negotiated sets
        plan, src_split, comp_pads = self._link_plan()
        sig.append(("__links__", tuple(sorted(plan.items())),
                    tuple(sorted(src_split.items())),
                    tuple(sorted((k, tuple(sorted(v)))
                                 for k, v in comp_pads.items()))))
        return tuple(sig)

    def _maybe_rebuild(self):
        """Rebuild the compiled chain when a structural property changed
        (effect toggles, method enums, crops...).  Carried state survives;
        the XLA executable cache absorbs repeated configurations."""
        if self._static_signature() != self._built_signature:
            _log.info("static property change -> rebuilding pipeline")
            self.build()
            return True
        return False

    def reset(self) -> None:
        """PAUSED->READY analog: drop compiled state and per-element carry
        (deinterlace history, filter frame counters) so the next run starts
        fresh (change_state, gstvfmetalconvertscale.m:430-455)."""
        self._stages = []
        self._step = None
        self._step_py = None
        self._step_fast = None
        self._variant_stage = None
        self._variant_stages = []
        self._step_cache = {}
        self._make_step = None
        self._sp_replicated = set()
        self._sp_rep_sources = set()
        self._sp_graph_ok = True
        self._source_split = {}
        self._comp_split_pads = {}
        self._codec_chain = {}
        self._state = None
        self._mesh_state = None
        self._negotiated = False

    # -- output clock + per-source buffer selection -------------------------

    def _clock(self):
        """Output timeline rate (the aggregator's srcpad clock; fixate picks
        max input fps, gstvfmetalcompositor.m:460-540 — already folded into
        the negotiated tail spec) plus per-source timing info."""
        if self.sinks:
            # multi-sink: the output clock runs at the fastest branch tail
            tail_specs = [self._incoming(s)[0].spec for s in self.sinks]
            tail_spec = max(tail_specs, key=lambda sp: float(sp.fps))
        elif self._stages:
            tail_spec = self._stages[-1].out_spec
        else:
            tail_spec = self._outgoing(self.sources[0])[0].spec
        out_fps = float(tail_spec.fps) or 25.0
        infos = []
        for s in self.sources:
            spec = self._outgoing(s)[0].spec
            infos.append((s, spec, float(spec.fps) or out_fps,
                          s.timestamp_offset(), s.num_frames()))
        return out_fps, infos

    def _clock_num_frames(self, out_fps, infos, num_frames):
        """Output frame count: the stream runs until ALL sources are past
        their last buffer (aggregator EOS semantics), capped by the caller."""
        ends = []
        for s, spec, fps, off, n in infos:
            if n is None:
                ends = None  # unbounded source: caller must bound the run
                break
            ends.append(off + n / fps)
        computed = None
        if ends is not None and ends:
            computed = max(1, int(np.ceil(max(ends) * out_fps - 1e-6)))
        if num_frames is None:
            if computed is None:
                raise ValueError("unbounded pipeline: pass num_frames or "
                                 "set num-buffers on the source")
            return computed
        return min(num_frames, computed) if computed is not None else num_frames

    def _select_buffers(self, k, out_fps, infos):
        """Timestamp-driven buffer selection for output frame k: each source
        contributes its latest buffer with pts <= the output deadline
        (repeating/dropping as rates mismatch — the GstVideoAggregator
        aggregate model, gstvfmetalcompositor.m:574-684).  Returns
        {source_name: (gen_index, meta_dict)} with traced meta arrays."""
        deadline = k / out_fps + 1e-9
        sel = {}
        for s, spec, fps, off, n in infos:
            j = int(np.floor((deadline - off) * fps))
            # refine for sources with custom (monotonic) per-buffer pts
            limit = n if n is not None else j + 2
            while j + 1 < limit and s.buffer_pts(j + 1, spec) <= deadline:
                j += 1
            while j >= 0 and s.buffer_pts(j, spec) > deadline:
                j -= 1
            started = j >= 0
            ended = n is not None and j >= n
            gen_j = min(max(j, 0), n - 1) if n is not None else max(j, 0)
            flags = s.buffer_meta(gen_j, spec)
            meta = {
                "pts": np.float32(s.buffer_pts(gen_j, spec)),
                "tff": np.int32(1 if flags.get("tff", True) else 0),
                # started: the stream has produced its first buffer;
                # eos: past the last buffer (held = frozen last frame)
                "active": np.float32(1.0 if started else 0.0),
                "eos": np.float32(1.0 if ended else 0.0),
            }
            sel[s.name] = (gen_j, meta)
        return sel

    def latency(self):
        """(min, max) pipeline latency in seconds — the GstAggregator
        latency-query analog (the reference compositor inherits it from
        GstVideoAggregator, src/compositor/gstvfmetalcompositor.m:574):
        min 0 (in-memory processing, no buffering ahead of the clock),
        max one output period (the aggregator's timeout — a live run
        emits or drops each tick within one period)."""
        out_fps, _ = self._clock()
        return 0.0, 1.0 / out_fps

    def _paced_indices(self, num_frames, out_fps, time_fn, sleep_fn):
        """LIVE output-clock pacing (the GstAggregator timeout machinery,
        gstvfmetalcompositor.m:574-684): output frame k is due at
        t0 + k/out_fps.  Early -> sleep until the deadline; late past a
        full tick -> the missed ticks are DROPPED (QoS) and processing
        resumes at the newest due frame, exactly like an aggregator
        that times out and aggregates the newest buffers.

        Frame 0 is the PREROLL (the PAUSED->PLAYING transition): the
        clock starts only after it completes, so first-dispatch XLA
        compilation never burns live ticks — GStreamer's preroll
        semantics."""
        if num_frames <= 0:
            return
        yield 0  # preroll: compile + first frame, unpaced
        t0 = time_fn()  # frame 0 presented now; frame k due at t0 + k/fps
        k = 1
        while k < num_frames:
            now = time_fn()
            due = int((now - t0) * out_fps)
            if due > k:
                skipped = min(due, num_frames) - k
                self.stats.frames_dropped += skipped
                _log.debug("live QoS: dropping %d late frame(s) at tick %d",
                           skipped, k)
                k += skipped
                if k >= num_frames:
                    return
            deadline = t0 + k / out_fps
            now = time_fn()
            if now < deadline:
                sleep_fn(deadline - now)
            yield k
            k += 1

    def run_live(self, num_frames: Optional[int] = None, *,
                 time_fn=None, sleep_fn=None, progress=False) -> int:
        """Wall-clock-paced run: frames render on the output clock's
        schedule, late ticks drop (stats.frames_dropped).  The offline
        run() computes every frame as fast as the device allows; this is
        the live-pipeline analog, for sinks that present in real time.
        time_fn/sleep_fn are injectable for deterministic tests."""
        return self.run(num_frames, progress=progress, _live=True,
                        _time_fn=time_fn or time.perf_counter,
                        _sleep_fn=sleep_fn or time.sleep)

    def run(self, num_frames: Optional[int] = None, progress=False,
            _live=False, _time_fn=None, _sleep_fn=None) -> int:
        """Frame loop: generate -> device -> step -> host -> sink(s)."""
        if self._step is None:
            self.build()
        sources = self.sources
        sinks = self.sinks
        sink_specs = {s.name: self._incoming(s)[0].spec for s in sinks}

        out_fps, clock_infos = self._clock()
        num_frames = self._clock_num_frames(out_fps, clock_infos, num_frames)

        state = self._state
        src_specs = {}
        for s in sources:
            outs = self._outgoing(s)
            src_specs[s.name] = outs[0].spec

        # host-side encoder chain at the sink edge (computed at build time,
        # walks through passthrough elements)
        codecs = self._codec_chain

        # params (incl. weight buffers) staged to device once per run
        dev_params = self._stage_params()

        count = 0
        pending = None
        t_run = time.perf_counter()
        gen_cache = {}  # (source, index) -> device planes; reuses repeats
        # controller schedules index OUTPUT frame number on the pipeline
        # clock — the same k that drives _select_buffers, so a schedule
        # entry and a source buffer line up on the same timeline
        controlled = [el for el in self.elements
                      if getattr(el, "_controllers", None)]
        frame_iter = (self._paced_indices(num_frames, out_fps,
                                          _time_fn, _sleep_fn)
                      if _live else range(num_frames))
        for i in frame_iter:
            # per-frame controlled-property sync (gst_object_sync_values
            # analog) BEFORE the rebuild check: a schedule that flips a
            # static gate (e.g. gamma crossing 1.0) rebuilds like any
            # property write
            for el in controlled:
                el.sync_frame(i)
            # reconfigure BEFORE building this frame's inputs: a rebuild can
            # change source-split provisioning, which changes the upload
            # layout
            self._state = state  # publish the live scan-carried state so a
            # structural rebuild merges the CURRENT carry, not run-start
            if self._maybe_rebuild():
                state = self._state
                dev_params = self._stage_params()
                codecs = self._codec_chain
                gen_cache.clear()
            selection = self._select_buffers(i, out_fps, clock_infos)
            inputs = {}
            for s in sources:
                spec = src_specs[s.name]
                gen_j, meta = selection[s.name]
                cached = gen_cache.get(s.name)
                if cached is None or cached[0] != gen_j:
                    host = s.generate(gen_j, spec)
                    planes = host_to_planes(host, spec)
                    if s.name in self._source_split:
                        from tpuvf.core.frame import (quad_planes_host,
                                                      split_planes_host)

                        mode = self._source_split[s.name]
                        if mode == "quad":
                            planes = quad_planes_host(planes, spec)
                        else:
                            planes = split_planes_host(
                                planes, spec,
                                chroma_pair=mode == "cols_pair")
                    dev = {k: jax.device_put(v) for k, v in planes.items()}
                    gen_cache[s.name] = (gen_j, dev)
                else:
                    dev = cached[1]
                inputs[s.name] = dict(dev)
                inputs[s.name]["__meta__"] = meta
            frame_params = None
            try:
                frame_params = self._frame_params(dev_params)
                step_fn = self._select_step(
                    frame_params,
                    metas={s.name: selection[s.name][1] for s in sources})
                with trace(f"tpuvf.step[{i}]"):
                    out, state = step_fn(inputs, state, frame_params)
                # publish the carry NOW: the step donated the old state
                # buffers, so a failure below must not leave self._state
                # pointing at deleted arrays (unrecoverable without reset)
                self._state = state
            except _StageFailure as sf:
                self._flush_pending(sinks, codecs, sink_specs, pending)
                raise PipelineError(sf.element_name, i, sf.cause) from sf
            except Exception as exc:
                # per-frame device failure -> flow error with element context
                # (the MTLCommandBufferStatusError -> GST_FLOW_ERROR analog);
                # the fused program can't attribute, so bisect eagerly
                self._flush_pending(sinks, codecs, sink_specs, pending)
                raise PipelineError(
                    self._locate_failure(inputs, frame_params), i, exc
                ) from exc
            # overlap: consume frame i-1 while frame i computes (jax
            # dispatch is async; the device round trip of the previous
            # frame's readback hides behind this frame's compute)
            if pending is not None:
                try:
                    self._consume_all(sinks, codecs, sink_specs, *pending)
                except _StageFailure as sf:
                    # report the CONSUMED frame's index, not i
                    raise PipelineError(sf.element_name, pending[1],
                                        sf.cause) from sf
            pending = (out, i) if sinks else None
            count += 1
        if pending is not None:
            try:
                self._consume_all(sinks, codecs, sink_specs, *pending)
            except _StageFailure as sf:
                raise PipelineError(sf.element_name, pending[1],
                                    sf.cause) from sf
        self._state = state
        self.stats.frames += count
        self.stats.wall_seconds += time.perf_counter() - t_run
        _log.info("run complete: %s", self.stats.summary())
        for s in sinks:
            s.finalize()
        return count

    def _flush_pending(self, sinks, codecs, sink_specs, pending) -> None:
        """Best-effort delivery of the deferred previous frame before a
        failure propagates — its compute already succeeded, so a filesink
        should not end a frame short of the last good output.  Errors here
        are swallowed: the original failure wins."""
        if pending is None:
            return
        try:
            self._consume_all(sinks, codecs, sink_specs, *pending)
        except Exception:  # pragma: no cover - the original failure wins
            pass

    def _validate_sp(self, mesh, sp_axis: str) -> None:
        """Reject spatial row sharding the compiled chain cannot honor:
        every active stage must be sp_row_shardable and every plane height
        must split into EVEN per-shard row counts (field parity + chroma
        half-rows + row-pair 4:2:0 downsample all need it), with enough
        rows per shard for the widest halo (blur: 4)."""
        if sp_axis not in mesh.axis_names:
            raise ValueError(
                f"sp_axis {sp_axis!r} not in mesh axes {mesh.axis_names}")
        self._sp_row_pad = None
        sp = mesh.shape[sp_axis]
        if sp <= 1:
            return
        # quad/grid (row-phase) links DO compose with row sharding when
        # every phase plane splits evenly across shards: a row shard of
        # the phase planes is a contiguous FRAME band (phase row i of
        # shard s is global phase row s*rows+i), the cross-row-phase
        # stencils exchange spctx halos, and their frame-edge clamps
        # compare GLOBAL phase rows (blur9_v_split / blur9_grid4 /
        # interp_even_t / _grid2x_rows, round 4).  Only when the phase
        # rows DON'T align (divisibility/halo floor) fall back to the
        # column-split plan — outputs stay within the documented 1-LSB
        # layout tolerance.
        g = self._phase_granularity()
        if g > 1 and not self._sp_phase_rows_ok(sp, g):
            # round 5 (VERDICT r4 item 2): before giving up the 1.4-2.2x
            # quad/grid win, try BOTTOM-PADDING every sharded plane's rows
            # proportionally to the next alignment — frame-edge clamps
            # stay exact (spctx.total_rows/frame_last_row are true-frame
            # aware) and the host drops pad-row outputs
            pad_plan = self._sp_pad_plan(sp, g)
            if pad_plan is not None:
                self._sp_row_pad = pad_plan
                _log.info(
                    "sp=%d misaligned with the %d-row phase plan: bottom-"
                    "padding plane rows by ratio %d/%d, quad/grid links "
                    "kept", sp, g, pad_plan[1], pad_plan[0])
            else:
                _log.info(
                "sp=%d does not align with the %d-row phase plan "
                    "(phase rows must split evenly with >= 4 rows/shard) "
                    "and row padding does not apply: disabling quad/grid "
                    "links and rebuilding with the column-split plan",
                    sp, g)
                self._quad_links_enabled = False
                self.build()
        if not self._sp_graph_ok:
            raise ValueError(
                "graph cannot row-shard: a branch feeds both an aggregator "
                "pad (replicated under sp) and a sharded consumer; run "
                "with dp only")
        for st in self._stages:
            if st.passthrough or st.element.name in self._sp_replicated:
                continue  # replicated branches run unsharded
            e = st.element
            if not e.sp_row_shardable(st.in_spec, st.out_spec):
                raise ValueError(
                    f"element {e.name} ({e.ELEMENT_NAME}) does not support "
                    f"spatial row sharding for its negotiated specs "
                    f"{st.in_spec} -> {st.out_spec}; run with dp only")
        g = self._phase_granularity()  # recompute: build() may have reset
        for h in self._sp_heights():
            if g > 1:
                # phase-plane chains: _sp_phase_rows_ok held (or the plan
                # fell back above); the full-height rules don't apply
                continue
            rows = h // sp
            # even rows/shard: field parity + chroma half-rows + the 4:2:0
            # row-pair downsample; >= 4 rows: the widest halo (blur) reaches
            # only the adjacent shard
            if h % sp or rows % 2 or rows < 4:
                raise ValueError(
                    f"plane height {h} cannot split over sp={sp}: needs "
                    f"h % sp == 0 with even rows/shard >= 4 (field parity, "
                    f"chroma half-rows and the 4-row blur halo)")

    def _sp_heights(self):
        """Plane-spec heights that shard under sp (active stages +
        non-replicated source uploads)."""
        heights = []
        for st in self._stages:
            if st.passthrough or st.element.name in self._sp_replicated:
                continue
            if st.in_spec is not None:
                heights.append(st.in_spec.height)
            heights.append(st.out_spec.height)
        for s in self.sources:
            if s.name in self._sp_rep_sources:
                continue  # replicated upload: no divisibility constraint
            heights.append(self._outgoing(s)[0].spec.height)
        return heights

    def _phase_granularity(self) -> int:
        """Row granularity of the active link plan's phase planes: 4 when
        any grid16/grid420 link is live, 2 for quad links or a
        quad-provisioned source, 1 otherwise."""
        g = 1
        if any(v == "quad" for v in self._source_split.values()):
            g = 2
        for in_split, out_mode in (self.link_plan or {}).values():
            if (in_split == "grid8"
                    or out_mode in ("grid8", "packed32g8", "packed420g8")):
                return 8
        for in_split, out_mode in (self.link_plan or {}).values():
            if (in_split == "grid6"
                    or out_mode in ("grid6", "packed32g6", "packed420g6")):
                return 6
        for in_split, out_mode in (self.link_plan or {}).values():
            if (in_split == "grid3"
                    or out_mode in ("grid3", "packed32g3")):
                return 3
        for in_split, out_mode in (self.link_plan or {}).values():
            if (in_split == "grid"
                    or out_mode in ("grid", "packed32g", "packed420g")):
                return 4
            if (in_split == "quad"
                    or out_mode in ("quad", "packed32q", "packed16q")):
                g = max(g, 2)
        return g

    def _sp_phase_rows_ok(self, sp: int, g: int) -> bool:
        """True when every sharded plane's PHASE rows (h // g) split
        evenly over sp with >= 4 rows per shard (the widest phase-plane
        halo is blur9_v_split's 2).  Conservative for mixed-granularity
        grid chains: the quad-provisioned source head (granularity 2) is
        held to the grid rule (g=4) too."""
        return all(self._phase_rows_fit(h, sp, g)
                   for h in self._sp_heights())

    @staticmethod
    def _phase_rows_fit(h: int, sp: int, g: int) -> bool:
        return h % g == 0 and (h // g) % sp == 0 and (h // g) // sp >= 4

    def _sp_pad_plan(self, sp: int, g: int):
        """(true_frame_rows, padded_frame_rows) ratio that realigns a
        quad/grid phase plan with sp row sharding by bottom-padding every
        sharded plane PROPORTIONALLY (round 5, VERDICT r4 item 2), or
        None when padding does not apply.

        Scope: the whole active chain must ride phase links (quad/grid
        in-splits or quad/grid/packed-phase out modes) with every source
        quad-provisioned and no aggregator-replicated branches — exactly
        the plans whose row geometry is identity or the grid 2x stencils,
        where the TRUE-frame clamp machinery (spctx.total_rows /
        frame_last_row, shift_rows_cross_phase, blur9_v_split/_grid4)
        makes pad-row content don't-care.  Dense row resampling
        (transform, scaled convertscale) never negotiates these links,
        so it can't be mis-padded.

        Chains may carry heights in exactly-2x (grid16 in/out), 3x
        (grid36), 4x (grid64) or HALF-INTEGER 1.5x ratio (grid9 in/out
        — the ratio machinery is rational per plane, so m = 2h/h1 in
        {2,3,4,6,8} all pad consistently; h1 and the 2*g pad step are
        even, keeping every m*hp/2 integral).  The pad step is 2*g so
        every derived plane's pad (full, half, quarter rows) stays
        integral."""
        if self._sp_replicated or self._sp_rep_sources:
            return None
        quad_modes = {"quad", "packed32q", "packed16q",
                      "grid", "packed32g", "packed420g",
                      "grid8", "packed32g8", "packed420g8",
                      "grid6", "packed32g6", "packed420g6",
                      "grid3", "packed32g3"}
        plan = self.link_plan or {}
        for st in self._stages:
            if st.passthrough or st.in_spec is None:
                continue
            in_split, out_mode = plan.get(st.element.name, (False, "full"))
            if in_split not in ("quad", "grid", "grid8") \
                    and out_mode not in quad_modes:
                return None
        if not self.sources or any(
                self._source_split.get(s.name) != "quad"
                for s in self.sources):
            return None
        heights = sorted(set(self._sp_heights()))
        if not heights:
            return None
        h1 = heights[0]
        if h1 % 2 or any((2 * h) % h1 or (2 * h) // h1 not in (2, 3, 4, 6, 8)
                         for h in heights):
            return None
        step = 2 * g
        for pad in range(step, step * sp * 8 + 1, step):
            hp = h1 + pad
            if all((2 * h // h1) * hp % 2 == 0
                   and self._phase_rows_fit((2 * h // h1) * hp // 2, sp, g)
                   for h in heights):
                return (h1, hp)
        return None

    def _meta_source_of(self, elem):
        """The source whose per-buffer metadata reaches `elem` (walking the
        linear upstream chain; aggregators reset the stream so the walk
        stops there), or None."""
        from tpuvf.elements.compositor import Compositor

        node = elem
        while True:
            inc = self._incoming(node)
            if not inc:
                return None
            up = inc[0].upstream
            if isinstance(up, SourceElement):
                return up.name
            if isinstance(up, Compositor):
                return None
            node = up

    def _select_step(self, frame_params, metas=None):
        """Pick the jitted program variant combination for this frame's
        params (host check; each combination compiles once, cached).
        `metas` ({source_name: buffer metadata dict}) lets flag-dependent
        variants (deinterlace TFF) see this frame's host-visible flags."""
        stages = getattr(self, "_variant_stages", None)
        if not stages:
            return self._step
        meta_root = getattr(self, "_meta_root", {})
        fast = []
        for st in stages:
            elem_params = frame_params.get(st.element.name, {})
            if metas:
                src = meta_root.get(st.element.name)
                if src is not None and src in metas:
                    elem_params = dict(elem_params)
                    elem_params["__meta__"] = metas[src]
            try:
                if st.process.variant_select(elem_params) == "fast":
                    fast.append(st.element.name)
            except (KeyError, TypeError):  # pragma: no cover
                pass
        if not fast:
            return self._step
        return self._variant_step(frozenset(fast))

    def _locate_failure(self, inputs=None, params=None) -> str:
        """Attribute a runtime failure inside the fused program by re-running
        the step eagerly (op by op) on fresh state: _StageFailure then names
        the stage whose ops raise.  Best-effort — if the eager re-run can't
        reproduce, fall back to '<pipeline>'."""
        if inputs is None or self._step_py is None:
            return "<pipeline>"
        try:
            fresh = {
                st.element.name: st.element.init_state(st.in_spec, st.out_spec)
                for st in self._stages if not st.passthrough
            }
            with jax.disable_jit():
                self._step_py(inputs, fresh, params)
        except _StageFailure as sf:
            return sf.element_name
        except Exception:
            pass
        return "<pipeline>"

    def _consume(self, sink, codecs, sink_spec, out, index) -> None:
        host_planes = {k: np.asarray(v) for k, v in out.items()}
        payload = planes_to_host(host_planes, sink_spec)
        for codec in codecs:
            payload = codec.encode(payload, sink_spec)
        sink.consume(payload, sink_spec, index)

    def _consume_all(self, sinks, codec_map, sink_specs, out, index) -> None:
        """Deliver one step output to every sink (multi-sink steps return a
        {sink_name: planes} pytree; single-sink steps return planes)."""
        multi = len(sinks) > 1
        for sk in sinks:
            planes = out[sk.name] if multi else out
            try:
                self._consume(sk, codec_map.get(sk.name, ()),
                              sink_specs[sk.name], planes, index)
            except (_StageFailure, PipelineError):
                raise
            except Exception as exc:
                # name the sink whose consume/codec chain failed (a
                # multi-sink graph would otherwise blame sinks[0])
                raise _StageFailure(sk.name, exc) from exc

    def run_batched(self, num_frames: int, batch_size: int = 8,
                    mesh=None, sp_axis: Optional[str] = None,
                    independent_streams: bool = False) -> int:
        """Throughput mode: lax.scan over `batch_size` frames inside ONE
        jitted dispatch (per-frame state semantics preserved).  This replaces
        the reference's per-element streaming-thread overlap as the
        throughput lever (SURVEY.md §2.10).

        With `mesh` (jax.sharding.Mesh with a 'dp' axis, e.g. from
        tpuvf.parallel.mesh.make_mesh), the batch shards across chips: each
        dp shard scans its own sub-batch; batch_size must be a multiple of
        the dp size.  Per-frame state is carried per shard, so stateful
        elements (deinterlace) see their own shard's history — appropriate
        when dp shards map to independent streams.

        With `sp_axis` naming a second mesh axis, plane ROWS additionally
        shard across chips: stencil kernels (blur, deinterlace, chroma
        row-upsample) exchange explicit ppermute halos over ICI
        (parallel.spctx / parallel.halo pattern) and coordinate fields
        (vignette, grain) use global row indices — pixel-exact vs the
        unsharded program.  Every non-passthrough element must be
        sp_row_shardable for its negotiated specs and every plane height
        must divide into even per-shard rows (validated up front with a
        clear error)."""
        if self._step is None:
            self.build()
        # controlled properties (Element.control): the batch's FIRST frame
        # values determine structure; per-frame traced scalars are stacked
        # and scanned alongside the inputs below so a mid-batch ramp
        # animates exactly like run() (gstvfmetalvideofilter.m:183-205
        # snapshots per frame).  Schedules index OUTPUT frame number on
        # the pipeline clock (the _select_buffers k)
        controlled = [el for el in self.elements
                      if getattr(el, "_controllers", None)]
        for el in controlled:
            el.sync_frame(0)
        # property writes since the last build (incl. passthrough flips)
        # take effect at entry — geometry then stays fixed across the run
        self._maybe_rebuild()
        sources = self.sources
        sinks = self.sinks
        sink_specs = {s.name: self._incoming(s)[0].spec for s in sinks}
        codecs = self._codec_chain
        src_specs = {
            s.name: self._outgoing(s)[0].spec for s in sources
        }
        out_fps, clock_infos = self._clock()
        num_frames = self._clock_num_frames(out_fps, clock_infos, num_frames)

        if mesh is not None:
            from tpuvf.parallel.mesh import parallel_batch_fn

            if "dp" not in mesh.shape:
                raise ValueError(
                    f"mesh {dict(mesh.shape)} has no 'dp' axis — build it "
                    f"with {{'dp': 1, ...}} for sp-only sharding")
            if batch_size % mesh.shape["dp"] != 0:
                raise ValueError(
                    f"batch_size {batch_size} must divide by dp="
                    f"{mesh.shape['dp']}")
            if mesh.shape["dp"] > 1 and not independent_streams:
                # dp shards carry INDEPENDENT per-shard state: splitting one
                # sequential stream across shards silently rewrites history
                # for stateful elements (deinterlace prev-frame, grain frame
                # counter) — wrong output, no error.  Require the caller to
                # assert the shards are independent streams.
                unsafe = [
                    st.element.name for st in self._stages
                    if not st.passthrough and st.in_spec is not None
                    and not st.element.dp_shard_safe(st.in_spec, st.out_spec)
                ]
                if unsafe:
                    raise ValueError(
                        f"element(s) {unsafe} carry cross-frame state whose "
                        f"output changes when ONE stream is batch-split "
                        f"across dp={mesh.shape['dp']} shards (each shard "
                        f"sees its own history).  Pass "
                        f"independent_streams=True if the dp shards map to "
                        f"independent streams, or run with dp=1")
            if sp_axis is not None:
                # may REBUILD the chain (quad links fall back to the
                # column-split plan under sp) — select the step after
                self._validate_sp(mesh, sp_axis)

        codecs = self._codec_chain  # re-read: _validate_sp may have rebuilt
        # geometry is fixed across a batch (params staged per run);
        # _select_step applies the same mismatch-fallback guard as run()
        step = self._select_step(self.params())

        # controlled-property schedules may not change pipeline STRUCTURE
        # mid-call (run() rebuilds per frame; one scanned program can't):
        # capture the entry structure and verify it per frame below
        ctl_structure = None
        if controlled:
            ctl_structure = self._ctl_structure()

        def batch_step(inputs, state, params, frame_params):
            def body(st, xs):
                frame_inputs, fp = xs
                p = {name: ({**params[name], **fp[name]} if name in fp
                            else params[name]) for name in params}
                out, st2 = step(frame_inputs, st, p)
                return st2, out

            st, outs = jax.lax.scan(body, state, (inputs, frame_params))
            return outs, st

        row_pad = None
        if mesh is not None:
            sp_live = (sp_axis is not None and sp_axis in mesh.axis_names
                       and mesh.shape[sp_axis] > 1)
            if sp_live:
                row_pad = getattr(self, "_sp_row_pad", None)
            dp_run = parallel_batch_fn(
                step, mesh, self.params(), sp_axis=sp_axis,
                replicated_inputs=(frozenset(self._sp_rep_sources)
                                   if sp_live else frozenset()),
                replicated_state=(frozenset(self._sp_replicated)
                                  if sp_live else frozenset()),
                row_pad=row_pad)
        else:
            dp_run = None
        if dp_run is None:  # the mesh path never uses these
            batch_fn = jax.jit(batch_step)
            dev_params = jax.device_put(self.params())
        state = self._state
        dp_state = self._state  # tiled after the first dp_run call
        dp_tiled = False
        mesh_key = None
        if dp_run is not None:
            # resume the tiled per-shard state from a previous mesh call
            # with the same axes (cross-call stream continuity — the
            # non-mesh path gets this via self._state)
            mesh_key = (tuple(sorted(mesh.shape.items())), sp_axis)
            held = getattr(self, "_mesh_state", None)
            if held is not None and held[0] == mesh_key:
                dp_state, dp_tiled = held[1], True
            elif row_pad is not None:
                # misaligned-sp row padding (spctx row_pad): plane-shaped
                # state carries pad rows like the planes; resumed padded
                # state (above) skips this
                dp_state = jax.tree_util.tree_map(
                    lambda a: (_pad_rows_host(np.asarray(a), row_pad)
                               if np.ndim(a) >= 2 else a), dp_state)
        done = 0
        t_run = time.perf_counter()
        while done < num_frames:
            n = min(batch_size, num_frames - done)
            # mesh mode shards the batch axis, so the compiled shape is
            # fixed at batch_size: pad a short tail by repeating the last
            # frame and drop the padded outputs after readback
            pad = batch_size - n if dp_run is not None else 0
            selections = [
                self._select_buffers(done + i, out_fps, clock_infos)
                for i in range(n)
            ]
            stacked = {}
            for s in sources:
                spec = src_specs[s.name]
                frames = []
                metas = []
                gen_cache = (None, None)
                for i in range(n):
                    gen_j, meta = selections[i][s.name]
                    if gen_cache[0] != gen_j:
                        hp = host_to_planes(s.generate(gen_j, spec), spec)
                        if s.name in self._source_split:
                            from tpuvf.core.frame import (quad_planes_host,
                                                          split_planes_host)

                            mode = self._source_split[s.name]
                            if mode == "quad":
                                hp = quad_planes_host(hp, spec)
                            else:
                                hp = split_planes_host(
                                    hp, spec,
                                    chroma_pair=mode == "cols_pair")
                        gen_cache = (gen_j, hp)
                    frames.append(gen_cache[1])
                    metas.append(meta)
                stacked[s.name] = {
                    k: np.stack([f[k] for f in frames] + [frames[-1][k]] * pad)
                    for k in frames[0]
                }
                stacked[s.name]["__meta__"] = {
                    k: np.stack([m[k] for m in metas] + [metas[-1][k]] * pad)
                    for k in metas[0]
                }
            if row_pad is not None:
                # misaligned-sp row padding: every plane leaf bottom-pads
                # proportionally so phase rows split evenly over sp; the
                # outputs' pad rows are cropped after readback
                for name, d in stacked.items():
                    for k, v in d.items():
                        if k != "__meta__" and np.ndim(v) >= 3:
                            d[k] = _pad_rows_host(v, row_pad)
            if pad:
                # tail padding: mark the phantom frames so the mesh scan
                # FREEZES the carried state across them (their outputs are
                # dropped below; without the freeze they would advance
                # deinterlace history / the grain frame counter and poison
                # cross-call stream continuity)
                stacked["__pad__"] = np.arange(batch_size) >= n
            if controlled:
                # per-frame controlled-property snapshots, stacked and
                # scanned alongside the inputs (the reference's per-frame
                # GST_OBJECT_LOCK snapshot, gstvfmetalvideofilter.m:183-205).
                # Mesh mode (round-5): the stacks shard over dp with the
                # batch axis and replicate over sp — each dp shard scans
                # its own frames' snapshots; tail padding repeats the last
                # row (those outputs are dropped like the frames')
                rows = [
                    self._ctl_frame_params(done + i, ctl_structure)
                    for i in range(n)
                ]
                rows += [rows[-1]] * pad
                fp = {name: {k: np.stack([r[name][k] for r in rows])
                             for k in rows[0][name]}
                      for name in rows[0]}
            else:
                fp = {}
            try:
                if dp_run is not None:
                    outs, dp_state = dp_run(stacked, dp_state,
                                            tiled=dp_tiled,
                                            frame_params=fp)
                    dp_tiled = True
                else:
                    stacked = jax.device_put(stacked)
                    outs, state = batch_fn(stacked, state, dev_params, fp)
            except _StageFailure as sf:
                raise PipelineError(sf.element_name, done, sf.cause) from sf
            except Exception as exc:
                # attribute via the eager bisect on the batch's FIRST frame
                # (the same failure-location path run() uses)
                first = {
                    name: {
                        k: (jax.tree_util.tree_map(lambda v: v[0], v)
                            if k == "__meta__" else np.asarray(v)[0])
                        for k, v in d.items()
                    }
                    for name, d in stacked.items()
                    if name != "__pad__"  # batch-level flag, not a source
                }
                raise PipelineError(
                    self._locate_failure(first, self.params()), done, exc
                ) from exc
            if sinks:
                host = jax.tree_util.tree_map(np.asarray, outs)
                if row_pad is not None:
                    host = jax.tree_util.tree_map(
                        lambda a: (_crop_rows_host(a, row_pad)
                                   if np.ndim(a) >= 3 else a), host)
                for i in range(n):
                    frame_out = jax.tree_util.tree_map(
                        lambda v: v[i], host)
                    try:
                        self._consume_all(sinks, codecs, sink_specs,
                                          frame_out, done + i)
                    except _StageFailure as sf:
                        raise PipelineError(sf.element_name, done + i,
                                            sf.cause) from sf
            done += n
        if dp_run is not None:
            # publish per-shard state for the next mesh call; a dp=1 tiled
            # state IS the global stream state, so also publish it to
            # self._state for subsequent run()/non-mesh calls (dp>1 keeps
            # independent per-shard histories by design and leaves
            # self._state untouched)
            self._mesh_state = (mesh_key, dp_state)
            if mesh.shape["dp"] == 1:
                state = jax.tree_util.tree_map(
                    lambda s: np.asarray(s)[0], dp_state)
                if row_pad is not None:
                    state = jax.tree_util.tree_map(
                        lambda a: (_crop_rows_host(a, row_pad)
                                   if np.ndim(a) >= 2 else a), state)
        self._state = state
        self.stats.frames += done
        self.stats.wall_seconds += time.perf_counter() - t_run
        for s in sinks:
            s.finalize()
        return done
