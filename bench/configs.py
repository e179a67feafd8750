"""The five BASELINE.json benchmark configurations.

1. vfconvertscale: NV12 1920x1080 -> BGRA 640x480 (README pipeline)
2. vftransform:    rotate clockwise + crop on BGRA 640x480
3. vfvideofilter:  brightness/contrast/saturation + chroma-key + 3D LUT,
                   NV12 1080p single pass
4. vfdeinterlace:  greedy-H motion-adaptive, I420 1080i, threshold 0.3
5. vfcompositor:   4-input mixed BGRA+NV12 composite + PNG overlay at 4K

Each returns (label, step_fn, state0, params, spec_or_planes_maker) for
tpuvf.runtime.benchmark.measure_fps; all run HBM-resident with sampling
matrices fed as runtime buffers (never HLO constants).
"""

from __future__ import annotations

import numpy as np

from tpuvf.core.formats import VideoFormat
from tpuvf.core.registry import make
from tpuvf.core.spec import FrameSpec
from tpuvf.runtime.benchmark import random_planes_for_spec


def _element_step(elem, in_spec, out_spec=None):
    out_spec = out_spec or elem.transform_spec(in_spec)
    static = elem.static_config(in_spec, out_spec)
    # mirror Pipeline._link_plan: a quad-capable 4:2:0 element gets the
    # QUAD (row x col phase) layout with a quad-provisioned source and a
    # packed32q/packed16q sink edge; otherwise a single element feeding
    # the sink gets the packed16 (u16-word, byte-identical) edge layout
    # when it pays off (edge_packed16_ok — identity split avoids lane
    # interleaves; the scaled phase path costs more than canonical
    # standalone), and a split-capable consumer gets a split-provisioned
    # source upload
    import os

    from tpuvf.core.formats import RGB_FORMATS

    if (not os.environ.get("TPUVF_NO_QUAD_LINKS")
            and elem.grid_head_ok(in_spec, out_spec)):
        # GRID16 head (exactly-2x 4:2:0 upscale): quad-provisioned source,
        # sixteen (row mod 4, col mod 4) output phases, packed32g (RGB) /
        # packed420g (4:2:0) sink edge — mirrors Pipeline._link_plan
        if (out_spec.format in RGB_FORMATS
                and elem.edge_packed32_ok(in_spec, out_spec)):
            g_edge = "packed32g"
        else:
            g_edge = "packed420g"
        proc = elem.make_process_linked(in_spec, out_spec, static,
                                        in_split="quad", out_mode=g_edge)
        proc.source_split = "quad"
        return proc, elem.init_state(in_spec, out_spec), \
            elem.traced_params()
    if (not os.environ.get("TPUVF_NO_QUAD_LINKS")
            and getattr(elem, "grid64_head_ok",
                        lambda *_: False)(in_spec, out_spec)):
        # GRID64 head (exactly-4x): packed32g8 (RGB) / packed420g8
        # (format-preserving 4:2:0) sink edge — round 5
        if (out_spec.format in RGB_FORMATS
                and elem.edge_packed32_ok(in_spec, out_spec)):
            g8_edge = "packed32g8"
        else:
            g8_edge = "packed420g8"
        proc = elem.make_process_linked(in_spec, out_spec, static,
                                        in_split="quad", out_mode=g8_edge)
        proc.source_split = "quad"
        return proc, elem.init_state(in_spec, out_spec), \
            elem.traced_params()
    if (not os.environ.get("TPUVF_NO_QUAD_LINKS")
            and getattr(elem, "grid36_head_ok",
                        lambda *_: False)(in_spec, out_spec)):
        # GRID36 head (exactly-3x): packed32g6 (RGB) / packed420g6
        # (format-preserving 4:2:0) sink edge — round 5
        if (out_spec.format in RGB_FORMATS
                and elem.edge_packed32_ok(in_spec, out_spec)):
            g6_edge = "packed32g6"
        else:
            g6_edge = "packed420g6"
        proc = elem.make_process_linked(in_spec, out_spec, static,
                                        in_split="quad", out_mode=g6_edge)
        proc.source_split = "quad"
        return proc, elem.init_state(in_spec, out_spec), \
            elem.traced_params()
    if (not os.environ.get("TPUVF_NO_QUAD_LINKS")
            and out_spec.format in RGB_FORMATS
            and getattr(elem, "grid9_head_ok",
                        lambda *_: False)(in_spec, out_spec)
            and elem.edge_packed32_ok(in_spec, out_spec)):
        # GRID9 head (exactly-1.5x, RGB out only) — round 5
        proc = elem.make_process_linked(in_spec, out_spec, static,
                                        in_split="quad",
                                        out_mode="packed32g3")
        proc.source_split = "quad"
        return proc, elem.init_state(in_spec, out_spec), \
            elem.traced_params()
    if (not os.environ.get("TPUVF_NO_QUAD_LINKS")
            and in_spec.format in (VideoFormat.NV12, VideoFormat.I420)
            and elem.quad_input_ok(in_spec, out_spec)
            and elem.quad_output_ok(in_spec, out_spec)):
        if out_spec.format in RGB_FORMATS:
            q_edge = ("packed32q"
                      if (elem.edge_packed16_ok(in_spec, out_spec)
                          and elem.edge_packed32_ok(in_spec, out_spec))
                      else None)
        elif out_spec.format in (VideoFormat.NV12, VideoFormat.I420):
            q_edge = ("packed16q"
                      if elem.edge_packed16_ok(in_spec, out_spec) else None)
        else:
            q_edge = None
        if q_edge is not None:
            proc = elem.make_process_linked(in_spec, out_spec, static,
                                            in_split="quad", out_mode=q_edge)
            # benches feed no per-buffer metadata: the baked-field-order
            # fast body IS the stream semantics (deinterlace TFF variants)
            proc = getattr(proc, "variants", {}).get("fast", proc)
            proc.source_split = "quad"
            return proc, elem.init_state(in_spec, out_spec), \
                elem.traced_params()
    edge = ("packed16"
            if (elem.split_output_ok(in_spec, out_spec)
                and elem.edge_packed16_ok(in_spec, out_spec)) else "full")
    if (edge == "packed16" and out_spec.format in RGB_FORMATS
            and elem.edge_packed32_ok(in_spec, out_spec)):
        # RGB edges emit u32 pixel words (mirrors Pipeline._link_plan):
        # one fusion, no per-channel u16 planes
        edge = "packed32"
    src_split = (elem.split_input_ok(in_spec, out_spec)
                 and elem.source_split_worth_it(in_spec, out_spec, edge))
    proc = elem.make_process_linked(in_spec, out_spec, static,
                                    in_split=src_split, out_mode=edge)
    proc.source_split = src_split
    state0 = elem.init_state(in_spec, out_spec)
    return proc, state0, elem.traced_params()


def config_convertscale():
    in_spec = FrameSpec(VideoFormat.NV12, 1920, 1080)
    out_spec = FrameSpec(VideoFormat.BGRA, 640, 480, matrix=in_spec.matrix)
    elem = make("vfconvertscale")
    step, state0, params = _element_step(elem, in_spec, out_spec)
    return "convertscale NV12 1080p -> BGRA 640x480", step, state0, params, in_spec


def config_transform():
    in_spec = FrameSpec(VideoFormat.BGRA, 640, 480)
    elem = make("vftransform")
    elem.set_property("method", 1)  # clockwise
    elem.set_property("crop-left", 32)
    elem.set_property("crop-top", 16)
    step, state0, params = _element_step(elem, in_spec)
    return "transform rotate-cw + crop BGRA 640x480", step, state0, params, in_spec


def config_videofilter(tmp_lut_path="/tmp/tpuvf-bench-lut.cube"):
    # generate a 33^3 identity-ish LUT on the fly
    size = 33
    with open(tmp_lut_path, "w") as fh:
        fh.write(f"LUT_3D_SIZE {size}\n")
        for b in range(size):
            for g in range(size):
                for r in range(size):
                    fh.write(
                        f"{r/(size-1):.4f} {g/(size-1):.4f} {b/(size-1):.4f}\n")
    in_spec = FrameSpec(VideoFormat.NV12, 1920, 1080)
    elem = make("vfvideofilter")
    elem.set_property("brightness", 0.1)
    elem.set_property("contrast", 1.2)
    elem.set_property("saturation", 1.3)
    elem.set_property("chroma-key-enabled", True)
    elem.set_property("lut-file", tmp_lut_path)
    step, state0, params = _element_step(elem, in_spec)
    return ("videofilter bright/contrast/sat + chroma-key + 33^3 LUT NV12 1080p",
            step, state0, params, in_spec)


def config_deinterlace():
    in_spec = FrameSpec(VideoFormat.I420, 1920, 1080, interlaced=True)
    elem = make("vfdeinterlace")
    elem.set_property("method", 3)  # greedyh
    elem.set_property("motion-threshold", 0.3)
    step, state0, params = _element_step(elem, in_spec)
    return "deinterlace greedy-H I420 1080i", step, state0, params, in_spec


def config_compositor():
    from tpuvf.core.spec import CapsFilter

    comp = make("vfcompositor")
    comp.set_property("background", 1)
    pad_specs = {
        "sink_0": FrameSpec(VideoFormat.BGRA, 3840, 2160),
        "sink_1": FrameSpec(VideoFormat.NV12, 1920, 1080),
        "sink_2": FrameSpec(VideoFormat.BGRA, 1280, 720),
        "sink_3": FrameSpec(VideoFormat.NV12, 1280, 720),
    }
    comp.get_pad("sink_0")
    b1 = comp.get_pad("sink_1"); b1.set("xpos", 1920); b1.set("ypos", 0)
    b2 = comp.get_pad("sink_2"); b2.set("xpos", 0); b2.set("ypos", 1080)
    b2.set("alpha", 0.7)
    b3 = comp.get_pad("sink_3"); b3.set("xpos", 1920); b3.set("ypos", 1080)
    b3.set("operator", 2)
    out_spec = comp.aggregate_spec(pad_specs, CapsFilter(format=VideoFormat.BGRA))

    # plus PNG overlay on the composite (BASELINE config 5)
    ov = make("vfoverlay")
    img = np.zeros((256, 256, 4), np.uint8)
    img[..., 0] = 255
    img[..., 3] = 128
    from tpuvf.io import png as pngio

    pngio.write("/tmp/tpuvf-bench-ov.png", img)
    ov.set_property("location", "/tmp/tpuvf-bench-ov.png")
    ov.set_property("x", 128)
    ov.set_property("y", 128)

    # mirror Pipeline round 3: the overlay FOLDS into the compositor's
    # render pass (Pipeline._plan_overlay_folds) and the compositor takes
    # over the packed16 sink edge; source-fed pads provision split uploads
    split_ok = (comp.aggregate_split_ok(pad_specs, out_spec)
                and ov.fold_into_aggregate_ok(out_spec, out_spec))
    split_pads = frozenset(pad_specs) if split_ok else frozenset()
    agg = comp.make_aggregate(pad_specs, out_spec,
                              out_mode="packed16" if split_ok else "full",
                              split_pads=split_pads,
                              fold_overlays=(ov,))
    # static geometry at the baked values: run the steady-state variant
    # (cells when available — the pipeline's host-side pick does the same)
    if agg.variant_select(comp.traced_params()) == "fast":
        agg = agg.variants.get("cells", agg.variants["fast"])
    params = {"comp": comp.traced_params()}

    def step(pad_planes, state, params):
        out, _ = agg(pad_planes, (), params["comp"])
        return out, state

    def make_planes(batch):
        from tpuvf.core.formats import PLANAR_YUV_FORMATS

        rng = np.random.default_rng(0)

        def split_mode(name, spec):
            if name not in split_pads:
                return False
            # 4:2:0 pads upload the host PAIR chroma alongside
            # (mirrors Pipeline "cols_pair" provisioning, round 5)
            return ("pair" if spec.format in PLANAR_YUV_FORMATS
                    and spec.height % 2 == 0 else True)

        return {
            name: random_planes_for_spec(spec, batch, rng,
                                         split=split_mode(name, spec))
            for name, spec in pad_specs.items()
        }

    return ("compositor 4-input mixed 4K + PNG overlay", step, (), params,
            make_planes)


def _chain_config(title, w_in, h_in, w_out, h_out):
    """Beyond-BASELINE chain configs share the headline chain builder
    (NV12 convertscale -> videofilter) at a parameterized geometry."""
    from __graft_entry__ import _build_chain, _specs

    in_spec, mid_spec, out_spec = _specs(w_in, h_in, w_out, h_out)
    step, state0, params = _build_chain(
        in_spec, mid_spec, out_spec,
        {"brightness": 0.05, "contrast": 1.1, "saturation": 1.2})
    return (title, step, state0, params,
            lambda b: random_planes_for_spec(
                in_spec, b, split=getattr(step, "source_split", False)))


def config_chain8k():
    """Beyond-BASELINE: the headline chain at 8K (7680x4320)."""
    return _chain_config("8K NV12 convertscale+videofilter chain",
                         7680, 4320, 7680, 4320)


def config_scale8k4k():
    """Beyond-BASELINE: 8K NV12 -> 4K BGRA downscale + videofilter chain
    (exercises the blockband sampling path at scale)."""
    return _chain_config("8K NV12 -> 4K BGRA convertscale+videofilter chain",
                         7680, 4320, 3840, 2160)


def config_headline():
    """The bench.py headline chain (4K NV12 -> 4K BGRA convertscale ->
    videofilter) as a registry entry so profile_config.py / run_all can
    target it directly."""
    return _chain_config("4K NV12 convertscale+videofilter chain",
                         3840, 2160, 3840, 2160)


def config_scale1080to4k():
    """Beyond-BASELINE: 1080p NV12 -> 4K BGRA 2x-UPSAMPLE + videofilter
    chain (exercises the phase-stencil 2x column path: the split link's
    even/odd output columns are the _upsample2x_linear expressions
    verbatim — no lane interleave, no matmul)."""
    return _chain_config(
        "1080p NV12 -> 4K BGRA convertscale+videofilter chain",
        1920, 1080, 3840, 2160)


def config_scale540to4k():
    """Beyond-BASELINE: 540p NV12 -> 4K BGRA 4x-UPSAMPLE + videofilter
    chain (exercises the GRID64 mod-8 phase path, round 5: every 4x
    bilinear tap phase-fixed; device 178 vs 414 us/frame standalone,
    scripts/bench_grid64_ab.py)."""
    return _chain_config(
        "540p NV12 -> 4K BGRA 4x-upscale convertscale+videofilter chain",
        960, 540, 3840, 2160)


def config_scale1080to4k_nv12():
    """Beyond-BASELINE: format-preserving 2x upscale (NV12 1080p ->
    NV12 4K, the default fixation) — the grid16 packed420g sink edge."""
    in_spec = FrameSpec(VideoFormat.NV12, 1920, 1080)
    out_spec = FrameSpec(VideoFormat.NV12, 3840, 2160,
                         matrix=in_spec.matrix)
    elem = make("vfconvertscale")
    step, state0, params = _element_step(elem, in_spec, out_spec)
    return ("1080p NV12 -> 4K NV12 2x-upscale", step, state0, params,
            in_spec)


def config_scale720to4k():
    """Beyond-BASELINE: 720p NV12 -> 4K BGRA 3x-UPSAMPLE + videofilter
    chain (exercises the GRID36 mod-6 phase path, round 5: stencils
    derived from the dense sampler's per-geometry f32 weights)."""
    return _chain_config(
        "720p NV12 -> 4K BGRA 3x-upscale convertscale+videofilter chain",
        1280, 720, 3840, 2160)


def config_scale540to4k_nv12():
    """Beyond-BASELINE: format-preserving 4x upscale (NV12 540p ->
    NV12 4K, the default fixation at 4x) — the GRID64 packed420g8 sink
    edge (round 5: device 223.8 vs 756.6 us/frame over the kx-rows
    election, scripts/bench_grid64_420_ab.py)."""
    in_spec = FrameSpec(VideoFormat.NV12, 960, 540)
    out_spec = FrameSpec(VideoFormat.NV12, 3840, 2160,
                         matrix=in_spec.matrix)
    elem = make("vfconvertscale")
    step, state0, params = _element_step(elem, in_spec, out_spec)
    return ("540p NV12 -> 4K NV12 4x-upscale", step, state0, params,
            in_spec)


def config_scale720to1080():
    """Beyond-BASELINE: 720p NV12 -> 1080p BGRA 1.5x-UPSAMPLE +
    videofilter chain — the most common HD upscale (exercises the
    GRID9 mod-3 phase path, round 5: the grid36 stencil machinery at
    period 3)."""
    return _chain_config(
        "720p NV12 -> 1080p BGRA 1.5x-upscale convertscale+videofilter "
        "chain", 1280, 720, 1920, 1080)


def config_scale720to4k_nv12():
    """Beyond-BASELINE: format-preserving 3x upscale (NV12 720p ->
    NV12 4K, the default fixation at 3x) — the GRID36 packed420g6 sink
    edge (round 5: stencils from the dense sampler's per-geometry f32
    weights, 6-byte-period host re-join)."""
    in_spec = FrameSpec(VideoFormat.NV12, 1280, 720)
    out_spec = FrameSpec(VideoFormat.NV12, 3840, 2160,
                         matrix=in_spec.matrix)
    elem = make("vfconvertscale")
    step, state0, params = _element_step(elem, in_spec, out_spec)
    return ("720p NV12 -> 4K NV12 3x-upscale", step, state0, params,
            in_spec)


def config_convert422():
    """Beyond-BASELINE: packed 4:2:2 decode at 4K identity (UYVY ->
    BGRA) — the round-4 can_split_422 column-phase plan (both output
    column phases read the half-width chroma plane unchanged;
    scripts/bench_422_ab.py measured 9.2-15.6k vs canonical 1.0-1.7k
    fps in clean windows)."""
    in_spec = FrameSpec(VideoFormat.UYVY, 3840, 2160)
    out_spec = FrameSpec(VideoFormat.BGRA, 3840, 2160,
                         matrix=in_spec.matrix)
    elem = make("vfconvertscale")
    step, state0, params = _element_step(elem, in_spec, out_spec)
    return ("4K UYVY -> BGRA identity decode", step, state0, params,
            in_spec)


ALL = {
    "headline": config_headline,
    "convertscale": config_convertscale,
    "transform": config_transform,
    "videofilter": config_videofilter,
    "deinterlace": config_deinterlace,
    "compositor": config_compositor,
    "chain8k": config_chain8k,
    "scale8k4k": config_scale8k4k,
    "scale1080to4k": config_scale1080to4k,
    "scale540to4k": config_scale540to4k,
    "scale720to4k": config_scale720to4k,
    "scale720to1080": config_scale720to1080,
    "scale1080to4k_nv12": config_scale1080to4k_nv12,
    "scale540to4k_nv12": config_scale540to4k_nv12,
    "scale720to4k_nv12": config_scale720to4k_nv12,
    "convert422": config_convert422,
}
