"""Compositor config ablation: where do the ~2 ms/frame go?

  full      -- the BASELINE config 5 (4 pads + PNG overlay)
  no_ov     -- compositor only, no overlay stage
  one_pad   -- only the 4K background pad
  two_pad   -- 4K + 1080p NV12 pad
  ov_only   -- overlay alone on a 4K BGRA frame

Run:  JAX_COMPILATION_CACHE_DIR=/tmp/tpuvf-tpu-cache python -u \
        scripts/bench_comp_profile.py > /tmp/comp_profile.out 2>&1
"""
from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")

from tpuvf.core.formats import VideoFormat
from tpuvf.core.registry import make
from tpuvf.core.spec import CapsFilter, FrameSpec
from tpuvf.runtime.benchmark import measure_fps, random_planes_for_spec


def report(label, res):
    print(f"{label:>8}: {res['fps']:8.1f} fps  {res['ms_per_frame']:7.3f} ms",
          flush=True)


def comp_step(n_pads, with_overlay, prefer_fast=False):
    comp = make("vfcompositor")
    comp.set_property("background", 1)
    all_specs = {
        "sink_0": FrameSpec(VideoFormat.BGRA, 3840, 2160),
        "sink_1": FrameSpec(VideoFormat.NV12, 1920, 1080),
        "sink_2": FrameSpec(VideoFormat.BGRA, 1280, 720),
        "sink_3": FrameSpec(VideoFormat.NV12, 1280, 720),
    }
    pad_specs = dict(list(all_specs.items())[:n_pads])
    comp.get_pad("sink_0")
    if n_pads > 1:
        b1 = comp.get_pad("sink_1"); b1.set("xpos", 1920); b1.set("ypos", 0)
    if n_pads > 2:
        b2 = comp.get_pad("sink_2"); b2.set("xpos", 0); b2.set("ypos", 1080)
        b2.set("alpha", 0.7)
    if n_pads > 3:
        b3 = comp.get_pad("sink_3"); b3.set("xpos", 1920); b3.set("ypos", 1080)
        b3.set("operator", 2)
    out_spec = comp.aggregate_spec(pad_specs, CapsFilter(format=VideoFormat.BGRA))
    params = {}
    ov_proc = None
    split_ok = comp.aggregate_split_ok(pad_specs, out_spec)
    if with_overlay:
        ov = make("vfoverlay")
        img = np.zeros((256, 256, 4), np.uint8)
        img[..., 0] = 255
        img[..., 3] = 128
        from tpuvf.io import png as pngio

        pngio.write("/tmp/tpuvf-bench-ov.png", img)
        ov.set_property("location", "/tmp/tpuvf-bench-ov.png")
        ov.set_property("x", 128)
        ov.set_property("y", 128)
        link = split_ok and ov.split_input_ok(out_spec, out_spec)
        split_pads = frozenset(pad_specs) if link else frozenset()
        agg = comp.make_aggregate(pad_specs, out_spec,
                                  out_mode="split" if link else "full",
                                  split_pads=split_pads)
        edge = ("packed16" if ov.split_output_ok(out_spec, out_spec)
                else "full")
        ov_proc = ov.make_process_linked(
            out_spec, out_spec, ov.static_config(out_spec, out_spec),
            in_split=link, out_mode=edge)
        params["ov"] = ov.traced_params()
    else:
        # compositor at the sink edge keeps the canonical layout
        # (edge_packed16_ok is False: u8 phases -> u16 is a pure relayout)
        split_pads = frozenset()
        agg = comp.make_aggregate(pad_specs, out_spec)
    params["comp"] = comp.traced_params()

    if prefer_fast and hasattr(agg, "variants"):
        # the pipeline's steady-state program: the host-selected fast
        # (cond-free) render body; prefer_fast="cells" picks the
        # cell-partition body
        assert agg.variant_select(params["comp"]) == "fast"
        key = prefer_fast if isinstance(prefer_fast, str) else "fast"
        agg = agg.variants[key]

    def step(pad_planes, state, p):
        mid, _ = agg(pad_planes, (), p["comp"])
        if ov_proc is not None:
            mid, _ = ov_proc(mid, (), p["ov"])
        return mid, state

    def make_planes(batch):
        rng = np.random.default_rng(0)
        return {
            name: random_planes_for_spec(spec, batch, rng,
                                         split=name in split_pads)
            for name, spec in pad_specs.items()
        }

    return step, params, make_planes


def main():
    for label, n, ov in (("full", 4, True), ("no_ov", 4, False),
                         ("one_pad", 1, False), ("two_pad", 2, False)):
        step, params, mk = comp_step(n, ov)
        res = measure_fps(step, mk, (), params)
        report(label, res)

    # overlay alone on 4K BGRA
    ov = make("vfoverlay")
    from tpuvf.io import png as pngio

    img = np.zeros((256, 256, 4), np.uint8)
    img[..., 0] = 255
    img[..., 3] = 128
    pngio.write("/tmp/tpuvf-bench-ov.png", img)
    ov.set_property("location", "/tmp/tpuvf-bench-ov.png")
    ov.set_property("x", 128)
    ov.set_property("y", 128)
    spec = FrameSpec(VideoFormat.BGRA, 3840, 2160)
    proc = ov.make_process(spec, spec, ov.static_config(spec, spec))
    res = measure_fps(proc, lambda b: random_planes_for_spec(spec, b),
                      (), ov.traced_params())
    report("ov_only", res)

    print("DONE-SENTINEL", flush=True)


if __name__ == "__main__":
    main()
