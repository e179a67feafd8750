"""A/B round 2: scaled-pad compositor — split FAST (DUS) body vs split
CELLS vs interleaved.  Cells slice the scaled pads' matmul outputs per
cell (multi-consumer -> materialize); the fast body slices once per draw.
Run: JAX_COMPILATION_CACHE_DIR=/tmp/tpuvf-tpu-cache python -u \
       scripts/bench_comp_scaled_ab2.py > /tmp/comp_scaled_ab2.out 2>&1
"""
from __future__ import annotations

import sys

sys.path.insert(0, ".")

import collections

from scripts.bench_comp_scaled_ab import build
from tpuvf.runtime.benchmark import measure_fps


def main():
    s_step, s_st, s_p, s_mk = build(True)
    i_step, i_st, i_p, i_mk = build(False)
    # build(True) returns the cells variant (variant_select pick); also
    # grab the fast body by rebuilding without the cells override
    import os

    import numpy as np
    from tpuvf.core.formats import VideoFormat
    from tpuvf.core.registry import make
    from tpuvf.core.spec import CapsFilter, FrameSpec
    from tpuvf.runtime.benchmark import random_planes_for_spec

    comp = make("vfcompositor"); comp.set_property("background", 1)
    pad_specs = {
        "sink_0": FrameSpec(VideoFormat.BGRA, 3840, 2160),
        "sink_1": FrameSpec(VideoFormat.NV12, 1920, 1080),
        "sink_2": FrameSpec(VideoFormat.BGRA, 1280, 720),
    }
    comp.get_pad("sink_0")
    b1 = comp.get_pad("sink_1"); b1.set("xpos", 1920); b1.set("ypos", 0)
    b1.set("width", 1918); b1.set("height", 1440)
    b2 = comp.get_pad("sink_2"); b2.set("xpos", 0); b2.set("ypos", 1080)
    b2.set("alpha", 0.7); b2.set("width", 1912); b2.set("height", 1080)
    out_spec = comp.aggregate_spec(pad_specs, CapsFilter(format=VideoFormat.BGRA))
    agg = comp.make_aggregate(pad_specs, out_spec, out_mode="split")
    fast = agg.variants["fast"]
    params = {"comp": comp.traced_params()}

    def f_step(pad_planes, state, prm):
        out, _ = fast(pad_planes, (), prm["comp"])
        return out, state

    def f_mk(batch):
        rng = np.random.default_rng(0)
        return {n: random_planes_for_spec(s, batch, rng)
                for n, s in pad_specs.items()}

    variants = {
        "split-fast": (f_step, (), params, f_mk),
        "split-cells": (s_step, s_st, s_p, s_mk),
        "interleaved": (i_step, i_st, i_p, i_mk),
    }
    best = collections.defaultdict(float)
    for rep in range(3):
        for tag, (step, st, p, mk) in variants.items():
            res = measure_fps(step, mk, st, p, batch_small=2, batch_large=8)
            best[tag] = max(best[tag], res["fps"])
            print(f"rep{rep} {tag:>12}: {res['fps']:8.1f} fps", flush=True)
    print("BEST:", dict(best), flush=True)
    print("DONE-SENTINEL", flush=True)


if __name__ == "__main__":
    main()
