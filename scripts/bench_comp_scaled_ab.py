"""Within-process A/B: 4K compositor with SCALED pads — split canvas
(round 3b scaled phase sampler) vs the interleaved renderer (previous
behavior, forced via TPUVF_NO_SPLIT_SCALED).

Run: JAX_COMPILATION_CACHE_DIR=/tmp/tpuvf-tpu-cache python -u \
       scripts/bench_comp_scaled_ab.py > /tmp/comp_scaled_ab.out 2>&1
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

import numpy as np

from tpuvf.core.formats import VideoFormat
from tpuvf.core.registry import make
from tpuvf.core.spec import CapsFilter, FrameSpec
from tpuvf.runtime.benchmark import measure_fps, random_planes_for_spec


def build(split: bool):
    if not split:
        os.environ["TPUVF_NO_SPLIT_SCALED"] = "1"
    else:
        os.environ.pop("TPUVF_NO_SPLIT_SCALED", None)
    comp = make("vfcompositor")
    comp.set_property("background", 1)
    pad_specs = {
        "sink_0": FrameSpec(VideoFormat.BGRA, 3840, 2160),
        "sink_1": FrameSpec(VideoFormat.NV12, 1920, 1080),   # scaled up
        "sink_2": FrameSpec(VideoFormat.BGRA, 1280, 720),    # scaled up
    }
    comp.get_pad("sink_0")
    b1 = comp.get_pad("sink_1")
    b1.set("xpos", 1920); b1.set("ypos", 0)
    b1.set("width", 1918); b1.set("height", 1440)
    b2 = comp.get_pad("sink_2")
    b2.set("xpos", 0); b2.set("ypos", 1080); b2.set("alpha", 0.7)
    b2.set("width", 1912); b2.set("height", 1080)
    out_spec = comp.aggregate_spec(pad_specs,
                                   CapsFilter(format=VideoFormat.BGRA))
    split_ok = comp.aggregate_split_ok(pad_specs, out_spec)
    assert split_ok == split, (split, split_ok)
    agg = comp.make_aggregate(
        pad_specs, out_spec,
        out_mode="split" if split_ok else "full")
    if agg.variant_select(comp.traced_params()) == "fast":
        agg = agg.variants.get("cells", agg.variants["fast"])
    params = {"comp": comp.traced_params()}

    def step(pad_planes, state, prm):
        out, _ = agg(pad_planes, (), prm["comp"])
        return out, state

    def make_planes(batch):
        rng = np.random.default_rng(0)
        return {n: random_planes_for_spec(s, batch, rng)
                for n, s in pad_specs.items()}

    os.environ.pop("TPUVF_NO_SPLIT_SCALED", None)
    return step, (), params, make_planes


def main():
    import collections
    variants = {"split": build(True), "interleaved": build(False)}
    best = collections.defaultdict(float)
    for rep in range(4):
        for tag, (step, st, p, mk) in variants.items():
            res = measure_fps(step, mk, st, p, batch_small=2, batch_large=8)
            best[tag] = max(best[tag], res["fps"])
            print(f"rep{rep} {tag:>12}: {res['fps']:8.1f} fps", flush=True)
    print("BEST:", dict(best), flush=True)
    print("DONE-SENTINEL", flush=True)


if __name__ == "__main__":
    main()
