"""Within-process A/B: 4K chain with a MID-CHAIN crop transform —
split links through the transform (round 3c) vs every boundary forced
canonical.  videofilter ! transform(crop) ! videofilter on NV12 4K.

Run: JAX_COMPILATION_CACHE_DIR=/tmp/tpuvf-tpu-cache python -u \
       scripts/bench_transform_chain_ab.py > /tmp/tchain_ab.out 2>&1
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

from tpuvf.runtime.benchmark import measure_fps, random_planes_for_spec


def build(split: bool):
    from tpuvf.core.registry import make
    from tpuvf.core.formats import VideoFormat
    from tpuvf.core.spec import FrameSpec

    spec = FrameSpec(VideoFormat.NV12, 3840, 2160)
    vf1 = make("vfvideofilter")
    vf1.set_property("brightness", 0.05)
    vf1.set_property("contrast", 1.1)
    tr = make("vftransform")
    tr.set_property("crop-left", 64)
    tr.set_property("crop-top", 32)
    vf2 = make("vfvideofilter")
    vf2.set_property("saturation", 1.2)

    mode = "split" if split else "full"
    p1 = vf1.make_process_linked(
        spec, spec, vf1.static_config(spec, spec),
        in_split=split, out_mode=mode)
    p2 = tr.make_process_linked(
        spec, spec, tr.static_config(spec, spec),
        in_split=split, out_mode=mode)
    p3 = vf2.make_process_linked(
        spec, spec, vf2.static_config(spec, spec),
        in_split=split, out_mode="packed16" if split else "full")
    params = {"vf1": vf1.traced_params(), "tr": tr.traced_params(),
              "vf2": vf2.traced_params()}
    st2 = vf2.init_state(spec, spec)

    def step(planes, state, prm):
        a, _ = p1(planes, vf1.init_state(spec, spec), prm["vf1"])
        b, _ = p2(a, (), prm["tr"])
        out, ns = p3(b, state, prm["vf2"])
        return out, ns

    step.source_split = split
    return step, st2, params, spec


def main():
    import collections
    variants = {"split": build(True), "canonical": build(False)}
    best = collections.defaultdict(float)
    for rep in range(4):
        for tag, (step, st, p, spec) in variants.items():
            res = measure_fps(
                step,
                lambda b: random_planes_for_spec(
                    spec, b, split=getattr(step, "source_split", False)),
                st, p, batch_small=2, batch_large=8)
            best[tag] = max(best[tag], res["fps"])
            print(f"rep{rep} {tag:>9}: {res['fps']:8.1f} fps", flush=True)
    print("BEST:", dict(best), flush=True)
    print("DONE-SENTINEL", flush=True)


if __name__ == "__main__":
    main()
