"""Within-process A/B of the letterboxed exactly-2x rows closed form
(round 4): 1080p NV12 -> 3840x2400 BGRA add-borders (content 3840x2160
at y0=120), TPUVF_NO_LB2X unset vs set (set = dense/blockband matrix).

Run: JAX_COMPILATION_CACHE_DIR=/tmp/tpuvf-tpu-cache python -u \
       scripts/bench_lb2x_ab.py > /tmp/lb2x_ab.out 2>&1
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

from tpuvf.runtime.benchmark import measure_fps, random_planes_for_spec


def build(closed: bool):
    from tpuvf.core.formats import VideoFormat
    from tpuvf.core.registry import make
    from tpuvf.core.spec import FrameSpec

    saved = os.environ.get("TPUVF_NO_LB2X")
    if closed:
        os.environ.pop("TPUVF_NO_LB2X", None)
    else:
        os.environ["TPUVF_NO_LB2X"] = "1"
    try:
        in_spec = FrameSpec(VideoFormat.NV12, 1920, 1080)
        out_spec = FrameSpec(VideoFormat.BGRA, 3840, 2400,
                             matrix=in_spec.matrix)
        cs = make("vfconvertscale")
        cs.set_property("add-borders", True)
        cs_proc = cs.make_process_linked(
            in_spec, out_spec, cs.static_config(in_spec, out_spec),
            in_split=False, out_mode="full")
        params = {"cs": cs.traced_params()}
    finally:
        if saved is None:
            os.environ.pop("TPUVF_NO_LB2X", None)
        else:
            os.environ["TPUVF_NO_LB2X"] = saved

    def step(planes, state, params):
        out, _ = cs_proc(planes, (), params["cs"])
        return out, state

    return step, (), params, in_spec


def main():
    import collections

    variants = {"closed": build(True), "matrix": build(False)}
    best = collections.defaultdict(float)
    for rep in range(4):
        for tag, (step, st, p, spec) in variants.items():
            res = measure_fps(
                step, lambda b: random_planes_for_spec(spec, b),
                st, p, batch_small=2, batch_large=8)
            best[tag] = max(best[tag], res["fps"])
            print(f"rep{rep} {tag:>7}: {res['fps']:8.1f} fps", flush=True)
    print("BEST:", dict(best), flush=True)
    print("DONE-SENTINEL", flush=True)


if __name__ == "__main__":
    main()
