"""Within-process A/B: packed 4:2:2 at SCALED geometry (round-4 late
extension) — UYVY 4K -> convertscale -> BGRA 1080p -> videofilter chain,
scaled split links vs canonical, interleaved reps.

The scaled split saves the mid-chain boundary materialization exactly
like the 4:2:0 scaled case (8K->4K +32-44%, BENCH.md round 3b); packed
4:2:2 forces NEAREST sampling on every plane, chroma half width / full
height (kernels/convert.plan_rgba_sampler_split_scaled).

Run: JAX_COMPILATION_CACHE_DIR=/tmp/tpuvf-tpu-cache python -u \
       scripts/bench_422_scaled_ab.py > /tmp/b422s_ab.out 2>&1
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

from tpuvf.runtime.benchmark import measure_fps, random_planes_for_spec


GEOM = (3840, 2160, 1920, 1080)  # overridable: argv = W_IN H_IN W_OUT H_OUT


def build(variant: str):
    """variant: 'canonical' | 'split' (interleaved src) | 'presplit'."""
    from tpuvf.core.registry import make
    from tpuvf.core.formats import VideoFormat
    from tpuvf.core.spec import FrameSpec

    saved = os.environ.get("TPUVF_NO_SPLIT_SCALED")
    if variant == "canonical":
        os.environ["TPUVF_NO_SPLIT_SCALED"] = "1"
    else:
        os.environ.pop("TPUVF_NO_SPLIT_SCALED", None)
    try:
        wi, hi, wo, ho = GEOM
        in_spec = FrameSpec(VideoFormat.UYVY, wi, hi)
        mid_spec = FrameSpec(VideoFormat.BGRA, wo, ho,
                             matrix=in_spec.matrix)
        out_spec = mid_spec
        cs = make("vfconvertscale")
        vf = make("vfvideofilter")
        for k, v in {"brightness": 0.05, "contrast": 1.1,
                     "saturation": 1.2}.items():
            vf.set_property(k, v)
        split = variant != "canonical"
        src_split = variant == "presplit"
        cs_proc = cs.make_process_linked(
            in_spec, mid_spec, cs.static_config(in_spec, mid_spec),
            in_split="split" if src_split else False,
            out_mode="split" if split else "full")
        vf_proc = vf.make_process_linked(
            mid_spec, out_spec, vf.static_config(mid_spec, out_spec),
            in_split=split, out_mode="packed32")
        params = {"cs": cs.traced_params(), "vf": vf.traced_params()}
    finally:
        if saved is None:
            os.environ.pop("TPUVF_NO_SPLIT_SCALED", None)
        else:
            os.environ["TPUVF_NO_SPLIT_SCALED"] = saved

    def step(planes, state, params):
        mid, _ = cs_proc(planes, (), params["cs"])
        out, new_state = vf_proc(mid, state, params["vf"])
        return out, new_state

    step.source_split = "split" if src_split else False
    return step, vf.init_state(mid_spec, out_spec), params, in_spec


def main():
    import collections
    variants = {v: build(v) for v in ("split", "presplit", "canonical")}
    best = collections.defaultdict(float)
    for rep in range(4):
        for tag, (step, st, p, spec) in variants.items():
            res = measure_fps(
                step,
                lambda b, spec=spec, step=step: random_planes_for_spec(
                    spec, b, split=getattr(step, "source_split", False)),
                st, p, batch_small=2, batch_large=8)
            best[tag] = max(best[tag], res["fps"])
            print(f"rep{rep} {tag:>9}: {res['fps']:8.1f} fps "
                  f"{res['ms_per_frame']:7.3f} ms", flush=True)
    print("BEST:", dict(best), flush=True)
    print("DONE-SENTINEL", flush=True)


if __name__ == "__main__":
    if len(sys.argv) == 5:
        GEOM = tuple(int(a) for a in sys.argv[1:])
    print("GEOM:", GEOM, flush=True)
    main()
