"""Within-process A/B of a 2x-UPSAMPLE chain (1080p NV12 -> 4K BGRA
convertscale ! videofilter): scaled split links vs canonical, and
presplit (phase-matmul) vs interleaved-source (phase-stencil) input.

Alternating reps cancel the tunnel's window bimodality (identical
programs swing up to 3x between reps in BOTH directions — BENCH.md).

Run: JAX_COMPILATION_CACHE_DIR=/tmp/tpuvf-tpu-cache python -u \
       scripts/bench_upscale_ab.py > /tmp/upscale_ab.out 2>&1
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

from tpuvf.runtime.benchmark import measure_fps, random_planes_for_spec


def build(variant: str):
    """variant: 'canonical' | 'stencil' (interleaved src, split link) |
    'presplit' (split src upload, split link)."""
    from tpuvf.core.registry import make
    from __graft_entry__ import _specs

    saved = os.environ.get("TPUVF_NO_SPLIT_SCALED")
    if variant == "canonical":
        os.environ["TPUVF_NO_SPLIT_SCALED"] = "1"
    else:
        os.environ.pop("TPUVF_NO_SPLIT_SCALED", None)
    try:
        in_spec, mid_spec, out_spec = _specs(1920, 1080, 3840, 2160)
        cs = make("vfconvertscale")
        vf = make("vfvideofilter")
        for k, v in {"brightness": 0.05, "contrast": 1.1,
                     "saturation": 1.2}.items():
            vf.set_property(k, v)
        split = variant != "canonical"
        src_split = variant == "presplit"
        cs_proc = cs.make_process_linked(
            in_spec, mid_spec, cs.static_config(in_spec, mid_spec),
            in_split=src_split, out_mode="split" if split else "full")
        vf_proc = vf.make_process_linked(
            mid_spec, out_spec, vf.static_config(mid_spec, out_spec),
            in_split=split, out_mode="packed16")
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

    step.source_split = src_split
    return step, vf.init_state(mid_spec, out_spec), params, in_spec


def main():
    import collections
    variants = {v: build(v) for v in ("stencil", "presplit", "canonical")}
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
