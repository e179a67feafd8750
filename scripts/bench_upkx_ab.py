"""Within-process A/B of the kx integer-upsample closed form (round 4):
960x540 NV12 -> 4K BGRA (4x/4x) convertscale ! videofilter, canonical
boundaries, TPUVF_UPKX=both vs rows vs off (off = blockband matrix
path).  Alternating reps cancel the tunnel's window bimodality.

Run: JAX_COMPILATION_CACHE_DIR=/tmp/tpuvf-tpu-cache python -u \
       scripts/bench_upkx_ab.py > /tmp/upkx_ab.out 2>&1
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

from tpuvf.runtime.benchmark import measure_fps, random_planes_for_spec


def build(mode: str):
    from tpuvf.core.registry import make
    from __graft_entry__ import _specs

    saved = os.environ.get("TPUVF_UPKX")
    os.environ["TPUVF_UPKX"] = mode
    # keep the comparison on the canonical (non-split) plan for both arms
    saved_split = os.environ.get("TPUVF_NO_SPLIT_SCALED")
    os.environ["TPUVF_NO_SPLIT_SCALED"] = "1"
    try:
        in_spec, mid_spec, out_spec = _specs(960, 540, 3840, 2160)
        cs = make("vfconvertscale")
        vf = make("vfvideofilter")
        for k, v in {"brightness": 0.05, "contrast": 1.1,
                     "saturation": 1.2}.items():
            vf.set_property(k, v)
        cs_proc = cs.make_process_linked(
            in_spec, mid_spec, cs.static_config(in_spec, mid_spec),
            in_split=False, out_mode="full")
        vf_proc = vf.make_process_linked(
            mid_spec, out_spec, vf.static_config(mid_spec, out_spec),
            in_split=False, out_mode="packed16")
        params = {"cs": cs.traced_params(), "vf": vf.traced_params()}
    finally:
        if saved is None:
            os.environ.pop("TPUVF_UPKX", None)
        else:
            os.environ["TPUVF_UPKX"] = saved
        if saved_split is None:
            os.environ.pop("TPUVF_NO_SPLIT_SCALED", None)
        else:
            os.environ["TPUVF_NO_SPLIT_SCALED"] = saved_split

    def step(planes, state, params):
        mid, _ = cs_proc(planes, (), params["cs"])
        out, new_state = vf_proc(mid, state, params["vf"])
        return out, new_state

    return step, vf.init_state(mid_spec, out_spec), params, in_spec


def main():
    import collections

    variants = {m: build(m) for m in ("both", "rows", "off")}
    best = collections.defaultdict(float)
    for rep in range(4):
        for tag, (step, st, p, spec) in variants.items():
            res = measure_fps(
                step, lambda b: random_planes_for_spec(spec, b),
                st, p, batch_small=2, batch_large=8)
            best[tag] = max(best[tag], res["fps"])
            print(f"rep{rep} {tag:>5}: {res['fps']:8.1f} fps", flush=True)
    print("BEST:", dict(best), flush=True)
    print("DONE-SENTINEL", flush=True)


if __name__ == "__main__":
    main()
