"""Interleaved A/B of the round-5 mid-chain grid head: 1080i NV12
deinterlace (greedy-H) -> 4K BGRA 2x upscale.

 - grid : the new plan (deinterlace on quad links from a quad-provisioned
          source, convertscale grid16 head reading the quad boundary,
          packed32g edge) — composed exactly as Pipeline._link_plan
          negotiates it since the quad_upstream_chain extension
 - base : the previous election (column-split links: deinterlace split
          in/out, convertscale split-scaled sampler, packed32 edge)

Run:  JAX_COMPILATION_CACHE_DIR=/tmp/tpuvf-tpu-cache python -u \
        scripts/bench_deint_upscale_ab.py > /tmp/deint_upscale_ab.out 2>&1
"""
from __future__ import annotations

import sys

sys.path.insert(0, ".")

from tpuvf.core.formats import VideoFormat
from tpuvf.core.registry import make
from tpuvf.core.spec import FrameSpec
from tpuvf.runtime.benchmark import (measure_device_us, measure_fps,
                                     random_planes_for_spec)


def build(grid):
    in_spec = FrameSpec(VideoFormat.NV12, 1920, 1080, interlaced=True)
    mid_spec = FrameSpec(VideoFormat.NV12, 1920, 1080,
                         matrix=in_spec.matrix)
    out_spec = FrameSpec(VideoFormat.BGRA, 3840, 2160,
                         matrix=in_spec.matrix)
    di = make("vfdeinterlace")
    di.set_property("method", 3)  # greedyh
    di.set_property("motion-threshold", 0.3)
    cs = make("vfconvertscale")
    if grid:
        di_proc = di.make_process_linked(
            in_spec, mid_spec, di.static_config(in_spec, mid_spec),
            in_split="quad", out_mode="quad")
        di_proc = getattr(di_proc, "variants", {}).get("fast", di_proc)
        assert cs.grid_head_ok(mid_spec, out_spec)
        cs_proc = cs.make_process_linked(
            mid_spec, out_spec, cs.static_config(mid_spec, out_spec),
            in_split="quad", out_mode="packed32g")
        split = "quad"
    else:
        di_proc = di.make_process_linked(
            in_spec, mid_spec, di.static_config(in_spec, mid_spec),
            in_split=True, out_mode="split")
        di_proc = getattr(di_proc, "variants", {}).get("fast", di_proc)
        # the old negotiated plan kept the edge canonical ("full"):
        # _split_scaled_ok elects split links but edge_packed16_ok
        # rejects the scaled phase edge standalone
        cs_proc = cs.make_process_linked(
            mid_spec, out_spec, cs.static_config(mid_spec, out_spec),
            in_split=True, out_mode="full")
        split = True
    params = {"di": di.traced_params(), "cs": cs.traced_params()}

    def step(planes, state, params):
        mid, new_state = di_proc(planes, state, params["di"])
        out, _ = cs_proc(mid, (), params["cs"])
        return out, new_state

    state0 = di.init_state(in_spec, mid_spec)
    mk = lambda b: random_planes_for_spec(in_spec, b, split=split)
    return step, state0, params, mk


def main():
    a = build(True)
    b = build(False)
    for tag, (step, st, p, mk) in (("grid", a), ("base", b)):
        dev = measure_device_us(step, mk, st, p)
        if dev:
            print(f"device {tag:>5}: {dev['us_per_frame']:8.1f} us/frame "
                  f"({dev['fps_device']:7.1f} fps floor)", flush=True)
    for rep in range(4):
        for tag, (step, st, p, mk) in (("grid", a), ("base", b)):
            res = measure_fps(step, mk, st, p)
            print(f"rep{rep} {tag:>5}: {res['fps']:8.1f} fps "
                  f"{res['ms_per_frame']:7.3f} ms", flush=True)
    print("DONE-SENTINEL", flush=True)


if __name__ == "__main__":
    main()
