"""Interleaved A/B of the GRID9 (mod-3 phase) 1.5x-upscale dataflow vs
the previous standalone election (canonical sampler + blockband
matmuls) — covers 720p -> 1080p, the most common HD upscale.

Config: NV12 1280x720 -> BGRA 1920x1080 (1.5x/1.5x), standalone
convertscale; also a chain-with-videofilter A/B at the same geometry.

Run:  JAX_COMPILATION_CACHE_DIR=/tmp/tpuvf-tpu-cache python -u \
        scripts/bench_grid9_ab.py [w_in h_in] > /tmp/grid9_ab.out 2>&1
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

from tpuvf.core.formats import VideoFormat
from tpuvf.core.registry import make
from tpuvf.core.spec import FrameSpec
from tpuvf.runtime.benchmark import (measure_device_us, measure_fps,
                                     random_planes_for_spec)

from bench.configs import _element_step  # noqa: E402


def build(w_in, h_in, grid9):
    in_spec = FrameSpec(VideoFormat.NV12, w_in, h_in)
    out_spec = FrameSpec(VideoFormat.BGRA, 3 * w_in // 2, 3 * h_in // 2,
                         matrix=in_spec.matrix)
    elem = make("vfconvertscale")
    if grid9:
        static = elem.static_config(in_spec, out_spec)
        assert elem.grid9_head_ok(in_spec, out_spec)
        step = elem.make_process_linked(in_spec, out_spec, static,
                                        in_split="quad",
                                        out_mode="packed32g3")
        split = "quad"
        state0, params = elem.init_state(in_spec, out_spec), \
            elem.traced_params()
    else:
        os.environ["TPUVF_NO_GRID9"] = "1"
        try:
            step, state0, params = _element_step(elem, in_spec, out_spec)
        finally:
            os.environ.pop("TPUVF_NO_GRID9", None)
        split = getattr(step, "source_split", False)
    mk = lambda b: random_planes_for_spec(in_spec, b, split=split)
    return step, state0, params, mk


def build_chain(w_in, h_in, disable):
    from __graft_entry__ import _build_chain, _specs

    if disable:
        os.environ["TPUVF_NO_GRID9"] = "1"
    try:
        in_spec, mid_spec, out_spec = _specs(w_in, h_in,
                                             3 * w_in // 2, 3 * h_in // 2)
        step, state0, params = _build_chain(
            in_spec, mid_spec, out_spec,
            {"brightness": 0.05, "contrast": 1.1, "saturation": 1.2})
    finally:
        os.environ.pop("TPUVF_NO_GRID9", None)
    mk = lambda b: random_planes_for_spec(
        in_spec, b, split=getattr(step, "source_split", False))
    return step, state0, params, mk


def main():
    w_in, h_in = 1280, 720
    if len(sys.argv) >= 3:
        w_in, h_in = int(sys.argv[1]), int(sys.argv[2])
    pairs = [
        ("grid9", build(w_in, h_in, True)),
        ("base", build(w_in, h_in, False)),
        ("chain9", build_chain(w_in, h_in, False)),
        ("chainbase", build_chain(w_in, h_in, True)),
    ]
    for tag, (step, st, p, mk) in pairs:
        dev = measure_device_us(step, mk, st, p)
        if dev:
            print(f"device {tag:>9}: {dev['us_per_frame']:8.1f} us/frame "
                  f"({dev['fps_device']:7.1f} fps floor)", flush=True)
    for rep in range(3):
        for tag, (step, st, p, mk) in pairs:
            res = measure_fps(step, mk, st, p)
            print(f"rep{rep} {tag:>9}: {res['fps']:8.1f} fps "
                  f"{res['ms_per_frame']:7.3f} ms", flush=True)
    print("DONE-SENTINEL", flush=True)


if __name__ == "__main__":
    main()
