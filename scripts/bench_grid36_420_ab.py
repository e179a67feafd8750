"""Interleaved A/B of the GRID36 packed420g6 edge (format-preserving 3x
4:2:0 upscale, e.g. NV12 720p -> NV12 4K — the default fixation at 3x)
vs the previous standalone election (canonical sampler + closed forms,
TPUVF_NO_GRID36-forced).

Run:  JAX_COMPILATION_CACHE_DIR=/tmp/tpuvf-tpu-cache python -u \
        scripts/bench_grid36_420_ab.py [w_in h_in] > /tmp/grid36_420_ab.out 2>&1
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


def build(w_in, h_in, grid36):
    in_spec = FrameSpec(VideoFormat.NV12, w_in, h_in)
    out_spec = FrameSpec(VideoFormat.NV12, 3 * w_in, 3 * h_in,
                         matrix=in_spec.matrix)
    elem = make("vfconvertscale")
    if grid36:
        static = elem.static_config(in_spec, out_spec)
        assert elem.grid36_head_ok(in_spec, out_spec)
        step = elem.make_process_linked(in_spec, out_spec, static,
                                        in_split="quad",
                                        out_mode="packed420g6")
        split = "quad"
        state0, params = elem.init_state(in_spec, out_spec), \
            elem.traced_params()
    else:
        os.environ["TPUVF_NO_GRID36"] = "1"
        try:
            step, state0, params = _element_step(elem, in_spec, out_spec)
        finally:
            os.environ.pop("TPUVF_NO_GRID36", None)
        split = getattr(step, "source_split", False)
    mk = lambda b: random_planes_for_spec(in_spec, b, split=split)
    return step, state0, params, mk


def main():
    w_in, h_in = 1280, 720
    if len(sys.argv) >= 3:
        w_in, h_in = int(sys.argv[1]), int(sys.argv[2])
    a = build(w_in, h_in, True)   # grid36 packed420g6
    b = build(w_in, h_in, False)  # previous election

    for tag, (step, st, p, mk) in (("grid36", a), ("base", b)):
        dev = measure_device_us(step, mk, st, p)
        if dev:
            print(f"device {tag:>6}: {dev['us_per_frame']:8.1f} us/frame "
                  f"({dev['fps_device']:7.1f} fps floor)", flush=True)
    for rep in range(4):
        for tag, (step, st, p, mk) in (("grid36", a), ("base", b)):
            res = measure_fps(step, mk, st, p)
            print(f"rep{rep} {tag:>6}: {res['fps']:8.1f} fps "
                  f"{res['ms_per_frame']:7.3f} ms", flush=True)
    print("DONE-SENTINEL", flush=True)


if __name__ == "__main__":
    main()
