"""Within-process A/B of the exactly-2:1 downscale closed form
(convert._downsample2x and the plan_cols_phase_sampler 2:1 phase paths)
vs the dense/blockband sampling matmuls (TPUVF_NO_DOWN2X=1).

Two configs:
  - chain:  8K NV12 -> 4K BGRA convertscale ! videofilter (the scale8k4k
    bench config — its luma sampling matrices are (2160,4320) and
    (3840,7680) f32 dense buffers in the matmul form)
  - nv12:   4K NV12 -> 1080p NV12 standalone convertscale (the
    format-preserving default fixation at 2:1)

Alternating reps cancel the tunnel's window bimodality (BENCH.md).

Run: JAX_COMPILATION_CACHE_DIR=/tmp/tpuvf-tpu-cache python -u \
       scripts/bench_down2x_ab.py > /tmp/down2x_ab.out 2>&1
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

from tpuvf.runtime.benchmark import measure_fps, random_planes_for_spec


def build(config: str, fast: bool):
    saved = os.environ.get("TPUVF_NO_DOWN2X")
    if fast:
        os.environ.pop("TPUVF_NO_DOWN2X", None)
    else:
        os.environ["TPUVF_NO_DOWN2X"] = "1"
    try:
        from bench import configs as C

        if config == "chain":
            title, step, state0, params, mk = C.config_scale8k4k()
            return step, state0, params, mk
        from tpuvf.core.formats import VideoFormat
        from tpuvf.core.registry import make
        from tpuvf.core.spec import FrameSpec

        in_spec = FrameSpec(VideoFormat.NV12, 3840, 2160)
        out_spec = FrameSpec(VideoFormat.NV12, 1920, 1080,
                             matrix=in_spec.matrix)
        elem = make("vfconvertscale")
        step, state0, params = C._element_step(elem, in_spec, out_spec)
        return (step, state0, params,
                lambda b: random_planes_for_spec(
                    in_spec, b, split=getattr(step, "source_split", False)))
    finally:
        if saved is None:
            os.environ.pop("TPUVF_NO_DOWN2X", None)
        else:
            os.environ["TPUVF_NO_DOWN2X"] = saved


def main():
    import collections

    variants = {}
    for config in ("chain", "nv12"):
        for fast in (True, False):
            tag = f"{config}:{'down2x' if fast else 'matmul'}"
            variants[tag] = build(config, fast)
    best = collections.defaultdict(float)
    for rep in range(4):
        for tag, (step, st, p, mk) in variants.items():
            res = measure_fps(step, mk, st, p, batch_small=2, batch_large=8)
            best[tag] = max(best[tag], res["fps"])
            print(f"rep{rep} {tag:>14}: {res['fps']:8.1f} fps", flush=True)
    print("BEST:", dict(best), flush=True)
    print("DONE-SENTINEL", flush=True)


if __name__ == "__main__":
    main()
