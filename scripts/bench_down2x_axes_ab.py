"""Axis-split A/B of the integer-factor downscale closed form: which
axis pays?  TPUVF_DOWN2X in {"", "rows", "cols", "off"} on the 8K->4K
chain and the standalone 4K->1080p NV12->NV12 element.

Hypothesis from bench_down2x_ab.py: sublane (row) strided adds are
cheap; lane (column) mod-k reshape access inside the big fused emit is
the expensive half (CLAUDE.md lane-stride rule).

Run: JAX_COMPILATION_CACHE_DIR=/tmp/tpuvf-tpu-cache python -u \
       scripts/bench_down2x_axes_ab.py > /tmp/down2x_axes.out 2>&1
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

from tpuvf.runtime.benchmark import measure_fps, random_planes_for_spec


def build(config: str, mode: str):
    saved = os.environ.get("TPUVF_DOWN2X")
    os.environ["TPUVF_DOWN2X"] = mode
    try:
        from bench import configs as C

        if config == "chain":
            _, step, state0, params, mk = C.config_scale8k4k()
            return step, state0, params, mk, (2, 8)
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
                    in_spec, b, split=getattr(step, "source_split", False)),
                (8, 32))
    finally:
        if saved is None:
            os.environ.pop("TPUVF_DOWN2X", None)
        else:
            os.environ["TPUVF_DOWN2X"] = saved


def main():
    import collections

    variants = {}
    for config in ("chain", "nv12"):
        for mode in ("", "rows", "cols", "off"):
            tag = f"{config}:{mode or 'both'}"
            variants[tag] = build(config, mode)
    best = collections.defaultdict(float)
    for rep in range(3):
        for tag, (step, st, p, mk, sizes) in variants.items():
            res = measure_fps(step, mk, st, p,
                              batch_small=sizes[0], batch_large=sizes[1])
            best[tag] = max(best[tag], res["fps"])
            print(f"rep{rep} {tag:>11}: {res['fps']:8.1f} fps", flush=True)
    print("BEST:", dict(best), flush=True)
    print("DONE-SENTINEL", flush=True)


if __name__ == "__main__":
    main()
