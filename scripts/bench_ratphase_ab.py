"""Interleaved A/B of the rational-factor (q-phase, stride-p) downscale
closed form vs the Pallas banded rows kernel / dense matmul it replaces.

Configs:
  - config 1 (convertscale NV12 1080p -> BGRA 640x480): rows 1080->480
    and chroma 540->240 are both 9:4 — the closed form replaces the
    banded Pallas row kernel (luma) AND its bottom-padded variant
    (540-row chroma), fusing the rows pass into the element program.
  - a 720p->480p NV12->BGRA element (3:2 rows) as a second geometry.

TPUVF_RATPHASE in {"rows", "off"} per variant; interleaved reps so both
arms share each tunnel window.

Run: JAX_COMPILATION_CACHE_DIR=/tmp/tpuvf-tpu-cache python -u \
       scripts/bench_ratphase_ab.py > /tmp/ratphase_ab.out 2>&1
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

from tpuvf.runtime.benchmark import measure_fps, random_planes_for_spec


def build(config: str, mode: str):
    saved = os.environ.get("TPUVF_RATPHASE")
    os.environ["TPUVF_RATPHASE"] = mode
    try:
        from bench import configs as C
        from tpuvf.core.formats import VideoFormat
        from tpuvf.core.registry import make
        from tpuvf.core.spec import FrameSpec

        if config == "cfg1":
            _, step, state0, params, in_spec = C.config_convertscale()
            sizes = (8, 32)
        else:
            in_spec = FrameSpec(VideoFormat.NV12, 1280, 720)
            out_spec = FrameSpec(VideoFormat.BGRA, 854, 480,
                                 matrix=in_spec.matrix)
            elem = make("vfconvertscale")
            step, state0, params = C._element_step(elem, in_spec, out_spec)
            sizes = (8, 32)
        return (step, state0, params,
                lambda b: random_planes_for_spec(
                    in_spec, b, split=getattr(step, "source_split", False)),
                sizes)
    finally:
        if saved is None:
            os.environ.pop("TPUVF_RATPHASE", None)
        else:
            os.environ["TPUVF_RATPHASE"] = saved


def main():
    import collections

    variants = {}
    for config in ("cfg1", "720p"):
        for mode in ("rows", "off"):
            variants[f"{config}:{mode}"] = build(config, mode)
    best = collections.defaultdict(float)
    for rep in range(4):
        for tag, (step, st, p, mk, sizes) in variants.items():
            res = measure_fps(step, mk, st, p,
                              batch_small=sizes[0], batch_large=sizes[1])
            best[tag] = max(best[tag], res["fps"])
            print(f"rep{rep} {tag:>10}: {res['fps']:8.1f} fps", flush=True)
    print("BEST:", dict(best), flush=True)
    print("DONE-SENTINEL", flush=True)


if __name__ == "__main__":
    main()
