"""Device-time A/B of the rational-phase rows closed form (config 1 +
720p->480p element).  Wall-clock slopes are useless here — config-1
frames run ~60 us, far below the ~35 ms tunnel jitter (the transform
config's published-number rule) — so compare per-frame DEVICE time,
both variants traced back-to-back in one process/window.

Run: JAX_COMPILATION_CACHE_DIR=/tmp/tpuvf-tpu-cache python -u \
       scripts/bench_ratphase_dev.py > /tmp/ratphase_dev.out 2>&1
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

from tpuvf.runtime.benchmark import measure_device_us, random_planes_for_spec


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
        else:
            in_spec = FrameSpec(VideoFormat.NV12, 1280, 720)
            out_spec = FrameSpec(VideoFormat.BGRA, 854, 480,
                                 matrix=in_spec.matrix)
            elem = make("vfconvertscale")
            step, state0, params = C._element_step(elem, in_spec, out_spec)
        return (step, state0, params,
                lambda b: random_planes_for_spec(
                    in_spec, b, split=getattr(step, "source_split", False)))
    finally:
        if saved is None:
            os.environ.pop("TPUVF_RATPHASE", None)
        else:
            os.environ["TPUVF_RATPHASE"] = saved


def main():
    for config in ("cfg1", "720p"):
        for rep in range(2):
            for mode in ("rows", "off"):
                step, st, p, mk = build(config, mode)
                dev = measure_device_us(step, mk, st, p)
                if dev is None:
                    print(f"{config}:{mode}: NO TRACE", flush=True)
                    continue
                print(f"rep{rep} {config}:{mode:>4}: "
                      f"{dev['us_per_frame']:7.1f} us/frame "
                      f"({dev['fps_device']:8.1f} fps-device)", flush=True)
    print("DONE-SENTINEL", flush=True)


if __name__ == "__main__":
    main()
