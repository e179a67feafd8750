"""Interleaved A/B of the GRID64 4x-upscale CHAIN (540p NV12 -> 4K BGRA
convertscale+videofilter) vs the prior best plan (TPUVF_NO_QUAD_LINKS:
kx-rows closed form + split links) — VERDICT r4 item 5, chain leg.

Run:  JAX_COMPILATION_CACHE_DIR=/tmp/tpuvf-tpu-cache python -u \
        scripts/bench_grid64_chain_ab.py [w_in h_in w_out h_out] \
        > /tmp/grid64_chain_ab.out 2>&1
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

from tpuvf.runtime.benchmark import (measure_device_us, measure_fps,
                                     random_planes_for_spec)


def build(geom, grid64):
    if grid64:
        os.environ.pop("TPUVF_NO_QUAD_LINKS", None)
    else:
        os.environ["TPUVF_NO_QUAD_LINKS"] = "1"
    try:
        from bench.configs import _chain_config

        label, step, state0, params, mk = _chain_config("4x chain", *geom)
        return step, state0, params, mk
    finally:
        os.environ.pop("TPUVF_NO_QUAD_LINKS", None)


def main():
    geom = (960, 540, 3840, 2160)
    if len(sys.argv) >= 5:
        geom = tuple(int(a) for a in sys.argv[1:5])
    a = build(geom, True)   # grid64 chain
    b = build(geom, False)  # kx-rows + split plan

    for tag, (step, st, p, mk) in (("grid64", a), ("base", b)):
        print(f"{tag}: source_split={getattr(step, 'source_split', None)}",
              flush=True)
        dev = measure_device_us(step, mk, st, p)
        if dev:
            print(f"device {tag:>6}: {dev['us_per_frame']:8.1f} us/frame "
                  f"({dev['fps_device']:7.1f} fps floor)", flush=True)
    for rep in range(4):
        for tag, (step, st, p, mk) in (("grid64", a), ("base", b)):
            res = measure_fps(step, mk, st, p)
            print(f"rep{rep} {tag:>6}: {res['fps']:8.1f} fps "
                  f"{res['ms_per_frame']:7.3f} ms", flush=True)
    print("DONE-SENTINEL", flush=True)


if __name__ == "__main__":
    main()
