"""Within-process interleaved A/B of BASELINE config 5: host PAIR chroma
provisioning (round 5 — 4:2:0 pad uploads carry full-height main/adj u8
chroma so the LINEAR row upsample fuses into every cell fold) vs the
round-4 eager path (TPUVF_NO_CHROMA_PAIR).

Both variants consume the SAME planes (the pair keys are unused jit
inputs for the disabled program), so the A/B isolates the program shape.
Also captures a device trace per variant (the fps windows are 2x noisy;
the trace is the instrument — round-4 rule).

Run:  JAX_COMPILATION_CACHE_DIR=/tmp/tpuvf-tpu-cache python -u \
        scripts/bench_comp_pair_ab.py > /tmp/comp_pair_ab.out 2>&1
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

import bench.configs as cfgs
from tpuvf.runtime.benchmark import measure_device_us, measure_fps


def with_env(pair, fn):
    if pair:
        os.environ.pop("TPUVF_NO_CHROMA_PAIR", None)
    else:
        os.environ["TPUVF_NO_CHROMA_PAIR"] = "1"
    try:
        return fn()
    finally:
        os.environ.pop("TPUVF_NO_CHROMA_PAIR", None)


def main():
    a = with_env(True, cfgs.config_compositor)   # pair
    b = with_env(False, cfgs.config_compositor)  # eager (round-4)

    for tag, pair, (label, step, st, p, mk) in (("pair", True, a),
                                                ("eager", False, b)):
        dev = with_env(pair, lambda: measure_device_us(step, mk, st, p))
        if dev:
            print(f"device {tag:>6}: {dev['us_per_frame']:8.1f} us/frame "
                  f"({dev['fps_device']:7.1f} fps floor)", flush=True)
    for rep in range(4):
        for tag, pair, (label, step, st, p, mk) in (("pair", True, a),
                                                    ("eager", False, b)):
            res = with_env(pair, lambda: measure_fps(step, mk, st, p))
            print(f"rep{rep} {tag:>6}: {res['fps']:8.1f} fps "
                  f"{res['ms_per_frame']:7.3f} ms", flush=True)
    print("DONE-SENTINEL", flush=True)


if __name__ == "__main__":
    main()
