"""Round 2 of the LUT ablation: u16 corner table on the REAL config 3,
plus gather-split-count variants.

Run:  JAX_COMPILATION_CACHE_DIR=/tmp/tpuvf-tpu-cache python -u \
        scripts/bench_lut_profile2.py > /tmp/lut_profile2.out 2>&1
"""
from __future__ import annotations

import sys

sys.path.insert(0, ".")

from bench.configs import config_videofilter
from tpuvf.kernels import filter as kfilter
from tpuvf.runtime.benchmark import measure_fps, random_planes_for_spec


def report(label, res):
    print(f"{label:>16}: {res['fps']:8.1f} fps  {res['ms_per_frame']:7.3f} ms"
          f"  (t4={res['t_small']*1e3:.1f} ms t16={res['t_large']*1e3:.1f} ms)",
          flush=True)


def run_full(label):
    _, step, state0, params, in_spec = config_videofilter()
    res = measure_fps(step, lambda b: random_planes_for_spec(in_spec, b),
                      state0, params)
    report(label, res)
    return res


def main():
    run_full("full_u16_s2")  # element now defaults to u16; _GATHER_SPLITS=2

    kfilter._GATHER_SPLITS = 1
    run_full("full_u16_s1")  # phases already give 2-way gather overlap

    kfilter._GATHER_SPLITS = 4
    run_full("full_u16_s4")

    print("DONE-SENTINEL", flush=True)


if __name__ == "__main__":
    main()
