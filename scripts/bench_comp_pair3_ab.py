"""3-way device-time A/B of BASELINE config 5 (round 5): separates the
two effects the pair-provisioning commit combined —

  pair_eager : pair chroma upload, EAGER sample_draw_split decode
               (the shipped default)
  pair_lazy  : pair chroma upload + LAZY per-cell 4:2:0 decode
               (TPUVF_LAZY420=1)
  no_pair    : round-4 path (TPUVF_NO_CHROMA_PAIR=1)

MEASURED (round 5, v5e device traces): pair+lazy 596.3 / pair+eager
540.9 / no-pair 569.2 us/frame — the pair chroma upload WINS (-5%),
the lazy per-cell decode LOSES (+10%); the shipped default is
pair+eager (lazy behind TPUVF_LAZY420=1).  Device traces are the
instrument (fps windows are 2x noisy — round-4 rule).

Run:  JAX_COMPILATION_CACHE_DIR=/tmp/tpuvf-tpu-cache python -u \
        scripts/bench_comp_pair3_ab.py > /tmp/comp_pair3_ab.out 2>&1
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

import bench.configs as cfgs
from tpuvf.runtime.benchmark import measure_device_us, measure_fps

VARIANTS = (
    ("pair_eager", {}),
    ("pair_lazy", {"TPUVF_LAZY420": "1"}),
    ("no_pair", {"TPUVF_NO_CHROMA_PAIR": "1"}),
)
KEYS = ("TPUVF_LAZY420", "TPUVF_NO_CHROMA_PAIR")


def with_env(env, fn):
    for k in KEYS:
        os.environ.pop(k, None)
    os.environ.update(env)
    try:
        return fn()
    finally:
        for k in KEYS:
            os.environ.pop(k, None)


def main():
    built = [(tag, env, with_env(env, cfgs.config_compositor))
             for tag, env in VARIANTS]
    for tag, env, (label, step, st, p, mk) in built:
        dev = with_env(env, lambda: measure_device_us(step, mk, st, p))
        if dev:
            print(f"device {tag:>6}: {dev['us_per_frame']:8.1f} us/frame "
                  f"({dev['fps_device']:7.1f} fps floor)", flush=True)
    for rep in range(3):
        for tag, env, (label, step, st, p, mk) in built:
            res = with_env(env, lambda: measure_fps(step, mk, st, p))
            print(f"rep{rep} {tag:>6}: {res['fps']:8.1f} fps "
                  f"{res['ms_per_frame']:7.3f} ms", flush=True)
    print("DONE-SENTINEL", flush=True)


if __name__ == "__main__":
    main()
