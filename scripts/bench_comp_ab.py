"""Within-process A/B of BASELINE config 5: negotiated split links vs
forced-canonical, alternating reps to cancel drift.

Run:  JAX_COMPILATION_CACHE_DIR=/tmp/tpuvf-tpu-cache python -u \
        scripts/bench_comp_ab.py > /tmp/comp_ab.out 2>&1
"""
from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")

import bench.configs as cfgs
from tpuvf.runtime.benchmark import measure_fps


def build(linked: bool):
    if not linked:
        # force canonical layouts by patching the negotiation probes
        import tpuvf.elements.compositor as comp_mod
        import tpuvf.elements.overlay as ov_mod

        orig_c = comp_mod.Compositor.aggregate_split_ok
        orig_o = ov_mod.Overlay.split_input_ok
        orig_o2 = ov_mod.Overlay.split_output_ok
        comp_mod.Compositor.aggregate_split_ok = lambda *a, **k: False
        ov_mod.Overlay.split_input_ok = lambda *a, **k: False
        ov_mod.Overlay.split_output_ok = lambda *a, **k: False
        try:
            out = cfgs.config_compositor()
        finally:
            comp_mod.Compositor.aggregate_split_ok = orig_c
            ov_mod.Overlay.split_input_ok = orig_o
            ov_mod.Overlay.split_output_ok = orig_o2
        return out
    return cfgs.config_compositor()


def main():
    label_a, step_a, st_a, p_a, mk_a = build(True)
    label_b, step_b, st_b, p_b, mk_b = build(False)
    for rep in range(3):
        for tag, (step, st, p, mk) in (("linked", (step_a, st_a, p_a, mk_a)),
                                       ("plain", (step_b, st_b, p_b, mk_b))):
            res = measure_fps(step, mk, st, p)
            print(f"rep{rep} {tag:>7}: {res['fps']:8.1f} fps "
                  f"{res['ms_per_frame']:7.3f} ms", flush=True)
    print("DONE-SENTINEL", flush=True)


if __name__ == "__main__":
    main()
