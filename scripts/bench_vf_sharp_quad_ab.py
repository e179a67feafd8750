"""Interleaved A/B: 4K NV12 convertscale+videofilter WITH SHARPNESS —
quad links (blur9_h_split per row phase + blur9_v_split per column phase)
vs the column-split plan (full-height vertical blur).

Usage: python -u scripts/bench_vf_sharp_quad_ab.py [reps]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/tpuvf-tpu-cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from tpuvf.runtime.benchmark import measure_fps, random_planes_for_spec

FILTER_PROPS = {"brightness": 0.05, "contrast": 1.1, "saturation": 1.2,
                "sharpness": 0.5}


def build(quad: bool):
    if quad:
        os.environ.pop("TPUVF_NO_QUAD_LINKS", None)
    else:
        os.environ["TPUVF_NO_QUAD_LINKS"] = "1"
    from __graft_entry__ import _build_chain, _specs

    in_spec, mid_spec, out_spec = _specs(3840, 2160, 3840, 2160)
    step, state0, params = _build_chain(in_spec, mid_spec, out_spec,
                                        dict(FILTER_PROPS))
    src_split = getattr(step, "source_split", False)

    def make_planes(batch):
        return random_planes_for_spec(in_spec, batch, split=src_split)

    return step, state0, params, make_planes, src_split


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sides = {}
    for name, quad in (("quad", True), ("split", False)):
        sides[name] = build(quad)
        print(f"{name}: source_split={sides[name][4]}", flush=True)
    for r in range(reps):
        for name in ("quad", "split"):
            step, state0, params, make_planes, _ = sides[name]
            res = measure_fps(step, make_planes, state0, params,
                              batch_small=4, batch_large=16)
            print(f"rep{r} {name}: {res['fps']:.0f} fps", flush=True)


if __name__ == "__main__":
    main()
