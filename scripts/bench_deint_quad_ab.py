"""Interleaved A/B: deinterlace greedy-H 1080i with QUAD (row-phase) links
vs the column-split plan (config 4).

The quad fast body bakes the stream field order, so the kept field is a
pure passthrough and interpolation + motion run only on the discarded row
phase — half the stencil/motion work of the masked full-height
formulation.  Alternates the two programs in one process so both sample
the same tunnel windows.

Usage: python -u scripts/bench_deint_quad_ab.py [reps]
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


def build(quad: bool):
    if quad:
        os.environ.pop("TPUVF_NO_QUAD_LINKS", None)
    else:
        os.environ["TPUVF_NO_QUAD_LINKS"] = "1"
    from bench import configs as C

    label, step, state0, params, spec = C.config_deinterlace()
    src_split = getattr(step, "source_split", False)

    def make_planes(batch):
        return random_planes_for_spec(spec, batch, split=src_split)

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
                              batch_small=8, batch_large=32)
            print(f"rep{r} {name}: {res['fps']:.0f} fps", flush=True)


if __name__ == "__main__":
    main()
