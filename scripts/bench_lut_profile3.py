"""LUT table dtype x gather-split matrix on the REAL config 3.

Run:  JAX_COMPILATION_CACHE_DIR=/tmp/tpuvf-tpu-cache python -u \
        scripts/bench_lut_profile3.py > /tmp/lut_profile3.out 2>&1
"""
from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")

from bench.configs import config_videofilter
from tpuvf.io import lut as lutio
from tpuvf.kernels import filter as kfilter
from tpuvf.runtime.benchmark import measure_fps, random_planes_for_spec


def report(label, res):
    print(f"{label:>16}: {res['fps']:8.1f} fps  {res['ms_per_frame']:7.3f} ms",
          flush=True)


def main():
    _, step, state0, params, in_spec = config_videofilter()
    table = lutio.load("/tmp/tpuvf-bench-lut.cube")
    packs = {
        "f32": kfilter.pack_lut_corners(table, np.float32),
        "bf16": kfilter.pack_lut_corners(table, np.float32),  # cast below
        "u16": kfilter.pack_lut_corners(table, np.uint16),
    }
    import jax.numpy as jnp
    packs["bf16"] = jnp.asarray(packs["bf16"]).astype(jnp.bfloat16)

    for splits in (1, 2):
        kfilter._GATHER_SPLITS = splits
        for name in ("f32", "bf16", "u16"):
            p2 = dict(params)
            p2["lut"] = packs[name]
            res = measure_fps(
                step, lambda b: random_planes_for_spec(in_spec, b),
                state0, p2)
            report(f"{name}_s{splits}", res)

    print("DONE-SENTINEL", flush=True)


if __name__ == "__main__":
    main()
