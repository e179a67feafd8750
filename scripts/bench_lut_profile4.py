"""LUT gather layout variants on the REAL config 3, all bf16 splits=1.

  shaped  -- (hq, W)-shaped transposed gather (current default)
  flat    -- 1-D flattened indices, transposed (24, n) output
  pad32   -- corner rows padded 24 -> 32 bf16 (64-byte aligned rows)
  flatpad -- both

Run:  JAX_COMPILATION_CACHE_DIR=/tmp/tpuvf-tpu-cache python -u \
        scripts/bench_lut_profile4.py > /tmp/lut_profile4.out 2>&1
"""
from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")

import jax.numpy as jnp

from bench.configs import config_videofilter
from tpuvf.kernels import filter as kfilter
from tpuvf.runtime.benchmark import measure_fps, random_planes_for_spec


def report(label, res):
    print(f"{label:>10}: {res['fps']:8.1f} fps  {res['ms_per_frame']:7.3f} ms",
          flush=True)


def main():
    _, step, state0, params, in_spec = config_videofilter()
    lut = np.asarray(params["lut"]).astype(np.float32)  # bf16 -> f32 host
    pad32 = np.zeros((lut.shape[0], 32), np.float32)
    pad32[:, :24] = lut
    tabs = {
        "": jnp.asarray(lut).astype(jnp.bfloat16),
        "pad": jnp.asarray(pad32).astype(jnp.bfloat16),
    }

    for flat in (False, True):
        kfilter._GATHER_FLAT = flat
        for pname, tab in tabs.items():
            p2 = dict(params)
            p2["lut"] = tab
            res = measure_fps(
                step, lambda b: random_planes_for_spec(in_spec, b),
                state0, p2)
            report(("flat" if flat else "shaped") + pname, res)

    print("DONE-SENTINEL", flush=True)


if __name__ == "__main__":
    main()
