"""TPU-backend parity spot-check for the 2x-upsample split path: the
split-stencil chain vs the canonical chain ON THE REAL CHIP (the pytest
bitwise assertions run on CPU; cross-program-shape FMA fusion can differ
on TPU — this measures whether it does here).

Run: python -u scripts/tpu_upscale_parity.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/tpuvf-tpu-cache")

from scripts.bench_upscale_ab import build  # noqa: E402
from tpuvf.runtime.benchmark import random_planes_for_spec  # noqa: E402


def main():
    outs = {}
    for variant in ("stencil", "canonical", "presplit"):
        step, state0, params, in_spec = build(variant)
        planes = random_planes_for_spec(
            in_spec, 1, np.random.default_rng(3),
            split=getattr(step, "source_split", False))
        planes = jax.tree_util.tree_map(lambda v: v[0], planes)
        fn = jax.jit(lambda pl_, st, prm: step(pl_, st, prm))
        out, _ = fn(jax.device_put(planes), jax.device_put(state0),
                    jax.device_put(params))
        outs[variant] = {k: np.asarray(jax.device_get(v)).view(np.uint8)
                         for k, v in out.items()}
    base = outs["canonical"]
    for variant in ("stencil", "presplit"):
        for k, v in outs[variant].items():
            d = np.abs(v.astype(np.int16) - base[k].astype(np.int16))
            n = int((d > 0).sum())
            print(f"{variant:>9} vs canonical plane {k}: max diff "
                  f"{int(d.max())}, flipped {n}/{d.size} "
                  f"({100.0 * n / d.size:.4f}%)", flush=True)
    print("DONE-SENTINEL", flush=True)


if __name__ == "__main__":
    main()
