"""Within-process A/B: the brightness/contrast/saturation AFFINE FOLD
(round 4) vs the sequential stage chain, on the 4K headline chain
(NV12 4K -> convertscale -> videofilter -> BGRA 4K, quad links).

The fold composes the three clamp-free stages into
  out = (c*s)*x + ((1-s)*c)*(L.x) + k0
— per-frame scalar coefficients, ~13 ops/pixel vs ~26.  BENCH.md
round-3e names op-count reduction via affine folding as the remaining
headline lever (the emit fusion is VPU-bound at ~83 ops/pixel).

Alternating reps cancel tunnel window bimodality.

Run: JAX_COMPILATION_CACHE_DIR=/tmp/tpuvf-tpu-cache python -u \
       scripts/bench_bcs_fold_ab.py > /tmp/bcs_ab.out 2>&1
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

from tpuvf.runtime.benchmark import measure_fps, random_planes_for_spec


def build(fold: bool):
    from __graft_entry__ import _build_chain, _specs

    saved = os.environ.get("TPUVF_NO_BCS_FOLD")
    if fold:
        os.environ.pop("TPUVF_NO_BCS_FOLD", None)
    else:
        os.environ["TPUVF_NO_BCS_FOLD"] = "1"
    try:
        in_spec, mid_spec, out_spec = _specs(3840, 2160, 3840, 2160)
        step, state0, params = _build_chain(
            in_spec, mid_spec, out_spec,
            {"brightness": 0.05, "contrast": 1.1, "saturation": 1.2})
    finally:
        if saved is None:
            os.environ.pop("TPUVF_NO_BCS_FOLD", None)
        else:
            os.environ["TPUVF_NO_BCS_FOLD"] = saved
    return step, state0, params, in_spec


def main():
    import collections
    variants = {"fold": build(True), "seq": build(False)}
    best = collections.defaultdict(float)
    for rep in range(5):
        for tag, (step, st, p, spec) in variants.items():
            res = measure_fps(
                step,
                lambda b, spec=spec, step=step: random_planes_for_spec(
                    spec, b, split=getattr(step, "source_split", False)),
                st, p, batch_small=4, batch_large=16)
            best[tag] = max(best[tag], res["fps"])
            print(f"rep{rep} {tag:>5}: {res['fps']:8.1f} fps "
                  f"{res['ms_per_frame']:7.3f} ms", flush=True)
    print("BEST:", dict(best), flush=True)
    print("DONE-SENTINEL", flush=True)


if __name__ == "__main__":
    main()
