"""Within-process A/B of the 4K headline chain variants, alternating reps:

  plain   -- stack+reshape chroma rows, u8 reshape y deint (pre-round-2.5)
  banded  -- Pallas banded chroma row upsample
  b+u16   -- banded + u16-view y deinterleave
  p+u16   -- plain chroma + u16-view y deinterleave

Run:  JAX_COMPILATION_CACHE_DIR=/tmp/tpuvf-tpu-cache python -u \
        scripts/bench_chain_ab.py > /tmp/chain_ab.out 2>&1
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

from tpuvf.kernels import convert
from tpuvf.runtime.benchmark import measure_fps, random_planes_for_spec


def build(banded: bool, u16: bool):
    from __graft_entry__ import _build_chain, _specs

    if not banded:
        os.environ["TPUVF_NO_PALLAS"] = "1"
    else:
        os.environ.pop("TPUVF_NO_PALLAS", None)
    convert._DEINT_U16 = u16
    in_spec, mid_spec, out_spec = _specs(3840, 2160, 3840, 2160)
    step, state0, params = _build_chain(
        in_spec, mid_spec, out_spec,
        {"brightness": 0.05, "contrast": 1.1, "saturation": 1.2})
    os.environ.pop("TPUVF_NO_PALLAS", None)
    convert._DEINT_U16 = False
    return step, state0, params, in_spec


def main():
    import collections
    variants = {
        "plain": build(False, False),
        "banded": build(True, False),
        "b+u16": build(True, True),
        "p+u16": build(False, True),
    }
    best = collections.defaultdict(float)
    for rep in range(5):
        for tag, (step, st, p, spec) in variants.items():
            res = measure_fps(
                step, lambda b: random_planes_for_spec(spec, b), st, p)
            best[tag] = max(best[tag], res["fps"])
            print(f"rep{rep} {tag:>7}: {res['fps']:8.1f} fps "
                  f"{res['ms_per_frame']:7.3f} ms", flush=True)
    print("BEST:", dict(best), flush=True)
    print("DONE-SENTINEL", flush=True)


if __name__ == "__main__":
    main()
