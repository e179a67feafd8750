"""Within-process A/B of the 8K->4K chain: scaled split links vs canonical.

Alternating reps cancel the tunnel's window bimodality (identical programs
swing up to 3x between reps in BOTH directions — BENCH.md).

Run: JAX_COMPILATION_CACHE_DIR=/tmp/tpuvf-tpu-cache python -u \
       scripts/bench_scale8k_ab.py > /tmp/scale8k_ab.out 2>&1
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

from tpuvf.runtime.benchmark import measure_fps, random_planes_for_spec


def build(split: bool):
    from __graft_entry__ import _build_chain, _specs

    if not split:
        os.environ["TPUVF_NO_SPLIT_SCALED"] = "1"
    else:
        os.environ.pop("TPUVF_NO_SPLIT_SCALED", None)
    in_spec, mid_spec, out_spec = _specs(7680, 4320, 3840, 2160)
    step, state0, params = _build_chain(
        in_spec, mid_spec, out_spec,
        {"brightness": 0.05, "contrast": 1.1, "saturation": 1.2})
    os.environ.pop("TPUVF_NO_SPLIT_SCALED", None)
    return step, state0, params, in_spec


def main():
    import collections
    variants = {"split": build(True), "canonical": build(False)}
    best = collections.defaultdict(float)
    for rep in range(4):
        for tag, (step, st, p, spec) in variants.items():
            res = measure_fps(
                step,
                lambda b: random_planes_for_spec(
                    spec, b, split=getattr(step, "source_split", False)),
                st, p, batch_small=2, batch_large=8)
            best[tag] = max(best[tag], res["fps"])
            print(f"rep{rep} {tag:>9}: {res['fps']:8.1f} fps", flush=True)
    print("BEST:", dict(best), flush=True)
    print("DONE-SENTINEL", flush=True)


if __name__ == "__main__":
    main()
