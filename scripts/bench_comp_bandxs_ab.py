"""Within-process A/B of the round-4 per-row-band column cuts in the
compositor cells renderer vs the round-3 global cuts (TPUVF_NO_BANDXS),
on BASELINE config 5 under scan batching (the bench form).

Run: JAX_COMPILATION_CACHE_DIR=/tmp/tpuvf-tpu-cache python -u \
       scripts/bench_comp_bandxs_ab.py > /tmp/comp_bandxs_ab.out 2>&1
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

from tpuvf.runtime.benchmark import measure_fps


def build(band: bool):
    from bench import configs as C

    saved = os.environ.get("TPUVF_NO_BANDXS")
    if band:
        os.environ.pop("TPUVF_NO_BANDXS", None)
    else:
        os.environ["TPUVF_NO_BANDXS"] = "1"
    try:
        label, step, state0, params, mk = C.ALL["compositor"]()
    finally:
        if saved is None:
            os.environ.pop("TPUVF_NO_BANDXS", None)
        else:
            os.environ["TPUVF_NO_BANDXS"] = saved
    return step, state0, params, mk


def main():
    import collections

    variants = {"band": build(True), "global": build(False)}
    best = collections.defaultdict(float)
    for rep in range(4):
        for tag, (step, st, p, mk) in variants.items():
            res = measure_fps(step, mk, st, p, batch_small=2, batch_large=8)
            best[tag] = max(best[tag], res["fps"])
            print(f"rep{rep} {tag:>6}: {res['fps']:8.1f} fps", flush=True)
    print("BEST:", dict(best), flush=True)
    print("DONE-SENTINEL", flush=True)


if __name__ == "__main__":
    main()
