"""Per-op device trace of the SCAN-batched headline program (round 4).

The sequential-dispatch trace (bench_band_ab.py) shows the quad headline
as: 2x ~82 us VPU-bound emit fusions + ~51 us pad_add_fusion (the w_q
stack materialization) = 237.6 us/frame.  This probes whether the
pad_add copy survives in the program bench.py actually measures (the
lax.scan batch over 16 frames), and what each frame's op budget is
there.

Usage: python -u scripts/probe_scan_trace.py
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/tpuvf-tpu-cache")

W, H = 3840, 2160
BATCH = 16
N_CALLS = 10


def main():
    from __graft_entry__ import _build_chain, _specs
    from tpuvf.runtime.benchmark import (make_batch_fn,
                                         random_planes_for_spec)

    in_spec, mid_spec, out_spec = _specs(W, H, W, H)
    step, state0, params = _build_chain(
        in_spec, mid_spec, out_spec,
        {"brightness": 0.05, "contrast": 1.1, "saturation": 1.2})
    fn = make_batch_fn(step)
    state = jax.device_put(state0)
    dev_params = jax.device_put(params)
    planes = random_planes_for_spec(in_spec, BATCH, split=step.source_split)

    out = fn(planes, state, dev_params)[0]
    _ = np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]))[:1]

    tdir = "/tmp/tpuvf-scan-trace"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        for _ in range(N_CALLS):
            out = fn(planes, state, dev_params)[0]
        _ = np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]))[:1]

    files = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
    with gzip.open(files[0], "rt") as fh:
        trace = json.load(fh)
    events = trace["traceEvents"]
    tpu_pids = {
        e["pid"] for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "TPU" in str(e.get("args", {}).get("name", ""))
    }
    per_op, total = {}, 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in tpu_pids:
            continue
        nm = e.get("name", "?")
        if nm.startswith("jit_"):
            continue
        per_op[nm] = per_op.get(nm, 0.0) + e.get("dur", 0) / 1e3
        total += e.get("dur", 0) / 1e3
    frames = N_CALLS * BATCH
    print(f"\n=== scan batch={BATCH}: {total / frames * 1e3:.1f} us/frame "
          f"device ===")
    for nm, ms in sorted(per_op.items(), key=lambda kv: -kv[1])[:14]:
        print(f"  {ms / frames * 1e3:8.1f} us/frame  {nm[:100]}")
    print("DONE-SENTINEL", flush=True)


if __name__ == "__main__":
    main()
