"""Device-trace a bench config in its SCAN-BATCHED form (the program
measure_fps actually times): python scripts/profile_config_scan.py <name> [batch].

profile_config.py dispatches frames one by one, which serializes DMA with
compute; the scan program pipelines them, so per-frame op costs differ.
This traces `make_batch_fn(step)` over a batch and divides by
(reps * batch) for honest per-frame figures.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/tpuvf-tpu-cache")

from bench import configs as C  # noqa: E402
from tpuvf.runtime.benchmark import make_batch_fn  # noqa: E402

REPS = 6
TRACE_DIR = "/tmp/tpuvf-cfg-scan-trace"


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "headline"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    label, step, state0, params, spec_or_mk = C.ALL[name]()
    if callable(spec_or_mk):
        planes = spec_or_mk(batch)
    else:
        from tpuvf.runtime.benchmark import random_planes_for_spec

        planes = random_planes_for_spec(
            spec_or_mk, batch, split=getattr(step, "source_split", False))
    print(f"profiling (scan x{batch}) {label}")
    fn = make_batch_fn(step)
    dev_planes = jax.device_put(planes)
    dev_params = jax.device_put(params)
    dev_state = jax.device_put(state0)
    for _ in range(3):
        out, _st = fn(dev_planes, dev_state, dev_params)
    _ = np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]))[:1]

    os.system(f"rm -rf {TRACE_DIR}")
    with jax.profiler.trace(TRACE_DIR):
        for _ in range(REPS):
            out, _st = fn(dev_planes, dev_state, dev_params)
        _ = np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]))[:1]

    files = glob.glob(f"{TRACE_DIR}/**/*.trace.json.gz", recursive=True)
    if not files:
        print("NO TRACE FILES")
        return
    with gzip.open(files[0], "rt") as fh:
        trace = json.load(fh)
    events = trace["traceEvents"]
    tpu_pids = {
        e["pid"] for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "TPU" in str(e.get("args", {}).get("name", ""))
    }
    n_frames = REPS * batch
    per_op, total = {}, 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in tpu_pids:
            continue
        nm = e.get("name", "?")
        dur = e.get("dur", 0) / 1e3
        if nm.startswith("jit_"):
            continue  # the executable-level parent span double-counts
        per_op[nm] = per_op.get(nm, 0.0) + dur
        total += dur
    print(f"total device op time {total:.3f} ms / {n_frames} frames "
          f"= {total / n_frames * 1e3:.1f} us/frame\n")
    for nm, ms in sorted(per_op.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{ms / n_frames * 1e3:9.1f} us/frame  {nm[:110]}")
    print("DONE-SENTINEL", flush=True)


if __name__ == "__main__":
    main()
