"""Device-trace any bench config: python scripts/profile_config.py <name>."""

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

N_FRAMES = 30
TRACE_DIR = "/tmp/tpuvf-cfg-trace"


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "compositor"
    label, step, state0, params, spec_or_mk = C.ALL[name]()
    if callable(spec_or_mk):
        planes = spec_or_mk(1)
    else:
        from tpuvf.runtime.benchmark import random_planes_for_spec

        planes = random_planes_for_spec(
            spec_or_mk, 1, split=getattr(step, "source_split", False))
    planes = jax.tree_util.tree_map(lambda v: v[0], planes)
    print(f"profiling {label}")
    dev_planes = jax.device_put(planes)
    dev_params = jax.device_put(params)
    fn = jax.jit(lambda pl_, st, prm: step(pl_, st, prm))
    dev_state = jax.device_put(state0)
    for _ in range(4):
        out, _st = fn(dev_planes, dev_state, dev_params)
    _ = np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]))[:1]

    os.system(f"rm -rf {TRACE_DIR}")
    with jax.profiler.trace(TRACE_DIR):
        for _ in range(N_FRAMES):
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
    per_op, total = {}, 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in tpu_pids:
            continue
        name = e.get("name", "?")
        # skip the enclosing jit_* module spans — they envelope the
        # per-op events and double the total (same fix as
        # runtime/benchmark.measure_device_us)
        if str(name).startswith("jit"):
            continue
        dur = e.get("dur", 0) / 1e3
        per_op[name] = per_op.get(name, 0.0) + dur
        total += dur
    print(f"total device time {total:.3f} ms / {N_FRAMES} frames "
          f"= {total / N_FRAMES:.4f} ms/frame\n")
    for name, ms in sorted(per_op.items(), key=lambda kv: -kv[1])[:35]:
        print(f"{ms / N_FRAMES * 1e3:9.1f} us/frame  {name[:110]}")
    print("DONE-SENTINEL", flush=True)


if __name__ == "__main__":
    main()
