"""Device-trace the 4K headline chain (NV12 -> convertscale -> videofilter).

Round-2 left this at ~0.087-0.1 ms/frame in clean epochs vs a ~0.055 ms
read-NV12+write-u16 HBM roofline; candidate 3 said 'chase only after the
tunnel noise is understood'.  The trace shows what the residual ~0.04 ms
actually is.
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

from __graft_entry__ import _build_chain, _specs  # noqa: E402
from tpuvf.runtime.benchmark import random_planes_for_spec  # noqa: E402

N_FRAMES = 50
TRACE_DIR = "/tmp/tpuvf-chain4k-trace"


def main():
    in_spec, mid_spec, out_spec = _specs(3840, 2160, 3840, 2160)
    step, state0, params = _build_chain(
        in_spec, mid_spec, out_spec,
        {"brightness": 0.05, "contrast": 1.1, "saturation": 1.2})
    BATCH = 16
    planes = random_planes_for_spec(
        in_spec, BATCH, split=getattr(step, "source_split", False))
    dev = jax.device_put(planes)
    dev_params = jax.device_put(params)
    dev_state = jax.device_put(state0)

    # the REAL throughput form: lax.scan over the batch inside one
    # dispatch (tpuvf.runtime.benchmark.measure_fps / run_batched)
    def batched(pl_, st, prm):
        def body(carry, frame):
            out, st2 = step(frame, carry, prm)
            return st2, out

        st2, outs = jax.lax.scan(body, st, pl_)
        return outs, st2

    fn = jax.jit(batched)
    for _ in range(3):
        out, _st = fn(dev, dev_state, dev_params)
    _ = np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]))[:1]

    os.system(f"rm -rf {TRACE_DIR}")
    global N_FRAMES
    N_FRAMES = BATCH * 6
    with jax.profiler.trace(TRACE_DIR):
        for _ in range(6):
            out, _st = fn(dev, dev_state, dev_params)
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
        dur = e.get("dur", 0) / 1e3
        per_op[name] = per_op.get(name, 0.0) + dur
        total += dur
    print(f"total device time {total:.3f} ms / {N_FRAMES} frames "
          f"= {total / N_FRAMES:.4f} ms/frame\n")
    for name, ms in sorted(per_op.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{ms / N_FRAMES * 1e3:9.1f} us/frame  {name[:110]}")
    print("DONE-SENTINEL", flush=True)


if __name__ == "__main__":
    main()
