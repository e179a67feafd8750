"""A/B the headline chain's edge emit: packed16 (per-channel u16 planes)
vs packed32 (u32 pixel words per phase), optionally crossed with the
chroma-rows formulation (TPUVF_CHROMA_ROWS).

Usage: python -u scripts/bench_emit_ab.py [trace|ab]
  trace — device-trace each variant's scan-batched program (op breakdown)
  ab    — interleaved slope measurements A/B/A/B

Round-3d motivation (HLO dump of the headline, scripts/dump_hlo.py): the
per-channel packed16 emit splits into or_bitcast_fusion.5/.6 with SIX
f32[2160,1920] intermediates materialized between them (191 us of the
364 us frame), plus a separate 64 us scan-output DUS.
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

from tpuvf.runtime.benchmark import (  # noqa: E402
    make_batch_fn, measure_fps, random_planes_for_spec)

W, H = 3840, 2160
BATCH = 8


def build(edge_mode: str, chroma_rows: str = "pallas"):
    os.environ["TPUVF_CHROMA_ROWS"] = chroma_rows
    from __graft_entry__ import _specs
    from tpuvf.core.registry import make

    in_spec, mid_spec, out_spec = _specs(W, H, W, H)
    cs = make("vfconvertscale")
    vf = make("vfvideofilter")
    for k, v in {"brightness": 0.05, "contrast": 1.1,
                 "saturation": 1.2}.items():
        vf.set_property(k, v)
    cs_proc = cs.make_process_linked(
        in_spec, mid_spec, cs.static_config(in_spec, mid_spec),
        in_split=True, out_mode="split")
    vf_proc = vf.make_process_linked(
        mid_spec, out_spec, vf.static_config(mid_spec, out_spec),
        in_split=True, out_mode=edge_mode)
    params = {"cs": cs.traced_params(), "vf": vf.traced_params()}

    def step(planes, state, params):
        mid, _ = cs_proc(planes, (), params["cs"])
        out, new_state = vf_proc(mid, state, params["vf"])
        return out, new_state

    step.source_split = True
    return step, vf.init_state(mid_spec, out_spec), params, in_spec


def trace_variant(name, step, state0, params, in_spec, reps=6):
    fn = make_batch_fn(step)
    planes = jax.device_put(
        random_planes_for_spec(in_spec, BATCH, split=True))
    dev_params = jax.device_put(params)
    dev_state = jax.device_put(state0)
    for _ in range(3):
        out, _ = fn(planes, dev_state, dev_params)
    _ = np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]))[:1]
    tdir = f"/tmp/tpuvf-emit-trace-{name}"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        for _ in range(reps):
            out, _ = fn(planes, dev_state, dev_params)
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
    n = reps * BATCH
    per_op, total = {}, 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in tpu_pids:
            continue
        nm = e.get("name", "?")
        if nm.startswith("jit_") or nm.startswith("while"):
            continue
        dur = e.get("dur", 0) / 1e3
        per_op[nm] = per_op.get(nm, 0.0) + dur
        total += dur
    print(f"\n== {name}: {total / n * 1e3:.1f} us/frame device")
    for nm, ms in sorted(per_op.items(), key=lambda kv: -kv[1])[:12]:
        print(f"  {ms / n * 1e3:8.1f} us/frame  {nm[:90]}")
    sys.stdout.flush()


VARIANTS = [
    ("p16-pallas", "packed16", "pallas"),
    ("p32-pallas", "packed32", "pallas"),
    ("p32-pair", "packed32", "pair"),
    ("p32-xla", "packed32", "xla"),
]


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "trace"
    if mode == "trace":
        for name, emit, crows in VARIANTS:
            step, st0, params, in_spec = build(emit, crows)
            trace_variant(name, step, st0, params, in_spec)
    else:
        built = {}
        for name, emit, crows in VARIANTS:
            built[name] = build(emit, crows)
        for rep in range(3):
            for name in built:
                step, st0, params, in_spec = built[name]
                r = measure_fps(
                    step,
                    lambda b, s=in_spec, st=step: random_planes_for_spec(
                        s, b, split=True),
                    st0, params)
                print(f"rep{rep} {name}: {r['fps']:.0f} fps "
                      f"({r['ms_per_frame']:.3f} ms/frame)")
                sys.stdout.flush()
    print("DONE-SENTINEL", flush=True)


if __name__ == "__main__":
    main()
