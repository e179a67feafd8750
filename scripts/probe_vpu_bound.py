"""Is the quad headline emit VPU-compute-bound? (round 3e)

The headline device trace reads 190 us/frame with two ~82 us emit fusions.
HLO op-count: each emit fusion executes ~344M vector element-ops per frame
(~83 ops/output-pixel over its 4.15M pixels); at the v5e VPU's ~4 T op/s
that alone is ~170 us — the traffic model (~66 MB ≈ 100 us) no longer
binds.  Test: profile three variants whose TRAFFIC is identical but whose
per-pixel op count differs.  If device time scales with the op count (not
flat), the emits are VPU-bound and the headline is closed at the
arithmetic's speed of light.

A = full chain (convertscale -> quant boundary -> videofilter b/c/s)
B = convertscale only (yuv->rgb, no boundary quant, no filter)
C = near-zero math (dequant y, quantize, pack) — traffic floor

Usage: python -u scripts/probe_vpu_bound.py
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
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/tpuvf-tpu-cache")

from tpuvf.core.formats import VideoFormat  # noqa: E402
from tpuvf.core.spec import FrameSpec  # noqa: E402
from tpuvf.kernels import convert  # noqa: E402
from tpuvf.kernels.color import quant  # noqa: E402

W, H = 3840, 2160


def quad_planes(rng):
    u8 = lambda shape: rng.integers(0, 256, shape, dtype=np.uint8)
    return {
        **{f"y_{ph}": u8((H // 2, W // 2)) for ph in convert.QUAD_PHASES},
        "u": u8((H // 2, W // 2)),
        "v": u8((H // 2, W // 2)),
    }


def step_full():
    """The shipped headline chain (quad links)."""
    from __graft_entry__ import _build_chain, _specs

    in_spec, mid_spec, out_spec = _specs(W, H, W, H)
    step, state0, params = _build_chain(
        in_spec, mid_spec, out_spec,
        {"brightness": 0.05, "contrast": 1.1, "saturation": 1.2})
    return (lambda pl: step(pl, state0, params)[0])


def step_cs_only():
    """convertscale NV12->BGRA alone: yuv->rgb + quantize + pack."""
    in_spec = FrameSpec(VideoFormat.NV12, W, H)
    sampler = convert.plan_rgba_sampler_quad(in_spec)

    def run(planes):
        chans = sampler(planes, {})
        return convert.pack_rgba_quad(
            chans, VideoFormat.BGRA, in_spec.matrix_index, "packed32q",
            unit_range=True)

    return run


def step_floor():
    """Traffic floor: same reads/writes, near-zero math (luma copy)."""
    def run(planes):
        out = {}
        for rp in ("e", "o"):
            for cp in ("e", "o"):
                y = planes[f"y_{rp}{cp}"]
                u = planes["u"]
                v = planes["v"]
                w = (y.astype(jnp.uint32)
                     | (u.astype(jnp.uint32) << 8)
                     | (v.astype(jnp.uint32) << 16))
                out[f"w_{rp}{cp}"] = w
        return out

    return run


def profile(name, fn, planes, n=30):
    dev = jax.device_put(planes)
    jf = jax.jit(fn)
    for _ in range(3):
        out = jf(dev)
    _ = np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]))[:1]
    tdir = f"/tmp/tpuvf-vpu-probe-{name}"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        for _ in range(n):
            out = jf(dev)
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
            continue  # outer span double-counts its children
        per_op[nm] = per_op.get(nm, 0.0) + e.get("dur", 0) / 1e3
        total += e.get("dur", 0) / 1e3
    print(f"\n=== {name}: {total / n * 1e3:.1f} us/frame ===")
    for nm, ms in sorted(per_op.items(), key=lambda kv: -kv[1])[:6]:
        print(f"  {ms / n * 1e3:8.1f} us/frame  {nm[:90]}")
    return total / n * 1e3


def main():
    rng = np.random.default_rng(0)
    planes = quad_planes(rng)
    t_full = profile("full", step_full(), planes)
    t_cs = profile("csonly", step_cs_only(), planes)
    t_floor = profile("floor", step_floor(), planes)
    print(f"\nfull {t_full:.1f}  cs-only {t_cs:.1f}  floor {t_floor:.1f}"
          f"  (us/frame device)")
    print("DONE-SENTINEL", flush=True)


if __name__ == "__main__":
    main()
