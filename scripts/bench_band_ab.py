"""Row-band pipelining probe for the 4K quad headline (round 4).

probe_vpu_bound.py (round 3e) showed the headline's device time is
ADDITIVE: ~74 us HBM traffic + ~110 us VPU math = 184 us/frame, where
ideal DMA/compute overlap would give max(traffic, math) ~= 115 us.
Hypothesis to test: splitting the frame into R row bands inside the
step gives XLA R smaller fusions whose stores/loads could overlap
neighbouring bands' compute (or at least change the fusion's VMEM
working set enough to re-enable double buffering).

Variants (identical math, identical traffic):
  full    — the shipped quad chain, one pass over (1080, 1920) phases
  band2/4/8 — the same step applied per row band with a 1-row halo on
            every plane (the chroma row stencils reach +-1 row inside a
            phase plane), outputs row-concatenated

Device time comes from a jax.profiler trace (sum of ph=="X" on the TPU
pid, jit_ outer spans excluded), n=30 frames per variant; the
wall-clock interleaved A/B uses measure_fps as a cross-check.

Usage: python -u scripts/bench_band_ab.py [n_reps]
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

from tpuvf.kernels import convert  # noqa: E402

W, H = 3840, 2160
PH, PW = H // 2, W // 2  # quad phase plane dims


def quad_planes(rng):
    u8 = lambda shape: rng.integers(0, 256, shape, dtype=np.uint8)
    return {
        **{f"y_{ph}": u8((PH, PW)) for ph in convert.QUAD_PHASES},
        "u": u8((PH, PW)),
        "v": u8((PH, PW)),
    }


def build_step():
    from __graft_entry__ import _build_chain, _specs

    in_spec, mid_spec, out_spec = _specs(W, H, W, H)
    step, state0, params = _build_chain(
        in_spec, mid_spec, out_spec,
        {"brightness": 0.05, "contrast": 1.1, "saturation": 1.2})
    assert step.source_split == "quad"
    return lambda pl: step(pl, state0, params)[0]


def banded(step, n_bands):
    """Apply `step` per row band with a 1-row edge halo, concat rows.

    The quad chain is row-local except the chroma row-phase stencils
    (+-1 row inside each (PH, PW) phase plane), so a 1-row halo
    reproduces the full-frame values except at interior band seams
    where the edge-clamp differs — irrelevant for a perf probe, and
    measured below as a max-diff for honesty.
    """
    bh = PH // n_bands
    assert bh * n_bands == PH

    def run(planes):
        outs = []
        for b in range(n_bands):
            r0, r1 = b * bh, (b + 1) * bh
            lo = 1 if b else 0
            hi = 1 if b + 1 < n_bands else 0
            sl = {k: v[r0 - lo:r1 + hi] for k, v in planes.items()}
            w = step(sl)["w_q"]
            outs.append(w[:, lo:w.shape[1] - hi])
        return {"w_q": jnp.concatenate(outs, axis=1)}

    return run


def profile(name, fn, planes, n=30):
    dev = jax.device_put(planes)
    jf = jax.jit(fn)
    for _ in range(3):
        out = jf(dev)
    _ = np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]))[:1]
    tdir = f"/tmp/tpuvf-band-probe-{name}"
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
            continue
        per_op[nm] = per_op.get(nm, 0.0) + e.get("dur", 0) / 1e3
        total += e.get("dur", 0) / 1e3
    print(f"\n=== {name}: {total / n * 1e3:.1f} us/frame ===", flush=True)
    for nm, ms in sorted(per_op.items(), key=lambda kv: -kv[1])[:8]:
        print(f"  {ms / n * 1e3:8.1f} us/frame  {nm[:90]}")
    return total / n * 1e3


def main():
    rng = np.random.default_rng(0)
    planes = quad_planes(rng)
    step = build_step()

    variants = {
        "full": step,
        "band2": banded(step, 2),
        "band4": banded(step, 4),
        "band8": banded(step, 8),
    }

    # value sanity: band seams differ only where the halo edge-clamp
    # lands (chroma stencil rows) — report the diff so the probe is
    # honest about what it measures
    dev = jax.device_put(planes)
    ref = np.asarray(jax.jit(step)(dev)["w_q"])
    got = np.asarray(jax.jit(variants["band4"])(dev)["w_q"])
    frac = (ref != got).mean()
    print(f"band4 value drift vs full: {frac:.2e} of u32 words differ "
          f"(seam edge-clamp only)", flush=True)

    times = {}
    for name, fn in variants.items():
        times[name] = profile(name, fn, planes)

    print("\nSUMMARY us/frame device:",
          {k: round(v, 1) for k, v in times.items()})
    print("DONE-SENTINEL", flush=True)


if __name__ == "__main__":
    main()
