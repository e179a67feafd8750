"""Benchmark harness: batched pipeline steps + overhead-cancelling timing.

Environment notes (measured): the axon remote TPU backend has a fixed
~40 ms per-call tunnel round-trip and its block_until_ready is a no-op, so

- completion is forced with a 1-element device_get (`sync`),
- work is batched inside ONE jitted call via lax.scan (per-frame state
  semantics preserved, dispatch amortized),
- throughput is the *slope* between a small-batch and a large-batch timing,
  which cancels the fixed per-call overhead.
"""

from __future__ import annotations

import time
from typing import Callable, Dict

import numpy as np


def sync(out):
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    idx = (0,) * (leaf.ndim - 1) + (slice(0, 1),)
    return np.asarray(jax.device_get(leaf[idx]))


def make_batch_fn(step: Callable):
    """step(frame_planes, state, params) -> (out_planes, state), scanned over
    a leading batch axis in one XLA program; params (incl. weight buffers)
    are loop-invariant arguments, never HLO constants."""
    import jax

    def batch_step(planes, state, params):
        def body(st, frame):
            out, st2 = step(frame, st, params)
            return st2, out

        st, outs = jax.lax.scan(body, state, planes)
        return outs, st

    return jax.jit(batch_step)


def time_best(fn, *args, reps=4) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out, _ = fn(*args)
        sync(out)
        best = min(best, time.perf_counter() - t0)
    return best


def measure_fps(
    step: Callable,
    make_planes: Callable[[int], Dict],
    state0,
    params=None,
    batch_small: int = 4,
    batch_large: int = 16,
    reps: int = 4,
) -> dict:
    """Two-point throughput measurement of a per-frame step function."""
    import jax

    fn = make_batch_fn(step)
    state = jax.device_put(state0)
    params = jax.device_put(params if params is not None else {})
    planes_s = make_planes(batch_small)
    planes_l = make_planes(batch_large)
    sync(fn(planes_s, state, params)[0])  # compile
    sync(fn(planes_l, state, params)[0])
    t_small = time_best(fn, planes_s, state, params, reps=reps)
    t_large = time_best(fn, planes_l, state, params, reps=reps)
    per_frame = (t_large - t_small) / (batch_large - batch_small)
    if per_frame <= 0:
        per_frame = t_large / batch_large
    return {
        "fps": 1.0 / per_frame,
        "ms_per_frame": per_frame * 1000.0,
        "t_small": t_small,
        "t_large": t_large,
        "batches": (batch_small, batch_large),
    }


def random_planes_for_spec(spec, batch, rng=None, split=False):
    """Random device-resident canonical planes with a leading batch axis.

    split=True produces the column-phase SPLIT upload layout
    (core.frame.split_planes_host); split="quad" the QUAD row x col phase
    layout (core.frame.quad_planes_host): what the pipeline feeds a chain
    whose first element consumes provisioned sources."""
    import jax.numpy as jnp

    rng = rng or np.random.default_rng(0)
    out = {}
    for p in spec.planes:
        shape = (batch,) + ((p.channels,) if p.channels > 1 else ()) + (
            p.height, p.width)
        out[p.name] = rng.integers(0, 256, shape, dtype=np.uint8)
    if split == "quad":
        from tpuvf.core.formats import RGB_FORMATS

        def quad(x):
            return {ph: np.ascontiguousarray(x[..., rp::2, cp::2])
                    for ph, (rp, cp) in zip(("ee", "eo", "oe", "oo"),
                                            ((0, 0), (0, 1), (1, 0), (1, 1)))}

        if spec.format in RGB_FORMATS:
            rgba = out.pop("rgba")
            for c, n in enumerate(("r", "g", "b", "a")):
                for ph, v in quad(rgba[:, c]).items():
                    out[f"{n}_{ph}"] = v
        else:
            for ph, v in quad(out.pop("y")).items():
                out[f"y_{ph}"] = v
    elif split:
        from tpuvf.core.formats import RGB_FORMATS

        if spec.format in RGB_FORMATS:
            rgba = out.pop("rgba")
            for c, n in enumerate(("r", "g", "b", "a")):
                out[f"{n}_e"] = np.ascontiguousarray(rgba[:, c, :, 0::2])
                out[f"{n}_o"] = np.ascontiguousarray(rgba[:, c, :, 1::2])
        else:
            y = out.pop("y")
            out["y_e"] = np.ascontiguousarray(y[..., 0::2])
            out["y_o"] = np.ascontiguousarray(y[..., 1::2])
            if split == "pair":
                # compositor-pad provisioning: + full-height PAIR chroma
                from tpuvf.core.frame import chroma_pair_rows

                for n in ("u", "v"):
                    out[f"{n}_m"], out[f"{n}_a"] = chroma_pair_rows(out[n])
    return {k: jnp.asarray(v) for k, v in out.items()}


def measure_device_us(step, make_planes, state0, params=None,
                      n_frames: int = 30, trace_dir: str | None = None):
    """Per-frame DEVICE time (us) from a jax.profiler trace — the
    publishable number for sub-tunnel-resolution configs (BASELINE
    config 2 'transform' frames run ~6-40 us; wall-clock slope readings
    through the ~35 ms tunnel spread 27k-155k fps, which is noise, not
    measurement).  Device traces work through the axon tunnel (round-2
    finding) and repeat within a few percent.

    Returns {"us_per_frame", "fps_device"} or None when the platform
    exposes no device pid (CPU runs)."""
    import glob
    import gzip
    import json as _json
    import os
    import shutil
    import tempfile

    import jax

    fn = jax.jit(lambda pl_, st, prm: step(pl_, st, prm))
    planes = jax.tree_util.tree_map(lambda v: v[0], make_planes(1))
    state = jax.device_put(state0)
    params = jax.device_put(params if params is not None else {})
    for _ in range(4):
        out, _st = fn(planes, state, params)
    sync(out)
    tdir = trace_dir or tempfile.mkdtemp(prefix="tpuvf-devtrace-")
    shutil.rmtree(tdir, ignore_errors=True)
    with jax.profiler.trace(tdir):
        for _ in range(n_frames):
            out, _st = fn(planes, state, params)
        sync(out)
    files = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
    if not files:
        return None
    with gzip.open(files[0], "rt") as fh:
        events = _json.load(fh)["traceEvents"]
    tpu_pids = {
        e["pid"] for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "TPU" in str(e.get("args", {}).get("name", ""))
    }
    if not tpu_pids:
        return None
    # skip the enclosing jit_* module spans — they envelope the per-op
    # events and would double-count the total
    total_us = sum(e.get("dur", 0) for e in events
                   if e.get("ph") == "X" and e.get("pid") in tpu_pids
                   and not str(e.get("name", "")).startswith("jit"))
    if total_us <= 0:
        return None
    us = total_us / n_frames
    return {"us_per_frame": us, "fps_device": 1e6 / us}
