"""Headline benchmark: 4K convertscale+filter chain throughput per chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N}

vs_baseline = measured fps / 240 — the BASELINE.json north star (>= 4x
realtime 4K60) for the NV12 4K -> convertscale -> videofilter chain on one
TPU chip.  The chain runs HBM-resident: the frame batch is pre-staged on
device and iterated with lax.scan inside ONE jitted call, so per-frame
semantics (state carry) are preserved while host dispatch is amortized.

Timing notes for this environment: the axon remote backend's
block_until_ready is a no-op and every call pays a fixed ~40ms tunnel
round-trip, so (a) completion is forced by a 1-element device_get and
(b) throughput is derived from the *slope* between a small-batch and a
large-batch run, cancelling the fixed per-call overhead.
"""

from __future__ import annotations

import json
import time

import numpy as np


def _sync(out):
    """Force execution on backends where block_until_ready is unreliable."""
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    idx = (0,) * (leaf.ndim - 1) + (slice(0, 1),)
    return np.asarray(jax.device_get(leaf[idx]))


def _make_batch_fn(step):
    import jax

    def batch_step(planes, state):
        def body(st, frame):
            out, st2 = step(frame, st)
            return st2, out

        st, outs = jax.lax.scan(body, state, planes)
        return outs, st

    return jax.jit(batch_step)


def _time_batch(fn, planes, state, reps=4):
    best = float("inf")
    out = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out, _st = fn(planes, state)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return best


def bench_convertscale_filter(
    w_in=3840, h_in=2160, w_out=3840, h_out=2160,
    batch_small=4, batch_large=16, reps=4,
):
    import jax.numpy as jnp

    from __graft_entry__ import _build_chain, _specs

    in_spec, mid_spec, out_spec = _specs(w_in, h_in, w_out, h_out)
    step, state0 = _build_chain(
        in_spec, mid_spec, out_spec,
        {"brightness": 0.05, "contrast": 1.1, "saturation": 1.2},
    )
    fn = _make_batch_fn(step)

    rng = np.random.default_rng(0)
    cw, ch = (w_in + 1) // 2, (h_in + 1) // 2

    def make_planes(b):
        return {
            "y": jnp.asarray(rng.integers(0, 256, (b, h_in, w_in), dtype=np.uint8)),
            "u": jnp.asarray(rng.integers(0, 256, (b, ch, cw), dtype=np.uint8)),
            "v": jnp.asarray(rng.integers(0, 256, (b, ch, cw), dtype=np.uint8)),
        }

    import jax

    state = jax.device_put(state0)
    planes_s = make_planes(batch_small)
    planes_l = make_planes(batch_large)

    # warmup/compile both shapes
    _sync(fn(planes_s, state)[0])
    _sync(fn(planes_l, state)[0])

    t_small = _time_batch(fn, planes_s, state, reps)
    t_large = _time_batch(fn, planes_l, state, reps)
    per_frame = (t_large - t_small) / (batch_large - batch_small)
    if per_frame <= 0:
        # overhead-dominated; fall back to the large-batch average
        per_frame = t_large / batch_large
    return 1.0 / per_frame, t_small, t_large


def main():
    fps, t_s, t_l = bench_convertscale_filter()
    result = {
        "metric": "4K NV12 convertscale+videofilter chain fps/chip (HBM-resident)",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / 240.0, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
