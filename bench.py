"""Headline benchmark: 4K60 convertscale+filter chain throughput per chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N}

vs_baseline is measured fps / 240 — the BASELINE.json north star of >= 4x
realtime 4K60 (240 fps-equivalent) for the NV12 4K -> convertscale ->
videofilter chain on one TPU chip.  The chain runs HBM-resident (inputs
pre-staged on device, state donated, one jitted program per frame batch) —
host transfer is excluded per the north-star definition; see bench/ for the
full config suite including transfer-inclusive numbers.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def bench_convertscale_filter(
    w_in=3840, h_in=2160, w_out=3840, h_out=2160, batch=8, iters=12, warmup=3
):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_chain, _specs

    in_spec, mid_spec, out_spec = _specs(w_in, h_in, w_out, h_out)
    step, state0 = _build_chain(
        in_spec, mid_spec, out_spec,
        {"brightness": 0.05, "contrast": 1.1, "saturation": 1.2},
    )

    def batch_step(planes, state):
        # lax.scan over the frame batch: keeps per-frame semantics (state
        # carry) while amortizing dispatch; frames stay in HBM throughout.
        def body(st, frame):
            out, st2 = step(frame, st)
            return st2, out

        st, outs = jax.lax.scan(body, state, planes)
        return outs, st

    fn = jax.jit(batch_step, donate_argnums=(1,))

    rng = np.random.default_rng(0)
    cw, ch = (w_in + 1) // 2, (h_in + 1) // 2
    planes = {
        "y": jnp.asarray(rng.integers(0, 256, (batch, h_in, w_in), dtype=np.uint8)),
        "u": jnp.asarray(rng.integers(0, 256, (batch, ch, cw), dtype=np.uint8)),
        "v": jnp.asarray(rng.integers(0, 256, (batch, ch, cw), dtype=np.uint8)),
    }
    state = jax.device_put(state0)

    for _ in range(warmup):
        out, state = fn(planes, state)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(iters):
        out, state = fn(planes, state)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    frames = batch * iters
    return frames / dt


def main():
    fps = bench_convertscale_filter()
    result = {
        "metric": "4K NV12 convertscale+videofilter chain fps/chip (HBM-resident)",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / 240.0, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
