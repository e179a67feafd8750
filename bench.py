"""Headline benchmark: 4K convertscale+filter chain throughput per chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N}

vs_baseline = measured fps / 240 — the BASELINE.json north star (>= 4x
realtime 4K60) for the NV12 4K -> convertscale -> videofilter chain on one
TPU chip.  The chain runs HBM-resident: frames iterated with lax.scan inside
one jitted call (state carry preserved, dispatch amortized), sampling
matrices fed as runtime buffers.  Completion is forced with a device_get
(the remote backend's block_until_ready is a no-op) and throughput comes
from the slope between two batch sizes, cancelling fixed per-call overhead.

See bench/run_all.py for the full five-config BASELINE suite.
"""

from __future__ import annotations

import json



def _enable_compile_cache():
    """First compiles through the remote tunnel cost minutes; persist them."""
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", "/tmp/tpuvf-tpu-cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass


def main():
    _enable_compile_cache()
    from __graft_entry__ import _build_chain, _specs
    from tpuvf.runtime.benchmark import measure_fps, random_planes_for_spec

    in_spec, mid_spec, out_spec = _specs(3840, 2160, 3840, 2160)
    step, state0, params = _build_chain(
        in_spec, mid_spec, out_spec,
        {"brightness": 0.05, "contrast": 1.1, "saturation": 1.2},
    )

    def make_planes(batch):
        return random_planes_for_spec(
            in_spec, batch, split=getattr(step, "source_split", False))

    # the axon tunnel's throughput is bimodal (fast windows vs congested
    # shared windows, round-2 analysis): the HEADLINE is the any-window
    # MEDIAN of five spaced measurements — reproducible across driver runs
    # — with min and the fast-window max reported alongside as the noise
    # floor / capability figure
    import statistics
    import time

    samples = []
    for i in range(5):
        if i:
            time.sleep(2.0)  # spaced: don't sample one tunnel window 5x
        samples.append(
            measure_fps(step, make_planes, state0, params,
                        batch_small=4, batch_large=16)["fps"])
    fps = statistics.median(samples)
    # window-independent floor (round 5, VERDICT r4 item 3): per-frame
    # device time from a jax.profiler trace — tunnel congestion moves the
    # wall-clock median up to 20x between driver runs but not this figure.
    # Sequential-dispatch floor; scan-batched wall readings can exceed it
    # by overlapping weight fetches (round-3b trace-vs-scan caveat).
    from tpuvf.runtime.benchmark import measure_device_us

    extra = {}
    try:
        dev = measure_device_us(step, make_planes, state0, params)
        if dev is not None:
            extra = {
                "device_us_per_frame": round(dev["us_per_frame"], 2),
                "fps_device_floor": round(dev["fps_device"], 2),
            }
    except Exception:
        pass
    print(json.dumps({
        "metric": "4K NV12 convertscale+videofilter chain fps/chip (HBM-resident)",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / 240.0, 3),
        "min": round(min(samples), 2),
        "fast_window": round(max(samples), 2),
        "samples": [round(s, 1) for s in samples],
        **extra,
    }))


if __name__ == "__main__":
    main()
