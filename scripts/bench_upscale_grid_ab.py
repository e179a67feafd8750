"""Within-process A/B of the 1080p NV12 -> 4K BGRA 2x-upscale chain:
GRID16 (4x4 phase) negotiated links vs the round-3c split-stencil plan.

The grid prototype (scripts/bench_upscale_p44.py) measured 421 -> 233
us/frame sequential-dispatch device time; this drives the PRODUCTIONIZED
element path (convertscale grid head + videofilter grid + packed32g
edge) through measure_fps with alternating reps to cancel the tunnel's
window bimodality, plus a one-off TPU parity count (grid vs stencil
full-res u32 words reassembled on host).

Run: JAX_COMPILATION_CACHE_DIR=/tmp/tpuvf-tpu-cache python -u \
       scripts/bench_upscale_grid_ab.py > /tmp/upscale_grid_ab.out 2>&1
"""
from __future__ import annotations

import sys

sys.path.insert(0, ".")

import numpy as np

from tpuvf.runtime.benchmark import measure_fps, random_planes_for_spec


def build(variant: str):
    """variant: 'grid' (4x4 phase links; packed32g emits ONE stacked
    (16, H/4, W/4) u32 output — 16 separate outputs made the lax.scan
    stacking DUS non-in-place, ~73 us/frame of full-buffer copies EACH)
    | 'stencil' (round-3c split)."""
    from tpuvf.core.registry import make
    from __graft_entry__ import _specs

    in_spec, mid_spec, out_spec = _specs(1920, 1080, 3840, 2160)
    cs = make("vfconvertscale")
    vf = make("vfvideofilter")
    for k, v in {"brightness": 0.05, "contrast": 1.1,
                 "saturation": 1.2}.items():
        vf.set_property(k, v)
    if variant == "grid":
        cs_proc = cs.make_process_linked(
            in_spec, mid_spec, cs.static_config(in_spec, mid_spec),
            in_split="quad", out_mode="grid")
        vf_proc = vf.make_process_linked(
            mid_spec, out_spec, vf.static_config(mid_spec, out_spec),
            in_split="grid", out_mode="packed32g")
        src_split = "quad"
    else:
        cs_proc = cs.make_process_linked(
            in_spec, mid_spec, cs.static_config(in_spec, mid_spec),
            in_split=False, out_mode="split")
        vf_proc = vf.make_process_linked(
            mid_spec, out_spec, vf.static_config(mid_spec, out_spec),
            in_split=True, out_mode="packed32")
        src_split = False
    params = {"cs": cs.traced_params(), "vf": vf.traced_params()}

    def step(planes, state, params):
        mid, _ = cs_proc(planes, (), params["cs"])
        out, new_state = vf_proc(mid, state, params["vf"])
        return out, new_state

    step.source_split = src_split
    return step, vf.init_state(mid_spec, out_spec), params, in_spec


def parity(variants):
    import jax

    rng = np.random.default_rng(7)
    y = rng.integers(0, 256, (1080, 1920), np.uint8)
    u = rng.integers(0, 256, (540, 960), np.uint8)
    v = rng.integers(0, 256, (540, 960), np.uint8)
    full = {}
    for tag, (step, st, p, spec) in variants.items():
        if getattr(step, "source_split", False) == "quad":
            from tpuvf.core.frame import quad_planes_host

            planes = quad_planes_host({"y": y, "u": u, "v": v}, spec)
        else:
            planes = {"y": y, "u": u, "v": v}
        out, _ = jax.jit(step)(jax.device_put(planes), st, p)
        out = {k: np.asarray(jax.device_get(o)) for k, o in out.items()}
        fw = np.zeros((2160, 3840), np.uint32)
        if "w_g" in out:
            for i in range(16):
                fw[i // 4::4, i % 4::4] = out["w_g"][i]
        elif "w_00" in out:
            for qq in range(4):
                for pph in range(4):
                    fw[qq::4, pph::4] = out[f"w_{qq}{pph}"]
        else:
            fw[:, 0::2] = out["w_c"][0]
            fw[:, 1::2] = out["w_c"][1]
        full[tag] = fw
    a = full["grid"].view(np.uint8).astype(np.int32)
    b = full["stencil"].view(np.uint8).astype(np.int32)
    d = np.abs(a - b)
    print(f"parity grid-vs-stencil: {int((d > 0).sum())}/{d.size} bytes "
          f"differ, max {int(d.max())} LSB", flush=True)


def main():
    import collections

    variants = {v: build(v) for v in ("grid", "stencil")}
    parity(variants)
    best = collections.defaultdict(float)
    for rep in range(4):
        for tag, (step, st, p, spec) in variants.items():
            res = measure_fps(
                step,
                lambda b: random_planes_for_spec(
                    spec, b, split=getattr(step, "source_split", False)),
                st, p, batch_small=2, batch_large=8)
            best[tag] = max(best[tag], res["fps"])
            print(f"rep{rep} {tag:>8}: {res['fps']:8.1f} fps", flush=True)
    print("BEST:", dict(best), flush=True)
    print("DONE-SENTINEL", flush=True)


if __name__ == "__main__":
    main()
