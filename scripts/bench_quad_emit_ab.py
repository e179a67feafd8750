"""A/B the 4K quad headline's packed32q SCAN-output form.

The scan-batched headline trace showed two ~85 us/frame
dynamic-update-slice full-buffer copies stacking the four per-phase u32
outputs (form A); grid16's fix (ONE stacked output) re-traced WORSE here
(497 vs 394 us/frame total op time), so measure fps directly:
  A = four (H/2, W/2) u32 outputs (pre-round-3f shipped form)
  B = one stacked (4, H/2, W/2) u32 output (jnp.stack axis=-3)
  C = one (2H, W/2) u32 output, phases as row BANDS (concat axis=-2)

Run: JAX_COMPILATION_CACHE_DIR=/tmp/tpuvf-tpu-cache python -u \
       scripts/bench_quad_emit_ab.py > /tmp/quad_emit_ab.out 2>&1
"""
from __future__ import annotations

import sys

sys.path.insert(0, ".")

import jax.numpy as jnp

from tpuvf.kernels.convert import QUAD_PHASES
from tpuvf.runtime.benchmark import measure_fps, random_planes_for_spec


def build(variant: str):
    from tpuvf.core.registry import make
    from __graft_entry__ import _specs

    in_spec, mid_spec, out_spec = _specs(3840, 2160, 3840, 2160)
    cs = make("vfconvertscale")
    vf = make("vfvideofilter")
    for k, v in {"brightness": 0.05, "contrast": 1.1,
                 "saturation": 1.2}.items():
        vf.set_property(k, v)
    cs_proc = cs.make_process_linked(
        in_spec, mid_spec, cs.static_config(in_spec, mid_spec),
        in_split="quad", out_mode="quad")
    vf_proc = vf.make_process_linked(
        mid_spec, out_spec, vf.static_config(mid_spec, out_spec),
        in_split="quad", out_mode="packed32q")
    params = {"cs": cs.traced_params(), "vf": vf.traced_params()}

    def step(planes, state, params):
        mid, _ = cs_proc(planes, (), params["cs"])
        out, new_state = vf_proc(mid, state, params["vf"])
        wq = out["w_q"]
        if variant == "four":
            out = {f"w_{ph}": wq[..., i, :, :]
                   for i, ph in enumerate(QUAD_PHASES)}
        elif variant == "bands":
            out = {"w_b": jnp.concatenate(
                [wq[..., i, :, :] for i in range(4)], axis=-2)}
        return out, new_state

    step.source_split = "quad"
    return step, vf.init_state(mid_spec, out_spec), params, in_spec


def main():
    import collections

    variants = {v: build(v) for v in ("stack", "four", "bands")}
    best = collections.defaultdict(float)
    for rep in range(4):
        for tag, (step, st, p, spec) in variants.items():
            res = measure_fps(
                step,
                lambda b: random_planes_for_spec(
                    spec, b, split="quad"),
                st, p, batch_small=2, batch_large=8)
            best[tag] = max(best[tag], res["fps"])
            print(f"rep{rep} {tag:>6}: {res['fps']:8.1f} fps", flush=True)
    print("BEST:", dict(best), flush=True)
    print("DONE-SENTINEL", flush=True)


if __name__ == "__main__":
    main()
