"""Within-process A/B of the NV12 1080p -> NV12 4K 2x-upscale + filter
chain: grid420 boundary + packed420g edge vs the prior negotiated plan
(scaled split link + canonical 4:2:0 edge), plus TPU parity.

Run: JAX_COMPILATION_CACHE_DIR=/tmp/tpuvf-tpu-cache python -u \
       scripts/bench_upscale420_chain_ab.py > /tmp/upscale420_chain.out 2>&1
"""
from __future__ import annotations

import sys

sys.path.insert(0, ".")

import numpy as np

from tpuvf.core.formats import VideoFormat
from tpuvf.core.spec import FrameSpec
from tpuvf.runtime.benchmark import measure_fps, random_planes_for_spec

VF_PROPS = {"brightness": 0.05, "contrast": 1.1, "saturation": 1.2}


def build(variant: str):
    from tpuvf.core.registry import make

    in_spec = FrameSpec(VideoFormat.NV12, 1920, 1080)
    out_spec = FrameSpec(VideoFormat.NV12, 3840, 2160,
                         matrix=in_spec.matrix)
    cs = make("vfconvertscale")
    vf = make("vfvideofilter")
    for k, v in VF_PROPS.items():
        vf.set_property(k, v)
    if variant == "grid":
        cs_proc = cs.make_process_linked(
            in_spec, out_spec, cs.static_config(in_spec, out_spec),
            in_split="quad", out_mode="grid")
        vf_proc = vf.make_process_linked(
            out_spec, out_spec, vf.static_config(out_spec, out_spec),
            in_split="grid", out_mode="packed420g")
        src_split = "quad"
    else:
        # the prior negotiated plan: scaled split link, packed16 4:2:0
        # edge (identity videofilter supports it at 4K)
        cs_proc = cs.make_process_linked(
            in_spec, out_spec, cs.static_config(in_spec, out_spec),
            in_split=False, out_mode="split")
        vf_proc = vf.make_process_linked(
            out_spec, out_spec, vf.static_config(out_spec, out_spec),
            in_split=True, out_mode="packed16")
        src_split = False
    params = {"cs": cs.traced_params(), "vf": vf.traced_params()}

    def step(planes, state, params):
        mid, _ = cs_proc(planes, (), params["cs"])
        out, new_state = vf_proc(mid, state, params["vf"])
        return out, new_state

    step.source_split = src_split
    return step, vf.init_state(out_spec, out_spec), params, in_spec


def parity(variants):
    import jax

    from tpuvf.core.frame import planes_to_host, quad_planes_host

    out_spec = FrameSpec(VideoFormat.NV12, 3840, 2160)
    rng = np.random.default_rng(7)
    y = rng.integers(0, 256, (1080, 1920), np.uint8)
    u = rng.integers(0, 256, (540, 960), np.uint8)
    v = rng.integers(0, 256, (540, 960), np.uint8)
    host = {}
    for tag, (step, st, p, spec) in variants.items():
        if getattr(step, "source_split", False) == "quad":
            planes = quad_planes_host({"y": y, "u": u, "v": v}, spec)
        else:
            planes = {"y": y, "u": u, "v": v}
        out, _ = jax.jit(step)(jax.device_put(planes), st, p)
        out = {k: np.asarray(jax.device_get(o)) for k, o in out.items()}
        host[tag] = planes_to_host(out, out_spec)
    for k in ("y", "uv"):
        a = host["grid"][k].astype(np.int32)
        b = host["split"][k].astype(np.int32)
        d = np.abs(a - b)
        print(f"parity {k}: {int((d > 0).sum())}/{d.size} bytes differ, "
              f"max {int(d.max())} LSB", flush=True)


def main():
    import collections

    variants = {v: build(v) for v in ("grid", "split")}
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
            print(f"rep{rep} {tag:>6}: {res['fps']:8.1f} fps", flush=True)
    print("BEST:", dict(best), flush=True)
    print("DONE-SENTINEL", flush=True)


if __name__ == "__main__":
    main()
