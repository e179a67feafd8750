"""Prototype: 8K NV12 -> 4K BGRA chain from a QUAD-provisioned luma
source — the 2:1 downscale is a pure cross-phase average (zero strided
loads, zero matmuls, chroma consumed identity) fused straight through
the filter to a FULL u32-word emit.

A/B vs the negotiated scale8k4k chain (split links + rows-closed-form
downsample, the round-3g shipped state).  Expected ceiling: ~83 MB/frame
at ~620 GB/s = ~134 us = ~7.4k fps.

Run: JAX_COMPILATION_CACHE_DIR=/tmp/tpuvf-tpu-cache python -u \
       scripts/bench_halfq_proto.py > /tmp/halfq_proto.out 2>&1
"""
from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")

from tpuvf.runtime.benchmark import measure_fps, random_planes_for_spec


def build_proto():
    import jax.numpy as jnp

    from tpuvf.core.formats import VideoFormat
    from tpuvf.core.registry import make
    from tpuvf.core.spec import FrameSpec
    from tpuvf.kernels import color, convert, filter as kfilter
    from tpuvf.kernels.color import as_unit_float, quant, quant_sim_unit

    in_spec = FrameSpec(VideoFormat.NV12, 7680, 4320)
    out_spec = FrameSpec(VideoFormat.BGRA, 3840, 2160)
    vf = make("vfvideofilter")
    for k, v in {"brightness": 0.05, "contrast": 1.1,
                 "saturation": 1.2}.items():
        vf.set_property(k, v)
    mid_spec = FrameSpec(VideoFormat.BGRA, 3840, 2160)
    cfg = dict(vf.static_config(mid_spec, out_spec))
    gates = dict(cfg["gates"])
    midx = in_spec.matrix_index
    half = np.float32(0.5)

    def step(planes, state, params):
        ee = as_unit_float(planes["y_ee"])
        eo = as_unit_float(planes["y_eo"])
        oe = as_unit_float(planes["y_oe"])
        oo = as_unit_float(planes["y_oo"])
        # rows-then-cols pair averages — the canonical closed-form order
        y = ((ee + oe) * half + (eo + oo) * half) * half
        u = as_unit_float(planes["u"])
        v = as_unit_float(planes["v"])
        r, g, b = color.yuv_to_rgb(y, u, v, midx)
        # cs->vf RGBA8 boundary (quantize-at-texture-write parity)
        chans = tuple(quant_sim_unit(c) for c in (r, g, b))
        chans = chans + (jnp.ones_like(chans[0]),)
        fi = state["frame_index"]
        ch = kfilter.apply_color_adjustments_t(
            chans, params, fi, 3840, 2160, gates=gates)
        wq = convert.pack_words_u32(
            tuple(quant(c) for c in ch), out_spec.format)
        return ({"w_f": wq},
                {"frame_index": (fi + np.uint32(1)).astype(jnp.uint32)})

    step.source_split = "quad"
    state0 = {"frame_index": np.uint32(0)}
    return step, state0, vf.traced_params(), in_spec


def build_current():
    from bench import configs as C

    _, step, state0, params, mk = C.config_scale8k4k()
    return step, state0, params, mk


def main():
    import jax.numpy as jnp  # noqa: F401

    proto_step, proto_st, proto_p, in_spec = build_proto()
    cur_step, cur_st, cur_p, cur_mk = build_current()

    def proto_mk(b):
        return random_planes_for_spec(in_spec, b, split="quad")

    best = {"proto": 0.0, "current": 0.0}
    for rep in range(3):
        for tag, (step, st, p, mk) in (
                ("proto", (proto_step, proto_st, proto_p, proto_mk)),
                ("current", (cur_step, cur_st, cur_p, cur_mk))):
            res = measure_fps(step, mk, st, p, batch_small=2, batch_large=8)
            best[tag] = max(best[tag], res["fps"])
            print(f"rep{rep} {tag:>8}: {res['fps']:8.1f} fps", flush=True)
    print("BEST:", best, flush=True)
    print("DONE-SENTINEL", flush=True)


if __name__ == "__main__":
    main()
