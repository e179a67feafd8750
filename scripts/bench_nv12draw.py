"""Compositor NV12-pad sampling cost at 1080p identity (the per-draw
mystery): current plan_plane_sampler vs alternatives.

  current   -- plan_plane_sampler fast paths (row sublane + LANE interleave)
  dense_col -- row fast path + DENSE MXU matmul for the column upsample
  split_u16 -- split-phase chroma + u16-word interleave of quantized... n/a
               (chroma is float); instead: split-phase compute + f32
               stack+reshape ONLY at the very end (same as current, control)

Each step outputs premultiplied quantized rgba (4, H, W) u8 to force full
work.  Run one at a time vs other TPU jobs!

Run:  JAX_COMPILATION_CACHE_DIR=/tmp/tpuvf-tpu-cache python -u \
        scripts/bench_nv12draw.py > /tmp/nv12draw.out 2>&1
"""
from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")

import jax.numpy as jnp

from tpuvf.core.formats import VideoFormat
from tpuvf.core.spec import FrameSpec
from tpuvf.kernels import color as kcolor, convert, sample
from tpuvf.kernels.color import dequant, quant
from tpuvf.kernels.sample import WeightBuffers
from tpuvf.runtime.benchmark import measure_fps, random_planes_for_spec

W, H = 1920, 1080
spec = FrameSpec(VideoFormat.NV12, W, H)


def report(label, res):
    print(f"{label:>10}: {res['fps']:8.1f} fps  {res['ms_per_frame']:7.3f} ms",
          flush=True)


def out_pack(r, g, b, a):
    return {"rgba": jnp.stack([quant(r), quant(g), quant(b), quant(a)],
                              axis=-3)}


def make_current():
    bufs = WeightBuffers("probe")
    run_y = convert.plan_plane_sampler(W, H, W, H, sample.LINEAR, 1.0, 1.0, bufs)
    run_c = convert.plan_plane_sampler(W // 2, H // 2, W, H, sample.LINEAR,
                                       1.0, 1.0, bufs)

    def step(planes, state, p):
        y = run_y(dequant(planes["y"]), p)
        u = run_c(dequant(planes["u"]), p)
        v = run_c(dequant(planes["v"]), p)
        r, g, b = kcolor.yuv_to_rgb(y, u, v, 0)
        a = jnp.ones_like(r)
        return out_pack(r, g, b, a), state

    return step, bufs.buffers


def make_dense_col():
    bufs = WeightBuffers("probe2")
    # rows: 2x fast path (sublane, fine); cols: dense matmul
    t = sample.texcoords(W, 1.0)
    wmat = sample.sample_matrix(t, W // 2, sample.LINEAR)  # (W, W/2)
    fetch_w = bufs.add(np.ascontiguousarray(wmat.T), "colw")  # (W/2, W)

    def up_c(c, p):
        cr = convert._upsample2x_linear(c, -2)  # rows
        wm = fetch_w(p)
        return jnp.einsum("...hw,wo->...ho", cr, wm,
                          preferred_element_type=jnp.float32,
                          precision=sample.MATMUL_PRECISION)

    def step(planes, state, p):
        y = dequant(planes["y"])
        u = up_c(dequant(planes["u"]), p)
        v = up_c(dequant(planes["v"]), p)
        r, g, b = kcolor.yuv_to_rgb(y, u, v, 0)
        a = jnp.ones_like(r)
        return out_pack(r, g, b, a), state

    return step, bufs.buffers


def make_split_phase():
    """Split-phase everything; interleave only the FINAL quantized u8."""
    split = convert.plan_rgba_sampler_split(spec, matrix_index=0)

    def step(planes, state, p):
        ch_e, ch_o = split(planes, p)
        qe = [quant(c) for c in ch_e]
        qo = [quant(c) for c in ch_o]
        return {"rgba": jnp.stack(
            [convert.interleave_cols_u8(a, b) for a, b in zip(qe, qo)],
            axis=-3)}, state

    return step, {}


def main():
    for label, mk in (("current", make_current), ("dense_col", make_dense_col),
                      ("split_u8", make_split_phase)):
        step, bufs = mk()
        res = measure_fps(step, lambda b: random_planes_for_spec(spec, b),
                          (), dict(bufs))
        report(label, res)
    print("DONE-SENTINEL", flush=True)


if __name__ == "__main__":
    main()
