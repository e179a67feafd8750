#!/usr/bin/env python
"""TPU-backend golden parity sweep — one representative case per element,
run on the real chip (the pytest goldens run on CPU).  Usage:
python scripts/tpu-golden-sweep.py"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np, jax.numpy as jnp
from tests.oracle import metal_ref, filter_ref, element_ref
from tests.util import assert_planes_close, random_host_frame
from tpuvf.core.frame import host_to_planes
from tpuvf.core.formats import VideoFormat
from tpuvf.core.registry import make
from tpuvf.core.spec import FrameSpec

RNG = np.random.default_rng(99)
results = []

def check(name, fn):
    try:
        fn()
        results.append((name, "OK"))
    except AssertionError as e:
        results.append((name, f"FAIL: {str(e)[:120]}"))
    print(results[-1], flush=True)

def run_elem(elem_name, fmt, w, h, props, host=None, interlaced=False):
    spec = FrameSpec(VideoFormat(fmt), w, h, interlaced=interlaced)
    host = random_host_frame(RNG, spec) if host is None else host
    planes = host_to_planes(host, spec)
    elem = make(elem_name)
    for k, v in (props or {}).items():
        elem.set_property(k, v)
    out_spec = elem.transform_spec(spec)
    proc = elem.make_process(spec, out_spec, elem.static_config(spec, out_spec))
    state = elem.init_state(spec, out_spec)
    dev = {k: jnp.asarray(v) for k, v in planes.items()}
    out, _ = proc(dev, state, elem.traced_params())
    return {k: np.asarray(v) for k, v in out.items()}, planes, spec

# videofilter combo
def t_filter():
    got, planes, spec = run_elem("vfvideofilter", "NV12", 64, 48,
        {"brightness": -0.1, "contrast": 1.3, "saturation": 1.4, "hue": -0.2,
         "gamma": 0.8, "sepia": 0.3, "vignette": 0.4})
    u = dict(brightness=-0.1, contrast=1.3, saturation=1.4, hue=-0.2*np.pi,
             gamma=0.8, sepia=0.3, invert=False, chroma_key_enabled=False,
             key_r=0, key_g=1, key_b=0, key_tolerance=0.2, key_smoothness=0.1,
             vignette=0.4, noise=0.0)
    rgba = metal_ref.sample_rgba(planes, "NV12", spec.matrix_index, 64, 48)
    tx = (np.arange(64, dtype=np.float32)+0.5)/64
    ty = (np.arange(48, dtype=np.float32)+0.5)/48
    tc = np.stack(np.broadcast_arrays(tx[None,:], ty[:,None]), -1)
    rgba = filter_ref.apply_color_adjustments(rgba, u, tc, 0)
    want = metal_ref.pack_rgba(metal_ref.quant(rgba).transpose(2,0,1), "NV12", spec.matrix_index)
    assert_planes_close(got, want, tol=2, context="tpu filter")
check("videofilter combo NV12", t_filter)

# convertscale: NV12 -> BGRA identity (the split-phase + banded-chroma
# fast path; 96-wide so the chroma plane is lane-UNALIGNED at 48)
def t_convert():
    spec = FrameSpec(VideoFormat("NV12"), 96, 64)
    host = random_host_frame(RNG, spec)
    planes = host_to_planes(host, spec)
    elem = make("vfconvertscale")
    out_spec = FrameSpec(VideoFormat("BGRA"), 96, 64, matrix=spec.matrix)
    proc = elem.make_process_linked(
        spec, out_spec, elem.static_config(spec, out_spec),
        out_mode="packed16")
    dev = {k: jnp.asarray(v) for k, v in planes.items()}
    out, _ = proc(dev, (), elem.traced_params())
    got16 = np.ascontiguousarray(np.asarray(out["rgba"]))  # u16 words
    got = {"rgba": got16.view(np.uint8).reshape(4, 64, 96)}
    rgba = metal_ref.sample_rgba(planes, "NV12", spec.matrix_index, 96, 64)
    want = metal_ref.pack_rgba(
        metal_ref.quant(rgba).transpose(2, 0, 1), "RGBA", spec.matrix_index)
    assert_planes_close(got, want, tol=2, context="tpu convertscale")
check("convertscale NV12->BGRA split+packed16", t_convert)

# transform rotate+crop
def t_transform():
    got, planes, spec = run_elem("vftransform", "RGBA", 48, 32,
                                 {"method": 1, "crop-left": 4})
    q = element_ref.transform(planes, "RGBA", spec.matrix_index, 48, 32, 1, 4, 0, 0, 0)
    want = metal_ref.pack_rgba(q, "RGBA", spec.matrix_index)
    assert_planes_close(got, want, tol=2, context="tpu transform")
check("transform rot+crop", t_transform)

# deinterlace greedyh frame1
def t_deint():
    spec = FrameSpec(VideoFormat.I420, 48, 32, interlaced=True)
    hosts = [random_host_frame(RNG, spec) for _ in range(2)]
    elem = make("vfdeinterlace"); elem.set_property("method", 3)
    out_spec = elem.transform_spec(spec)
    proc = elem.make_process(spec, out_spec, elem.static_config(spec, out_spec))
    state = elem.init_state(spec, out_spec)
    outs = []
    for hostf in hosts:
        dev = {k: jnp.asarray(v) for k, v in host_to_planes(hostf, spec).items()}
        out, state = proc(dev, state, elem.traced_params())
        outs.append({k: np.asarray(v) for k, v in out.items()})
    prev_q = None; wants = []
    for hostf in hosts:
        pl = host_to_planes(hostf, spec)
        rgba = metal_ref.sample_rgba(pl, "I420", spec.matrix_index, 48, 32, filt="nearest")
        cq = metal_ref.quant(rgba); cur = metal_ref.dequant(cq)
        prev = metal_ref.dequant(prev_q) if prev_q is not None else np.zeros_like(cur)
        of = element_ref.deinterlace(cur, prev, 3, True, 0.1, has_prev=prev_q is not None)
        wants.append(metal_ref.pack_rgba(metal_ref.quant(of).transpose(2,0,1), "I420", spec.matrix_index))
        prev_q = cq
    assert_planes_close(outs[1], wants[1], tol=2, context="tpu deint f1")
check("deinterlace greedyh", t_deint)

# compositor 2-input over
def t_comp():
    comp = make("vfcompositor"); comp.set_property("background", 1)
    b1 = comp.get_pad("sink_1"); b1.set("xpos", 16); b1.set("ypos", 8); b1.set("alpha", 0.6)
    comp.get_pad("sink_0")
    s0 = FrameSpec(VideoFormat.BGRA, 32, 24); s1 = FrameSpec(VideoFormat.NV12, 24, 16)
    h0 = random_host_frame(RNG, s0); h1 = random_host_frame(RNG, s1)
    p0 = host_to_planes(h0, s0); p1 = host_to_planes(h1, s1)
    from tpuvf.core.spec import CapsFilter
    out_spec = comp.aggregate_spec({"sink_0": s0, "sink_1": s1}, CapsFilter(format=VideoFormat.BGRA))
    agg = comp.make_aggregate({"sink_0": s0, "sink_1": s1}, out_spec)
    inputs = {"sink_0": {k: jnp.asarray(v) for k, v in p0.items()},
              "sink_1": {k: jnp.asarray(v) for k, v in p1.items()}}
    out, _ = agg(inputs, (), comp.traced_params())
    got = {k: np.asarray(v) for k, v in out.items()}
    dst = np.zeros((out_spec.height, out_spec.width, 4), np.float32); dst[...,3]=1
    dst = metal_ref.dequant(metal_ref.quant(dst))
    dst = element_ref.composite_draw(dst, p0, "BGRA", s0.matrix_index, 0,0,32,24, 1.0, 1)
    dst = element_ref.composite_draw(dst, p1, "NV12", s1.matrix_index, 16,8,24,16, 0.6, 1)
    want = metal_ref.pack_rgba(metal_ref.quant(dst).transpose(2,0,1), "BGRA", 0)
    assert_planes_close(got, want, tol=2, context="tpu comp")
check("compositor 2-input", t_comp)

fails = [r for r in results if r[1] != "OK"]
print(f"\nTPU GOLDEN SWEEP: {len(results)-len(fails)}/{len(results)} OK", flush=True)
