"""Stage-level ablation profile of BASELINE config 3 (videofilter+LUT).

Measures, on the real TPU, where the frame time goes:
  full         -- the exact bench config (bright/contrast/sat + key + LUT)
  nolut        -- same element, no lut-file
  lut_only     -- apply_lut_t alone on full-res channels (dequant->lut->quant)
  gather_only  -- the corner gather without the trilinear reduce
  lut_bf16     -- lut_only with a bfloat16 corner table (f32 reduce)

Run:  JAX_COMPILATION_CACHE_DIR=/tmp/tpuvf-tpu-cache python -u \
        scripts/bench_lut_profile.py > /tmp/lut_profile.out 2>&1
"""
from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from bench.configs import config_videofilter
from tpuvf.kernels import filter as kfilter
from tpuvf.kernels.color import dequant, quant
from tpuvf.runtime.benchmark import measure_fps, random_planes_for_spec

H, W = 1080, 1920


def report(label, res):
    print(f"{label:>12}: {res['fps']:8.1f} fps  {res['ms_per_frame']:7.3f} ms"
          f"  (t4={res['t_small']*1e3:.1f} ms t16={res['t_large']*1e3:.1f} ms)",
          flush=True)


def rgba_planes(batch, rng=None):
    rng = rng or np.random.default_rng(0)
    return {
        "r": jnp.asarray(rng.integers(0, 256, (batch, H, W), np.uint8)),
        "g": jnp.asarray(rng.integers(0, 256, (batch, H, W), np.uint8)),
        "b": jnp.asarray(rng.integers(0, 256, (batch, H, W), np.uint8)),
        "a": jnp.asarray(rng.integers(0, 256, (batch, H, W), np.uint8)),
    }


def main():
    label, step, state0, params, in_spec = config_videofilter()

    # -- full config ------------------------------------------------------
    res = measure_fps(step, lambda b: random_planes_for_spec(in_spec, b),
                      state0, params)
    report("full", res)

    # -- no LUT -----------------------------------------------------------
    from tpuvf.core.registry import make
    from tpuvf.core.spec import FrameSpec
    from tpuvf.core.formats import VideoFormat

    elem = make("vfvideofilter")
    elem.set_property("brightness", 0.1)
    elem.set_property("contrast", 1.2)
    elem.set_property("saturation", 1.3)
    elem.set_property("chroma-key-enabled", True)
    spec = FrameSpec(VideoFormat.NV12, W, H)
    static = elem.static_config(spec, spec)
    proc = elem.make_process(spec, spec, static)
    res = measure_fps(proc, lambda b: random_planes_for_spec(spec, b),
                      elem.init_state(spec, spec), elem.traced_params())
    report("nolut", res)

    lut_packed = params["lut"]
    size = 33

    # -- LUT stage alone (full-res single-phase) --------------------------
    def lut_step(planes, state, p):
        chans = tuple(dequant(planes[c]) for c in ("r", "g", "b", "a"))
        out = kfilter.apply_lut_t(chans, p["lut"], size)
        return {c: quant(x) for c, x in zip("rgba", out)}, state

    res = measure_fps(lut_step, rgba_planes, (), {"lut": lut_packed})
    report("lut_only", res)

    # -- gather only (no trilinear reduce; cheap unweighted row sum keeps
    #    the gather live) --------------------------------------------------
    def gather_step(planes, state, p):
        r = dequant(planes["r"])
        g = dequant(planes["g"])
        b = dequant(planes["b"])
        s1 = jnp.float32(size - 1)
        r0 = jnp.clip(jnp.floor(r * s1), 0, size - 1).astype(jnp.int32)
        g0 = jnp.clip(jnp.floor(g * s1), 0, size - 1).astype(jnp.int32)
        b0 = jnp.clip(jnp.floor(b * s1), 0, size - 1).astype(jnp.int32)
        cell = (b0 * size + g0) * size + r0
        hq = H // 2
        outs = []
        for i in range(2):
            c = cell[..., i * hq:(i + 1) * hq, :]
            corners = kfilter._gather_corners_t(p["lut"], c)
            outs.append(corners.sum(axis=0))
        return {"o": quant(jnp.concatenate(outs, axis=-2) * 0.04)}, state

    res = measure_fps(gather_step, rgba_planes, (), {"lut": lut_packed})
    report("gather_only", res)

    # -- bf16 corner table -------------------------------------------------
    lut_bf16 = lut_packed.astype(jnp.bfloat16)
    res = measure_fps(lut_step, rgba_planes, (), {"lut": lut_bf16})
    report("lut_bf16", res)

    print("DONE-SENTINEL", flush=True)


if __name__ == "__main__":
    main()
