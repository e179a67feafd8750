"""Stage ablation of the 4K headline chain (NV12 -> convertscale -> BGRA ->
videofilter -> BGRA).

  chain    -- the full headline chain (bench.py)
  cs_only  -- convertscale NV12 4K -> BGRA 4K alone
  vf_only  -- videofilter on BGRA 4K alone
  sample   -- split sampler (NV12 -> float phase channels) + quant only
  interleave -- u8 interleave of split phases alone

Run:  JAX_COMPILATION_CACHE_DIR=/tmp/tpuvf-tpu-cache python -u \
        scripts/bench_chain_profile.py > /tmp/chain_profile.out 2>&1
"""
from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")

import jax.numpy as jnp

from tpuvf.core.formats import VideoFormat
from tpuvf.core.registry import make
from tpuvf.core.spec import FrameSpec
from tpuvf.kernels import convert
from tpuvf.kernels.color import quant
from tpuvf.runtime.benchmark import measure_fps, random_planes_for_spec

W, H = 3840, 2160
FILTER_PROPS = {"brightness": 0.05, "contrast": 1.1, "saturation": 1.2}


def report(label, res):
    print(f"{label:>10}: {res['fps']:8.1f} fps  {res['ms_per_frame']:7.3f} ms",
          flush=True)


def main():
    in_spec = FrameSpec(VideoFormat.NV12, W, H)
    bgra = FrameSpec(VideoFormat.BGRA, W, H, matrix=in_spec.matrix)

    from __graft_entry__ import _build_chain
    step, state0, params = _build_chain(in_spec, bgra, bgra, FILTER_PROPS)
    res = measure_fps(step, lambda b: random_planes_for_spec(in_spec, b),
                      state0, params)
    report("chain", res)

    cs = make("vfconvertscale")
    proc = cs.make_process(in_spec, bgra, cs.static_config(in_spec, bgra))
    res = measure_fps(lambda p, s, prm: proc(p, s, prm),
                      lambda b: random_planes_for_spec(in_spec, b),
                      (), cs.traced_params())
    report("cs_only", res)

    vf = make("vfvideofilter")
    for k, v in FILTER_PROPS.items():
        vf.set_property(k, v)
    vproc = vf.make_process(bgra, bgra, vf.static_config(bgra, bgra))
    res = measure_fps(vproc, lambda b: random_planes_for_spec(bgra, b),
                      vf.init_state(bgra, bgra), vf.traced_params())
    report("vf_only", res)

    split_sampler = convert.plan_rgba_sampler_split(in_spec)

    def sample_step(planes, state, prm):
        ch_e, ch_o = split_sampler(planes, prm)
        return ({f"e{i}": quant(c) for i, c in enumerate(ch_e)}
                | {f"o{i}": quant(c) for i, c in enumerate(ch_o)}), state

    res = measure_fps(sample_step, lambda b: random_planes_for_spec(in_spec, b),
                      (), {})
    report("sample", res)

    def inter_step(planes, state, prm):
        outs = {}
        for i in range(4):
            outs[f"c{i}"] = convert.interleave_cols_u8(
                planes[f"e{i}"], planes[f"o{i}"])
        return outs, state

    def split_planes(batch):
        rng = np.random.default_rng(0)
        return {
            f"{p}{i}": jnp.asarray(
                rng.integers(0, 256, (batch, H, W // 2), np.uint8))
            for p in "eo" for i in range(4)
        }

    res = measure_fps(inter_step, split_planes, (), {})
    report("interleave", res)

    print("DONE-SENTINEL", flush=True)


if __name__ == "__main__":
    main()
