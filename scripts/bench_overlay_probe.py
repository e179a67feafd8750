"""Overlay step sub-ablation at 4K BGRA: where do 2 ms go?

  sampler   -- dequant channels + pack only (no blend)
  pad_blend -- current form: jnp.pad rect overlay to frame + global blend
  full_buf  -- staged FULL-frame overlay buffers (no pad op) + global blend
  rect_set  -- rect slice blend + .at[].set (round-1 form)

Run:  JAX_COMPILATION_CACHE_DIR=/tmp/tpuvf-tpu-cache python -u \
        scripts/bench_overlay_probe.py > /tmp/ov_probe.out 2>&1
"""
from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")

import jax.numpy as jnp

from tpuvf.core.formats import VideoFormat
from tpuvf.core.spec import FrameSpec
from tpuvf.kernels import convert
from tpuvf.kernels.color import dequant
from tpuvf.runtime.benchmark import measure_fps, random_planes_for_spec

W, H = 3840, 2160
RY, RX = slice(128, 384), slice(128, 384)
spec = FrameSpec(VideoFormat.BGRA, W, H)

rng = np.random.default_rng(0)
ov_rect = rng.random((4, 256, 256)).astype(np.float32)
ov_full = np.zeros((4, H, W), np.float32)
ov_full[:, RY, RX] = ov_rect
PAD_HW = ((RY.start, H - RY.stop), (RX.start, W - RX.stop))


def report(label, res):
    print(f"{label:>10}: {res['fps']:8.1f} fps  {res['ms_per_frame']:7.3f} ms",
          flush=True)


def chans_of(planes):
    x = planes["rgba"]
    return [dequant(x[..., c, :, :]) for c in range(4)]


def s_sampler(planes, state, p):
    chans = chans_of(planes)
    return convert.pack_rgba_t(tuple(chans), VideoFormat.BGRA, 0), state


def s_pad(planes, state, p):
    chans = chans_of(planes)
    ov = p["ov"]
    a = jnp.pad(ov[3] * p["alpha"], PAD_HW)
    for c in range(3):
        chans[c] = chans[c] * (1.0 - a) + jnp.pad(ov[c], PAD_HW) * a
    return convert.pack_rgba_t(tuple(chans), VideoFormat.BGRA, 0), state


def s_full(planes, state, p):
    chans = chans_of(planes)
    a = p["ovf"][3] * p["alpha"]
    for c in range(3):
        chans[c] = chans[c] * (1.0 - a) + p["ovf"][c] * a
    return convert.pack_rgba_t(tuple(chans), VideoFormat.BGRA, 0), state


def s_rect(planes, state, p):
    chans = chans_of(planes)
    ov = p["ov"]
    a = ov[3] * p["alpha"]
    for c in range(3):
        region = chans[c][..., RY, RX]
        blended = region * (1.0 - a) + ov[c] * a
        chans[c] = chans[c].at[..., RY, RX].set(blended)
    return convert.pack_rgba_t(tuple(chans), VideoFormat.BGRA, 0), state


def mk(batch):
    return random_planes_for_spec(spec, batch)


params = {"alpha": np.float32(0.8), "ov": ov_rect, "ovf": ov_full}
for label, fn in (("sampler", s_sampler), ("pad_blend", s_pad),
                  ("full_buf", s_full), ("rect_set", s_rect)):
    report(label, measure_fps(fn, mk, (), params))

print("DONE-SENTINEL", flush=True)
