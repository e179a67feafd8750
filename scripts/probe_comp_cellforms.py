"""Probe: cell-fold formulations for the compositor's big NV12-over-BGRA
cell (BASELINE config 5's sink_1 region, 1080x960 phase cell).

The round-4 trace shows the cell fold split into EIGHT per-channel-phase
fusions, each re-reading the shared inputs (materialized f32 chroma
~17.6 MB/op; lazy in-fusion chroma recompute made it WORSE — the pair
interleave's broadcast materializes per fusion).  Question: does
emitting the cell STACKED (4, h, w) collapse the fold into one fusion
per phase that reads y/uv/under-draw once?

Forms (same per-pixel math, two-draw fold: s0 RGBA under, s1 NV12 over):
  A "perchan"        — 8 separate (h, w) u8 outputs (the in-tree shape)
  B "stacked"        — 2 stacked (4, h, w) u8 outputs (one per phase)
  C "stacked-lazy"   — stacked + chroma recomputed in-fusion (pair form)
  D "stacked8"       — ONE (8, h, w) u8 output (both phases)

Run: JAX_COMPILATION_CACHE_DIR=/tmp/tpuvf-tpu-cache python -u \
       scripts/probe_comp_cellforms.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/tpuvf-tpu-cache")

from tpuvf.kernels import color as kcolor
from tpuvf.kernels.color import as_unit_float, quant_sim
from tpuvf.kernels.convert import _shift_edge, _upsample2x_linear

H, W = 1080, 1920
WP = W // 2
HC, WC = H // 2, WP


def quant(x):
    return jnp.clip(jnp.round(x * 255.0), 0.0, 255.0).astype(jnp.uint8)


def dequant(x):
    return x.astype(jnp.float32) * np.float32(1.0 / 255.0)


def make_inputs():
    rng = np.random.default_rng(0)

    def u8(shape):
        return jnp.asarray(rng.integers(0, 256, shape, dtype=np.uint8))

    planes = {
        "y_e": u8((H, WP)), "y_o": u8((H, WP)),
        "u": u8((HC, WC)), "v": u8((HC, WC)),
    }
    s0 = {f"{n}_{p}": u8((H, WP))
          for n in ("r", "g", "b", "a") for p in ("e", "o")}
    return planes, s0


def eager_chroma(planes):
    """The in-tree eager split-sampler chroma: rows 2x then column taps."""
    out = {}
    for name in ("u", "v"):
        cf = as_unit_float(planes[name])
        cf = _upsample2x_linear(cf, -2)
        prev = _shift_edge(cf, -1, -1)
        nxt = _shift_edge(cf, -1, +1)
        out[name] = (0.25 * prev + 0.75 * cf, 0.75 * cf + 0.25 * nxt)
    return out


def lazy_chroma_pair(c8, suffix):
    """In-fusion recompute (pair broadcast-select rows + column taps)."""
    cf = as_unit_float(c8)
    prev_r = _shift_edge(cf, -2, -1)
    nxt_r = _shift_edge(cf, -2, +1)
    top = 0.25 * prev_r + 0.75 * cf
    bot = 0.75 * cf + 0.25 * nxt_r
    pair = jax.lax.broadcasted_iota(jnp.int32, (1, 2, 1), 1)
    up = jnp.where(pair == 0, top[:, None, :], bot[:, None, :])
    up = up.reshape(2 * c8.shape[-2], c8.shape[-1])
    prev = _shift_edge(up, -1, -1)
    nxt = _shift_edge(up, -1, +1)
    if suffix == "e":
        return 0.25 * prev + 0.75 * up
    return 0.75 * up + 0.25 * nxt


def cell_channels(planes, s0, alpha, lazy):
    """Two-draw fold per phase: s0 (RGBA, alpha from plane) under,
    s1 (NV12, premult alpha = alpha scalar) over.  Returns
    {phase: [4 x (H, WP) f32-quantized u8 values]}."""
    if not lazy:
        ch = eager_chroma(planes)
    out = {}
    for pi, suffix in enumerate(("e", "o")):
        y = as_unit_float(planes[f"y_{suffix}"])
        if lazy:
            u = lazy_chroma_pair(planes["u"], suffix)
            v = lazy_chroma_pair(planes["v"], suffix)
        else:
            u = ch["u"][pi]
            v = ch["v"][pi]
        r, g, b = kcolor.yuv_to_rgb(y, u, v, 0)
        src1 = (r * alpha, g * alpha, b * alpha, alpha * jnp.ones_like(r))
        a0 = as_unit_float(s0[f"a_{suffix}"])
        chans = []
        for c, n in enumerate(("r", "g", "b", "a")):
            v0 = (a0 if c == 3
                  else as_unit_float(s0[f"{n}_{suffix}"]) * a0)
            cell = quant(v0)  # draw 0 over background (opaque: SOURCE)
            blended = src1[c] + dequant(cell) * (1.0 - src1[3])
            chans.append(quant(blended))
        out[suffix] = chans
    return out


def form_perchan(planes, s0, alpha):
    out = cell_channels(planes, s0, alpha, lazy=False)
    return tuple(out["e"]) + tuple(out["o"])


def form_stacked(planes, s0, alpha):
    out = cell_channels(planes, s0, alpha, lazy=False)
    return (jnp.stack(out["e"], 0), jnp.stack(out["o"], 0))


def form_stacked_lazy(planes, s0, alpha):
    out = cell_channels(planes, s0, alpha, lazy=True)
    return (jnp.stack(out["e"], 0), jnp.stack(out["o"], 0))


def form_stacked8(planes, s0, alpha):
    out = cell_channels(planes, s0, alpha, lazy=False)
    return jnp.stack(out["e"] + out["o"], 0)


def measure(fn, planes, s0, n=30):
    from tpuvf.runtime.benchmark import measure_device_us

    step = lambda pl, st, prm: (fn(pl["p"], pl["s0"], prm["alpha"]), st)
    mk = lambda b: {"p": {k: v[None] for k, v in planes.items()},
                    "s0": {k: v[None] for k, v in s0.items()}}
    # measure_device_us drops the leading batch dim via tree_map[0]
    return measure_device_us(step, mk, (), {"alpha": jnp.float32(0.6)},
                             n_frames=n)


def main():
    planes, s0 = make_inputs()
    forms = [
        ("perchan", form_perchan),
        ("stacked", form_stacked),
        ("stacked-lazy", form_stacked_lazy),
        ("stacked8", form_stacked8),
    ]
    # parity first: normalize every form to one (8, H, WP) stack
    ref = None
    for name, fn in forms:
        out = jax.jit(lambda pl, s, a: fn(pl, s, a))(
            planes, s0, jnp.float32(0.6))
        leaves = [np.asarray(x) for x in jax.tree_util.tree_leaves(out)]
        if len(leaves) == 8:
            flat = np.stack(leaves, 0)
        elif len(leaves) == 2:
            flat = np.concatenate(leaves, 0)
        else:
            flat = leaves[0]
        if ref is None:
            ref = flat
        else:
            same = np.array_equal(ref, flat)
            nd = int(np.abs(ref.astype(int) - flat.astype(int)).max())
            print(f"{name}: parity vs perchan "
                  f"{'BITWISE' if same else f'DIFFERS max {nd}'}")
    for name, fn in forms:
        r = measure(fn, planes, s0)
        print(f"{name:14s} {r['us_per_frame']:8.1f} us/frame"
              if r else f"{name}: no device trace")
    print("DONE-SENTINEL", flush=True)


if __name__ == "__main__" and not os.environ.get("PROBE_WAVE2"):
    main()


# -- round-4 second wave: half-height chroma, row-parity pair forms ---------
# The trace shows the full-height f32 chroma planes (8.3 MB each) re-read
# by all 8 per-channel fusions.  These forms keep chroma HALF-height and
# organize the whole cell fold as (H/2, 2, WP) row-parity pairs: the row
# 2x taps become per-parity expressions of the half-res chroma (rows-
# then-cols order preserved -> bitwise), and the final u8 (or u16-word)
# write reshapes (H/2, 2, WP) -> (H, WP) once on quantized bytes.


def pair_chroma(planes, name, suffix):
    """(top, bot) f32 half-height chroma, column-phase tapped: the
    _upsample2x_linear row taps + split-sampler column taps regrouped by
    output row parity (identical per-value op order)."""
    c = as_unit_float(planes[name])
    prev_r = _shift_edge(c, -2, -1)
    nxt_r = _shift_edge(c, -2, +1)
    top = 0.25 * prev_r + 0.75 * c   # even output rows
    bot = 0.75 * c + 0.25 * nxt_r    # odd output rows
    def col(ph):
        prev = _shift_edge(ph, -1, -1)
        nxt = _shift_edge(ph, -1, +1)
        if suffix == "e":
            return 0.25 * prev + 0.75 * ph
        return 0.75 * ph + 0.25 * nxt
    return col(top), col(bot)


def cell_pair_channels(planes, s0, alpha, emit):
    """emit="u8": [(H,WP) u8 x 4] per phase via one (H/2,2,WP) write;
    emit="u16": [(H,WP) u16 x 4] packed words (e | o<<8), no u8 canvas."""
    outs = {}
    for suffix in ("e", "o"):
        y8 = planes[f"y_{suffix}"]
        yp = as_unit_float(y8.reshape(H // 2, 2, WP))
        u_tb = pair_chroma(planes, "u", suffix)
        v_tb = pair_chroma(planes, "v", suffix)
        a0p = as_unit_float(s0[f"a_{suffix}"].reshape(H // 2, 2, WP))
        chans = []
        for c, n in enumerate(("r", "g", "b", "a")):
            par = []
            for p in range(2):
                rp, gp, bp = kcolor.yuv_to_rgb(
                    yp[:, p, :], u_tb[p], v_tb[p], 0)
                s1v = (rp, gp, bp)[c] * alpha if c < 3 else (
                    alpha * jnp.ones_like(rp))
                a0v = a0p[:, p, :]
                v0 = (a0v if c == 3 else as_unit_float(
                    s0[f"{n}_{suffix}"].reshape(H // 2, 2, WP))[:, p, :]
                    * a0v)
                cell = quant(v0)
                par.append(quant(s1v + dequant(cell) * (1.0 - alpha)))
            pair = jnp.stack(par, axis=1)          # (H/2, 2, WP) u8
            chans.append(pair)
        outs[suffix] = chans
    if emit == "u8":
        return tuple(ch.reshape(H, WP) for ch in outs["e"]) + tuple(
            ch.reshape(H, WP) for ch in outs["o"])
    words = []
    for ce, co in zip(outs["e"], outs["o"]):
        w = ce.astype(jnp.uint16) | (co.astype(jnp.uint16) << 8)
        words.append(w.reshape(H, WP))
    return tuple(words)


def form_pair_u8(planes, s0, alpha):
    return cell_pair_channels(planes, s0, alpha, "u8")


def form_pair_u16(planes, s0, alpha):
    return cell_pair_channels(planes, s0, alpha, "u16")


def form_perchan_u16(planes, s0, alpha):
    """Baseline + fused u16-word emit (no pair form)."""
    out = cell_channels(planes, s0, alpha, lazy=False)
    return tuple(e.astype(jnp.uint16) | (o.astype(jnp.uint16) << 8)
                 for e, o in zip(out["e"], out["o"]))


def main2():
    planes, s0 = make_inputs()
    ref = jax.jit(lambda pl, s, a: form_perchan(pl, s, a))(
        planes, s0, jnp.float32(0.6))
    ref8 = np.stack([np.asarray(x) for x in ref], 0)
    out = jax.jit(lambda pl, s, a: form_pair_u8(pl, s, a))(
        planes, s0, jnp.float32(0.6))
    got8 = np.stack([np.asarray(x) for x in out], 0)
    print("pair-u8 parity:",
          "BITWISE" if np.array_equal(ref8, got8) else
          f"DIFFERS {int(np.abs(ref8.astype(int)-got8.astype(int)).max())}")
    wr = jax.jit(lambda pl, s, a: form_pair_u16(pl, s, a))(
        planes, s0, jnp.float32(0.6))
    w8 = np.stack([np.asarray(x) for x in wr], 0)
    expect = ref8[:4].astype(np.uint16) | (ref8[4:].astype(np.uint16) << 8)
    print("pair-u16 parity:",
          "BITWISE" if np.array_equal(expect, w8) else "DIFFERS")
    for name, fn in (("pair-u8", form_pair_u8),
                     ("pair-u16", form_pair_u16),
                     ("perchan-u16", form_perchan_u16),
                     ("perchan", form_perchan)):
        r = measure(fn, planes, s0)
        print(f"{name:14s} {r['us_per_frame']:8.1f} us/frame"
              if r else f"{name}: no device trace")
    print("DONE-SENTINEL2", flush=True)


if __name__ == "__main__" and os.environ.get("PROBE_WAVE2"):
    main2()
