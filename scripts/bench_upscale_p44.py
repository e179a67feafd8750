"""4x4 phase-grid prototype for the 2x-upscale chain (round 3e).

At EXACTLY 2x/2x 4:2:0->RGB geometry, decomposing the OUTPUT into a
(row mod 4) x (col mod 4) phase grid makes every sampling tap a
phase-clean 2-tap stencil:

- luma (2x both axes): out row 4m+qq maps to luma row 2m + (qq+0.5)/2-0.5
  -> 2-tap row stencils over the luma col-phase planes' row-parity slices;
  out col 4j+p maps to luma col 2j + (p+0.5)/2-0.5 -> 2-tap col stencils
  over the (y_e, y_o) col-phase planes (weights .25/.75).
- chroma (4x both axes): out row 4m+qq maps to chroma row m + (qq-1.5)/4
  -> phase-fixed 2-tap stencils (weights .375/.625, .125/.875);
  same for cols.

So the ENTIRE chain (dequant -> stencils -> yuv_to_rgb -> boundary
quant_sim -> filter b/c/s -> quant -> u32 word pack) fuses per phase with
ZERO resampling materialization.  The shipped 2-phase split path instead
materializes full-res f32 chroma (matmul tiles + row interleaves: ~280
us/frame of the 457 us trace).  Projected: ~36 MB traffic (58 us floor)
+ ~140 us VPU ~= 200 us/frame.

A = the shipped scale1080to4k chain step (negotiated links)
B = 16-phase hand-rolled chain (outputs 16 (540,960) u32 planes; the
    host would interleave rows+cols in one native pass like packed32q)

Parity: 2-term stencil dots vs the canonical matmul's FMA differ by
<= 1 ulp -> expect <= 1 LSB byte diffs on knife-edge pixels.

Usage: python -u scripts/bench_upscale_p44.py [--trace-only]
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/tpuvf-tpu-cache")

from bench import configs as C  # noqa: E402
from tpuvf.core.formats import VideoFormat  # noqa: E402
from tpuvf.core.spec import FrameSpec  # noqa: E402
from tpuvf.kernels import color, convert  # noqa: E402
from tpuvf.kernels import filter as kfilter  # noqa: E402
from tpuvf.kernels.color import as_unit_float, quant, quant_sim  # noqa: E402

W_IN, H_IN = 1920, 1080
W_OUT, H_OUT = 3840, 2160
GATES = dict.fromkeys(
    ("hue", "gamma", "sepia", "invert", "chroma_key", "vignette", "noise"),
    False)
VF = {"brightness": np.float32(0.05), "contrast": np.float32(1.1),
      "saturation": np.float32(1.2)}

# (weight_lo, weight_hi) of the 2-tap stencils per output phase
LUMA_W = [(0.25, 0.75), (0.75, 0.25), (0.25, 0.75), (0.75, 0.25)]
CHROMA_W = [(0.375, 0.625), (0.125, 0.875), (0.875, 0.125), (0.625, 0.375)]


def _cat(a, b, axis):
    return jnp.concatenate([a, b], axis=axis)


def build_p44_step(matrix_index: int):
    f32 = np.float32

    def step(planes):
        ye = as_unit_float(planes["y_e"])  # (1080, 960) luma cols 2j
        yo = as_unit_float(planes["y_o"])  # luma cols 2j+1
        uf = as_unit_float(planes["u"])    # (540, 960)
        vf_ = as_unit_float(planes["v"])

        # --- luma rows: per row phase qq, per col-phase plane ------------
        def rowphase(Y, qq):
            Y0 = Y[0::2]                         # luma rows 2m
            Y1 = Y[1::2]                         # luma rows 2m+1
            if qq == 0:   # taps rows 2m-1 (.25), 2m (.75); clamp row -1 -> 0
                Ym1 = _cat(Y0[:1], Y1[:-1], -2)
                return f32(0.25) * Ym1 + f32(0.75) * Y0
            if qq == 1:   # 2m (.75), 2m+1 (.25)
                return f32(0.75) * Y0 + f32(0.25) * Y1
            if qq == 2:   # 2m (.25), 2m+1 (.75)
                return f32(0.25) * Y0 + f32(0.75) * Y1
            #  qq == 3:   # 2m+1 (.75), 2m+2 (.25); clamp row 1080 -> 1079
            Y2 = _cat(Y0[1:], Y1[-1:], -2)
            return f32(0.75) * Y1 + f32(0.25) * Y2

        # --- luma cols: per col phase p from (E, O) row-phase planes -----
        def colphase(E, O, p):
            if p == 0:    # luma cols 2j-1 (.25), 2j (.75); clamp col -1 -> 0
                Om1 = _cat(E[:, :1], O[:, :-1], -1)
                return f32(0.25) * Om1 + f32(0.75) * E
            if p == 1:    # 2j (.75), 2j+1 (.25)
                return f32(0.75) * E + f32(0.25) * O
            if p == 2:    # 2j (.25), 2j+1 (.75)
                return f32(0.25) * E + f32(0.75) * O
            #  p == 3:    # 2j+1 (.75), 2j+2 (.25); clamp col 1920 -> 1919
            E2 = _cat(E[:, 1:], O[:, -1:], -1)
            return f32(0.75) * O + f32(0.25) * E2

        # --- chroma: phase-fixed 2-tap stencils, rows then cols ----------
        def chroma_rows(Cf, qq):
            wlo, whi = CHROMA_W[qq]
            if qq < 2:    # taps rows m-1, m
                prev = convert._shift_edge(Cf, -2, -1)
                return f32(wlo) * prev + f32(whi) * Cf
            nxt = convert._shift_edge(Cf, -2, +1)  # taps rows m, m+1
            return f32(wlo) * Cf + f32(whi) * nxt

        def chroma_cols(Cr, p):
            wlo, whi = CHROMA_W[p]
            if p < 2:     # taps cols j-1, j
                prev = convert._shift_edge(Cr, -1, -1)
                return f32(wlo) * prev + f32(whi) * Cr
            nxt = convert._shift_edge(Cr, -1, +1)  # taps cols j, j+1
            return f32(wlo) * Cr + f32(whi) * nxt

        out = {}
        x_base = np.arange(W_OUT // 4, dtype=np.float32) * 4.0
        y_base = np.arange(H_OUT // 4, dtype=np.float32) * 4.0
        for qq in range(4):
            E = rowphase(ye, qq)
            O = rowphase(yo, qq)
            u_r = chroma_rows(uf, qq)
            v_r = chroma_rows(vf_, qq)
            for p in range(4):
                y_ph = colphase(E, O, p)
                u_ph = chroma_cols(u_r, p)
                v_ph = chroma_cols(v_r, p)
                r, g, b = color.yuv_to_rgb(y_ph, u_ph, v_ph, matrix_index)
                a = jnp.ones_like(r)
                # element boundary: RGBA8 texture write (quant_sim)
                r, g, b, a = (quant_sim(r), quant_sim(g), quant_sim(b),
                              quant_sim(a))
                chans = kfilter.apply_color_adjustments_t(
                    (r, g, b, a), VF, jnp.uint32(0), W_OUT, H_OUT,
                    gates=GATES, x_index=x_base + p, y_index=y_base + qq)
                q = tuple(quant(c) for c in chans)
                out[f"w_{qq}{p}"] = convert.pack_words_u32(
                    q, VideoFormat.BGRA)
        return out

    return step


def profile(name, fn, planes, n=30):
    dev = jax.device_put(planes)
    jf = jax.jit(fn)
    for _ in range(3):
        out = jf(dev)
    _ = np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]))[:1]
    tdir = f"/tmp/tpuvf-p44-{name}"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        for _ in range(n):
            out = jf(dev)
        _ = np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]))[:1]
    files = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
    with gzip.open(files[0], "rt") as fh:
        trace = json.load(fh)
    events = trace["traceEvents"]
    tpu_pids = {
        e["pid"] for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "TPU" in str(e.get("args", {}).get("name", ""))
    }
    per_op, total = {}, 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in tpu_pids:
            continue
        nm = e.get("name", "?")
        if nm.startswith("jit_"):
            continue
        per_op[nm] = per_op.get(nm, 0.0) + e.get("dur", 0) / 1e3
        total += e.get("dur", 0) / 1e3
    print(f"=== {name}: {total / n * 1e3:.1f} us/frame ===")
    for nm, ms in sorted(per_op.items(), key=lambda kv: -kv[1])[:8]:
        print(f"  {ms / n * 1e3:8.1f} us/frame  {nm[:90]}")
    return total / n * 1e3


def main():
    rng = np.random.default_rng(7)
    y = rng.integers(0, 256, (H_IN, W_IN), dtype=np.uint8)
    u = rng.integers(0, 256, (H_IN // 2, W_IN // 2), dtype=np.uint8)
    v = rng.integers(0, 256, (H_IN // 2, W_IN // 2), dtype=np.uint8)

    # --- A: the shipped chain -------------------------------------------
    label, step_a, state0, params, mk = C.ALL["scale1080to4k"]()
    from tpuvf.runtime.benchmark import random_planes_for_spec  # noqa: F401

    in_spec = FrameSpec(VideoFormat.NV12, W_IN, H_IN)
    if getattr(step_a, "source_split", False):
        planes_a = {"y_e": y[:, 0::2], "y_o": y[:, 1::2], "u": u, "v": v}
    else:
        planes_a = {"y": y, "u": u, "v": v}
    out_a = jax.jit(lambda pl: step_a(pl, state0, params)[0])(
        jax.device_put(planes_a))
    out_a = {k: np.asarray(jax.device_get(va)) for k, va in out_a.items()}
    print("A output planes:", {k: (va.shape, str(va.dtype))
                               for k, va in out_a.items()})

    # --- B: 16-phase prototype ------------------------------------------
    step_b = build_p44_step(in_spec.matrix_index)
    planes_b = {"y_e": y[:, 0::2], "y_o": y[:, 1::2], "u": u, "v": v}
    out_b = jax.jit(step_b)(jax.device_put(planes_b))
    out_b = {k: np.asarray(jax.device_get(vb)) for k, vb in out_b.items()}

    # --- parity -----------------------------------------------------------
    full_a = np.zeros((H_OUT, W_OUT), np.uint32)
    if "w_c" in out_a:  # stacked packed32 edge (round 3f)
        full_a[:, 0::2] = out_a["w_c"][0]
        full_a[:, 1::2] = out_a["w_c"][1]
    elif "w_g" in out_a:  # the chain now negotiates grid16 itself
        for i in range(16):
            full_a[i // 4::4, i % 4::4] = out_a["w_g"][i]
    elif "w_e" in out_a:
        full_a[:, 0::2] = out_a["w_e"]
        full_a[:, 1::2] = out_a["w_o"]
    else:
        raise SystemExit(f"unexpected A layout: {list(out_a)}")
    full_b = np.zeros((H_OUT, W_OUT), np.uint32)
    for qq in range(4):
        for p in range(4):
            full_b[qq::4, p::4] = out_b[f"w_{qq}{p}"]
    ba = full_a.view(np.uint8).reshape(H_OUT, W_OUT, 4).astype(np.int32)
    bb = full_b.view(np.uint8).reshape(H_OUT, W_OUT, 4).astype(np.int32)
    diff = np.abs(ba - bb)
    print(f"parity: {int((diff > 0).sum())}/{diff.size} bytes differ, "
          f"max {int(diff.max())} LSB")

    # --- device profiles --------------------------------------------------
    t_a = profile("A-shipped",
                  lambda pl: step_a(pl, state0, params)[0], planes_a)
    t_b = profile("B-p44", step_b, planes_b)
    print(f"\nA {t_a:.1f} us/frame   B {t_b:.1f} us/frame   "
          f"({t_a / t_b:.2f}x)")
    print("DONE-SENTINEL", flush=True)


if __name__ == "__main__":
    main()
