"""Quad-split (row x column phase) headline-chain prototype A/B.

Hypothesis (round 3d): the headline chain's 254 us/frame device time is
dominated by TRAFFIC, not FLOPs — the chroma row 2x-upsample materializes
two full-height (2160,1920) f32 planes (Pallas banded kernels, 34.5 us
each) that the final or_or emit fusion then re-reads (33 MB of its 83 MB).
If the OUTPUT is row-phase split too (four u32 quarter planes, host
interleaves rows+cols in the same repack pass that today interleaves
cols), the chroma row stencils fuse into the emits and the intermediates
vanish.  Projected ~66 MB total traffic ≈ 100 us/frame.

A = the shipped headline step (bench.configs.config_headline)
B = hand-rolled quad-split equivalent (same float ops per output pixel)

Usage: python -u scripts/bench_rowphase.py [--trace]
"""

from __future__ import annotations

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
from tpuvf.kernels import color, convert  # noqa: E402
from tpuvf.kernels import filter as kfilter  # noqa: E402
from tpuvf.kernels.color import dequant, quant, quant_sim  # noqa: E402
from tpuvf.runtime.benchmark import (  # noqa: E402
    measure_fps, random_planes_for_spec)

W, H = 3840, 2160
GATES = dict.fromkeys(
    ("hue", "gamma", "sepia", "invert", "chroma_key", "vignette", "noise"),
    False)


def build_quad_step(matrix_index: int):
    x_base = np.arange(W // 2, dtype=np.float32) * 2.0

    def quad_step(planes, state, params):
        p = params["vf"]
        uf, vf_ = dequant(planes["u"]), dequant(planes["v"])
        out = {}
        for rp in ("e", "o"):
            if rp == "e":  # output rows 2k: 0.25*c[k-1] + 0.75*c[k]
                rows = lambda cf: (0.25 * convert._shift_edge(cf, -2, -1)
                                   + 0.75 * cf)
            else:          # output rows 2k+1: 0.75*c[k] + 0.25*c[k+1]
                rows = lambda cf: (0.75 * cf
                                   + 0.25 * convert._shift_edge(cf, -2, +1))
            u_r, v_r = rows(uf), rows(vf_)

            def cols(cf):
                return (0.25 * convert._shift_edge(cf, -1, -1) + 0.75 * cf,
                        0.75 * cf + 0.25 * convert._shift_edge(cf, -1, +1))

            u_e, u_o = cols(u_r)
            v_e, v_o = cols(v_r)
            for cp, uu, vv in (("e", u_e, v_e), ("o", u_o, v_o)):
                y = dequant(planes[f"y_{rp}{cp}"])
                r, g, b = color.yuv_to_rgb(y, uu, vv, matrix_index)
                chans = tuple(
                    quant_sim(c) for c in (r, g, b, jnp.ones_like(r)))
                chans = kfilter.apply_color_adjustments_t(
                    chans, p, state["frame_index"], W, H, gates=GATES,
                    x_index=x_base + (0.0 if cp == "e" else 1.0))
                q = tuple(quant(c) for c in chans)
                out[f"w_{rp}{cp}"] = convert.pack_words_u32(
                    q, VideoFormat.BGRA)
        return out, state

    return quad_step


def build_quad_step_b2(matrix_index: int):
    """B + EXACT clip elision: quant_sim after the [0,1]-clipped yuv_to_rgb
    output needs no clip; the filter's final clip(0,1) after clip(1e-4,1)
    with every later gate off is a no-op, as is quant's clip.  Bit-identical
    by clip idempotence."""
    x_base = np.arange(W // 2, dtype=np.float32) * 2.0
    f255 = np.float32(255.0)
    inv255 = np.float32(1.0 / 255.0)

    def quad_step(planes, state, params):
        p = params["vf"]
        uf, vf_ = dequant(planes["u"]), dequant(planes["v"])
        out = {}
        for rp in ("e", "o"):
            if rp == "e":
                rows = lambda cf: (0.25 * convert._shift_edge(cf, -2, -1)
                                   + 0.75 * cf)
            else:
                rows = lambda cf: (0.75 * cf
                                   + 0.25 * convert._shift_edge(cf, -2, +1))
            u_r, v_r = rows(uf), rows(vf_)

            def cols(cf):
                return (0.25 * convert._shift_edge(cf, -1, -1) + 0.75 * cf,
                        0.75 * cf + 0.25 * convert._shift_edge(cf, -1, +1))

            u_e, u_o = cols(u_r)
            v_e, v_o = cols(v_r)
            for cp, uu, vv in (("e", u_e, v_e), ("o", u_o, v_o)):
                y = dequant(planes[f"y_{rp}{cp}"])
                r, g, b = color.yuv_to_rgb(y, uu, vv, matrix_index)
                # boundary quant_sim without the redundant clip
                r, g, b = (jnp.round(r * f255) * inv255,
                           jnp.round(g * f255) * inv255,
                           jnp.round(b * f255) * inv255)
                # filter prefix (brightness -> contrast -> saturation)
                br, c, s = p["brightness"], p["contrast"], p["saturation"]
                r, g, b = r + br, g + br, b + br
                r = (r - 0.5) * c + 0.5
                g = (g - 0.5) * c + 0.5
                b = (b - 0.5) * c + 0.5
                lum = (kfilter.REC709_LUMA[0] * r + kfilter.REC709_LUMA[1] * g
                       + kfilter.REC709_LUMA[2] * b)
                r = lum + (r - lum) * s
                g = lum + (g - lum) * s
                b = lum + (b - lum) * s
                # shader pow-clamp; later clips/clip-in-quant are no-ops
                r = jnp.clip(r, 0.0001, 1.0)
                g = jnp.clip(g, 0.0001, 1.0)
                b = jnp.clip(b, 0.0001, 1.0)
                q = tuple(jnp.round(x * f255).astype(jnp.uint8)
                          for x in (r, g, b))
                a = jnp.full_like(q[0], 255)
                out[f"w_{rp}{cp}"] = convert.pack_words_u32(
                    (q[0], q[1], q[2], a), VideoFormat.BGRA)
        return out, state

    return quad_step


def build_quad_step_c(matrix_index: int):
    """B2 + 255-scale affine folding: the YUV matrix absorbs the dequant
    /quant scales (operates on raw u8-valued floats, emits 0..255-scale
    values), and brightness/contrast/saturation compose into ONE affine
    out_c = a*q_c + k*lum(q) + t.  Changes rounding order (knife-edge
    pixels may flip 1 LSB) — measured for speed before deciding."""
    m = color.YUV_TO_RGB[matrix_index]
    off = color.YUV_OFFSET * 255.0  # (16, 128, 128)
    bias = -(m @ off.astype(np.float64)).astype(np.float32)
    f255 = np.float32(255.0)

    def quad_step(planes, state, params):
        p = params["vf"]
        br, c, s = p["brightness"], p["contrast"], p["saturation"]
        # filter affine on the 255 scale:
        # x_c = c*q_c + t, t = (255*br - 127.5)*c + 127.5
        # out_c = s*x_c + (1-s)*lum(x) = (c*s)*q_c + c*(1-s)*lum(q) + t
        t = (f255 * br - np.float32(127.5)) * c + np.float32(127.5)
        a_coef = c * s
        k_coef = c * (1.0 - s)
        w0, w1, w2 = (np.float32(kfilter.REC709_LUMA[0]),
                      np.float32(kfilter.REC709_LUMA[1]),
                      np.float32(kfilter.REC709_LUMA[2]))
        uf = planes["u"].astype(jnp.float32)
        vf_ = planes["v"].astype(jnp.float32)
        out = {}
        for rp in ("e", "o"):
            if rp == "e":
                rows = lambda cf: (0.25 * convert._shift_edge(cf, -2, -1)
                                   + 0.75 * cf)
            else:
                rows = lambda cf: (0.75 * cf
                                   + 0.25 * convert._shift_edge(cf, -2, +1))
            u_r, v_r = rows(uf), rows(vf_)

            def cols(cf):
                return (0.25 * convert._shift_edge(cf, -1, -1) + 0.75 * cf,
                        0.75 * cf + 0.25 * convert._shift_edge(cf, -1, +1))

            u_e, u_o = cols(u_r)
            v_e, v_o = cols(v_r)
            for cp, uu, vv in (("e", u_e, v_e), ("o", u_o, v_o)):
                y = planes[f"y_{rp}{cp}"].astype(jnp.float32)
                r = m[0, 0] * y + m[0, 1] * uu + m[0, 2] * vv + bias[0]
                g = m[1, 0] * y + m[1, 1] * uu + m[1, 2] * vv + bias[1]
                b = m[2, 0] * y + m[2, 1] * uu + m[2, 2] * vv + bias[2]
                # yuv_to_rgb clamp + boundary quantize, 255 scale
                r = jnp.round(jnp.clip(r, 0.0, f255))
                g = jnp.round(jnp.clip(g, 0.0, f255))
                b = jnp.round(jnp.clip(b, 0.0, f255))
                lum = w0 * r + w1 * g + w2 * b
                r = a_coef * r + (k_coef * lum + t)
                g = a_coef * g + (k_coef * lum + t)
                b = a_coef * b + (k_coef * lum + t)
                lo, hi = np.float32(0.0001 * 255.0), f255
                q = tuple(jnp.round(jnp.clip(x, lo, hi)).astype(jnp.uint8)
                          for x in (r, g, b))
                a = jnp.full_like(q[0], 255)
                out[f"w_{rp}{cp}"] = convert.pack_words_u32(
                    (q[0], q[1], q[2], a), VideoFormat.BGRA)
        return out, state

    return quad_step


def quad_planes_from_split(planes):
    """{"y_e","y_o","u","v"} (batch, H, W/2) -> quad layout (numpy)."""
    y_e = np.asarray(planes["y_e"])
    y_o = np.asarray(planes["y_o"])
    return {
        "y_ee": np.ascontiguousarray(y_e[:, 0::2]),
        "y_oe": np.ascontiguousarray(y_e[:, 1::2]),
        "y_eo": np.ascontiguousarray(y_o[:, 0::2]),
        "y_oo": np.ascontiguousarray(y_o[:, 1::2]),
        "u": np.asarray(planes["u"]),
        "v": np.asarray(planes["v"]),
    }


def interleave_cols(w_e, w_o):
    out = np.empty((w_e.shape[0], 2 * w_e.shape[1]), np.uint32)
    out[:, 0::2] = w_e
    out[:, 1::2] = w_o
    return out


def main():
    trace = "--trace" in sys.argv
    label, stepA, state0, params, _mk = C.ALL["headline"]()
    assert getattr(stepA, "source_split", False)
    from __graft_entry__ import _specs

    in_spec, _, _ = _specs(W, H, W, H)
    mi = in_spec.matrix_index
    variants = {
        "B": build_quad_step(mi),
        "B2": build_quad_step_b2(mi),
        "C": build_quad_step_c(mi),
    }

    def make_planes_A(batch):
        return random_planes_for_spec(in_spec, batch, split=True)

    def make_planes_B(batch):
        pls = jax.device_get(make_planes_A(batch))
        return jax.device_put(quad_planes_from_split(pls))

    # ---- parity ----------------------------------------------------------
    pls = jax.device_get(make_planes_A(1))
    one = {k: v[0] for k, v in pls.items()}
    oneB = {k: v[0] for k, v in jax.tree_util.tree_map(
        np.asarray, quad_planes_from_split(pls)).items()}
    dparams = jax.device_put(params)
    dstate = jax.device_put(state0)
    outA, _ = jax.jit(stepA)(jax.device_put(one), dstate, dparams)
    # the shipped chain emits a single stacked plane since round 3f:
    # w_q = quad phases (ee, eo, oe, oo) on the leading axis
    if "w_q" in outA:
        wq = np.asarray(outA["w_q"])
        rows_eA = interleave_cols(wq[0], wq[1])
        rows_oA = interleave_cols(wq[2], wq[3])
        fullA = np.empty((H, W), np.uint32)
        fullA[0::2] = rows_eA
        fullA[1::2] = rows_oA
    elif "w_c" in outA:
        wc = np.asarray(outA["w_c"])
        fullA = interleave_cols(wc[0], wc[1])
    else:
        fullA = interleave_cols(np.asarray(outA["w_e"]),
                                np.asarray(outA["w_o"]))
    oneB_dev = jax.device_put(oneB)
    for vname, stepV in variants.items():
        outB, _ = jax.jit(stepV)(oneB_dev, dstate, dparams)
        rows_e = interleave_cols(np.asarray(outB["w_ee"]),
                                 np.asarray(outB["w_eo"]))
        rows_o = interleave_cols(np.asarray(outB["w_oe"]),
                                 np.asarray(outB["w_oo"]))
        fullB = np.empty_like(fullA)
        fullB[0::2] = rows_e
        fullB[1::2] = rows_o
        ba = fullA.view(np.uint8).astype(np.int16)
        bb = fullB.view(np.uint8).astype(np.int16)
        diff = np.abs(ba - bb)
        print(f"parity {vname} vs A: {(diff > 0).sum()} / {diff.size} "
              f"bytes differ, max {diff.max()} LSB", flush=True)

    if trace:
        import glob
        import gzip
        import json

        def trace_one(name, step, mk):
            planes = jax.tree_util.tree_map(
                lambda v: v[0], jax.device_get(mk(1)))
            dp = jax.device_put(planes)
            fn = jax.jit(step)
            for _ in range(3):
                out, _s = fn(dp, dstate, dparams)
            _ = np.asarray(jax.device_get(
                jax.tree_util.tree_leaves(out)[0]))[:1]
            tdir = f"/tmp/tpuvf-rowphase-{name}"
            os.system(f"rm -rf {tdir}")
            with jax.profiler.trace(tdir):
                for _ in range(20):
                    out, _s = fn(dp, dstate, dparams)
                _ = np.asarray(jax.device_get(
                    jax.tree_util.tree_leaves(out)[0]))[:1]
            files = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
            with gzip.open(files[0], "rt") as fh:
                ev = json.load(fh)["traceEvents"]
            pids = {e["pid"] for e in ev
                    if e.get("ph") == "M" and e.get("name") == "process_name"
                    and "TPU" in str(e.get("args", {}).get("name", ""))}
            per = {}
            for e in ev:
                if e.get("ph") == "X" and e.get("pid") in pids:
                    per[e["name"]] = per.get(e["name"], 0.0) + e["dur"] / 1e3
            print(f"--- {name} ---")
            for k, ms in sorted(per.items(), key=lambda kv: -kv[1])[:12]:
                print(f"{ms / 20 * 1e3:9.1f} us/frame  {k[:100]}")

        trace_one("A", stepA, make_planes_A)
        for vname, stepV in variants.items():
            trace_one(vname, stepV, make_planes_B)
        print("DONE-SENTINEL", flush=True)
        return

    # ---- interleaved A/B fps --------------------------------------------
    for rep in range(3):
        line = []
        ra = measure_fps(stepA, make_planes_A, state0, params)
        line.append(f"A {ra['fps']:8.1f}")
        for vname, stepV in variants.items():
            rv = measure_fps(stepV, make_planes_B, state0, params)
            line.append(f"{vname} {rv['fps']:8.1f}")
        print(f"rep {rep}: " + "   ".join(line), flush=True)
    print("DONE-SENTINEL", flush=True)


if __name__ == "__main__":
    main()
