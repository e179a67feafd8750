"""Scan-output stacking via CARRY accumulation vs scan ys (round 4).

The scan-batched headline trace shows the two ~86 us VPU-bound emit
fusions PLUS a ~50 us/frame fusion that re-writes the (4, H/2, W/2)
w_q stack (the jnp.stack concat materializes, then the scan's ys
stacking consumes it).  Hypothesis: accumulating outputs through the
scan CARRY — a donated (B, 4, H/2, W/2) buffer updated with in-place
dynamic_update_slice — lets XLA root each emit fusion directly in the
batch buffer, eliminating the extra full-frame write:

  A  scan ys (shipped make_batch_fn)
  B  carry DUS of the whole stacked w_q per frame
  C  carry DUS of the two phase-pair halves (slice-of-concat folds
     away, so each or_bitcast emit fusion gets its own DUS root)

All variants compute identical values (asserted).  Interleaved fps
A/B/C per rep (CLAUDE.md: judge scan forms by fps, not trace totals).

Usage: python -u scripts/bench_scan_carry_ab.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/tpuvf-tpu-cache")

W, H = 3840, 2160
BS, BL = 4, 16


def build():
    from __graft_entry__ import _build_chain, _specs

    in_spec, mid_spec, out_spec = _specs(W, H, W, H)
    step, state0, params = _build_chain(
        in_spec, mid_spec, out_spec,
        {"brightness": 0.05, "contrast": 1.1, "saturation": 1.2})
    return step, state0, params, in_spec


def variant_a(step):
    def batch(planes, state, params, buf):
        def body(st, frame):
            out, st2 = step(frame, st, params)
            return st2, out["w_q"]

        st, outs = jax.lax.scan(body, state, planes)
        return outs, st

    return jax.jit(batch)


def variant_carry(step, halves):
    def batch(planes, state, params, buf):
        def body(carry, frame):
            st, b, i = carry
            out, st2 = step(frame, st, params)
            w = out["w_q"]
            if halves:
                b = jax.lax.dynamic_update_slice(
                    b, w[0:2][None], (i, 0, 0, 0))
                b = jax.lax.dynamic_update_slice(
                    b, w[2:4][None], (i, 2, 0, 0))
            else:
                b = jax.lax.dynamic_update_slice(b, w[None], (i, 0, 0, 0))
            return (st2, b, i + 1), ()

        (st, b, _), _ = jax.lax.scan(
            body, (state, buf, jnp.int32(0)), planes)
        return b, st

    return jax.jit(batch, donate_argnums=(3,))


def sync1(x):
    _ = np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:1]))


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    from tpuvf.runtime.benchmark import random_planes_for_spec

    step, state0, params, in_spec = build()
    state = jax.device_put(state0)
    dev_params = jax.device_put(params)
    planes_s = random_planes_for_spec(in_spec, BS, split=step.source_split)
    planes_l = random_planes_for_spec(in_spec, BL, split=step.source_split)

    fns = {
        "A_ys": variant_a(step),
        "B_carry": variant_carry(step, halves=False),
        "C_carry2": variant_carry(step, halves=True),
    }

    def mkbuf(b):
        return jnp.zeros((b, 4, H // 2, W // 2), jnp.uint32)

    # parity: all variants produce identical words (donated bufs are
    # consumed, so make fresh ones per call)
    ref = np.asarray(fns["A_ys"](planes_s, state, dev_params, 0)[0])
    for nm in ("B_carry", "C_carry2"):
        got = np.asarray(fns[nm](planes_s, state, dev_params, mkbuf(BS))[0])
        assert np.array_equal(ref, got), nm
    print("parity: A == B == C bitwise", flush=True)

    # warm the large shapes
    for nm, fn in fns.items():
        buf = mkbuf(BL) if nm != "A_ys" else 0
        sync1(fn(planes_l, state, dev_params, buf)[0])

    # persistent donated buffers: re-donate the RETURNED buffer each call
    # so no realloc/zero-fill is paid in the timed region
    bufs = {nm: (mkbuf(BL), mkbuf(BS)) for nm in ("B_carry", "C_carry2")}

    for r in range(reps):
        line = []
        for nm, fn in fns.items():
            if nm == "A_ys":
                t0 = time.perf_counter()
                sync1(fn(planes_s, state, dev_params, 0)[0])
                ts = time.perf_counter() - t0
                t0 = time.perf_counter()
                sync1(fn(planes_l, state, dev_params, 0)[0])
                tl = time.perf_counter() - t0
            else:
                bl, bs = bufs[nm]
                t0 = time.perf_counter()
                outs = fn(planes_s, state, dev_params, bs)[0]
                sync1(outs)
                ts = time.perf_counter() - t0
                t0 = time.perf_counter()
                outl = fn(planes_l, state, dev_params, bl)[0]
                sync1(outl)
                tl = time.perf_counter() - t0
                bufs[nm] = (outl, outs)
            per = (tl - ts) / (BL - BS)
            fps = 1.0 / per if per > 0 else float("inf")
            line.append(f"{nm} {fps:8.0f} fps ({per * 1e6:6.1f} us/f)")
        print(f"rep{r}: " + "  ".join(line), flush=True)

    print("DONE-SENTINEL", flush=True)


if __name__ == "__main__":
    main()
