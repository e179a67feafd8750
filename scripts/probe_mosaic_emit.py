"""Mosaic lowering probes for a Pallas quad-emit kernel (round 3e).

The headline emit is VPU-bound on top of a NON-overlapped ~74 us traffic
floor (scripts/probe_vpu_bound.py: full 184 = floor 74 + cs 34 + filter 76,
additive).  A Pallas kernel with pipelined DMA could hide the traffic under
the arithmetic -> ~120 us/frame.  Round-3 blocker: u8<->f32 casts don't
lower in Mosaic.  Probe every escape hatch:

  1. u8 -> f32 direct              (expected FAIL, reconfirm)
  2. u8 -> i32 -> f32 two-step
  3. pltpu.bitcast u8->i8, i8->i32, &0xFF, ->f32
  4. f32 -> u32 (quantize+pack side); f32->i32->u32
  5. jnp.round (round-nearest-even)
  6. u32 shifts/ors (word packing)
  7. pipelined copy bandwidth: u8 in -> u32 out, trivial math, grid over
     row blocks — does Mosaic's auto double-buffering reach ~600 GB/s?

Usage: python -u scripts/probe_mosaic_emit.py
"""

from __future__ import annotations

import functools
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/tpuvf-tpu-cache")

H, W = 1080, 1920


def try_kernel(name, kernel, x, out_shape, expect=None, interpret=False):
    try:
        fn = pl.pallas_call(kernel, out_shape=out_shape)
        res = jax.jit(fn)(x)
        res = np.asarray(jax.device_get(res))
        ok = "OK"
        if expect is not None:
            match = np.allclose(res.astype(np.float64),
                                expect.astype(np.float64), atol=1e-4)
            ok = "OK exact" if match else f"OK BUT WRONG (max diff {np.abs(res.astype(np.float64)-expect.astype(np.float64)).max()})"
        print(f"[{name}] {ok}")
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"[{name}] FAIL: {type(e).__name__}: {msg}")
        return False


def main():
    rng = np.random.default_rng(0)
    x_u8 = rng.integers(0, 256, (H, W), dtype=np.uint8)
    x_f32 = rng.random((H, W), dtype=np.float32) * 255.0

    # 1. u8 -> f32 direct
    def k1(x_ref, o_ref):
        o_ref[:] = x_ref[:].astype(jnp.float32) * (1.0 / 255.0)

    try_kernel("u8->f32 direct", k1, x_u8,
               jax.ShapeDtypeStruct((H, W), jnp.float32),
               expect=x_u8.astype(np.float32) / 255.0)

    # 2. u8 -> i32 -> f32
    def k2(x_ref, o_ref):
        o_ref[:] = x_ref[:].astype(jnp.int32).astype(jnp.float32) * (1.0 / 255.0)

    try_kernel("u8->i32->f32", k2, x_u8,
               jax.ShapeDtypeStruct((H, W), jnp.float32),
               expect=x_u8.astype(np.float32) / 255.0)

    # 2b. u8 -> u16 -> f32
    def k2b(x_ref, o_ref):
        o_ref[:] = x_ref[:].astype(jnp.uint16).astype(jnp.float32)

    try_kernel("u8->u16->f32", k2b, x_u8,
               jax.ShapeDtypeStruct((H, W), jnp.float32),
               expect=x_u8.astype(np.float32))

    # 3. bitcast u8->i8 then widen and mask
    def k3(x_ref, o_ref):
        s = pltpu.bitcast(x_ref[:], jnp.int8)
        w = s.astype(jnp.int32) & 0xFF
        o_ref[:] = w.astype(jnp.float32)

    try_kernel("bitcast i8 ->i32 &0xFF ->f32", k3, x_u8,
               jax.ShapeDtypeStruct((H, W), jnp.float32),
               expect=x_u8.astype(np.float32))

    # 4. f32 -> u32 and f32 -> i32 -> u32
    def k4(x_ref, o_ref):
        o_ref[:] = x_ref[:].astype(jnp.uint32)

    try_kernel("f32->u32", k4, x_f32,
               jax.ShapeDtypeStruct((H, W), jnp.uint32),
               expect=x_f32.astype(np.uint32))

    def k4b(x_ref, o_ref):
        o_ref[:] = x_ref[:].astype(jnp.int32).astype(jnp.uint32)

    try_kernel("f32->i32->u32", k4b, x_f32,
               jax.ShapeDtypeStruct((H, W), jnp.uint32),
               expect=x_f32.astype(np.int32).astype(np.uint32))

    # 5. round-nearest-even
    def k5(x_ref, o_ref):
        o_ref[:] = jnp.round(x_ref[:])

    try_kernel("jnp.round f32", k5, x_f32,
               jax.ShapeDtypeStruct((H, W), jnp.float32),
               expect=np.round(x_f32))

    # 6. u32 shifts/ors
    x_u32 = x_u8.astype(np.uint32)

    def k6(x_ref, o_ref):
        v = x_ref[:]
        o_ref[:] = v | (v << 8) | (v << 16) | jnp.uint32(0xFF000000)

    try_kernel("u32 shift/or", k6, x_u32,
               jax.ShapeDtypeStruct((H, W), jnp.uint32),
               expect=x_u32 | (x_u32 << 8) | (x_u32 << 16) | 0xFF000000)

    # 6b. u8 -> i32 -> f32 mul -> round -> i32 -> u32 pack (full emit chain
    # on one channel)
    def k6b(x_ref, o_ref):
        f = x_ref[:].astype(jnp.int32).astype(jnp.float32) * (1.0 / 255.0)
        f = (f - 0.5) * 1.1 + 0.5
        q = jnp.round(jnp.clip(f, 0.0, 1.0) * 255.0).astype(jnp.int32)
        w = q.astype(jnp.uint32)
        o_ref[:] = w | (w << 8) | (w << 16) | jnp.uint32(0xFF000000)

    ref_f = x_u8.astype(np.float32) / 255.0
    ref_f = (ref_f - 0.5) * np.float32(1.1) + 0.5
    ref_q = np.round(np.clip(ref_f, 0, 1) * 255.0).astype(np.int32).astype(np.uint32)
    try_kernel("full emit chain 1ch", k6b, x_u8,
               jax.ShapeDtypeStruct((H, W), jnp.uint32),
               expect=ref_q | (ref_q << 8) | (ref_q << 16) | 0xFF000000)

    # 7. pipelined bandwidth: 4 u8 planes in -> 2 u32 planes out, row-block
    # grid; measure device time via trace
    BLK = 216  # 1080 / 5

    def k7(a_ref, b_ref, u_ref, v_ref, oe_ref, oo_ref):
        def word(y, c):
            yi = y.astype(jnp.int32).astype(jnp.float32)
            ci = c.astype(jnp.int32).astype(jnp.float32)
            q = jnp.round(yi * 0.5 + ci * 0.5).astype(jnp.int32).astype(jnp.uint32)
            return q | (q << 8) | (q << 16) | jnp.uint32(0xFF000000)

        oe_ref[:] = word(a_ref[:], u_ref[:])
        oo_ref[:] = word(b_ref[:], v_ref[:])

    grid = (H // BLK,)
    spec8 = pl.BlockSpec((BLK, W), lambda i: (i, 0))
    fn7 = pl.pallas_call(
        k7,
        grid=grid,
        in_specs=[spec8, spec8, spec8, spec8],
        out_specs=[pl.BlockSpec((BLK, W), lambda i: (i, 0))] * 2,
        out_shape=[jax.ShapeDtypeStruct((H, W), jnp.uint32)] * 2,
    )
    try:
        ys = [jnp.asarray(rng.integers(0, 256, (H, W), dtype=np.uint8))
              for _ in range(4)]
        jf = jax.jit(lambda a, b, u, v: fn7(a, b, u, v))
        outs = jf(*ys)
        _ = np.asarray(jax.device_get(outs[0]))[:1]
        tdir = "/tmp/tpuvf-mosaic-emit-bw"
        os.system(f"rm -rf {tdir}")
        n = 50
        with jax.profiler.trace(tdir):
            for _ in range(n):
                outs = jf(*ys)
            _ = np.asarray(jax.device_get(outs[0]))[:1]
        files = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
        with gzip.open(files[0], "rt") as fh:
            trace = json.load(fh)
        events = trace["traceEvents"]
        tpu_pids = {
            e["pid"] for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"
            and "TPU" in str(e.get("args", {}).get("name", ""))
        }
        total = sum(e.get("dur", 0) / 1e3 for e in events
                    if e.get("ph") == "X" and e.get("pid") in tpu_pids
                    and not e.get("name", "").startswith("jit_"))
        us = total / n * 1e3
        mb = (4 * H * W * 1 + 2 * H * W * 4) / 1e6
        print(f"[pipelined emit kernel] {us:.1f} us for {mb:.1f} MB "
              f"= {mb / us * 1e3:.0f} GB/s")
    except Exception as e:
        print(f"[pipelined emit kernel] FAIL: {type(e).__name__}: "
              f"{str(e).splitlines()[0][:160]}")

    print("DONE-SENTINEL", flush=True)


if __name__ == "__main__":
    main()
