"""Feasibility probes for the Pallas per-tile compositor fold (VERDICT #3).

The round-2 blocker: draw x-offsets are lane-UNALIGNED in phase space
(canvas phase col 960 is not a 128 multiple) and Mosaic HBM slices need
128-lane alignment.  The escape tested here: load the COMPACT source
block lane-aligned at 0 and place it in-kernel with `pltpu.roll` along
the lane axis (a lane rotation Mosaic supports natively), then mask.

Probes (all on a 4K-phase-sized canvas band):
  A. XLA reference: the current u8-canvas DUS blend chain for 4 draws —
     the number to beat (the fold's canvas re-materialization cost).
  B. Pallas band fold: one kernel, grid over 32-row bands, 4 draws
     blended in VMEM with roll placement, canvas written ONCE.
     Sources: premultiplied u16 quant-units (the XLA pre-pass output).
  C. roll-only microbench: lane-roll bandwidth on (32, 1920) f32.

Run: JAX_COMPILATION_CACHE_DIR=/tmp/tpuvf-tpu-cache python -u \
       scripts/bench_comp_pallas.py [cpu] > /tmp/comp_pallas.out 2>&1
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

import jax

if "cpu" in sys.argv[1:]:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/tpuvf-tpu-cache")

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = "cpu" in sys.argv[1:]

# canvas: one 4K column phase (2160, 1920); 4 draws like config 5
CH, CW = 2160, 1920
DRAWS = [
    # (x0_phase, y0, w_phase, h) — the 4 corner pads of config 5 in phase
    (0, 0, 1920, 2160),     # 4K background pad (full canvas)
    (960, 0, 960, 1080),    # 1080p at (1920, 0) -> phase x 960 UNALIGNED
    (0, 1080, 640, 720),    # 720p at (0, 1080)
    (960, 1080, 640, 720),  # 720p at (1920, 1080)
]
BAND = 32
ITERS = 30

rng = np.random.default_rng(0)
SRCS = [rng.integers(0, 65536, (h, w), dtype=np.uint16)
        for (x0, y0, w, h) in DRAWS]
ALPHAS = [rng.integers(0, 65536, (h, w), dtype=np.uint16)
          for (x0, y0, w, h) in DRAWS]
BG = rng.integers(0, 256, (CH, CW), dtype=np.uint8)

INV16 = np.float32(1.0 / 65535.0)
INV8 = np.float32(1.0 / 255.0)


def quant8(x):
    return jnp.round(jnp.clip(x, 0.0, 1.0) * 255.0).astype(jnp.uint8)


def measure(name, fn, *args):
    try:
        args = [jax.device_put(a) for a in args]
        jfn = jax.jit(fn)
        out = jfn(*args)
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]))
        t0 = time.perf_counter()
        np.asarray(jax.device_get(
            jax.tree_util.tree_leaves(jfn(*args))[0]))
        wall = time.perf_counter() - t0
        print(f"{name:28s} {wall / ITERS * 1e3:9.4f} ms/it", flush=True)
    except Exception:
        import traceback

        print(f"{name:28s} FAILED:", flush=True)
        traceback.print_exc(limit=4)


# -- A. XLA DUS chain (the current render_fast_split shape) -----------------

def xla_fold(bg, *planes):
    srcs, alphas = planes[:4], planes[4:]

    def one(i, dst):
        for (x0, y0, w, h), s, a in zip(DRAWS, srcs, alphas):
            sf = s.astype(jnp.float32) * INV16
            af = a.astype(jnp.float32) * INV16
            dv = dst[y0:y0 + h, x0:x0 + w].astype(jnp.float32) * INV8
            blended = sf + dv * (1.0 - af)
            dst = dst.at[y0:y0 + h, x0:x0 + w].set(quant8(blended))
        return dst

    return jax.lax.fori_loop(0, ITERS, one, bg)


measure("A. xla-dus-4draws", xla_fold, BG, *SRCS, *ALPHAS)


# -- B. Pallas band fold ----------------------------------------------------

def pallas_fold(bg, *planes):
    srcs, alphas = planes[:4], planes[4:]
    n_bands = CH // BAND

    def kernel(bg_ref, *refs):
        src_refs = refs[:4]
        a_refs = refs[4:8]
        out_ref = refs[8]
        band0 = pl.program_id(0) * BAND
        dst = bg_ref[:].astype(jnp.float32) * INV8
        col = jax.lax.broadcasted_iota(jnp.int32, (BAND, CW), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (BAND, CW), 0) + band0
        for k, (x0, y0, w, h) in enumerate(DRAWS):
            # source band loaded aligned at lane 0, width padded to CW by
            # the BlockSpec (index_map clamps rows; rows outside the draw
            # masked below)
            sf = src_refs[k][:].astype(jnp.float32) * INV16
            af = a_refs[k][:].astype(jnp.float32) * INV16
            if sf.shape[-1] < CW:
                pad = CW - sf.shape[-1]
                sf = jnp.pad(sf, ((0, 0), (0, pad)))
                af = jnp.pad(af, ((0, 0), (0, pad)))
            if x0:
                sf = pltpu.roll(sf, shift=x0, axis=1)
                af = pltpu.roll(af, shift=x0, axis=1)
            inside = ((col >= x0) & (col < x0 + w)
                      & (row >= y0) & (row < y0 + h))
            af = jnp.where(inside, af, 0.0)
            sf = jnp.where(inside, sf, 0.0)
            blended = sf + dst * (1.0 - af)
            dst = quant8(blended).astype(jnp.float32) * INV8  # per-draw u8
        out_ref[:] = quant8(dst)

    in_specs = [pl.BlockSpec((BAND, CW), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    for (x0, y0, w, h) in DRAWS:
        # band rows [band0, band0+BAND) map to source rows - y0, clamped
        # into range; out-of-range rows are masked in-kernel so the clamp
        # only needs to keep the DMA in bounds
        nb = h // BAND

        def imap(i, y0=y0, nb=nb):
            return (jnp.clip(i - y0 // BAND, 0, nb - 1), 0)

        in_specs.append(pl.BlockSpec((BAND, w), imap,
                                     memory_space=pltpu.VMEM))
    for (x0, y0, w, h) in DRAWS:
        nb = h // BAND

        def imap(i, y0=y0, nb=nb):
            return (jnp.clip(i - y0 // BAND, 0, nb - 1), 0)

        in_specs.append(pl.BlockSpec((BAND, w), imap,
                                     memory_space=pltpu.VMEM))

    fold = pl.pallas_call(
        kernel,
        grid=(n_bands,),
        out_shape=jax.ShapeDtypeStruct((CH, CW), jnp.uint8),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((BAND, CW), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=INTERPRET,
    )

    def one(i, carry):
        # thread the measured op through the carry (loop-invariant bodies
        # get hoisted, CLAUDE.md trap #2)
        bg2 = bg + carry.astype(jnp.uint8)
        out = fold(bg2, *srcs, *alphas)
        return carry + out[0, 0].astype(jnp.int32)

    return jax.lax.fori_loop(0, ITERS, one, jnp.int32(0))


measure("B. pallas-band-fold", pallas_fold, BG, *SRCS, *ALPHAS)


# -- C. roll bandwidth ------------------------------------------------------

def roll_bw(x):
    def kernel(x_ref, out_ref):
        out_ref[:] = pltpu.roll(x_ref[:], shift=960, axis=1)

    roll = pl.pallas_call(
        kernel,
        grid=(CH // BAND,),
        out_shape=jax.ShapeDtypeStruct((CH, CW), jnp.float32),
        in_specs=[pl.BlockSpec((BAND, CW), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BAND, CW), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=INTERPRET,
    )

    def one(i, carry):
        return carry + roll(x + carry)[0, 0]

    return jax.lax.fori_loop(0, ITERS, one, jnp.float32(0))


measure("C. roll-bandwidth-f32", roll_bw,
        rng.random((CH, CW), np.float32))

print("done", flush=True)
