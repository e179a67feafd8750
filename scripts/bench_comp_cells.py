"""Cell-partition compositor spike (VERDICT #3, pure XLA).

The Pallas per-tile fold is dead on this toolchain (bench_comp_pallas.py:
Mosaic refuses u8<->f32 casts in-kernel and pltpu.roll runs ~30 GB/s).
The XLA alternative: at BAKED geometry the draw rects are static, so
partition the canvas into the rect grid induced by all draw edges and
compute each cell as ONE fused expression — the blend fold of its
covering draws reading compact source slices — assembled with
concatenate.  The canvas is written once; no DUS chain, no canvas
re-reads between draws.

Compares (one u8 canvas plane, config-5-like geometry, per phase):
  A. sequential DUS fold (the current render_fast_split shape)
  B. cell-partition concat assembly
  C. B but emitting u16 packed words directly (both phases -> edge)

Run: JAX_COMPILATION_CACHE_DIR=/tmp/tpuvf-tpu-cache python -u \
       scripts/bench_comp_cells.py [cpu] > /tmp/comp_cells.out 2>&1
"""

from __future__ import annotations

import sys
import time

import numpy as np

import jax

if "cpu" in sys.argv[1:]:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/tpuvf-tpu-cache")

import jax.numpy as jnp

CH, CW = 2160, 1920  # one 4K column phase
# (x0, y0, w, h) in phase space — config-5-like: full-canvas pad + corners
DRAWS = [
    (0, 0, 1920, 2160),
    (960, 0, 960, 1080),
    (0, 1080, 640, 720),
    (960, 1080, 640, 720),
]
ITERS = 30

rng = np.random.default_rng(0)
SRC = [rng.integers(0, 256, (h, w), dtype=np.uint8)
       for (x, y, w, h) in DRAWS]
ALPHA = [np.float32(a) for a in (1.0, 0.8, 0.7, 0.6)]
BG = rng.integers(0, 256, (CH, CW), dtype=np.uint8)

INV8 = np.float32(1.0 / 255.0)


def dq(x):
    return x.astype(jnp.float32) * INV8


def q8(x):
    return jnp.round(jnp.clip(x, 0.0, 1.0) * 255.0).astype(jnp.uint8)


def measure(name, fn, *args):
    try:
        args = [jax.device_put(a) for a in args]
        jfn = jax.jit(fn)
        np.asarray(jax.device_get(jfn(*args)))
        t0 = time.perf_counter()
        np.asarray(jax.device_get(jfn(*args)))
        wall = time.perf_counter() - t0
        print(f"{name:28s} {wall / ITERS * 1e3:9.4f} ms/it", flush=True)
    except Exception:
        import traceback

        print(f"{name:28s} FAILED:", flush=True)
        traceback.print_exc(limit=4)


# -- A. sequential DUS fold -------------------------------------------------

def seq_fold_once(bg, srcs):
    dst = bg
    for (x, y, w, h), s, a in zip(DRAWS, srcs, ALPHA):
        sf = dq(s) * a  # "premultiplied" stand-in
        dv = dq(dst[y:y + h, x:x + w])
        dst = dst.at[y:y + h, x:x + w].set(q8(sf + dv * (1.0 - a)))
    return dst


def seq_fold(bg, *srcs):
    def body(i, carry):
        return seq_fold_once(bg + carry.astype(jnp.uint8) * 0 + (i % 2),
                             srcs)

    return jax.lax.fori_loop(0, ITERS, body, bg)


measure("A. seq-dus-fold", seq_fold, BG, *SRC)


# -- B. cell partition ------------------------------------------------------

def make_cells():
    xs = sorted({0, CW} | {x for (x, y, w, h) in DRAWS}
                | {x + w for (x, y, w, h) in DRAWS})
    ys = sorted({0, CH} | {y for (x, y, w, h) in DRAWS}
                | {y + h for (x, y, w, h) in DRAWS})
    xs = [x for x in xs if 0 <= x <= CW]
    ys = [y for y in ys if 0 <= y <= CH]
    cells = []
    for yi in range(len(ys) - 1):
        row = []
        for xi in range(len(xs) - 1):
            cx0, cx1 = xs[xi], xs[xi + 1]
            cy0, cy1 = ys[yi], ys[yi + 1]
            covering = [
                k for k, (x, y, w, h) in enumerate(DRAWS)
                if x <= cx0 and cx1 <= x + w and y <= cy0 and cy1 <= y + h
            ]
            row.append((cx0, cx1, cy0, cy1, covering))
        cells.append(row)
    return cells


CELLS = make_cells()


def cell_fold_once(bg, srcs):
    rows = []
    for row in CELLS:
        cols = []
        for (cx0, cx1, cy0, cy1, covering) in row:
            v = dq(bg[cy0:cy1, cx0:cx1])
            for k in covering:
                x, y, w, h = DRAWS[k]
                s = dq(srcs[k][cy0 - y:cy1 - y, cx0 - x:cx1 - x]) * ALPHA[k]
                v = dq(q8(s + v * (1.0 - ALPHA[k])))
            cols.append(q8(v))
        rows.append(jnp.concatenate(cols, axis=1) if len(cols) > 1
                    else cols[0])
    return jnp.concatenate(rows, axis=0) if len(rows) > 1 else rows[0]


def cell_fold(bg, *srcs):
    def body(i, carry):
        return cell_fold_once(bg + carry * 0 + (i % 2).astype(jnp.uint8),
                              srcs)

    return jax.lax.fori_loop(0, ITERS, body, bg)


measure("B. cell-concat-fold", cell_fold, BG, *SRC)


# -- C. cell fold emitting u16 packed words (simulating the edge) ----------

def cell_fold_u16(bg, *srcs):
    def once(bg):
        rows = []
        for row in CELLS:
            cols = []
            for (cx0, cx1, cy0, cy1, covering) in row:
                v = dq(bg[cy0:cy1, cx0:cx1])
                for k in covering:
                    x, y, w, h = DRAWS[k]
                    s = dq(srcs[k][cy0 - y:cy1 - y, cx0 - x:cx1 - x]) \
                        * ALPHA[k]
                    v = dq(q8(s + v * (1.0 - ALPHA[k])))
                e = q8(v)
                # both phases stand-in: e | (e+1) << 8
                cols.append(e.astype(jnp.uint16)
                            | ((e + jnp.uint8(1)).astype(jnp.uint16) << 8))
            rows.append(jnp.concatenate(cols, axis=1) if len(cols) > 1
                        else cols[0])
        return jnp.concatenate(rows, axis=0) if len(rows) > 1 else rows[0]

    def body(i, carry):
        return once(bg + (carry[0, 0] % 2).astype(jnp.uint8))

    out = jax.lax.fori_loop(
        0, ITERS, body,
        jnp.zeros((CH, CW), jnp.uint16))
    return out


measure("C. cell-fold-packed16", cell_fold_u16, BG, *SRC)


# correctness: B == A (same per-pixel op sequence)
a = np.asarray(jax.jit(lambda bg, *s: seq_fold_once(bg, s))(
    jax.device_put(BG), *[jax.device_put(s) for s in SRC]))
b = np.asarray(jax.jit(lambda bg, *s: cell_fold_once(bg, s))(
    jax.device_put(BG), *[jax.device_put(s) for s in SRC]))
print("A==B bitwise:", bool(np.array_equal(a, b)), flush=True)

print("done", flush=True)
