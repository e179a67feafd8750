"""Round-3 adversarial attempt at the 2 ns/idx LUT gather wall (VERDICT #2).

Question: can a Pallas/Mosaic kernel gather from the 35,937-row corner
table faster than XLA's ~2.0 ns/idx (honest full-sum consumption,
bench_gather5.py)?  Probes:

  A. XLA jnp.take baseline on the real table shape (36k x 24 u8) — the
     number to beat.
  B. Pallas jnp.take with the WHOLE table VMEM-resident, per-tile index
     blocks — does Mosaic lower a deep dynamic gather at all, and at what
     rate?  (round 2: deep take_along_axis failed to lower; jnp.take with
     flat indices is the remaining untried lowering)
  C. Pallas two-level: sublane take_along_axis among 8 rows AFTER an XLA
     pre-gather of the 8-row neighborhood — measures whether the 0.083
     ns/idx tile-local rate composes (it cannot beat A if the pre-gather
     itself pays 2 ns/idx, but measures the compose overhead).
  D. Pallas per-index dynamic-slice loop (the only guaranteed-to-lower
     form) — documents the scalar-loop rate.

Usage: python -u scripts/bench_gather6.py [cpu]
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S = 33
ROWS = S * S * S  # 35,937
ROWS_PAD = 36864  # pad to a multiple of 1024 for clean tiling
PAYLOAD = 24
N = 1 << 20  # 1M indices per call (about one 1080p phase)
ITERS = 50

rng = np.random.default_rng(0)
TAB_U8 = rng.integers(0, 256, (ROWS_PAD, PAYLOAD), dtype=np.uint8)
IDX = rng.integers(0, ROWS, (N,), dtype=np.int32)


def measure(name, fn, *args):
    try:
        args = [jax.device_put(a) for a in args]
        jfn = jax.jit(fn)
        out = jfn(*args)
        np.asarray(jax.device_get(out))  # force completion (axon no-op blk)
        t0 = time.perf_counter()
        np.asarray(jax.device_get(jfn(*args)))
        wall = time.perf_counter() - t0
        per_idx = wall / ITERS / N * 1e9
        print(f"{name:32s} {wall / ITERS * 1e3:9.3f} ms/it  "
              f"{per_idx:7.3f} ns/idx", flush=True)
    except Exception as e:
        import traceback; print(f"{name:32s} FAILED:", flush=True); traceback.print_exc(limit=3)


# -- A. XLA baseline: full-sum consumption, gather threaded through carry ---

def xla_take(idx, tab):
    def body(i, acc):
        rows = jnp.take(tab, (idx + i) % ROWS, axis=0)  # (N, 24) u8
        return acc + rows.astype(jnp.float32).sum()

    return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))


measure("A. xla-take-36k-u8x24", xla_take, IDX, TAB_U8)


# -- B. Pallas whole-table VMEM gather via jnp.take -------------------------

TILE = 1024  # indices per grid step


def pallas_take(idx, tab):
    def kernel(idx_ref, tab_ref, out_ref):
        # Mosaic's gather lowering requires operand/index shape agreement;
        # try the broadcast-index form: idx (TILE, 24) columns identical
        flat = idx_ref[:].reshape(-1, 1)
        idx2 = jnp.broadcast_to(flat, (TILE, PAYLOAD))
        rows = jnp.take_along_axis(tab_ref[:], idx2, axis=0)  # (TILE, 24)
        out_ref[:] = rows.astype(jnp.float32).sum(axis=-1).reshape(8, 128)

    return pl.pallas_call(
        kernel,
        grid=(N // TILE,),
        out_shape=jax.ShapeDtypeStruct((N // TILE * 8, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec((8, TILE // 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS_PAD, PAYLOAD), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(idx.reshape(N // TILE * 8, TILE // 8), tab)


def pallas_take_loop(idx, tab):
    def body(i, acc):
        return acc + pallas_take((idx + i) % ROWS, tab).sum()

    return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))


measure("B. pallas-take-36k-vmem", pallas_take_loop, IDX, TAB_U8)


# -- D. per-index dynamic-slice loop (guaranteed lowering, expected slow) ---

def pallas_dynslice(idx, tab):
    K = 128  # only gather 128 of TILE indices per tile — it's a rate probe

    def kernel(idx_ref, tab_ref, out_ref):
        def body(j, acc):
            row = tab_ref[pl.ds(idx_ref[0, j], 1), :]  # (1, 24)
            return acc + row.astype(jnp.int32).astype(jnp.float32).sum()

        out_ref[:] = jnp.full((8, 128), jax.lax.fori_loop(
            0, K, body, jnp.float32(0)))

    return pl.pallas_call(
        kernel,
        grid=(N // TILE,),
        out_shape=jax.ShapeDtypeStruct((N // TILE * 8, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec((8, TILE // 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS_PAD, PAYLOAD), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(idx.reshape(N // TILE * 8, TILE // 8), tab)


def pallas_dynslice_loop(idx, tab):
    def body(i, acc):
        return acc + pallas_dynslice((idx + i) % ROWS, tab).sum()

    return jax.lax.fori_loop(0, 4, body, jnp.float32(0))


def measure_d(name):
    # different iter count + only K/TILE coverage: report ns per GATHERED idx
    try:
        idxd = jax.device_put(IDX)
        tabd = jax.device_put(TAB_U8)
        jfn = jax.jit(pallas_dynslice_loop)
        np.asarray(jax.device_get(jfn(idxd, tabd)))
        t0 = time.perf_counter()
        np.asarray(jax.device_get(jfn(idxd, tabd)))
        wall = time.perf_counter() - t0
        gathered = 4 * (N // TILE) * 128
        print(f"{name:32s} {wall / 4 * 1e3:9.3f} ms/it  "
              f"{wall / gathered * 1e9:7.3f} ns/idx", flush=True)
    except Exception as e:
        import traceback; print(f"{name:32s} FAILED:", flush=True); traceback.print_exc(limit=3)


measure_d("D. pallas-dynslice-scalar")

print("done", flush=True)
