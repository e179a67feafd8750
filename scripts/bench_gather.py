"""Measure 3D-LUT gather formulations on the real TPU.

Round-1 finding: XLA row gathers cost ~4 ns/index regardless of row width,
making the 33^3 corner-packed LUT the 1080p videofilter wall (8.4 ms of
9.3 ms).  This sweeps the formulation space:

  xla-rows-f32     current: take((S^3, 24) f32, idx, axis=0)
  xla-rows-bf16    same, bf16 table
  xla-lanes        transposed: take((24, S^3), idx, axis=1) — lane-axis
  xla-lanes-1      payload 1: take((S^3,), idx) scalar rows
  xla-onechan      (S^3, 8) single-channel corners x3 gathers
  pallas-take      jnp.take of a VMEM-resident table inside a kernel
  pallas-lane-gather  tile-local lane dynamic_gather (128-deep shared row)

Usage: python -u scripts/bench_gather.py > /tmp/bench_gather.out 2>&1
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tpuvf-tpu-cache")

import jax
import jax.numpy as jnp
import numpy as np

S = 33
N_CELLS = S ** 3
H, W = 1080, 1920
P = H * W
ITERS = 200

rng = np.random.default_rng(0)
idx_host = rng.integers(0, N_CELLS, (H, W), dtype=np.int32)
table24 = rng.random((N_CELLS, 24), dtype=np.float32)


def measure(name, fn, *args):
    """fori_loop with the gather threaded through the carry (anti-hoist)."""
    try:
        args = [jax.device_put(a) for a in args]

        def body(i, carry):
            out = fn(carry, *args[1:]) if False else None
            return carry

        # thread: perturb idx by carry so the loop body can't be hoisted
        def loop(idx0, *rest):
            def body(i, acc):
                out = fn((idx0 + (i % 2)) % N_CELLS
                         if idx0.dtype == jnp.int32 else idx0, *rest)
                # fold output back into a scalar carry
                return acc + jnp.float32(out.ravel()[0])
            return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

        jfn = jax.jit(loop)
        t0 = time.perf_counter()
        r = jfn(*args)
        np.asarray(jax.device_get(r))
        compile_and_first = time.perf_counter() - t0
        t0 = time.perf_counter()
        r = jfn(*args)
        np.asarray(jax.device_get(r))
        wall = time.perf_counter() - t0
        per_iter_ms = wall / ITERS * 1e3
        ns_per_idx = wall / ITERS / P * 1e9
        print(f"{name:24s} {per_iter_ms:9.3f} ms/frame  {ns_per_idx:7.3f} ns/idx"
              f"   (first call {compile_and_first:.1f}s)", flush=True)
    except Exception as e:
        print(f"{name:24s} FAILED: {type(e).__name__}: {str(e)[:200]}",
              flush=True)


print(f"devices: {jax.devices()}", flush=True)

# 1. current formulation
measure("xla-rows-f32",
        lambda idx, t: jnp.take(t, idx, axis=0),
        idx_host, table24)

# 2. bf16 table
measure("xla-rows-bf16",
        lambda idx, t: jnp.take(t, idx, axis=0),
        idx_host, table24.astype(jnp.bfloat16))

# 3. transposed lane-axis gather
measure("xla-lanes",
        lambda idx, t: jnp.take(t, idx.ravel(), axis=1),
        idx_host, np.ascontiguousarray(table24.T))

# 4. scalar payload
measure("xla-rows-1",
        lambda idx, t: jnp.take(t, idx, axis=0),
        idx_host, table24[:, 0].copy())

# 5. one-channel (8 corners) x1
measure("xla-rows-8",
        lambda idx, t: jnp.take(t, idx, axis=0),
        idx_host, np.ascontiguousarray(table24[:, :8]))

# 6. pallas VMEM-table take
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pallas_take24(idx, table):
    def kernel(idx_ref, tab_ref, out_ref):
        out_ref[:] = jnp.take(tab_ref[:], idx_ref[:].ravel(), axis=0).reshape(
            out_ref.shape)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((idx.shape[0] * idx.shape[1], 24),
                                       jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(idx, table)


measure("pallas-take-full", _pallas_take24, idx_host[:128], table24)


def _pallas_take_tiled(idx, table):
    """Grid over row tiles; table replicated to every program."""
    TH = 8

    def kernel(idx_ref, tab_ref, out_ref):
        out_ref[:] = jnp.take(tab_ref[:], idx_ref[:].ravel(), axis=0).reshape(
            out_ref.shape)

    return pl.pallas_call(
        kernel,
        grid=(idx.shape[0] // TH,),
        out_shape=jax.ShapeDtypeStruct((idx.shape[0], W // 128, 128, 24),
                                       jnp.float32),
        in_specs=[
            pl.BlockSpec((TH, W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_CELLS, 24), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TH, W // 128, 128, 24),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )(idx, table)


measure("pallas-take-tiled", _pallas_take_tiled, idx_host, table24)


# 7. tile-local lane dynamic_gather probe: shared 128-entry row
def _pallas_lane128(idx, table):
    """out[i,j] = row[idx[i,j]] with row 128 wide, via take_along_axis."""
    def kernel(idx_ref, tab_ref, out_ref):
        row = tab_ref[:]  # (8, 128) broadcast row block
        idxs = idx_ref[:] % 128
        big = jnp.broadcast_to(row[:1, :], idxs.shape)
        out_ref[:] = jnp.take_along_axis(big, idxs, axis=1)

    return pl.pallas_call(
        kernel,
        grid=(idx.shape[0] // 8,),
        out_shape=jax.ShapeDtypeStruct(idx.shape, jnp.float32),
        in_specs=[
            pl.BlockSpec((8, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(idx, table)


measure("pallas-lane128", _pallas_lane128, idx_host,
        np.ascontiguousarray(table24[:8, :128] * 0 +
                             rng.random((8, 128), dtype=np.float32)))


# 8. sublane dynamic_gather probe: 8-deep shared table
def _pallas_sub8(idx, table):
    def kernel(idx_ref, tab_ref, out_ref):
        idxs = idx_ref[:] % 8
        op = jnp.broadcast_to(tab_ref[:], idxs.shape + ())  # (8, W)
        # gather along sublanes: out[i,j] = tab[idx[i,j], j]
        out_ref[:] = jnp.take_along_axis(tab_ref[:][:, :idxs.shape[1]],
                                         idxs, axis=0)

    return pl.pallas_call(
        kernel,
        grid=(idx.shape[0] // 8,),
        out_shape=jax.ShapeDtypeStruct(idx.shape, jnp.float32),
        in_specs=[
            pl.BlockSpec((8, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(idx, table)


measure("pallas-sublane8", _pallas_sub8, idx_host,
        rng.random((8, W), dtype=np.float32))

print("done", flush=True)
