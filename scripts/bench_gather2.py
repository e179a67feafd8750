"""Gather probes round 2: tile-local rates, in-bounds promise, overlap."""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tpuvf-tpu-cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S = 33
N_CELLS = S ** 3
H, W = 1080, 1920
P = H * W
ITERS = 200

rng = np.random.default_rng(0)
idx_host = rng.integers(0, N_CELLS, (H, W), dtype=np.int32)
table24 = rng.random((N_CELLS, 24), dtype=np.float32)


def measure(name, fn, *args):
    try:
        args = [jax.device_put(a) for a in args]

        def loop(idx0, *rest):
            def body(i, acc):
                out = fn((idx0 + (i % 2)) % N_CELLS
                         if idx0.dtype in (jnp.int32, jnp.uint32) else idx0,
                         *rest)
                return acc + jnp.float32(out.ravel()[0])
            return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

        jfn = jax.jit(loop)
        t0 = time.perf_counter()
        np.asarray(jax.device_get(jfn(*args)))
        first = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(jax.device_get(jfn(*args)))
        wall = time.perf_counter() - t0
        print(f"{name:28s} {wall / ITERS * 1e3:9.3f} ms/it  "
              f"{wall / ITERS / P * 1e9:7.3f} ns/idx  (first {first:.1f}s)",
              flush=True)
    except Exception as e:
        print(f"{name:28s} FAILED: {type(e).__name__}: {str(e)[:160]}",
              flush=True)


print(f"devices: {jax.devices()}", flush=True)

# A. gather with PROMISE_IN_BOUNDS (no clip lowering)
def gather_promise(idx, t):
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0,),
        start_index_map=(0,))
    return jax.lax.gather(
        t, idx.ravel()[:, None], dnums, slice_sizes=(1, 24),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)


measure("gather-promise-inbounds", gather_promise, idx_host, table24)

# B. two half gathers (overlap test)
def gather_split(idx, t):
    flat = idx.ravel()
    a = jnp.take(t, flat[:P // 2], axis=0)
    b = jnp.take(t, flat[P // 2:], axis=0)
    return a + b  # force both


measure("gather-2-split", gather_split, idx_host, table24)


def gather_4split(idx, t):
    flat = idx.ravel()
    q = P // 4
    outs = [jnp.take(t, flat[i * q:(i + 1) * q], axis=0) for i in range(4)]
    return sum(outs)


measure("gather-4-split", gather_4split, idx_host, table24)

# C. table-size scaling
for s in (9, 17, 33, 64):
    n = s ** 3
    tab = rng.random((n, 24), dtype=np.float32)
    idxs = rng.integers(0, n, (H, W), dtype=np.int32)

    def g(idx, t=None, _tab=None):
        return None

    def gg(idx, t):
        return jnp.take(t, idx, axis=0)

    # rebind measure loop modulo
    def measure_s(name, idx0, tab):
        try:
            idx0 = jax.device_put(idx0)
            tab = jax.device_put(tab)

            def loop(idx0, tab):
                def body(i, acc):
                    out = jnp.take(tab, (idx0 + (i % 2)) % n, axis=0)
                    return acc + jnp.float32(out.ravel()[0])
                return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

            jfn = jax.jit(loop)
            np.asarray(jax.device_get(jfn(idx0, tab)))
            t0 = time.perf_counter()
            np.asarray(jax.device_get(jfn(idx0, tab)))
            wall = time.perf_counter() - t0
            print(f"{name:28s} {wall / ITERS * 1e3:9.3f} ms/it  "
                  f"{wall / ITERS / P * 1e9:7.3f} ns/idx", flush=True)
        except Exception as e:
            print(f"{name:28s} FAILED: {str(e)[:120]}", flush=True)

    measure_s(f"gather-table-{s}^3", idxs, tab)

# D. tile-local lane gather rate (128-entry row lookup, vectorized?)
def pallas_lane_gather(idx, row):
    def kernel(idx_ref, row_ref, out_ref):
        idxs = jnp.remainder(idx_ref[:], 128)
        big = jnp.broadcast_to(row_ref[0:1, :], idxs.shape)
        out_ref[:] = jnp.take_along_axis(big, idxs, axis=1)

    return pl.pallas_call(
        kernel,
        grid=(idx.shape[0] // 8,),
        out_shape=jax.ShapeDtypeStruct(idx.shape, jnp.float32),
        in_specs=[
            pl.BlockSpec((8, idx.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, idx.shape[1]), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(idx, row)


measure("pallas-lane-gather-128", pallas_lane_gather, idx_host,
        rng.random((1, 128), dtype=np.float32))


# E. tile-local sublane gather (8-deep)
def pallas_sublane_gather(idx, tab):
    def kernel(idx_ref, tab_ref, out_ref):
        idxs = jnp.remainder(idx_ref[:], 8)
        out_ref[:] = jnp.take_along_axis(tab_ref[:], idxs, axis=0)

    return pl.pallas_call(
        kernel,
        grid=(idx.shape[0] // 8,),
        out_shape=jax.ShapeDtypeStruct(idx.shape, jnp.float32),
        in_specs=[
            pl.BlockSpec((8, idx.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, idx.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, idx.shape[1]), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(idx, tab)


measure("pallas-sublane-gather-8", pallas_sublane_gather, idx_host,
        rng.random((8, W), dtype=np.float32))


# F. deep VMEM take_along_axis: operand (D, W) shared, idx (8, W), axis 0
#    — does Mosaic lower depth > 8 sublane gathers?
def pallas_deep_gather(idx, tab):
    D = tab.shape[0]

    def kernel(idx_ref, tab_ref, out_ref):
        idxs = jnp.remainder(idx_ref[:], D)
        # broadcast-gather: take_along_axis wants matching shapes; try the
        # (D, W) operand with (8, W) indices anyway
        out_ref[:] = jnp.take_along_axis(tab_ref[:], idxs, axis=0)

    return pl.pallas_call(
        kernel,
        grid=(idx.shape[0] // 8,),
        out_shape=jax.ShapeDtypeStruct(idx.shape, jnp.float32),
        in_specs=[
            pl.BlockSpec((8, idx.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tab.shape[0], idx.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, idx.shape[1]), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(idx, tab)


for depth in (32, 128, 1024):
    measure(f"pallas-deep-gather-{depth}", pallas_deep_gather, idx_host,
            rng.random((depth, W), dtype=np.float32))

print("done", flush=True)
