"""Load-pattern probe: same 33 MB of bytes, loaded as u8 / u16 / u32 / f32.

Each variant computes an f32 sum of all bytes (widening fused), ITERS x.

Run:  JAX_COMPILATION_CACHE_DIR=/tmp/tpuvf-tpu-cache python -u \
        scripts/bench_loads.py > /tmp/loads.out 2>&1
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tpuvf-tpu-cache")

import jax
import jax.numpy as jnp
import numpy as np

H, W = 2160, 3840 * 4  # 33 MB of bytes
ITERS = 50

rng = np.random.default_rng(0)
y8 = rng.integers(0, 256, (H, W), np.uint8)
y16 = y8.view(np.uint16)
y32 = y8.view(np.uint32)
yf = y8.astype(np.float32)


def s_u8(x):
    return (x.astype(jnp.float32) * (1 / 255.0)).sum()


def s_u16(x):
    e = (x & 0xFF).astype(jnp.float32)
    o = (x >> 8).astype(jnp.float32)
    return ((e + o) * (1 / 255.0)).sum()


def s_u32(x):
    a = (x & 0xFF).astype(jnp.float32)
    b = ((x >> 8) & 0xFF).astype(jnp.float32)
    c = ((x >> 16) & 0xFF).astype(jnp.float32)
    d = (x >> 24).astype(jnp.float32)
    return ((a + b + c + d) * (1 / 255.0)).sum()


def s_f32(x):
    return (x * (1 / 255.0)).sum()


def measure(name, fn, arr, nbytes):
    arr = jax.device_put(arr)

    def loop(a):
        def body(i, acc):
            return acc + fn(a + i.astype(a.dtype))
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

    jfn = jax.jit(loop)
    np.asarray(jax.device_get(jfn(arr)))
    t0 = time.perf_counter()
    np.asarray(jax.device_get(jfn(arr)))
    wall = time.perf_counter() - t0
    ms = wall / ITERS * 1e3
    print(f"{name:8s} {ms:8.3f} ms/it  {nbytes / (wall / ITERS) / 1e9:7.1f} GB/s",
          flush=True)


nb = y8.nbytes
measure("u8", s_u8, y8, nb)
measure("u16", s_u16, y16, nb)
measure("u32", s_u32, y32, nb)
measure("f32", s_f32, yf, yf.nbytes)

print("DONE-SENTINEL", flush=True)
