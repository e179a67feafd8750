"""u8 column interleave/deinterleave strategies at 4K (4 channels).

  stack    -- jnp.stack(..., axis=-1).reshape (current interleave_cols_u8)
  u16bit   -- e | (o << 8) on u16, bitcast_convert_type -> u8, reshape
  deint_slice -- y.reshape(H, W/2, 2)[..., k] (current deinterleave)
  deint_u16   -- bitcast to u16, mask/shift

Run:  JAX_COMPILATION_CACHE_DIR=/tmp/tpuvf-tpu-cache python -u \
        scripts/bench_interleave.py > /tmp/interleave.out 2>&1
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tpuvf-tpu-cache")

import jax
import jax.numpy as jnp
import numpy as np

H, W = 2160, 3840
Wc = W // 2
ITERS = 50

rng = np.random.default_rng(0)
e_host = rng.integers(0, 256, (4, H, Wc), np.uint8)
o_host = rng.integers(0, 256, (4, H, Wc), np.uint8)
full_host = rng.integers(0, 256, (4, H, W), np.uint8)


def il_stack(e, o):
    return jnp.stack([e, o], axis=-1).reshape(e.shape[:-1] + (2 * e.shape[-1],))


def il_u16(e, o):
    x = e.astype(jnp.uint16) | (o.astype(jnp.uint16) << 8)
    b = jax.lax.bitcast_convert_type(x, jnp.uint8)  # (..., Wc, 2)
    return b.reshape(e.shape[:-1] + (2 * e.shape[-1],))


def deint_slice(y):
    p = y.reshape(y.shape[:-1] + (y.shape[-1] // 2, 2))
    return p[..., 0], p[..., 1]


def deint_u16(y):
    p = y.reshape(y.shape[:-1] + (y.shape[-1] // 2, 2))
    x = jax.lax.bitcast_convert_type(p, jnp.uint16)  # (..., Wc)
    return (x & 0xFF).astype(jnp.uint8), (x >> 8).astype(jnp.uint8)


def measure(name, fn, *args):
    args = [jax.device_put(a) for a in args]

    def loop(*a):
        def body(i, acc):
            outs = fn(*[x + i.astype(x.dtype) for x in a])
            if not isinstance(outs, tuple):
                outs = (outs,)
            # full-sum consumption: no slice-of-op DCE ambiguity
            return acc + sum(o.astype(jnp.uint32).sum() for o in outs)
        return jax.lax.fori_loop(0, ITERS, body, jnp.uint32(0))

    jfn = jax.jit(loop)
    np.asarray(jax.device_get(jfn(*args)))
    t0 = time.perf_counter()
    np.asarray(jax.device_get(jfn(*args)))
    wall = time.perf_counter() - t0
    print(f"{name:14s} {wall / ITERS * 1e3:8.3f} ms/it", flush=True)


# correctness first (host)
e0 = jnp.asarray(e_host[:1, :8, :256])
o0 = jnp.asarray(o_host[:1, :8, :256])
assert np.array_equal(np.asarray(il_u16(e0, o0)), np.asarray(il_stack(e0, o0))), \
    "u16 interleave mismatch"
y0 = jnp.asarray(full_host[:1, :8, :256])
a1, b1 = deint_slice(y0)
a2, b2 = deint_u16(y0)
assert np.array_equal(np.asarray(a1), np.asarray(a2))
assert np.array_equal(np.asarray(b1), np.asarray(b2))
print("correctness OK", flush=True)

measure("il_stack", il_stack, e_host, o_host)
measure("il_u16", il_u16, e_host, o_host)
measure("deint_slice", deint_slice, full_host)
measure("deint_u16", deint_u16, full_host)

print("DONE-SENTINEL", flush=True)
