"""Transposed-gather rate probe (round 2): bf16/f32 table, flat indices,
FULL-sum consumption (no ravel[0] DCE ambiguity), 1/2/4 overlapped sites.

Run:  JAX_COMPILATION_CACHE_DIR=/tmp/tpuvf-tpu-cache python -u \
        scripts/bench_gather5.py > /tmp/gather5.out 2>&1
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tpuvf-tpu-cache")

import jax
import jax.numpy as jnp
import numpy as np

S = 33
N_CELLS = S ** 3
P = 1080 * 1920
ITERS = 100

rng = np.random.default_rng(0)
idx_host = rng.integers(0, N_CELLS, (P,), dtype=np.int32)


def gather_t(tab, idx):
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(0,), collapsed_slice_dims=(0,), start_index_map=(0,))
    return jax.lax.gather(
        tab, idx[:, None], dn, slice_sizes=(1, tab.shape[1]),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)


def measure(name, sites, tab):
    idx = jax.device_put(idx_host)
    tab = jax.device_put(tab)
    q = P // sites

    def loop(idx, tab):
        def body(i, acc):
            shift = i % 3
            outs = [
                gather_t(tab, (idx[k * q:(k + 1) * q] + shift) % N_CELLS)
                for k in range(sites)
            ]
            # full-sum consumption: every gathered byte feeds the result
            s = sum(o.astype(jnp.float32).sum() for o in outs)
            return acc + s

        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

    jfn = jax.jit(loop)
    np.asarray(jax.device_get(jfn(idx, tab)))  # compile
    t0 = time.perf_counter()
    np.asarray(jax.device_get(jfn(idx, tab)))
    wall = time.perf_counter() - t0
    print(f"{name:24s} {wall / ITERS * 1e3:8.3f} ms/it  "
          f"{wall / ITERS / P * 1e9:6.3f} ns/idx", flush=True)


tab_f32 = rng.random((N_CELLS, 24), dtype=np.float32)
tab_bf16 = jnp.asarray(tab_f32).astype(jnp.bfloat16)

for sites in (1, 2, 4):
    measure(f"bf16 x{sites}", sites, tab_bf16)
for sites in (1, 2):
    measure(f"f32  x{sites}", sites, tab_f32)

# sum-only floor: same loop shape without the gather
def floor_loop(idx, tab):
    def body(i, acc):
        return acc + (idx[:1] + i).astype(jnp.float32).sum()
    return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

idx = jax.device_put(idx_host)
jfn = jax.jit(floor_loop)
np.asarray(jax.device_get(jfn(idx, tab_bf16)))
t0 = time.perf_counter()
np.asarray(jax.device_get(jfn(idx, tab_bf16)))
print(f"{'loop floor':24s} {(time.perf_counter()-t0)/ITERS*1e3:8.3f} ms/it",
      flush=True)

print("DONE-SENTINEL", flush=True)
