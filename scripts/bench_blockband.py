"""Block-banded sampling matmul probe (round 3).

Config 1 (NV12 1080p -> BGRA 640x480) spends ~100 of its 139 us/frame in
DENSE sampling matmuls whose weight matrices are 2-tap banded:
  - chroma ROWS  (540 -> 480, 960 wide, x2 planes): the Pallas banded
    kernel is gated on in_size % 8 == 0, so 540 falls back to dense
    (~20 us each, device profile scripts/profile_config.py convertscale)
  - ALL COLUMNS (1920 -> 640 luma, 960 -> 640 chroma x2): columns always
    run dense on the MXU (~60 us total)
A banded weight matrix is mostly exact zeros; slicing tiles of output
columns/rows down to each tile's nonzero input span drops the dead MACs
with BITWISE-identical results (adding f32 zeros is exact).

Measures dense vs block-banded (tile 128) for both shapes, plus the
row-padded Pallas banded variant for the 540-row chroma case.

Run: JAX_COMPILATION_CACHE_DIR=/tmp/tpuvf-tpu-cache python -u \
       scripts/bench_blockband.py > /tmp/blockband.out 2>&1
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tpuvf-tpu-cache")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tpuvf.kernels import sample

N_LO, N_HI = 100, 400


def col_matrix(in_w, out_w):
    t = sample.texcoords(out_w, 1.0)
    return sample.sample_matrix(t, in_w, "linear", None)  # (out, in)


def tile_plan(w, tile):
    """Static per-tile nonzero input spans of a banded (out, in) matrix."""
    out_n = w.shape[0]
    plan = []
    for o0 in range(0, out_n, tile):
        blk = w[o0:o0 + tile]
        nz = np.nonzero(blk.any(axis=0))[0]
        lo, hi = int(nz.min()), int(nz.max()) + 1
        plan.append((o0, min(o0 + tile, out_n), lo, hi))
    return plan


def measure(name, fn, *args):
    """Two-N slope: cancels the ~35 ms fixed tunnel cost per dispatch."""
    jlo = jax.jit(lambda *a: fn(N_LO, *a))
    jhi = jax.jit(lambda *a: fn(N_HI, *a))
    np.asarray(jax.device_get(jlo(*args)))
    np.asarray(jax.device_get(jhi(*args)))
    best = []
    for _ in range(3):
        t0 = time.perf_counter(); np.asarray(jax.device_get(jlo(*args)))
        lo = time.perf_counter() - t0
        t0 = time.perf_counter(); np.asarray(jax.device_get(jhi(*args)))
        hi = time.perf_counter() - t0
        best.append((hi - lo) / (N_HI - N_LO))
    per = min(best)
    print(f"{name:34s} {per * 1e6:9.2f} us/it  (3 reps: "
          + ", ".join(f"{b*1e6:.1f}" for b in best) + ")", flush=True)
    return jlo


def check_bitwise(name, a, b):
    a, b = np.asarray(a), np.asarray(b)
    same = (a == b).all()
    print(f"{name:34s} bitwise-equal: {bool(same)}"
          + ("" if same else f"  max|d|={np.abs(a-b).max()}"), flush=True)


def bench_cols(H, in_w, out_w):
    print(f"--- columns ({H}, {in_w}) -> ({H}, {out_w}) ---")
    rng = np.random.default_rng(0)
    img = jax.device_put(rng.random((H, in_w), dtype=np.float32))
    w = col_matrix(in_w, out_w)
    wm = jax.device_put(jnp.asarray(w))
    plan = tile_plan(w, 128)
    spans = [(hi - lo) for (_, _, lo, hi) in plan]
    print(f"  tiles: {len(plan)}, spans {spans}")

    def dense(n, img, wm):
        def body(i, acc):
            x = img + acc[0, 0] * np.float32(1e-30)  # thread the carry
            return jnp.einsum("hw,ow->ho", x, wm,
                              preferred_element_type=jnp.float32,
                              precision=sample.MATMUL_PRECISION)
        return jax.lax.fori_loop(0, n, body,
                                 jnp.zeros((H, out_w), jnp.float32))

    def blocked(n, img, wm):
        def body(i, acc):
            x = img + acc[0, 0] * np.float32(1e-30)
            outs = [
                jnp.einsum(
                    "hw,ow->ho",
                    jax.lax.slice_in_dim(x, lo, hi, axis=1),
                    jax.lax.slice(wm, (o0, lo), (o1, hi)),
                    preferred_element_type=jnp.float32,
                    precision=sample.MATMUL_PRECISION)
                for (o0, o1, lo, hi) in plan
            ]
            return jnp.concatenate(outs, axis=1)
        return jax.lax.fori_loop(0, n, body,
                                 jnp.zeros((H, out_w), jnp.float32))

    fd = measure("dense cols", dense, img, wm)
    fb = measure("blocked cols", blocked, img, wm)
    check_bitwise("blocked vs dense", fd(img, wm), fb(img, wm))


def bench_rows(in_h, out_h, W):
    print(f"--- rows ({in_h}, {W}) -> ({out_h}, {W}) ---")
    rng = np.random.default_rng(0)
    img = jax.device_put(rng.random((in_h, W), dtype=np.float32))
    w = col_matrix(in_h, out_h)  # (out_h, in_h)
    wm = jax.device_put(jnp.asarray(w))
    plan = tile_plan(w, 128)
    print(f"  tiles: {len(plan)}, spans {[(hi - lo) for (_,_,lo,hi) in plan]}")

    def dense(n, img, wm):
        def body(i, acc):
            x = img + acc[0, 0] * np.float32(1e-30)
            return jnp.einsum("oh,hw->ow", wm, x,
                              preferred_element_type=jnp.float32,
                              precision=sample.MATMUL_PRECISION)
        return jax.lax.fori_loop(0, n, body,
                                 jnp.zeros((out_h, W), jnp.float32))

    def blocked(n, img, wm):
        def body(i, acc):
            x = img + acc[0, 0] * np.float32(1e-30)
            outs = [
                jnp.einsum(
                    "oh,hw->ow",
                    jax.lax.slice(wm, (o0, lo), (o1, hi)),
                    jax.lax.slice_in_dim(x, lo, hi, axis=0),
                    preferred_element_type=jnp.float32,
                    precision=sample.MATMUL_PRECISION)
                for (o0, o1, lo, hi) in plan
            ]
            return jnp.concatenate(outs, axis=0)
        return jax.lax.fori_loop(0, n, body,
                                 jnp.zeros((out_h, W), jnp.float32))

    fd = measure("dense rows", dense, img, wm)
    fb = measure("blocked rows", blocked, img, wm)
    check_bitwise("blocked vs dense", fd(img, wm), fb(img, wm))

    # Pallas banded with an edge-padded operand (540 % 8 != 0 gate lift)
    if in_h % 8:
        from tpuvf.kernels.pallas import resample as pres
        pad_to = -(-in_h // 8) * 8
        t_np = sample.texcoords(out_h, 1.0)

        def banded_padded(n, img, wm):
            def body(i, acc):
                x = img + acc[0, 0] * np.float32(1e-30)
                xp = jnp.pad(x, ((0, pad_to - in_h), (0, 0)), mode="edge")
                return pres.banded_resample_rows(xp, t_np, sample_rows=in_h)
            return jax.lax.fori_loop(0, n, body,
                                     jnp.zeros((out_h, W), jnp.float32))

        try:
            fp = measure("pallas banded (padded)", banded_padded, img, wm)
            check_bitwise("pallas vs dense", fd(img, wm), fp(img, wm))
        except Exception as e:
            print("pallas padded FAILED:", str(e)[:300])


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    bench_cols(480, 1920, 640)   # luma columns
    bench_cols(480, 960, 640)    # chroma columns (upscale 960->640? no: down)
    bench_rows(540, 480, 960)    # chroma rows (540 % 8 != 0)
    bench_rows(1080, 480, 1920)  # luma rows (Pallas-eligible today)
    print("DONE-SENTINEL")
