"""4K NV12 -> convertscale -> filter -> BGRA: even/odd column-plane
prototype vs the current chain.

Keeps chroma (and the deinterleaved luma) as separate even/odd-column
half-width planes through every elementwise stage so NO f32 lane
interleave ever happens; the single interleave runs once on uint8 at the
output edge.  Validates bit-parity vs the production chain, then measures
both on the TPU with the scan-slope method.
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tpuvf-tpu-cache")

import jax
import jax.numpy as jnp
import numpy as np

from tpuvf.kernels import color
from tpuvf.kernels.color import dequant, quant

H, W = 2160, 3840
CW, CH = W // 2, H // 2

rng = np.random.default_rng(0)

BRIGHT, CONTRAST, SAT = np.float32(0.05), np.float32(1.1), np.float32(1.2)
LUMA = np.array([0.2126, 0.7152, 0.0722], np.float32)


def filter_rgb(r, g, b):
    r = r + BRIGHT
    g = g + BRIGHT
    b = b + BRIGHT
    half = np.float32(0.5)
    r = (r - half) * CONTRAST + half
    g = (g - half) * CONTRAST + half
    b = (b - half) * CONTRAST + half
    luma = LUMA[0] * r + LUMA[1] * g + LUMA[2] * b
    r = luma + (r - luma) * SAT
    g = luma + (g - luma) * SAT
    b = luma + (b - luma) * SAT
    one, zero = np.float32(1), np.float32(0)
    return (jnp.clip(r, zero, one), jnp.clip(g, zero, one),
            jnp.clip(b, zero, one))


# ---- current production chain (for parity + timing reference) -------------
def chain_current(planes):
    from tpuvf.kernels import convert

    y = dequant(planes["y"])
    u = dequant(planes["u"])
    v = dequant(planes["v"])
    uf = convert._upsample2x_linear(convert._upsample2x_linear(u, -2), -1)
    vf = convert._upsample2x_linear(convert._upsample2x_linear(v, -2), -1)
    r, g, b = color.yuv_to_rgb(y, uf, vf, 0)
    # convertscale element boundary quantize (RGBA8 target)
    r, g, b = dequant(quant(r)), dequant(quant(g)), dequant(quant(b))
    r, g, b = filter_rgb(r, g, b)
    rq, gq, bq = quant(r), quant(g), quant(b)
    a = jnp.full_like(rq, 255)
    return jnp.stack([bq, gq, rq, a], axis=-3)  # BGRA plane order


# ---- even/odd column-plane chain -------------------------------------------
def _row_upsample2x(c):
    """(CH, X) -> (2*CH, X): row-axis 2x linear (sublane interleave OK)."""
    prev = jnp.concatenate([c[:1], c[:-1]], axis=0)
    nxt = jnp.concatenate([c[1:], c[-1:]], axis=0)
    even = 0.25 * prev + 0.75 * c
    odd = 0.75 * c + 0.25 * nxt
    return jnp.stack([even, odd], axis=1).reshape(2 * c.shape[0], c.shape[1])


def _col_even_odd(c):
    """(H, CW) -> even/odd full-res column phases, both (H, CW)."""
    prev = jnp.concatenate([c[:, :1], c[:, :-1]], axis=1)
    nxt = jnp.concatenate([c[:, 1:], c[:, -1:]], axis=1)
    even = 0.25 * prev + 0.75 * c
    odd = 0.75 * c + 0.25 * nxt
    return even, odd


def chain_evenodd(planes):
    y8 = planes["y"]
    # luma deinterleave on uint8 (once)
    y_pairs = y8.reshape(y8.shape[0], CW, 2)
    y_e = dequant(y_pairs[..., 0])
    y_o = dequant(y_pairs[..., 1])

    def chroma(c8):
        cf = _row_upsample2x(dequant(c8))
        return _col_even_odd(cf)

    u_e, u_o = chroma(planes["u"])
    v_e, v_o = chroma(planes["v"])

    outs = []
    for yy, uu, vv in ((y_e, u_e, v_e), (y_o, u_o, v_o)):
        r, g, b = color.yuv_to_rgb(yy, uu, vv, 0)
        r, g, b = dequant(quant(r)), dequant(quant(g)), dequant(quant(b))
        r, g, b = filter_rgb(r, g, b)
        outs.append((quant(b), quant(g), quant(r)))
    (be, ge, re), (bo, go, ro) = outs

    def interleave(e, o):  # uint8 lane interleave, once, at the edge
        return jnp.stack([e, o], axis=-1).reshape(e.shape[0], W)

    bq = interleave(be, bo)
    gq = interleave(ge, go)
    rq = interleave(re, ro)
    a = jnp.full_like(bq, 255)
    return jnp.stack([bq, gq, rq, a], axis=-3)


def measure(name, fn, planes, iters=60, batch=8):
    stacked = {k: jnp.asarray(np.stack([v] * batch)) for k, v in planes.items()}

    def run(xs):
        def body(carry, fr):
            out = fn(fr)
            return carry + jnp.float32(out[0, 0, 0]), ()
        c, _ = jax.lax.scan(body, jnp.float32(0), xs)
        return c

    jfn = jax.jit(run)
    t0 = time.perf_counter()
    np.asarray(jax.device_get(jfn(stacked)))
    first = time.perf_counter() - t0
    # slope between two batch sizes is overkill here; scan amortizes call cost
    t0 = time.perf_counter()
    for _ in range(iters // batch):
        r = jfn(stacked)
    np.asarray(jax.device_get(r))
    wall = time.perf_counter() - t0
    frames = (iters // batch) * batch
    print(f"{name:18s} {wall / frames * 1e3:8.3f} ms/frame "
          f"({frames / wall:7.1f} fps)  first {first:.1f}s", flush=True)


def main():
    global H, W, CW, CH
    planes = {
        "y": rng.integers(0, 256, (H, W), dtype=np.uint8),
        "u": rng.integers(0, 256, (CH, CW), dtype=np.uint8),
        "v": rng.integers(0, 256, (CH, CW), dtype=np.uint8),
    }
    # parity check on CPU-sized crop first (on device, small)
    small = {
        "y": planes["y"][:64, :128], "u": planes["u"][:32, :64],
        "v": planes["v"][:32, :64],
    }
    Hs, Ws = H, W
    H, W, CW, CH = 64, 128, 64, 32
    a = np.asarray(jax.jit(chain_current)(
        {k: jnp.asarray(v) for k, v in small.items()}))
    b = np.asarray(jax.jit(chain_evenodd)(
        {k: jnp.asarray(v) for k, v in small.items()}))
    diff = np.abs(a.astype(int) - b.astype(int))
    print(f"parity: max diff {diff.max()} ({(diff > 0).mean():.2%} differ)",
          flush=True)
    H, W, CW, CH = Hs, Ws, Ws // 2, Hs // 2

    dev = {k: jnp.asarray(v) for k, v in planes.items()}
    measure("current", chain_current, dev)
    measure("evenodd", chain_evenodd, dev)
    measure("current2", chain_current, dev)
    measure("evenodd2", chain_evenodd, dev)


if __name__ == "__main__":
    main()
