"""Color-space math: BT.601/BT.709 limited-range YUV<->RGB, quantization.

Constants and formulas reproduce the reference's common shader prelude
(/root/reference/src/common/vfmetalshaders.m:40-79): limited-range matrices,
offset subtraction before the matrix multiply, and clamp to [0,1] after.

These are elementwise fused-multiply-add chains — VPU work that XLA fuses
into whatever surrounds them; no Pallas needed.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# MSL float3x3 constructors take *columns*; rows below are the usual
# R/G/B = f(Y,Cb,Cr) equations. yuv_to_rgb[m][r][c] multiplies (y,u,v).
YUV_OFFSET = np.array([16.0 / 255.0, 128.0 / 255.0, 128.0 / 255.0], np.float32)

YUV_TO_RGB = np.array(
    [
        # BT.601 limited range (vfmetalshaders.m:42-47)
        [
            [1.164383, 0.0, 1.596027],
            [1.164383, -0.391762, -0.812968],
            [1.164383, 2.017232, 0.0],
        ],
        # BT.709 limited range (vfmetalshaders.m:50-55)
        [
            [1.164383, 0.0, 1.792741],
            [1.164383, -0.213249, -0.532909],
            [1.164383, 2.112402, 0.0],
        ],
    ],
    np.float32,
)

# rgb->yuv: rows are Y/U/V = f(R,G,B) (vfmetalshaders.m:58-69, columns = R,G,B)
RGB_TO_YUV = np.array(
    [
        [
            [0.256788, 0.504129, 0.097906],
            [-0.148223, -0.290993, 0.439216],
            [0.439216, -0.367788, -0.071427],
        ],
        [
            [0.182586, 0.614231, 0.062007],
            [-0.100644, -0.338572, 0.439216],
            [0.439216, -0.398942, -0.040274],
        ],
    ],
    np.float32,
)


def dequant(x: jnp.ndarray) -> jnp.ndarray:
    """uint8 -> float in [0,1] (Metal Unorm8 read: v / 255)."""
    return x.astype(jnp.float32) * np.float32(1.0 / 255.0)


def quant(x: jnp.ndarray) -> jnp.ndarray:
    """float -> uint8 (Metal Unorm8 store: round(clamp(v,0,1)*255))."""
    return jnp.round(jnp.clip(x, 0.0, 1.0) * 255.0).astype(jnp.uint8)


def quant_sim(x: jnp.ndarray) -> jnp.ndarray:
    """float -> float with the RGBA8 quantization APPLIED but the u8 dtype
    elided: bit-identical to dequant(quant(x)) — round/clip are the same ops
    and the u8->f32 convert is exact — without ever materializing uint8.

    Used for fused element boundaries: u8 loads run at ~90 GB/s on v5e
    (scripts/bench_interleave3.py) while f32 elementwise chains fuse at full
    HBM bandwidth, so a split-linked boundary keeps the quantized VALUES in
    f32 and XLA fuses straight through the element edge."""
    return jnp.round(jnp.clip(x, 0.0, 1.0) * 255.0) * np.float32(1.0 / 255.0)


def quant_unit(x: jnp.ndarray) -> jnp.ndarray:
    """quant() for values ALREADY in [0,1]: the clip is elided — round and
    scale are bit-identical by clip idempotence.  Callers must guarantee
    the range statically (yuv_to_rgb clamps its output; the videofilter
    chain is [1e-4, 1]-bounded when no sepia/noise gate is on).  Saves ~8
    us/frame of the 4K quad emit (scripts/bench_rowphase.py B2)."""
    return jnp.round(x * 255.0).astype(jnp.uint8)


def quant_sim_unit(x: jnp.ndarray) -> jnp.ndarray:
    """quant_sim() for values already in [0,1] (clip elided, bit-identical
    — see quant_unit)."""
    return jnp.round(x * 255.0) * np.float32(1.0 / 255.0)


def quant_units(x: jnp.ndarray) -> jnp.ndarray:
    """float -> bfloat16 holding the quantized INTEGER value round(clip(x)
    * 255) in 0..255 — every such integer is exact in bf16 (8 explicit
    mantissa bits + implicit leading 1 cover 0..511), so
    `quant_units(x).astype(f32) * (1/255)` == dequant(quant(x)) BIT-exactly.

    This is the split-boundary storage type: half the bytes of f32 at full
    HBM bandwidth (u8 would be quarter-width but u8-typed fusion traffic
    runs ~3x below bandwidth on v5e)."""
    return jnp.round(jnp.clip(x, 0.0, 1.0) * 255.0).astype(jnp.bfloat16)


def as_unit_float(x: jnp.ndarray) -> jnp.ndarray:
    """Boundary plane -> dequantized f32 in [0,1]:
    uint8 -> /255; bfloat16 (quant_units) -> f32 then /255 (exact);
    float32 (quant_sim values) passes through unchanged."""
    if x.dtype == jnp.uint8:
        return dequant(x)
    if x.dtype == jnp.bfloat16:
        return x.astype(jnp.float32) * np.float32(1.0 / 255.0)
    return x


def yuv_to_rgb(y, u, v, matrix_index: int):
    """Limited-range YUV -> RGB, clamped to [0,1] (yuvToRGB, m:71-79).

    Inputs are float arrays in [0,1] (any matching shapes); matrix_index is a
    static 0/1.  Returns (r, g, b).
    """
    m = YUV_TO_RGB[matrix_index]
    yo = y - YUV_OFFSET[0]
    uo = u - YUV_OFFSET[1]
    vo = v - YUV_OFFSET[2]
    r = m[0][0] * yo + m[0][1] * uo + m[0][2] * vo
    g = m[1][0] * yo + m[1][1] * uo + m[1][2] * vo
    b = m[2][0] * yo + m[2][1] * uo + m[2][2] * vo
    one = np.float32(1.0)
    zero = np.float32(0.0)
    return (
        jnp.clip(r, zero, one),
        jnp.clip(g, zero, one),
        jnp.clip(b, zero, one),
    )


def rgb_to_yuv(r, g, b, matrix_index: int):
    """RGB -> limited-range YUV (+offset), unclamped.

    The MSL output kernels (rgbaToNV12 etc., vfmetalshaders.m:90-168) clamp
    only at the texture write; quant() reproduces that clamp, so averaging
    steps in between operate on unclamped values exactly like the GPU.
    """
    m = RGB_TO_YUV[matrix_index]
    y = m[0][0] * r + m[0][1] * g + m[0][2] * b + YUV_OFFSET[0]
    u = m[1][0] * r + m[1][1] * g + m[1][2] * b + YUV_OFFSET[1]
    v = m[2][0] * r + m[2][1] * g + m[2][2] * b + YUV_OFFSET[2]
    return y, u, v


def rgb_to_chroma_downsampled(r, g, b, matrix_index: int, out_cw: int, out_ch: int):
    """RGB (H, W) -> (u, v) at 4:2:0 half resolution.

    Reproduces rgbaToNV12's 2x2 box average with edge clamping for odd
    dimensions (vfmetalshaders.m:104-124): the RGB values of each 2x2 block
    (duplicating the last row/column when H or W is odd) are averaged *before*
    the RGB->YUV matrix is applied.
    """
    h, w = r.shape[-2], r.shape[-1]
    pad_h, pad_w = 2 * out_ch - h, 2 * out_cw - w

    def avg(x):
        if pad_h or pad_w:
            cfg = [(0, 0)] * (x.ndim - 2) + [(0, pad_h), (0, pad_w)]
            x = jnp.pad(x, cfg, mode="edge")
        # row pairs first (sublane stride), then lane pairs via a trailing
        # reshape — measured fastest on TPU among reshape-mean / lane-strided
        # slices / matmul variants
        rows = (x[..., 0::2, :] + x[..., 1::2, :]) * np.float32(0.5)
        s = rows.shape
        pairs = rows.reshape(*s[:-1], out_cw, 2)
        return (pairs[..., 0] + pairs[..., 1]) * np.float32(0.5)

    ra, ga, ba = avg(r), avg(g), avg(b)
    _, u, v = rgb_to_yuv(ra, ga, ba, matrix_index)
    return u, v
