"""Pallas banded row resampler.

Bilinear resampling along H touches exactly 2 input rows per output row, but
the XLA formulation is a dense (outH, inH) matmul — O(inH) MACs per output
row.  This kernel exploits the band structure: the grid walks tiles of
TILE_OUT consecutive output rows; for each tile the scalar-prefetched row
indices choose a contiguous input band, which the BlockSpec index_map DMAs
into VMEM, and each output row is a 2-tap weighted add of dynamically
sliced band rows (VPU work, no MXU, no wasted MACs).

Grid/index plumbing follows the PrefetchScalarGridSpec pattern from the
Pallas TPU guide.  Dense-matmul and this kernel are numerically identical
(same weights); tests compare in interpreter mode.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_OUT = 8


def plan_rows(t: np.ndarray, in_size: int):
    """Per-output-row (i0, w0) for linear sampling at texcoords t.

    out[r] = w0[r] * img[i0[r]] + (1-w0[r]) * img[i0[r]+1], with i0 clamped
    so i0+1 stays in range (weights adjusted to keep clamp-to-edge
    semantics exact).
    """
    s = t * in_size - 0.5
    x0 = np.floor(s)
    f = (s - x0).astype(np.float32)
    i0 = x0.astype(np.int64)
    # fold clamp-to-edge into the two taps, keeping i0+1 always in range:
    #   below row 0        -> both taps row 0   (i0=0,      w0=1)
    #   at/above last row  -> both taps row n-1 (i0=n-2,    w0=0)
    lo = i0 < 0
    i0 = np.where(lo, 0, i0)
    f = np.where(lo, 0.0, f)
    hi = i0 > in_size - 2
    i0 = np.where(hi, in_size - 2, i0)
    f = np.where(hi, 1.0, f)
    w0 = (1.0 - f).astype(np.float32)
    return np.maximum(i0, 0).astype(np.int32), w0


def _band_plan(i0: np.ndarray, in_size: int):
    """(starts, band): 8-aligned input band origin per output tile and the
    (8-aligned) band height — Mosaic HBM slices must align to the sublane
    tiling."""
    n_tiles = (len(i0) + TILE_OUT - 1) // TILE_OUT
    starts = np.zeros(n_tiles, np.int32)
    need = 0
    for tidx in range(n_tiles):
        seg = i0[tidx * TILE_OUT: (tidx + 1) * TILE_OUT]
        base = (int(seg.min()) // 8) * 8
        starts[tidx] = base
        need = max(need, int(seg.max()) + 2 - base)
    band = min(-(-need // 8) * 8, in_size)
    for tidx in range(n_tiles):
        starts[tidx] = max(min(starts[tidx], in_size - band), 0)
    return starts, band


def _make_kernel(band: int, width: int):
    def kernel(starts_ref, i0_ref, w0_ref, img_hbm, out_ref):
        tile = pl.program_id(0)
        # starts are pre-aligned; the hint lets Mosaic slice HBM at sublane
        # granularity
        base = pl.multiple_of(starts_ref[tile], 8)

        def inner(band_vmem, sem):
            cp = pltpu.make_async_copy(
                img_hbm.at[pl.ds(base, band), :], band_vmem, sem)
            cp.start()
            cp.wait()
            for r in range(TILE_OUT):
                idx = i0_ref[tile * TILE_OUT + r] - base
                w0 = w0_ref[tile * TILE_OUT + r]
                row0 = band_vmem[pl.ds(idx, 1), :]
                row1 = band_vmem[pl.ds(idx + 1, 1), :]
                out_ref[pl.ds(r, 1), :] = row0 * w0 + row1 * (1.0 - w0)

        pl.run_scoped(
            inner,
            pltpu.VMEM((band, width), jnp.float32),
            pltpu.SemaphoreType.DMA,
        )

    return kernel


def banded_resample_rows(img: jnp.ndarray, t: np.ndarray, interpret=False,
                         sample_rows: int | None = None):
    """img (H, W) float32 -> (len(t), W): linear row resample at texcoords t.

    Requires monotonic t (true for all samplers here).  W should be a
    multiple of 128 for efficiency (padded otherwise).

    `sample_rows` is the LOGICAL input height when the operand carries
    alignment pad rows at the bottom (Mosaic's HBM band slices need
    8-aligned offsets, so a 540-row chroma plane is padded to 544 and
    sampled with sample_rows=540): texcoords and the clamp-to-edge taps
    use the logical height, so pad-row contents are never read with
    nonzero weight and the result is identical to the dense sampler on
    the unpadded plane.
    """
    in_h, w = img.shape
    logical = in_h if sample_rows is None else sample_rows
    if not 2 <= logical <= in_h:
        raise ValueError(f"sample_rows {logical} out of range for {in_h}")
    out_h = len(t)
    if in_h % 8 != 0:
        raise ValueError("banded_resample_rows needs in_h % 8 == 0 "
                         "(Mosaic sublane alignment); pad the operand and "
                         "pass sample_rows, or use the dense sampler")
    # the manual HBM band slice requires lane (width) alignment to the
    # 128-lane tiling — pad narrow images and slice the result back
    pad_w = (-w) % 128
    if pad_w:
        out = banded_resample_rows(
            jnp.pad(img, ((0, 0), (0, pad_w))), t, interpret,
            sample_rows=sample_rows)
        return out[:, :w]
    i0, w0 = plan_rows(np.asarray(t, np.float64), logical)
    pad_out = (-out_h) % TILE_OUT
    if pad_out:
        i0 = np.concatenate([i0, np.repeat(i0[-1:], pad_out)])
        w0 = np.concatenate([w0, np.repeat(w0[-1:], pad_out)])
    n_tiles = len(i0) // TILE_OUT
    starts, band = _band_plan(i0, in_h)
    assert all(
        0 <= i0[k * TILE_OUT + r] - starts[k] + 1 < band
        for k in range(n_tiles) for r in range(TILE_OUT)
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # starts, i0, w0
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # full image, DMA'd manually
        ],
        out_specs=pl.BlockSpec(
            (TILE_OUT, w), lambda tile, *_: (tile, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        _make_kernel(band, w),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles * TILE_OUT, w), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(starts), jnp.asarray(i0), jnp.asarray(w0), img)
    return out[:out_h]
