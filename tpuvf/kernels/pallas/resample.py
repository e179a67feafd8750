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
    w0 = 1.0 - f
    # clamp-to-edge: fold out-of-range taps onto valid rows
    lo = i0 < 0
    w0 = np.where(lo, 1.0, w0)  # both taps land on row 0: full weight first
    i0 = np.where(lo, 0, i0)
    w0 = np.where(i0 >= in_size - 1, 1.0, w0)
    i0 = np.minimum(i0, in_size - 1)
    # second tap index = min(i0+1, in-1); when it clamps, give w0 the rest
    i1 = np.minimum(i0 + 1, in_size - 1)
    same = i1 == i0
    w0 = np.where(same, 1.0, w0)
    return i0.astype(np.int32), w0.astype(np.float32)


def _band_starts(i0: np.ndarray, in_size: int, band: int):
    """Input band origin per output tile (static, from the numpy plan)."""
    n_tiles = (len(i0) + TILE_OUT - 1) // TILE_OUT
    starts = np.zeros(n_tiles, np.int32)
    for tidx in range(n_tiles):
        lo = i0[tidx * TILE_OUT: (tidx + 1) * TILE_OUT].min()
        starts[tidx] = min(lo, max(in_size - band, 0))
    return starts


def _make_kernel(band: int, width: int):
    def kernel(starts_ref, i0_ref, w0_ref, img_hbm, out_ref):
        tile = pl.program_id(0)
        base = starts_ref[tile]

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


def banded_resample_rows(img: jnp.ndarray, t: np.ndarray, interpret=False):
    """img (H, W) float32 -> (len(t), W): linear row resample at texcoords t.

    Requires monotonic t (true for all samplers here).  W should be a
    multiple of 128 for efficiency (padded otherwise).
    """
    in_h, w = img.shape
    out_h = len(t)
    i0, w0 = plan_rows(np.asarray(t, np.float64), in_h)
    # band height: max rows any tile touches (+1 for the second tap)
    spans = [
        i0[k * TILE_OUT: (k + 1) * TILE_OUT].max()
        - i0[k * TILE_OUT: (k + 1) * TILE_OUT].min()
        for k in range((out_h + TILE_OUT - 1) // TILE_OUT)
    ]
    band = int(max(spans)) + 2
    band = max(band, 2)
    pad_out = (-out_h) % TILE_OUT
    if pad_out:
        i0 = np.concatenate([i0, np.repeat(i0[-1:], pad_out)])
        w0 = np.concatenate([w0, np.repeat(w0[-1:], pad_out)])
    n_tiles = len(i0) // TILE_OUT
    if band > in_h:
        band = in_h
    starts = _band_starts(i0, in_h, band)
    i0_rel_ok = all(
        i0[k * TILE_OUT + r] - starts[k] + 1 < band + 1
        for k in range(n_tiles) for r in range(min(TILE_OUT, len(i0)))
    )
    assert i0_rel_ok

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # starts, i0, w0
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # full image, DMA'd manually
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
