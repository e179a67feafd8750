"""Spatial-sharding context: row-axis locality for kernels under shard_map.

When a pipeline step runs with plane ROWS sharded over a mesh axis
(`Pipeline.run_batched(mesh, sp_axis=...)`), every vertical stencil must
read real neighbor rows across the shard boundary instead of edge-clamping
locally, and every row-coordinate field (vignette falloff, grain hash)
must use GLOBAL row indices.  Kernels stay unchanged at their call sites:
the row-pad/shift helpers in kernels/convert.py, kernels/filter.py and
kernels/deinterlace.py consult this context and switch to the halo
exchange (jax.lax.ppermute neighbor traffic over ICI — the explicit,
predictable collective; no all-gather) when an axis is active.

This is the idiomatic TPU mapping of the reference's "every pixel is a GPU
thread" model at multi-chip scale (SURVEY.md §2.10/§5): the videofilter's
9-tap blur reads 4 rows past the tile edge
(/root/reference/src/videofilter/metalvideofilter_shaders.h:257-299), the
deinterlacers ±1 row
(/root/reference/src/deinterlace/metaldeinterlace_shaders.h:88-218), the
4:2:0 chroma row-upsample ±1 chroma row.

Activated by tpuvf.parallel.mesh.parallel_batch_fn inside the shard_map
body, so the context is live exactly while the step traces as a manual
per-shard program.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

_STATE = {"axis": None, "row_pad": None}


@contextmanager
def spatial_axis(axis_name: Optional[str], row_pad=None):
    """Mark `axis_name` as the active row-sharding mesh axis while tracing
    a shard-local step (None = no-op).

    `row_pad` (round 5): a `(true_frame_rows, padded_frame_rows)` ratio
    when the host bottom-padded every sharded plane's rows so misaligned
    phase-plane geometry still splits evenly over the axis
    (Pipeline._sp_pad_plan).  Every plane pads PROPORTIONALLY (a plane
    with R rows physically carries R*padded/true rows), so one global
    ratio recovers any plane's TRUE row count; `total_rows` reports the
    true count and `frame_last_row` locates the true frame-edge row, so
    stencil frame-edge clamps stay exact while pad-row outputs (dropped
    by the host) are don't-care."""
    prev = (_STATE["axis"], _STATE["row_pad"])
    _STATE["axis"] = axis_name
    _STATE["row_pad"] = row_pad if axis_name is not None else None
    try:
        yield
    finally:
        _STATE["axis"], _STATE["row_pad"] = prev


def active_axis() -> Optional[str]:
    return _STATE["axis"]


def axis_size() -> int:
    """Number of row shards (1 when no spatial axis is active).  Static
    under shard_map tracing."""
    axis_name = _STATE["axis"]
    if axis_name is None:
        return 1
    return jax.lax.axis_size(axis_name)


def all_rows(x: jnp.ndarray, axis: int = -2) -> jnp.ndarray:
    """Gather every shard's rows of a row-sharded array into the full
    global-height array (jax.lax.all_gather tiled over the sp axis; rides
    ICI).  The escape hatch for FRAME-GLOBAL row structure — resampling
    matmuls contracting over H, 90-degree rotations — where halo exchange
    cannot express the dependency: gather the input once, then compute
    only THIS shard's output rows (slice the weight-matrix rows /
    shard_rows the result), so compute stays sharded and only the input
    plane transits the interconnect.  No-op without an active axis."""
    axis_name = _STATE["axis"]
    if axis_name is None:
        return x
    return jax.lax.all_gather(
        x, axis_name, axis=axis % x.ndim, tiled=True)


def pad_rows_halo(x: jnp.ndarray, lo: int, hi: int) -> jnp.ndarray:
    """(..., R, W) -> (..., lo+R+hi, W) with shard-correct edge semantics:
    interior shard boundaries receive the neighbor's boundary rows via
    ppermute; the outermost shards replicate their own edge row (the
    clamp-to-edge semantics every kernel already has on one device).

    Requires lo, hi <= R (halos never span more than one neighbor — true
    for every kernel here: blur 4, deinterlace 1, chroma upsample 1,
    enforced by Pipeline's sp divisibility gate)."""
    axis_name = _STATE["axis"]
    rows = x.shape[-2]
    if lo > rows or hi > rows:
        raise ValueError(
            f"halo ({lo},{hi}) exceeds local rows {rows}; use more rows "
            f"per shard")
    idx = jax.lax.axis_index(axis_name)
    n = jax.lax.axis_size(axis_name)
    parts = []
    if lo:
        # my bottom rows become the NEXT shard's top halo
        bot = jax.lax.slice_in_dim(x, rows - lo, rows, axis=-2)
        from_prev = jax.lax.ppermute(
            bot, axis_name, [(i, (i + 1) % n) for i in range(n)])
        first = jax.lax.slice_in_dim(x, 0, 1, axis=-2)
        edge = jnp.concatenate([first] * lo, axis=-2) if lo > 1 else first
        parts.append(jnp.where(idx == 0, edge, from_prev))
    parts.append(x)
    if hi:
        top = jax.lax.slice_in_dim(x, 0, hi, axis=-2)
        from_next = jax.lax.ppermute(
            top, axis_name, [(i, (i - 1) % n) for i in range(n)])
        last = jax.lax.slice_in_dim(x, rows - 1, rows, axis=-2)
        edge = jnp.concatenate([last] * hi, axis=-2) if hi > 1 else last
        parts.append(jnp.where(idx == n - 1, edge, from_next))
    if len(parts) == 1:
        return x
    return jnp.concatenate(parts, axis=-2)


def pad_rows_edge(x: jnp.ndarray, lo: int, hi: int) -> jnp.ndarray:
    """Edge-clamped row padding along axis -2: jnp.pad(mode="edge") on one
    device, halo exchange under an active spatial axis.  THE entry point
    for every vertical stencil."""
    if lo == 0 and hi == 0:
        return x
    if _STATE["axis"] is not None:
        return pad_rows_halo(x, lo, hi)
    pad = [(0, 0)] * x.ndim
    pad[-2] = (lo, hi)
    return jnp.pad(x, pad, mode="edge")


def shard_rows(x: jnp.ndarray, local_rows: int) -> jnp.ndarray:
    """Slice THIS shard's rows out of a replicated full-height array
    (axis -2) — for build-time full-frame fields (the overlay's padded
    rect planes) consumed by row-sharded compute.  No-op without an
    active axis or when the array is already local-sized; under an
    active axis, rows [axis_index*local_rows, +local_rows).  XLA fuses
    the slice into the surrounding pad/elementwise expression, so the
    full-height intermediate is never materialized per shard.

    Under a row_pad ratio the build-time array still has TRUE frame
    rows while local_rows reflects the padded layout: zero-extend the
    bottom first so every shard's slice aligns with its padded global
    rows (the zero rows land only in pad-row outputs, which the host
    drops) — without this, dynamic_slice start-clamping would SHIFT the
    tail shard's true rows."""
    axis_name = _STATE["axis"]
    if x.shape[-2] == local_rows:
        return x
    if axis_name is None:
        # unsharded trace over row-PADDED planes (the mesh runner's
        # eval_shape pass): extend the build-time true-height array to
        # the padded height
        if x.shape[-2] < local_rows:
            pad = [(0, 0)] * x.ndim
            pad[-2] = (0, local_rows - x.shape[-2])
            return jnp.pad(x, pad)
        return x
    need = local_rows * jax.lax.axis_size(axis_name)
    if x.shape[-2] < need:
        pad = [(0, 0)] * x.ndim
        pad[-2] = (0, need - x.shape[-2])
        x = jnp.pad(x, pad)
    idx = jax.lax.axis_index(axis_name)
    start = idx * np.int32(local_rows)
    return jax.lax.dynamic_slice_in_dim(x, start, local_rows, axis=-2)


def global_row_iota(shape) -> jnp.ndarray:
    """int32 GLOBAL row indices broadcast to `shape` (rows on axis -2).

    For phase-plane kernels whose edge clamps cross phases (blur9_v_split,
    deinterlace interp_even_t): the clamp must trigger at the FRAME's
    first/last phase row, not the shard's.  Without an active axis this
    is a plain broadcasted iota."""
    rows = shape[-2]
    it = jax.lax.broadcasted_iota(jnp.int32, tuple(shape[-2:]), 0)
    it = jnp.broadcast_to(it, tuple(shape))
    if _STATE["axis"] is not None:
        it = it + jax.lax.axis_index(_STATE["axis"]) * np.int32(rows)
    return it


def total_rows(local_rows: int) -> int:
    """TRUE global row count of a row-sharded plane (static: local rows x
    shard count, with any host row padding removed via the active
    row_pad ratio).  Every caller is a frame-edge clamp condition, which
    must fire at the TRUE frame edge — the padded rows below it are
    dropped by the host."""
    physical = local_rows * axis_size()
    rp = _STATE["row_pad"]
    if rp is None:
        return physical
    true_frame, padded_frame = rp
    num = physical * true_frame
    if num % padded_frame:
        raise ValueError(
            f"plane with {physical} padded rows is not proportional to "
            f"row_pad ratio {true_frame}/{padded_frame}")
    return num // padded_frame


def frame_last_row(x: jnp.ndarray) -> jnp.ndarray:
    """(..., 1, W) slice holding the FRAME's true last row on the shard
    that owns it (meaningless elsewhere — pair with a global-row
    `where`, the cross-phase clamp pattern).  Without row padding this
    is the shard-local last row, exactly the pre-round-5 expression."""
    local = x.shape[-2]
    li = (total_rows(local) - 1) % local
    return jax.lax.slice_in_dim(x, li, li + 1, axis=-2)


def global_rows(local_rows: int, global_rows_total: int) -> jnp.ndarray:
    """f32 GLOBAL row indices of the local plane rows (for row-coordinate
    fields: vignette falloff, grain hash).  Without an active axis (or when
    the plane is unsharded) this is arange(global_rows_total)."""
    axis_name = _STATE["axis"]
    base = np.arange(local_rows, dtype=np.float32)
    if axis_name is None or local_rows == global_rows_total:
        return jnp.asarray(base)
    idx = jax.lax.axis_index(axis_name)
    return jnp.asarray(base) + idx.astype(jnp.float32) * np.float32(local_rows)
