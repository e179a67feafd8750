"""Row-sharded stencil ops with explicit halo exchange (shard_map).

The videofilter's 9-tap separable blur reads 4 rows beyond each tile edge
(metalvideofilter_shaders.h:257-299) and the deinterlacers read +-1 row.
When plane rows are sharded over an 'sp' mesh axis, each shard exchanges a
fixed halo with its neighbors via jax.lax.ppermute (ICI neighbor traffic,
no all-gather), then runs the unchanged local kernel on the padded tile.

This is the idiomatic TPU replacement for the reference's "every pixel is a
GPU thread" model at multi-chip scale (SURVEY.md §2.10, §5 long-context).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from tpuvf.kernels import filter as kfilter


def _exchange_row_halo(x, halo: int, axis_name: str):
    """Append neighbors' boundary rows: returns (lo_halo, x, hi_halo) rows
    concatenated along -2, replicating at the outer edges.

    x: (..., rows_local, W) — the local shard.
    """
    idx = jax.lax.axis_index(axis_name)
    n = jax.lax.axis_size(axis_name)

    top_rows = jax.lax.slice_in_dim(x, 0, halo, axis=-2)
    bot_rows = jax.lax.slice_in_dim(
        x, x.shape[-2] - halo, x.shape[-2], axis=-2)

    # send my top rows to the previous shard (they become its bottom halo)
    from_next = jax.lax.ppermute(
        top_rows, axis_name, [(i, (i - 1) % n) for i in range(n)])
    # send my bottom rows to the next shard (they become its top halo)
    from_prev = jax.lax.ppermute(
        bot_rows, axis_name, [(i, (i + 1) % n) for i in range(n)])

    # outer edges replicate their own boundary (clamp-to-edge semantics)
    first_row = jax.lax.slice_in_dim(x, 0, 1, axis=-2)
    last_row = jax.lax.slice_in_dim(x, x.shape[-2] - 1, x.shape[-2], axis=-2)
    edge_top = jnp.concatenate([first_row] * halo, axis=-2)
    edge_bot = jnp.concatenate([last_row] * halo, axis=-2)

    top_halo = jnp.where(idx == 0, edge_top, from_prev)
    bot_halo = jnp.where(idx == n - 1, edge_bot, from_next)
    return jnp.concatenate([top_halo, x, bot_halo], axis=-2)


def sharded_blur9(img, mesh, sp_axis: str = "sp"):
    """Separable 9-tap Gaussian on a row-sharded (..., 4, H, W) image.

    Horizontal taps are shard-local; vertical taps see a 4-row halo from the
    neighbors.  Pixel-exact vs the single-device kernel.
    """
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    ndim = img.ndim
    spec_elems = [None] * ndim
    spec_elems[-2] = sp_axis
    spec = P(*spec_elems)

    @partial(
        shard_map, mesh=mesh, in_specs=(spec,), out_specs=spec,
        check_vma=False,
    )
    def run(local):
        halo = 4
        h_blur = kfilter.blur9(local, axis=-1)  # horizontal: local
        padded = _exchange_row_halo(h_blur, halo, sp_axis)
        # vertical taps over the padded tile; interior slice back out.
        # blur9 edge-pads internally, so slice the valid region of a plain
        # 9-tap convolution instead:
        n = local.shape[-2]
        out = None
        for i, w in enumerate(kfilter.BLUR_WEIGHTS):
            tap = jax.lax.slice_in_dim(padded, i, i + n, axis=-2)
            tap = tap * jnp.float32(w)
            out = tap if out is None else out + tap
        return out

    return run(img)
