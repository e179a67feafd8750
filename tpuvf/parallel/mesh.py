"""Device mesh + sharding policies for multi-chip scaling.

The reference is strictly single-device (one shared MTLDevice,
vfmetaldevice.m:30-64); its only scaling levers are GPU thread count and
per-element pipeline threads (SURVEY.md §2.10).  The TPU-native framework
scales two ways instead:

- **dp** (data parallel): independent frames of a batch spread across chips.
  The natural lever for multi-stream or offline transcode workloads — no
  cross-chip traffic except at the edges.
- **sp** (spatial parallel): plane rows spread across chips for frames too
  large or latency-critical for one chip.  Elementwise stages shard freely;
  the row-sampling matmuls contract over the sharded axis and XLA inserts
  the psum/all-gather over ICI; stencil stages (blur, deinterlace) use the
  explicit halo exchange in tpuvf.parallel.halo.

Shardings ride on jax.sharding.NamedSharding — no custom communication
backend; collectives are XLA's, laid out over ICI.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def make_mesh(axes: Optional[Dict[str, int]] = None, devices=None):
    """Build a Mesh from {'dp': n, 'sp': m}; defaults to all devices on dp."""
    import jax
    from jax.sharding import Mesh

    devices = list(devices if devices is not None else jax.devices())
    if axes is None:
        axes = {"dp": len(devices)}
    total = int(np.prod(list(axes.values())))
    if total > len(devices):
        raise ValueError(f"mesh {axes} needs {total} devices, have {len(devices)}")
    arr = np.asarray(devices[:total]).reshape(tuple(axes.values()))
    return Mesh(arr, tuple(axes.keys()))


def batch_sharding(mesh, dp_axis: str = "dp", sp_axis: Optional[str] = None):
    """NamedSharding for batched frame planes (batch, [C,] H, W):
    batch over dp, rows over sp (if present), W replicated."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    if sp_axis and sp_axis in mesh.axis_names:
        return NamedSharding(mesh, P(dp_axis, sp_axis, None))
    return NamedSharding(mesh, P(dp_axis))


def replicated(mesh):
    from jax.sharding import NamedSharding, PartitionSpec as P

    return NamedSharding(mesh, P())


def shard_batch(planes: Dict, mesh, dp_axis="dp", sp_axis=None) -> Dict:
    """device_put a dict of batched planes with dp(+sp) sharding.

    4:2:0 chroma planes have half the rows of luma; row sharding divides
    both as long as rows_per_shard stays integral — callers should pick
    sp sizes dividing ceil(H/2).
    """
    import jax

    sh = batch_sharding(mesh, dp_axis, sp_axis)
    return {k: jax.device_put(v, sh) for k, v in planes.items()}


def parallel_batch_fn(step, mesh, params, dp_axis="dp"):
    """Data-parallel batch execution: shard_map over the dp axis; each shard
    runs a *local* lax.scan over its sub-batch (scan is sequential, so
    scanning a dp-sharded axis directly would serialize across chips —
    shard_map keeps each chip's scan independent).

    State is tiled with a leading dp axis so every shard carries its own
    history — appropriate for stateless elements, and for stateful ones when
    dp shards map to independent streams.

    Returns run(planes, state, tiled=False) -> (outs (B, ...), state_tiled).
    Pass a previous call's returned state back with tiled=True.
    """
    import functools

    import jax
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    dp = mesh.shape[dp_axis]
    spec = P(dp_axis)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(spec, spec, P()),
        out_specs=(spec, spec),
        check_vma=False,
    )
    def sharded(planes, state_tiled, params):
        state = jax.tree_util.tree_map(lambda s: s[0], state_tiled)

        def body(st, frame):
            out, st2 = step(frame, st, params)
            return st2, out

        st, outs = jax.lax.scan(body, state, planes)
        return outs, jax.tree_util.tree_map(lambda s: s[None], st)

    fn = jax.jit(sharded)

    def tile_state(state):
        return jax.tree_util.tree_map(
            lambda s: np.broadcast_to(
                np.asarray(s), (dp,) + np.shape(s)).copy(),
            state,
        )

    def run(planes, state, tiled=False):
        dev = shard_batch(planes, mesh, dp_axis)
        st = state if tiled else tile_state(state)
        dev_state = jax.device_put(st, batch_sharding(mesh, dp_axis))
        dev_params = jax.device_put(params, replicated(mesh))
        with mesh:
            return fn(dev, dev_state, dev_params)

    return run
