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


def parallel_batch_fn(step, mesh, params, dp_axis="dp", sp_axis=None):
    """jit a scanned batch step with inputs sharded over the mesh.

    Each dp shard scans its own sub-batch (state is carried per shard —
    appropriate for stateless elements and per-stream state when each dp
    shard maps to one stream).
    """
    import jax

    def batch_step(planes, state, params):
        def body(st, frame):
            out, st2 = step(frame, st, params)
            return st2, out

        st, outs = jax.lax.scan(body, state, planes)
        return outs, st

    fn = jax.jit(batch_step)

    def run(planes, state):
        dev = shard_batch(planes, mesh, dp_axis, sp_axis)
        dev_state = jax.device_put(state, replicated(mesh))
        dev_params = jax.device_put(params, replicated(mesh))
        with mesh:
            return fn(dev, dev_state, dev_params)

    return run
