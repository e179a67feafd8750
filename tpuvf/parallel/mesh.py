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
  the row-sampling matmuls all-gather their row operand over ICI and
  compute only each shard's output band; stencil stages (blur,
  deinterlace, chroma row-upsample) use the explicit ppermute halo
  exchange in tpuvf.parallel.spctx (tpuvf.parallel.halo is the original
  standalone prototype of the same exchange, kept for its tests).

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


def parallel_batch_fn(step, mesh, params, dp_axis="dp", sp_axis=None,
                      replicated_inputs=frozenset(),
                      replicated_state=frozenset(),
                      row_pad=None):
    """Data(+spatial)-parallel batch execution: shard_map over the dp axis
    (each shard runs a *local* lax.scan over its sub-batch — scanning a
    dp-sharded axis directly would serialize across chips) and, with
    sp_axis, over plane ROWS: every plane-like leaf (ndim >= 3 counting the
    batch axis) shards its -2 axis, and the step traces with
    parallel.spctx active so vertical stencils exchange ppermute halos and
    coordinate fields use global row indices.

    State is tiled with a leading dp axis so every shard carries its own
    history — appropriate for stateless elements, and for stateful ones when
    dp shards map to independent streams.  Stateful plane-shaped carry
    (deinterlace prev-frame) row-shards with the planes under sp.

    `frame_params` (round-5, controllers under mesh): an optional
    {element: {param: (B,) array}} of per-frame traced-scalar snapshots
    (Element.control schedules, stacked by Pipeline.run_batched).  The
    stacks shard over dp with the batch axis and replicate over sp; each
    shard's local scan merges its frames' rows into the staged params —
    the same per-frame override the non-mesh batch path applies
    (reference per-frame property sync:
    /root/reference/src/videofilter/gstvfmetalvideofilter.m:183-205).

    Returns run(planes, state, tiled=False, frame_params=None)
    -> (outs (B, ...), state_tiled).  Pass a previous call's returned
    state back with tiled=True.
    """
    import functools

    import jax
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tpuvf.parallel import spctx

    if dp_axis not in mesh.shape:
        raise ValueError(
            f"mesh {dict(mesh.shape)} has no '{dp_axis}' axis — build it "
            f"with {{'{dp_axis}': 1, ...}} for sp-only sharding")
    dp = mesh.shape[dp_axis]
    sp_live = sp_axis is not None and sp_axis in mesh.axis_names \
        and mesh.shape[sp_axis] > 1
    sp = sp_axis if sp_live else None

    def leaf_spec(ndim: int) -> P:
        """dp on axis 0; rows (-2) over sp for plane-like leaves."""
        if sp and ndim >= 3:
            elems = [dp_axis] + [None] * (ndim - 1)
            elems[ndim - 2] = sp
            return P(*elems)
        return P(dp_axis)

    def tree_specs(tree, replicated_keys=frozenset()) -> object:
        """Per-leaf specs; top-level dict keys in `replicated_keys` (the
        pipeline's aggregator-feeding branches) stay dp-only — every sp
        shard holds those branches' full rows."""
        if isinstance(tree, dict) and replicated_keys:
            return {
                k: jax.tree_util.tree_map(
                    lambda x: P(dp_axis) if k in replicated_keys
                    else leaf_spec(np.ndim(x)), v)
                for k, v in tree.items()
            }
        return jax.tree_util.tree_map(lambda x: leaf_spec(np.ndim(x)), tree)

    _compiled = {}

    def get_fn(planes, state_tiled, frame_params):
        key = (
            jax.tree_util.tree_structure(planes),
            tuple(np.shape(x) for x in jax.tree_util.tree_leaves(planes)),
            jax.tree_util.tree_structure(state_tiled),
            tuple(np.shape(x)
                  for x in jax.tree_util.tree_leaves(state_tiled)),
            jax.tree_util.tree_structure(frame_params),
            tuple(np.shape(x)
                  for x in jax.tree_util.tree_leaves(frame_params)),
        )
        hit = _compiled.get(key)
        if hit is not None:
            return hit
        in_specs = (tree_specs(planes, replicated_inputs),
                    tree_specs(state_tiled, replicated_state), P(),
                    tree_specs(frame_params))
        # output structure (for out_specs) from an abstract trace of the
        # scanned step — same leaf rule as the inputs
        def scanned(pl, st_t, prm, fp):
            import jax.numpy as jnp

            pl = dict(pl)
            # "__pad__" (B,) bool marks tail-padding frames (a short final
            # batch repeats its last frame to keep the compiled shape):
            # their outputs are dropped by the caller, and the carried
            # STATE must freeze across them — otherwise phantom frames
            # advance deinterlace history / the grain frame counter and
            # poison cross-call stream continuity
            pad = pl.pop("__pad__", None)
            state = jax.tree_util.tree_map(lambda s: s[0], st_t)
            has_fp = bool(fp)

            def body(st, xs):
                fpi = xs.get("fp", {})
                p = ({name: ({**prm[name], **fpi[name]} if name in fpi
                             else prm[name]) for name in prm}
                     if has_fp else prm)
                out, st2 = step(xs["pl"], st, p)
                if "pad" in xs:
                    st2 = jax.tree_util.tree_map(
                        lambda new, old: jnp.where(xs["pad"], old, new),
                        st2, st)
                return st2, out

            xs = {"pl": pl, "fp": fp}
            if pad is not None:
                xs["pad"] = pad
            st, outs = jax.lax.scan(body, state, xs)
            return outs, jax.tree_util.tree_map(lambda s: s[None], st)

        if sp:
            # eval_shape on GLOBAL shapes outside the spatial context (the
            # unsharded trace) just to learn the output pytree structure
            out_shapes = jax.eval_shape(scanned, planes, state_tiled,
                                        params, frame_params)
            # the carried state keeps the SAME replication as its in_specs:
            # a replicated branch's plane-shaped state (deinterlace
            # prev-frame feeding a compositor pad) stays full-height on
            # every sp shard — sharding it here would stack the replicas
            # into an n_sp-times-too-tall state on the way out
            out_specs = (tree_specs(out_shapes[0]),
                         tree_specs(out_shapes[1], replicated_state))
        else:
            out_specs = (P(dp_axis), P(dp_axis))

        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=in_specs,
            out_specs=out_specs,
            check_vma=False,
        )
        def sharded(pl, st_t, prm, fp):
            # row_pad: (true, padded) frame-row ratio when the caller
            # bottom-padded plane rows to realign phase plans with sp
            # (Pipeline._sp_pad_plan) — stencil frame-edge clamps consult
            # it via spctx.total_rows/frame_last_row
            with spctx.spatial_axis(sp, row_pad=row_pad if sp else None):
                return scanned(pl, st_t, prm, fp)

        fn = jax.jit(sharded)
        _compiled[key] = fn
        return fn

    def tile_state(state):
        return jax.tree_util.tree_map(
            lambda s: np.broadcast_to(
                np.asarray(s), (dp,) + np.shape(s)).copy(),
            state,
        )

    def put(tree, replicated_keys=frozenset()):
        specs = tree_specs(tree, replicated_keys)
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        spec_leaves = jax.tree_util.tree_leaves(
            specs, is_leaf=lambda s: isinstance(s, P))
        return jax.tree_util.tree_unflatten(treedef, [
            jax.device_put(x, NamedSharding(mesh, s))
            for x, s in zip(leaves, spec_leaves)
        ])

    staged_params = []  # device_put ONCE — weight buffers / LUT tables are
    # the dominant per-call transfer on the remote-tunnel backend

    def run(planes, state, tiled=False, frame_params=None):
        fp = frame_params or {}
        dev = put(planes, replicated_inputs)
        st = state if tiled else tile_state(state)
        dev_state = put(st, replicated_state)
        dev_fp = put(fp)  # (B,) leaves -> dp-sharded, sp-replicated
        if not staged_params:
            staged_params.append(jax.device_put(params, replicated(mesh)))
        fn = get_fn(planes, st, fp)
        with mesh:
            return fn(dev, dev_state, staged_params[0], dev_fp)

    return run
