"""Deinterlacing kernels: bob / linear / weave / greedy-H.

Faithful to /root/reference/src/deinterlace/metaldeinterlace_shaders.h:
- kept field = even rows when top-field-first else odd rows (all kernels)
- bob (h:88-114): kept rows copied; discarded rows = average of the rows
  directly above/below (edge-clamped)
- linear (h:118-152): same structure; the shader computes 4 taps but uses
  the simple (above+below)*0.5 — reproduced as-is
- weave (h:156-177): discarded rows taken from the previous frame
- greedyH (h:181-218): per-pixel motion = |cur.rgb - prev.rgb|; below the
  threshold weave from prev, else bob interpolation

All operate on (..., 4, H, W) float RGBA planes; row selections are masks
over a broadcasted row-index iota — pure VPU work that XLA fuses.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _row_mask(height: int, tff):
    """True where the row belongs to the kept field.  `tff` may be a Python
    bool (static field layout) or a traced bool scalar (per-buffer
    GST_VIDEO_BUFFER_FLAG_TFF analog) — keep = even-row XNOR tff."""
    even = jnp.asarray((np.arange(height) % 2 == 0)[:, None])
    return even == jnp.asarray(tff, bool)


def _shift_rows(img, offset: int):
    """Row shift with edge clamp via pad+slice (no gather); halo-aware
    under spatial row sharding (±1-row reach, metaldeinterlace_shaders.h:
    88-218 -> parallel.spctx)."""
    import jax

    from tpuvf.parallel import spctx

    axis = img.ndim - 2
    h = img.shape[axis]
    p = spctx.pad_rows_edge(img, max(-offset, 0), max(offset, 0))
    start = max(offset, 0)
    return jax.lax.slice_in_dim(p, start, start + h, axis=axis)


def _bob_interp(cur):
    return (_shift_rows(cur, -1) + _shift_rows(cur, +1)) * 0.5


def bob(cur, tff: bool):
    keep = _row_mask(cur.shape[-2], tff)
    return jnp.where(keep, cur, _bob_interp(cur))


def linear(cur, tff: bool):
    # the reference's "linear" collapses to the same 2-tap average (h:147)
    keep = _row_mask(cur.shape[-2], tff)
    return jnp.where(keep, cur, _bob_interp(cur))


def weave(cur, prev, tff: bool):
    keep = _row_mask(cur.shape[-2], tff)
    return jnp.where(keep, cur, prev)


def greedyh(cur, prev, tff: bool, motion_threshold):
    keep = _row_mask(cur.shape[-2], tff)
    d = cur[..., :3, :, :] - prev[..., :3, :, :]
    motion = jnp.sqrt((d * d).sum(axis=-3, keepdims=True))
    low_motion = motion < motion_threshold
    repl = jnp.where(low_motion, prev, _bob_interp(cur))
    return jnp.where(keep, cur, repl)


# -- ROW-PHASE (field) formulation for the quad dataflow (round 3d) ---------
# Fields ARE row phases: with the frame carried as even/odd row planes the
# kept field is a PURE PASSTHROUGH and interpolation/motion run only on the
# discarded phase — half the stencil and motion work of the masked
# full-height formulation, and no row-parity select at all.  The taps are
# the _bob_interp expressions verbatim (same adds, same order, same edge
# clamps), so per-pixel values are bit-identical to the canonical kernels.

def interp_even_t(e_t, o_t):
    """Bob interpolation at EVEN output rows 2k: (cur[2k-1] + cur[2k+1])
    * 0.5 = (O[k-1] + O[k]) * 0.5; the row -1 edge clamp folds to full row
    0, which is the even phase's own first row (metaldeinterlace_shaders.h
    :88-114 edge behavior via _shift_rows).  Halo-aware under spctx row
    sharding (convert.shift_rows_cross_phase)."""
    from tpuvf.kernels.convert import shift_rows_cross_phase

    def one(e, o):
        above = shift_rows_cross_phase(o, -1, e)
        return (above + o) * 0.5

    return tuple(one(e, o) for e, o in zip(e_t, o_t))


def interp_odd_t(e_t, o_t):
    """Bob interpolation at ODD output rows 2k+1: (cur[2k] + cur[2k+2])
    * 0.5 = (E[k] + E[k+1]) * 0.5; the row-H edge clamp folds to full row
    H-1, the odd phase's own last row.  Halo-aware under spctx row
    sharding (convert.shift_rows_cross_phase)."""
    from tpuvf.kernels.convert import shift_rows_cross_phase

    def one(e, o):
        below = shift_rows_cross_phase(e, +1, o)
        return (e + below) * 0.5

    return tuple(one(e, o) for e, o in zip(e_t, o_t))


def discard_phase_t(method: str, cur_t, prev_t, interp_t, has_prev,
                    motion_threshold):
    """The DISCARDED row phase's output planes.

    cur_t/prev_t: this phase's current/previous planes; interp_t: the bob
    interpolation computed from both phases (interp_even_t/interp_odd_t).
    bob/linear ignore prev; weave takes prev wholesale; greedyh selects
    prev vs interp per pixel on motion (metaldeinterlace_shaders.h:156-218)
    — all with the first-frame bob fallback folded in (has_prev)."""
    if method in ("bob", "linear"):
        return interp_t
    if method == "weave":
        return tuple(jnp.where(has_prev, p, i)
                     for p, i in zip(prev_t, interp_t))
    motion = jnp.sqrt(sum((c - p) ** 2
                          for c, p in zip(cur_t[:3], prev_t[:3])))
    low = motion < motion_threshold
    return tuple(jnp.where(has_prev, jnp.where(low, p, i), i)
                 for p, i in zip(prev_t, interp_t))


# -- per-channel-tuple variants (no (4, H, W) stacks; see CLAUDE.md) --------

def bob_t(cur_t, tff: bool):
    keep = _row_mask(cur_t[0].shape[-2], tff)
    return tuple(jnp.where(keep, c, _bob_interp(c)) for c in cur_t)


def weave_t(cur_t, prev_t, tff: bool):
    keep = _row_mask(cur_t[0].shape[-2], tff)
    return tuple(jnp.where(keep, c, p) for c, p in zip(cur_t, prev_t))


def greedyh_t(cur_t, prev_t, tff: bool, motion_threshold):
    keep = _row_mask(cur_t[0].shape[-2], tff)
    motion = jnp.sqrt(sum((c - p) ** 2 for c, p in zip(cur_t[:3], prev_t[:3])))
    low_motion = motion < motion_threshold
    return tuple(
        jnp.where(keep, c, jnp.where(low_motion, p, _bob_interp(c)))
        for c, p in zip(cur_t, prev_t)
    )
