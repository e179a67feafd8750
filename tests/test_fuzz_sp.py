"""Seeded spatial-sharding fuzz: every random chain the sp gate ACCEPTS
must run bit-exact vs the unsharded pipeline (grain chains: the repo's
tolerance-with-outliers convention); everything else must be rejected
with a clear ValueError at dispatch time — never a mid-run shape crash.

This extends tests/test_fuzz_pipelines.py to the round-3 sp machinery:
random formats (incl. packed 4:2:2), random intermediate geometry/format
changes (the all_gather resampling path), stencils (blur, deinterlace),
and random dp x sp mesh splits.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax

from tpuvf.cli.launch import parse_pipeline
from tpuvf.parallel import mesh as pmesh
from tpuvf.runtime.observability import PipelineError


FORMATS = ["BGRA", "RGBA", "NV12", "I420", "UYVY", "YUY2"]
# mix of sp-friendly (8-divisible) and gate-exercising (odd/indivisible)
SIZES = [(64, 48), (128, 96), (64, 32), (96, 64), (37, 23), (62, 46)]
MESHES = [{"dp": 1, "sp": 2}, {"dp": 2, "sp": 2}, {"dp": 1, "sp": 4},
          {"dp": 2, "sp": 4}, {"dp": 1, "sp": 8},
          # round 5: MISALIGNED counts — quad/grid chains keep their plan
          # via proportional row padding (Pipeline._sp_pad_plan); full
          # plans still reject with the round-3 clear error
          {"dp": 1, "sp": 3}, {"dp": 2, "sp": 3}, {"dp": 1, "sp": 6}]

def _fuzz_png():
    """A deterministic RGBA overlay image on disk (parse-time dependency
    of vfmetaloverlay)."""
    import os
    from tpuvf.io import png as tpng
    path = "/tmp/tpuvf-fuzz-overlay.png"
    if not os.path.exists(path):
        r = np.random.default_rng(7)
        tpng.write(path, r.integers(0, 256, (12, 20, 4)).astype(np.uint8))
    return path


ELEMENTS = [
    "vfmetalvideofilter brightness=0.2",
    "vfmetalvideofilter sharpness=0.6 vignette=0.3",
    "vfmetalvideofilter noise=0.4 hue=0.3",
    "vfmetalvideofilter chroma-key-enabled=true",
    "vfmetaltransform method=clockwise",
    "vfmetaltransform method=vertical-flip",
    "vfmetaltransform crop-top=3 crop-left=5",
    "vfmetaltransform method=upper-left-diagonal crop-bottom=2 crop-right=3",
    "vfmetaldeinterlace method=greedyh",
    "vfmetaldeinterlace method=bob",
    "vfmetalconvertscale",
    "vfmetaloverlay location={png} relative-x=0.7 relative-y=0.6 alpha=0.8",
    "vfmetaloverlay location={png} x=9 y=5",
    "queue",
    "identity",
]


def _desc(rng):
    fmt = FORMATS[rng.integers(len(FORMATS))]
    w, h = SIZES[rng.integers(len(SIZES))]
    if fmt in ("UYVY", "YUY2") and w % 2:
        w += 1
    # mix vertically asymmetric patterns in (smpte): symmetric sources
    # mask opposite-edge-row halo bugs
    pat = ["ball", "smpte"][rng.integers(2)]
    desc = (
        f"videotestsrc num-buffers=2 pattern={pat} "
        f"! video/x-raw,format={fmt},width={w},height={h} "
    )
    for _ in range(rng.integers(1, 4)):
        desc += "! {} ".format(
            ELEMENTS[rng.integers(len(ELEMENTS))].format(png=_fuzz_png()))
        if rng.random() < 0.3:
            # intermediate caps: format and/or geometry change (the sp
            # all_gather resampling path)
            f2 = FORMATS[rng.integers(4)]  # planar/RGB intermediates
            w2, h2 = SIZES[rng.integers(4)]  # sp-friendly sizes
            if rng.random() < 0.25:
                # caps RANGES: fixation picks the size (reference
                # transform_caps semantics, gstvfmetalconvertscale.m)
                desc += ("! vfmetalconvertscale "
                         f"! video/x-raw,format={f2},width=[16,{w2}],"
                         f"height=[16,{h2}] ")
            else:
                desc += f"! vfmetalconvertscale "
                desc += f"! video/x-raw,format={f2},width={w2},height={h2} "
    desc += "! appsink"
    return desc


def _animate(rng, p):
    """Move controllable (traced) videofilter props off their baked values
    after build — the GST_PARAM_CONTROLLABLE analog — so the traced-param
    path is fuzzed under sp too.  Moves are gate-preserving: an effect
    that was on at build stays on (static_config gates would otherwise
    legitimately rebuild), while the always-traced props move freely."""
    moved = False
    for e in p.elements:
        if type(e).__name__ != "VideoFilter":
            continue
        e.props.set("brightness", float(rng.uniform(-0.4, 0.4)))
        e.props.set("contrast", float(rng.uniform(0.6, 1.4)))
        e.props.set("saturation", float(rng.uniform(0.5, 1.5)))
        for gated, lo, hi in (("vignette", 0.1, 0.9), ("noise", 0.1, 0.9),
                              ("hue", 0.05, 0.8), ("sharpness", 0.05, 0.9)):
            if abs(e.props.get(gated)) > 0.001 and rng.random() < 0.7:
                e.props.set(gated, float(rng.uniform(lo, hi)))
        moved = True
    if moved:
        assert not p._maybe_rebuild()  # animation must not recompile
    return moved


def _run_sp(desc, axes, animate, seed):
    sp = parse_pipeline(desc)
    sp.negotiate()
    sp.build()
    if animate:
        _animate(np.random.default_rng(1000 + seed + 500), sp)
    m = pmesh.make_mesh(axes)
    sp.run_batched(2, batch_size=2, mesh=m, sp_axis="sp")
    return sp.sinks[0].frames, getattr(sp, "_sp_row_pad", None)


def _planes(frame):
    return frame if isinstance(frame, dict) else {"m": frame}


def _run_one(seed):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    rng = np.random.default_rng(1000 + seed)
    desc = _desc(rng)
    axes = MESHES[rng.integers(len(MESHES))]
    animate = rng.random() < 0.5
    try:
        plain = parse_pipeline(desc)
        plain.negotiate()
        plain.build()
        if animate:
            _animate(np.random.default_rng(1000 + seed + 500), plain)
        plain.run_batched(2, batch_size=2)
    except (ValueError, NotImplementedError):
        return "invalid", desc  # chain itself rejected; nothing to compare
    try:
        a_frames, a_pad = _run_sp(desc, axes, animate, seed)
    except ValueError:
        return "sp-rejected", desc  # clear dispatch-time rejection: ok
    except PipelineError as exc:
        raise AssertionError(
            f"mid-run sp failure for: {desc} mesh={axes}\n{exc}") from exc
    b_frames = plain.sinks[0].frames
    assert len(a_frames) == len(b_frames) == 2, desc
    grain = "noise" in desc
    # vs the UNSHARDED run: 1-LSB knife-edge tolerance.  Two measured
    # program-shape artifact classes make bit-equality with the unsharded
    # program unattainable in general, and neither is a sharding bug:
    # (1) dp>1 gives each shard a DIFFERENT batch dim; XLA reassociates
    #     FMAs per program shape (measured: unsharded batch_size=1 vs =2
    #     shows identical flips with NO mesh at all);
    # (2) the sp collectives (all_gather feeding resampling matmuls,
    #     ppermute halos feeding stencils) MATERIALIZE their producer
    #     expression to f32, while the unsharded program fuses it into
    #     the consumer — one extra rounding at the boundary flips ~0.1%
    #     knife-edge pixels.
    # The REAL halo-correctness oracle is below: two different sp shard
    # counts must agree BITWISE — boundary-row bugs are shard-layout-
    # dependent and cannot survive that; fusion artifacts are identical
    # across sp sizes (measured on every case investigated).
    for a, b in zip(a_frames, b_frames):
        planes_a, planes_b = _planes(a), _planes(b)
        assert set(planes_a) == set(planes_b)
        for k in planes_a:
            d = np.abs(planes_a[k].astype(int) - planes_b[k].astype(int))
            if grain:
                assert d.max() <= 4, f"{desc} mesh={axes}"
                assert (d > 0).mean() < 0.01, f"{desc} mesh={axes}"
            else:
                assert d.max() <= 1, f"{desc} mesh={axes} max diff {d.max()}"
                assert (d > 0).mean() < 0.005, f"{desc} mesh={axes}"
    # cross-shard-count bitwise check (same dp, different sp)
    sp_n = axes.get("sp", 1)
    # misaligned primaries pair with the other misaligned count (3 and 6
    # usually share the pad ratio -> bitwise oracle stays live for them)
    alt = dict(axes, sp={3: 6, 6: 3}.get(sp_n, 2 if sp_n != 2 else 4))
    if alt["dp"] * alt["sp"] <= len(jax.devices()) and alt["sp"] > 1:
        try:
            c_frames, c_pad = _run_sp(desc, alt, animate, seed)
        except ValueError:
            c_frames = None  # alt layout gated (rows/shard constraints)
        if c_frames is not None:
            for a, c in zip(a_frames, c_frames):
                planes_a, planes_c = _planes(a), _planes(c)
                for k in planes_a:
                    if grain or a_pad != c_pad:
                        # grain: FMA-chaotic across program shapes
                        # (CLAUDE.md).  Different row-pad ratios are
                        # different PROGRAM SHAPES too — compare with
                        # the knife-edge tolerance; same-pad layouts
                        # below keep the bitwise halo oracle
                        d = np.abs(planes_a[k].astype(int)
                                   - planes_c[k].astype(int))
                        assert d.max() <= (4 if grain else 1), \
                            f"{desc} {axes} vs {alt}"
                    else:
                        np.testing.assert_array_equal(
                            planes_a[k], planes_c[k],
                            err_msg=f"sp layouts disagree (halo bug): "
                                    f"{desc} {axes} vs {alt}")
    return "ran", desc


import os

N_SEEDS = int(os.environ.get("TPUVF_FUZZ_SEEDS", "30"))


@pytest.mark.parametrize("seed", range(N_SEEDS))
def test_random_sp_chain(seed):
    _run_one(seed)


def test_sp_fuzz_coverage():
    # the seeded set must exercise both sharded runs and gate rejections
    results = {_run_one(seed)[0] for seed in range(30)}
    assert "ran" in results
