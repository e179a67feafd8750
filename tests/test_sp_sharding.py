"""Pipeline-integrated spatial (row) sharding — run_batched(mesh, sp_axis).

The VERDICT round-2 gap: sp_axis was a dead parameter.  These tests run
FULL pipelines with plane rows sharded over an 'sp' mesh axis on the
8-device virtual CPU mesh and assert BIT-equality against the unsharded
run — both stencil classes (the videofilter's 4-row blur halo and the
deinterlacers' ±1-row reach), the 4:2:0 chroma row-upsample halo, and the
global-row coordinate fields (vignette falloff).

Two semantics notes baked into the tests:
- dp shards carry independent state, so stateful chains (weave/greedyh,
  grain) are compared on dp=1 meshes; dp>1 with such elements requires
  independent_streams=True (guard tested below).
- the grain hash is FMA-chaotic across compiled program shapes
  (CLAUDE.md), so the noise test uses the repo's tolerance-with-outliers
  convention instead of bit equality.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax

from tpuvf.cli.launch import parse_pipeline
from tpuvf.parallel import mesh as pmesh


def require_devices(n):
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} devices")


def assert_frames_equal(a, b):
    if isinstance(a, dict):
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])
    else:
        np.testing.assert_array_equal(a, b)


def _run_plain(desc, n, batch_size=None):
    p = parse_pipeline(desc)
    p.negotiate()
    p.build()
    p.run_batched(n, batch_size=batch_size or n)
    return p.sinks[0].frames


def _run_sp(desc, n, axes, sp_axis="sp", batch_size=None, **kw):
    p = parse_pipeline(desc)
    p.negotiate()
    p.build()
    m = pmesh.make_mesh(axes)
    p.run_batched(n, batch_size=batch_size or n, mesh=m, sp_axis=sp_axis,
                  **kw)
    return p.sinks[0].frames


@pytest.mark.parametrize("method", ["bob", "linear"])
def test_sp_dp_full_pipeline_bit_exact(method):
    """The VERDICT done-criterion: an sp=2 x dp=4 full pipeline with both
    stencil classes (filter sharpness != 0 + deinterlace) bit-matches the
    single-device output.  Methods here are the dp-safe ones (no
    cross-frame state feeding the output); the stateful methods bit-match
    on dp=1 below and are guarded at dp>1."""
    require_devices(8)
    desc = (
        "videotestsrc num-buffers=4 pattern=ball "
        "! video/x-raw,format=NV12,width=64,height=48 "
        f"! vfmetaldeinterlace method={method} "
        "! vfmetalvideofilter sharpness=0.5 contrast=1.2 vignette=0.4 "
        "! appsink"
    )
    plain = _run_plain(desc, 4)
    sp = _run_sp(desc, 4, {"dp": 4, "sp": 2})
    assert len(sp) == len(plain) == 4
    for a, b in zip(sp, plain):
        assert_frames_equal(a, b)


@pytest.mark.parametrize("method", ["greedyh", "weave"])
def test_sp_stateful_full_chain_bit_exact(method):
    """Stateful deinterlace + blur, rows sharded sp=8, TWO batches on dp=1
    so one stream's history is continuous — the sharded prev-frame carry
    round-trips through the tiled+row-sharded state."""
    require_devices(8)
    desc = (
        "videotestsrc num-buffers=6 pattern=ball "
        "! video/x-raw,format=NV12,width=64,height=48 "
        f"! vfmetaldeinterlace method={method} "
        "! vfmetalvideofilter sharpness=0.5 contrast=1.2 ! appsink"
    )
    plain = _run_plain(desc, 6, batch_size=3)
    sp = _run_sp(desc, 6, {"dp": 1, "sp": 8}, batch_size=3)
    assert len(sp) == len(plain) == 6
    for a, b in zip(sp, plain):
        assert_frames_equal(a, b)


def test_sp_only_deep_sharding_bit_exact():
    require_devices(8)
    desc = (
        "videotestsrc num-buffers=2 pattern=smpte "
        "! video/x-raw,format=NV12,width=64,height=128 "
        "! vfmetalvideofilter sharpness=-0.6 brightness=0.1 vignette=0.2 "
        "! appsink"
    )
    plain = _run_plain(desc, 2)
    sp = _run_sp(desc, 2, {"dp": 1, "sp": 8})
    for a, b in zip(sp, plain):
        assert_frames_equal(a, b)


def test_sp_rgb_chain_bit_exact():
    require_devices(8)
    desc = (
        "videotestsrc num-buffers=2 pattern=ball "
        "! video/x-raw,format=BGRA,width=64,height=64 "
        "! vfmetalvideofilter sharpness=0.7 saturation=1.4 vignette=0.3 "
        "! appsink"
    )
    plain = _run_plain(desc, 2)
    sp = _run_sp(desc, 2, {"dp": 2, "sp": 4})
    for a, b in zip(sp, plain):
        assert_frames_equal(a, b)


def test_sp_convertscale_identity_conversion_bit_exact():
    """NV12 -> BGRA at identity size (the 4:2:0 fast path's chroma
    row-upsample halo) sharded over rows."""
    require_devices(8)
    desc = (
        "videotestsrc num-buffers=2 "
        "! video/x-raw,format=NV12,width=64,height=64 "
        "! vfmetalconvertscale ! video/x-raw,format=BGRA "
        "! vfmetalvideofilter contrast=1.1 ! appsink"
    )
    plain = _run_plain(desc, 2)
    sp = _run_sp(desc, 2, {"dp": 2, "sp": 4})
    for a, b in zip(sp, plain):
        assert_frames_equal(a, b)


def test_sp_overlay_chain_bit_exact(tmp_path):
    """The overlay's rect blend under row sharding: the padded full-frame
    fields slice to each shard's rows (spctx.shard_rows) — including a
    rect that straddles shard boundaries."""
    require_devices(8)
    import tpuvf.io.png as pngio

    img = np.zeros((20, 24, 4), np.uint8)
    img[..., 0] = 230
    img[..., 3] = 150
    ov = str(tmp_path / "ov.png")
    pngio.write(ov, img)
    for fmt in ("BGRA", "NV12"):
        desc = (
            "videotestsrc num-buffers=2 pattern=smpte "
            f"! video/x-raw,format={fmt},width=64,height=64 "
            f"! vfmetaloverlay location={ov} x=10 y=20 alpha=0.7 "
            "! appsink"
        )
        plain = _run_plain(desc, 2)
        sp = _run_sp(desc, 2, {"dp": 2, "sp": 4})
        for a, b in zip(sp, plain):
            assert_frames_equal(a, b)


def test_sp_grain_within_tolerance():
    """The grain hash is FMA-chaotic across program shapes (CLAUDE.md):
    compare with the repo's tolerance + outlier allowance, not equality."""
    require_devices(8)
    desc = (
        "videotestsrc num-buffers=2 pattern=ball "
        "! video/x-raw,format=NV12,width=64,height=48 "
        "! vfmetalvideofilter noise=0.4 contrast=1.1 ! appsink"
    )
    plain = _run_plain(desc, 2)
    sp = _run_sp(desc, 2, {"dp": 1, "sp": 8})
    for a, b in zip(sp, plain):
        for k in a:
            d = np.abs(a[k].astype(int) - b[k].astype(int))
            assert d.max() <= 4
            assert (d > 0).mean() < 0.01  # <1% grain-hash outliers


# -- guards ------------------------------------------------------------------

def test_dp_single_stream_stateful_guarded():
    """VERDICT item 5: batch-splitting ONE stream across dp shards with a
    stateful element raises unless the caller asserts independent
    streams."""
    require_devices(8)
    p = parse_pipeline(
        "videotestsrc num-buffers=4 "
        "! video/x-raw,format=NV12,width=64,height=48 "
        "! vfmetaldeinterlace method=greedyh ! appsink"
    )
    p.negotiate()
    p.build()
    m = pmesh.make_mesh({"dp": 4})
    with pytest.raises(ValueError, match="independent_streams"):
        p.run_batched(4, batch_size=4, mesh=m)
    # the explicit opt-in runs (per-shard histories by design)
    assert p.run_batched(4, batch_size=4, mesh=m,
                         independent_streams=True) == 4


def test_dp_stateless_chain_needs_no_optin():
    require_devices(8)
    p = parse_pipeline(
        "videotestsrc num-buffers=4 "
        "! video/x-raw,format=NV12,width=64,height=48 "
        "! vfmetaldeinterlace method=bob "
        "! vfmetalvideofilter contrast=1.2 ! appsink"
    )
    p.negotiate()
    p.build()
    m = pmesh.make_mesh({"dp": 4})
    assert p.run_batched(4, batch_size=4, mesh=m) == 4


def test_sp_scaling_chain_accepted():
    """Scaling chains row-shard since the all_gather resampler landed
    (they were rejected before); bit-parity is covered by the
    test_sp_convertscale_scaled_bit_exact suite below."""
    require_devices(8)
    p = parse_pipeline(
        "videotestsrc num-buffers=2 "
        "! video/x-raw,format=NV12,width=64,height=48 "
        "! vfmetalconvertscale ! video/x-raw,format=BGRA,width=32,height=24 "
        "! appsink"
    )
    p.negotiate()
    p.build()
    m = pmesh.make_mesh({"dp": 2, "sp": 2})
    assert p.run_batched(2, batch_size=2, mesh=m, sp_axis="sp") == 2


def test_sp_rejects_bad_height():
    require_devices(8)
    # quad-provisioned NV12 chains SURVIVE a misaligned height since
    # round 5 (proportional phase-row padding) — bitwise vs unsharded
    p = parse_pipeline(
        "videotestsrc num-buffers=2 "
        "! video/x-raw,format=NV12,width=64,height=36 "
        "! vfmetalvideofilter contrast=1.2 ! appsink"
    )
    p.negotiate()
    p.build()
    m = pmesh.make_mesh({"dp": 1, "sp": 8})  # 36 % 8 != 0
    p.run_batched(2, batch_size=2, mesh=m, sp_axis="sp")
    ref = parse_pipeline(
        "videotestsrc num-buffers=2 "
        "! video/x-raw,format=NV12,width=64,height=36 "
        "! vfmetalvideofilter contrast=1.2 ! appsink"
    )
    ref.negotiate()
    ref.build()
    ref.run()
    for fa, fb in zip(p.sinks[0].frames, ref.sinks[0].frames):
        for k in fa:
            np.testing.assert_array_equal(fa[k], fb[k])
    # an RGB (non-quad-provisioned) chain has no phase plan to pad:
    # the height check still rejects at dispatch time
    r = parse_pipeline(
        "videotestsrc num-buffers=2 "
        "! video/x-raw,format=BGRA,width=64,height=36 "
        "! vfmetalvideofilter contrast=1.2 ! appsink"
    )
    r.negotiate()
    r.build()
    with pytest.raises(ValueError, match="height"):
        r.run_batched(2, batch_size=2, mesh=m, sp_axis="sp")


def test_sp_axis_unknown_rejected():
    require_devices(8)
    p = parse_pipeline(
        "videotestsrc num-buffers=8 "
        "! video/x-raw,format=NV12,width=64,height=64 "
        "! vfmetalvideofilter contrast=1.2 ! appsink"
    )
    p.negotiate()
    p.build()
    m = pmesh.make_mesh({"dp": 8})
    with pytest.raises(ValueError, match="sp_axis"):
        p.run_batched(8, batch_size=8, mesh=m, sp_axis="sp")


COMP_SP = (
    "videotestsrc num-buffers={n} pattern=smpte "
    "! video/x-raw,format=BGRA,width=128,height=64 ! c.sink_0 "
    "videotestsrc num-buffers={n} pattern=ball "
    "! video/x-raw,format=NV12,width=38,height=24 ! c.sink_1 "
    "vfmetalcompositor name=c background=black sink_1::xpos=89 "
    "sink_1::ypos=17 sink_1::alpha=0.8 {tail} ! appsink"
)


@pytest.mark.parametrize("tail", [
    "! video/x-raw,format=BGRA",
    "! video/x-raw,format=BGRA ! vfmetalvideofilter sharpness=0.5",
])
def test_sp_compositor_bit_exact(tail):
    """Compositor under sp row sharding: pad branches replicate, the
    canvas row-shards with masked draws (render_masked) — bit-exact vs
    the unsharded run, incl. an odd-size pad whose rect straddles shard
    boundaries and a downstream sharded stencil."""
    require_devices(8)
    desc = COMP_SP.format(n=2, tail=tail)
    plain = _run_plain(desc, 2)
    sp = _run_sp(desc, 2, {"dp": 2, "sp": 4})
    assert len(sp) == len(plain) == 2
    for a, b in zip(sp, plain):
        assert_frames_equal(a, b)


def test_sp_compositor_with_overlay_fold(tmp_path):
    """The folded overlay's mix also row-shards (pad+shard_rows in the
    masked body)."""
    require_devices(8)
    import tpuvf.io.png as pngio

    img = np.zeros((10, 14, 4), np.uint8)
    img[..., 0] = 255
    img[..., 3] = 128
    ov = str(tmp_path / "ov.png")
    pngio.write(ov, img)
    desc = (
        "videotestsrc num-buffers=2 pattern=smpte "
        "! video/x-raw,format=BGRA,width=64,height=64 ! c.sink_0 "
        "vfmetalcompositor name=c background=white "
        f"! vfmetaloverlay location={ov} x=20 y=28 ! appsink"
    )
    plain = _run_plain(desc, 2)
    sp = _run_sp(desc, 2, {"dp": 2, "sp": 4})
    for a, b in zip(sp, plain):
        assert_frames_equal(a, b)


def test_sp_pad_chroma_edge_rows_bit_exact():
    """Round-3 review finding 1: pad planes are REPLICATED under sp, so
    pad sampling must trace with the spatial context SUSPENDED — with the
    axis live, the 4:2:0 chroma row-upsample halo ppermutes an unsharded
    operand and interior shards read the plane's OPPOSITE edge row.  An
    asymmetric pattern (smpte) with the pad's top row on an interior
    shard exposes it (the symmetric ball pattern masks it)."""
    require_devices(8)
    desc = (
        "videotestsrc num-buffers=2 pattern=smpte "
        "! video/x-raw,format=BGRA,width=128,height=64 ! c.sink_0 "
        "videotestsrc num-buffers=2 pattern=smpte "
        "! video/x-raw,format=NV12,width=38,height=24 ! c.sink_1 "
        "vfmetalcompositor name=c background=black sink_1::xpos=30 "
        "sink_1::ypos=40 ! appsink"
    )
    plain = _run_plain(desc, 2)
    sp = _run_sp(desc, 2, {"dp": 1, "sp": 4})
    for a, b in zip(sp, plain):
        assert_frames_equal(a, b)


def test_sp_stateful_pad_branch_multi_batch_bit_exact():
    """Round-3 review finding 2: a replicated pad branch's plane-shaped
    STATE (deinterlace prev-frame) must keep its replication in the
    shard_map out_specs — sharding it stacked the replicas into an
    n_sp-times-too-tall state, crashing the SECOND batch's re-feed."""
    require_devices(8)
    desc = (
        "videotestsrc num-buffers=4 pattern=smpte "
        "! video/x-raw,format=NV12,width=64,height=64 "
        "! vfmetaldeinterlace method=greedyh ! c.sink_0 "
        "vfmetalcompositor name=c background=black ! appsink"
    )
    plain = _run_plain(desc, 4, batch_size=2)
    sp = _run_sp(desc, 4, {"dp": 1, "sp": 2}, batch_size=2)
    assert len(sp) == len(plain) == 4
    for a, b in zip(sp, plain):
        assert_frames_equal(a, b)


def test_sp_state_continuity_across_calls_bit_exact():
    """Round-3 review: the mesh path must publish the updated per-shard
    state, so a second run_batched(mesh=...) call — and a following
    non-mesh call (a dp=1 tiled state is the exact global stream state) —
    continues the stream exactly like the non-mesh path does across
    calls, instead of replaying the first-frame bob fallback.  (Each
    call restarts the source clock at frame 0; only STATE carries — the
    reference is therefore a non-mesh pipeline called the same way.)"""
    require_devices(8)
    desc = (
        "videotestsrc num-buffers=2 pattern=ball "
        "! video/x-raw,format=NV12,width=64,height=48 "
        "! vfmetaldeinterlace method=greedyh ! appsink"
    )
    plain = parse_pipeline(desc)
    plain.negotiate()
    plain.build()
    for _ in range(3):
        plain.run_batched(2, batch_size=2)
    p = parse_pipeline(desc)
    p.negotiate()
    p.build()
    m = pmesh.make_mesh({"dp": 1, "sp": 2})
    # two mesh calls (second resumes the held tiled state) + one
    # non-mesh call (resumes via self._state published from dp=1)
    p.run_batched(2, batch_size=2, mesh=m, sp_axis="sp")
    p.run_batched(2, batch_size=2, mesh=m, sp_axis="sp")
    p.run_batched(2, batch_size=2)
    frames = p.sinks[0].frames
    assert len(frames) == len(plain.sinks[0].frames) == 6
    for a, b in zip(frames, plain.sinks[0].frames):
        assert_frames_equal(a, b)


def test_sp_tee_multi_sink_bit_exact():
    """tee fan-out under sp: both branches (one with a vertical stencil)
    row-shard and every sink bit-matches the unsharded run."""
    require_devices(8)
    desc = (
        "videotestsrc num-buffers=2 pattern=ball "
        "! video/x-raw,format=NV12,width=64,height=48 "
        "! vfmetalconvertscale ! video/x-raw,format=BGRA ! tee name=t "
        "t. ! appsink name=a "
        "t. ! vfmetalvideofilter sharpness=0.5 contrast=1.2 "
        "! appsink name=b"
    )
    plain = parse_pipeline(desc)
    plain.negotiate()
    plain.build()
    plain.run_batched(2, batch_size=2)
    sp = parse_pipeline(desc)
    sp.negotiate()
    sp.build()
    m = pmesh.make_mesh({"dp": 2, "sp": 4})
    sp.run_batched(2, batch_size=2, mesh=m, sp_axis="sp")
    for sk in ("a", "b"):
        assert len(sp[sk].frames) == len(plain[sk].frames) == 2
        for fa, fb in zip(sp[sk].frames, plain[sk].frames):
            assert_frames_equal(fa, fb)


def test_sp_rejects_branch_conflict(tmp_path):
    """A branch feeding BOTH a compositor pad and its own sink cannot
    row-shard (replicated vs sharded conflict)."""
    require_devices(8)
    p = parse_pipeline(
        "videotestsrc num-buffers=2 "
        "! video/x-raw,format=BGRA,width=64,height=64 ! tee name=t "
        "t. ! identity ! c.sink_0 t. ! appsink name=side "
        "vfmetalcompositor name=c ! appsink name=main"
    )
    p.negotiate()
    p.build()
    m = pmesh.make_mesh({"dp": 2, "sp": 4})
    with pytest.raises(ValueError, match="row-shard"):
        p.run_batched(2, batch_size=2, mesh=m, sp_axis="sp")


# -- resampling under sp (all_gather + sharded output rows) ----------------
# The frame-global row contractions (scaling matmuls, rotations) gather
# their input rows over the sp axis and compute only each shard's output
# band (spctx.all_rows / sample.apply_separable / convert.plan_axis_sampler).


@pytest.mark.parametrize("method", ["bilinear", "nearest"])
@pytest.mark.parametrize("fmt_in,fmt_out,wh", [
    ("NV12", "BGRA", (64, 48, 128, 96)),    # 4:2:0 up, format convert
    ("BGRA", "BGRA", (128, 96, 48, 24)),    # RGB down, non-integral ratio
    ("I420", "NV12", (96, 72, 64, 48)),     # planar->planar down
])
def test_sp_convertscale_scaled_bit_exact(method, fmt_in, fmt_out, wh):
    """Scaled convertscale row-shards: in/out heights both divide sp with
    even rows/shard; dense row matmuls gather + slice, chroma planes ride
    the same path at half rows."""
    require_devices(8)
    iw, ih, ow, oh = wh
    desc = (
        f"videotestsrc num-buffers=2 pattern=smpte "
        f"! video/x-raw,format={fmt_in},width={iw},height={ih} "
        f"! vfmetalconvertscale method={method} "
        f"! video/x-raw,format={fmt_out},width={ow},height={oh} ! appsink"
    )
    plain = _run_plain(desc, 2)
    sp = _run_sp(desc, 2, {"dp": 2, "sp": 4})
    assert len(sp) == len(plain) == 2
    for a, b in zip(sp, plain):
        assert_frames_equal(a, b)


def test_sp_convertscale_letterbox_bit_exact():
    """add-borders letterbox under sp: the border mask (a full-height
    params buffer) slices to each shard's rows; border rows land on the
    right shards."""
    require_devices(8)
    desc = (
        "videotestsrc num-buffers=2 pattern=ball "
        "! video/x-raw,format=BGRA,width=128,height=32 "
        "! vfmetalconvertscale add-borders=true border-color=0xFF2040C0 "
        "! video/x-raw,format=BGRA,width=64,height=64 ! appsink"
    )
    plain = _run_plain(desc, 2)
    sp = _run_sp(desc, 2, {"dp": 1, "sp": 8})
    for a, b in zip(sp, plain):
        assert_frames_equal(a, b)


@pytest.mark.parametrize("tmethod", [
    "clockwise", "rotate-180", "vertical-flip", "upper-left-diagonal",
])
def test_sp_transform_fast_ops_bit_exact(tmethod):
    """Square fast layout ops permute GLOBAL rows — under sp they gather
    rows, apply, and keep the local band (apply_fast)."""
    require_devices(8)
    desc = (
        "videotestsrc num-buffers=2 pattern=smpte "
        "! video/x-raw,format=BGRA,width=64,height=64 "
        f"! vfmetaltransform method={tmethod} ! appsink"
    )
    plain = _run_plain(desc, 2)
    sp = _run_sp(desc, 2, {"dp": 2, "sp": 4})
    for a, b in zip(sp, plain):
        assert_frames_equal(a, b)


@pytest.mark.parametrize("tmethod,fmt", [
    ("clockwise", "BGRA"),        # anti-diagonal dense (non-square)
    ("counterclockwise", "NV12"),  # anti-diagonal dense + chroma planes
    ("rotate-180", "NV12"),        # diagonal dense with crop voids
])
def test_sp_transform_crop_rotate_bit_exact(tmethod, fmt):
    """Dense UV sampling under sp: the transposed operand carries the
    sharded axis in the last position (gathered along -1), crop voids
    slice the black-out mask per shard."""
    require_devices(8)
    desc = (
        "videotestsrc num-buffers=2 pattern=ball "
        f"! video/x-raw,format={fmt},width=96,height=48 "
        f"! vfmetaltransform method={tmethod} crop-left=10 crop-top=6 "
        "! appsink"
    )
    plain = _run_plain(desc, 2)
    sp = _run_sp(desc, 2, {"dp": 2, "sp": 4})
    for a, b in zip(sp, plain):
        assert_frames_equal(a, b)


def test_sp_scaled_chain_with_stencil_bit_exact():
    """Scaling into a sharded stencil chain: resample (gather+slice) feeds
    the videofilter's halo-exchanged blur — the downstream stencil sees
    correctly sharded rows."""
    require_devices(8)
    desc = (
        "videotestsrc num-buffers=2 pattern=smpte "
        "! video/x-raw,format=NV12,width=128,height=96 "
        "! vfmetalconvertscale ! video/x-raw,format=NV12,width=64,height=48 "
        "! vfmetalvideofilter sharpness=-0.6 saturation=1.3 ! appsink"
    )
    plain = _run_plain(desc, 2)
    sp = _run_sp(desc, 2, {"dp": 2, "sp": 4})
    for a, b in zip(sp, plain):
        assert_frames_equal(a, b)


@pytest.mark.parametrize("fmt_in,fmt_out,wh", [
    ("UYVY", "BGRA", (64, 48, 32, 24)),   # packed in, scaled decode
    ("NV12", "YUY2", (64, 48, 64, 48)),   # packed out, identity
    ("UYVY", "UYVY", (64, 96, 32, 48)),   # packed both sides, scaled
    # round 4: packed 4:2:2 INPUT identity rides the can_split_422
    # column-phase plan (u_e = u_o = u) — must compose with sp rows
    ("UYVY", "BGRA", (64, 48, 64, 48)),   # identity split -> packed32 edge
    ("YUY2", "NV12", (64, 48, 64, 48)),   # identity split -> 4:2:0 edge
])
def test_sp_packed_422_bit_exact(fmt_in, fmt_out, wh):
    """Packed 4:2:2 under sp: macro-pixels exist only at the host edge —
    device planes are planar with full-height chroma (nearest decode per
    row; 4:2:2 output pack is a horizontal pair average)."""
    require_devices(8)
    iw, ih, ow, oh = wh
    desc = (
        "videotestsrc num-buffers=2 pattern=smpte "
        f"! video/x-raw,format={fmt_in},width={iw},height={ih} "
        f"! vfmetalconvertscale "
        f"! video/x-raw,format={fmt_out},width={ow},height={oh} ! appsink"
    )
    plain = _run_plain(desc, 2)
    sp = _run_sp(desc, 2, {"dp": 2, "sp": 4})
    assert len(sp) == len(plain) == 2
    for a, b in zip(sp, plain):
        assert_frames_equal(a, b)


def test_sp_compositor_animated_geometry_bit_exact():
    """Animating pad geometry (off-baked xpos/ypos/operator) under sp row
    sharding: the general variant's render_general_sp places sources via
    canvas-padded traced dynamic slices — bit-exact vs the unsharded run,
    incl. a negative offset (top-crop) and a rect straddling shards."""
    require_devices(8)
    desc = (
        "videotestsrc num-buffers=2 pattern=smpte "
        "! video/x-raw,format=BGRA,width=128,height=64 ! c.sink_0 "
        "videotestsrc num-buffers=2 pattern=ball "
        "! video/x-raw,format=NV12,width=38,height=24 ! c.sink_1 "
        "vfmetalcompositor name=c background=black sink_1::xpos=89 "
        "sink_1::ypos=17 sink_1::alpha=0.8 "
        "! video/x-raw,format=BGRA ! appsink"
    )

    def animate(p):
        bag = p["c"].get_pad("sink_1")
        bag.set("xpos", 40)   # off-baked -> general variant
        bag.set("ypos", -6)   # negative: top-cropped
        assert not p._maybe_rebuild()

    p1 = parse_pipeline(desc)
    p1.negotiate(); p1.build(); animate(p1)
    p1.run_batched(2, batch_size=2)
    plain = p1.sinks[0].frames

    p2 = parse_pipeline(desc)
    p2.negotiate(); p2.build(); animate(p2)
    m = pmesh.make_mesh({"dp": 2, "sp": 4})
    p2.run_batched(2, batch_size=2, mesh=m, sp_axis="sp")
    sp = p2.sinks[0].frames
    assert len(sp) == len(plain) == 2
    for a, b in zip(sp, plain):
        assert_frames_equal(a, b)


def test_sp_compositor_animated_operator_bit_exact():
    """Animating the blend operator under sp (SOURCE select rides the
    traced rect mask in the sharded general body)."""
    require_devices(8)
    desc = (
        "videotestsrc num-buffers=2 pattern=smpte "
        "! video/x-raw,format=BGRA,width=64,height=64 ! c.sink_0 "
        "videotestsrc num-buffers=2 pattern=white "
        "! video/x-raw,format=BGRA,width=24,height=16 ! c.sink_1 "
        "vfmetalcompositor name=c background=checker sink_1::xpos=10 "
        "sink_1::ypos=30 sink_1::alpha=0.5 ! appsink"
    )

    def animate(p):
        bag = p["c"].get_pad("sink_1")
        bag.set("operator", 2)  # add (baked: over)
        assert not p._maybe_rebuild()

    p1 = parse_pipeline(desc)
    p1.negotiate(); p1.build(); animate(p1)
    p1.run_batched(2, batch_size=2)
    plain = p1.sinks[0].frames

    p2 = parse_pipeline(desc)
    p2.negotiate(); p2.build(); animate(p2)
    m = pmesh.make_mesh({"dp": 1, "sp": 8})
    p2.run_batched(2, batch_size=2, mesh=m, sp_axis="sp")
    sp = p2.sinks[0].frames
    for a, b in zip(sp, plain):
        assert_frames_equal(a, b)


def test_sp_downscale2x_bit_exact():
    """Exactly-2:1 downscale under sp row sharding: the closed-form row
    pair average is shard-local (even per-shard rows by construction —
    each shard's output band is half its input band), so no all-gather
    and BIT-equality with the unsharded run."""
    require_devices(2)
    desc = ("videotestsrc num-buffers=2 ! "
            "video/x-raw,format=NV12,width=128,height=96 ! "
            "vfmetalconvertscale ! "
            "video/x-raw,format=BGRA,width=64,height=48 ! "
            "vfmetalvideofilter contrast=1.2 ! appsink")
    plain = _run_plain(desc, 2)
    sp = _run_sp(desc, 2, {"dp": 1, "sp": 2})
    assert len(sp) == len(plain) == 2
    for a, b in zip(sp, plain):
        assert_frames_equal(a, b)


# -- round 4: quad/grid phase plans COMPOSE with sp row sharding -------------
# A row shard of the phase planes is a contiguous frame band (phase row i
# of shard s is global phase row s*rows+i); cross-row-phase stencils
# (blur9_v_split, blur9_grid4, deinterlace interp taps, the grid 2x row
# stencils) exchange spctx halos with FRAME-global edge clamps.  Oracle
# per the sp fuzzer convention: BITWISE across two sp layouts (halo bugs
# are layout-dependent and cannot survive that), <= 1 LSB vs unsharded
# (XLA FMA-contraction differs across program shapes).


def _assert_close_1lsb(sp_frames, plain_frames, frac=0.005):
    assert len(sp_frames) == len(plain_frames)
    for a, b in zip(sp_frames, plain_frames):
        pa = a if isinstance(a, dict) else {"m": a}
        pb = b if isinstance(b, dict) else {"m": b}
        assert set(pa) == set(pb)
        for k in pa:
            d = np.abs(np.asarray(pa[k]).astype(np.int32)
                       - np.asarray(pb[k]).astype(np.int32))
            assert d.max() <= 1, (k, int(d.max()))
            assert (d > 0).mean() < frac, (k, float((d > 0).mean()))


def _assert_quad_plan(desc, expect=True):
    from tpuvf.cli.launch import parse_pipeline as _pp

    p = _pp(desc)
    p.negotiate()
    p.build()
    has = (any(v == "quad" for v in p._source_split.values())
           or any(m[0] in ("quad", "grid") or m[1] in
                  ("quad", "grid", "packed32q", "packed16q",
                   "packed32g", "packed420g")
                  for m in (p.link_plan or {}).values()))
    assert has == expect, (p._source_split, p.link_plan)


QUAD_SP_CHAIN = (
    "videotestsrc num-buffers=2 pattern=smpte "
    "! video/x-raw,format=NV12,width=96,height=64 "
    "! vfmetalconvertscale ! video/x-raw,format=BGRA "
    "! vfmetalvideofilter brightness=0.1 contrast=1.2 vignette=0.4 "
    "! appsink"
)


def test_sp_quad_chain_layouts_bitwise():
    """Quad-linked identity chain under sp=2 and sp=4 (16 phase rows ->
    8 and 4 per shard): bitwise across layouts, <= 1 LSB vs unsharded."""
    require_devices(4)
    _assert_quad_plan(QUAD_SP_CHAIN)
    plain = _run_plain(QUAD_SP_CHAIN, 2)
    sp2 = _run_sp(QUAD_SP_CHAIN, 2, {"dp": 1, "sp": 2})
    sp4 = _run_sp(QUAD_SP_CHAIN, 2, {"dp": 1, "sp": 4})
    for a, b in zip(sp2, sp4):
        assert_frames_equal(a, b)
    _assert_close_1lsb(sp2, plain)


def test_sp_quad_sharpness_halo():
    """blur9_v_split under quad+sp: the 9-tap vertical blur's cross-row-
    phase taps reach 2 phase rows across the shard boundary (spctx halo)
    and its frame-edge clamps compare GLOBAL phase rows."""
    require_devices(4)
    desc = QUAD_SP_CHAIN.replace("vignette=0.4", "sharpness=0.7")
    _assert_quad_plan(desc)
    plain = _run_plain(desc, 2)
    sp2 = _run_sp(desc, 2, {"dp": 1, "sp": 2})
    sp4 = _run_sp(desc, 2, {"dp": 1, "sp": 4})
    for a, b in zip(sp2, sp4):
        assert_frames_equal(a, b)
    _assert_close_1lsb(sp2, plain)


def test_sp_quad_deinterlace_fields():
    """Deinterlace under quad+sp: fields ARE row phases, the kept field
    passes through and the interp taps (interp_even_t/interp_odd_t)
    exchange halos with cross-phase frame-edge clamps."""
    require_devices(4)
    desc = (
        "videotestsrc num-buffers=2 pattern=ball "
        "! video/x-raw,format=NV12,width=96,height=64 "
        "! vfmetaldeinterlace method=bob "
        "! vfmetalvideofilter contrast=1.2 "
        "! vfmetalconvertscale ! video/x-raw,format=BGRA ! appsink"
    )
    plain = _run_plain(desc, 2)
    sp2 = _run_sp(desc, 2, {"dp": 1, "sp": 2})
    sp4 = _run_sp(desc, 2, {"dp": 1, "sp": 4})
    for a, b in zip(sp2, sp4):
        assert_frames_equal(a, b)
    _assert_close_1lsb(sp2, plain)


def test_sp_quad_overlay_rect():
    """Overlay under quad+sp: each mod-2 phase piece pads to the full
    phase plane and slices this shard's row band (spctx.shard_rows)."""
    require_devices(2)
    import os
    from tpuvf.io import png as tpng

    path = "/tmp/tpuvf-sp-quad-overlay.png"
    if not os.path.exists(path):
        r = np.random.default_rng(11)
        tpng.write(path, r.integers(0, 256, (10, 14, 4)).astype(np.uint8))
    desc = (
        "videotestsrc num-buffers=2 pattern=smpte "
        "! video/x-raw,format=NV12,width=96,height=64 "
        f"! vfmetaloverlay location={path} x=21 y=13 alpha=0.7 "
        "! vfmetalvideofilter contrast=1.2 "
        "! vfmetalconvertscale ! video/x-raw,format=BGRA ! appsink"
    )
    plain = _run_plain(desc, 2)
    sp2 = _run_sp(desc, 2, {"dp": 1, "sp": 2})
    _assert_close_1lsb(sp2, plain)


def test_sp_grid_upscale_chain():
    """Grid16 2x-upscale chain under sp: 16 input phase rows (64/4)
    split over sp=2; the _grid2x_rows stencils exchange halos via
    shift_rows_cross_phase with frame-global clamps."""
    require_devices(4)
    desc = (
        "videotestsrc num-buffers=2 pattern=smpte "
        "! video/x-raw,format=NV12,width=96,height=64 "
        "! vfmetalconvertscale "
        "! video/x-raw,format=BGRA,width=192,height=128 "
        "! vfmetalvideofilter brightness=0.1 contrast=1.2 "
        "! appsink"
    )
    plain = _run_plain(desc, 2)
    sp2 = _run_sp(desc, 2, {"dp": 1, "sp": 2})
    sp4 = _run_sp(desc, 2, {"dp": 1, "sp": 4})
    for a, b in zip(sp2, sp4):
        assert_frames_equal(a, b)
    _assert_close_1lsb(sp2, plain, frac=0.02)


def test_sp_grid420_format_preserving_upscale():
    """packed420g (NV12 -> NV12 2x upscale) under sp row sharding."""
    require_devices(2)
    desc = (
        "videotestsrc num-buffers=2 pattern=ball "
        "! video/x-raw,format=NV12,width=96,height=64 "
        "! vfmetalconvertscale "
        "! video/x-raw,format=NV12,width=192,height=128 "
        "! appsink"
    )
    plain = _run_plain(desc, 2)
    sp2 = _run_sp(desc, 2, {"dp": 1, "sp": 2})
    _assert_close_1lsb(sp2, plain, frac=0.02)


def test_sp_quad_dp_mesh_combined():
    """dp=2 x sp=2 on the quad plan: per-shard batch scan + row shards."""
    require_devices(4)
    plain = _run_plain(QUAD_SP_CHAIN, 2)
    spdp = _run_sp(QUAD_SP_CHAIN, 2, {"dp": 2, "sp": 2}, batch_size=2)
    _assert_close_1lsb(spdp, plain)


def test_sp_upscale4x_closed_form():
    """kx integer upsample closed form (round 4) under sp row sharding:
    phase stencils are row-local with 1-row halos; bitwise across sp
    layouts, <= 1 LSB vs unsharded."""
    require_devices(4)
    desc = ("videotestsrc num-buffers=2 pattern=smpte "
            "! video/x-raw,format=NV12,width=64,height=48 "
            "! vfmetalconvertscale "
            "! video/x-raw,format=BGRA,width=256,height=192 "
            "! vfmetalvideofilter contrast=1.2 ! appsink")
    plain = _run_plain(desc, 2)
    sp2 = _run_sp(desc, 2, {"dp": 1, "sp": 2})
    sp4 = _run_sp(desc, 2, {"dp": 1, "sp": 4})
    for a, b in zip(sp2, sp4):
        assert_frames_equal(a, b)
    _assert_close_1lsb(sp2, plain, frac=0.02)


# -- round 5: MISALIGNED sp counts keep the quad/grid plan via row padding --
# When phase rows don't split evenly over sp (e.g. 32 phase rows at sp=3),
# the pipeline bottom-pads every sharded plane PROPORTIONALLY to the next
# alignment (Pipeline._sp_pad_plan) instead of rebuilding on the
# column-split plan; stencil frame-edge clamps stay exact because
# spctx.total_rows/frame_last_row are true-frame aware, and pad-row
# outputs are cropped at readback.  Oracle: bitwise across two padded
# layouts that share the pad (sp=3 and sp=6 both pad 64 -> 72), <= 1 LSB
# vs unsharded (VERDICT r4 item 2 done-condition).


def _run_sp_pipeline(desc, n, axes, sp_axis="sp", batch_size=None, **kw):
    p = parse_pipeline(desc)
    p.negotiate()
    p.build()
    m = pmesh.make_mesh(axes)
    p.run_batched(n, batch_size=batch_size or n, mesh=m, sp_axis=sp_axis,
                  **kw)
    return p


def _assert_pad_kept_quad(p, expect_ratio):
    assert p._sp_row_pad == expect_ratio, p._sp_row_pad
    assert any(v == "quad" for v in p._source_split.values()), \
        "quad plan must survive misaligned sp via row padding"


def test_sp_quad_misaligned_pads_and_keeps_plan():
    require_devices(6)
    plain = _run_plain(QUAD_SP_CHAIN, 2)
    p3 = _run_sp_pipeline(QUAD_SP_CHAIN, 2, {"dp": 1, "sp": 3})
    _assert_pad_kept_quad(p3, (64, 72))
    p6 = _run_sp_pipeline(QUAD_SP_CHAIN, 2, {"dp": 1, "sp": 6})
    _assert_pad_kept_quad(p6, (64, 72))
    sp3 = p3.sinks[0].frames
    sp6 = p6.sinks[0].frames
    for a, b in zip(sp3, sp6):
        assert_frames_equal(a, b)
    _assert_close_1lsb(sp3, plain)


def test_sp_quad_misaligned_sharpness_halo():
    """blur9_v_split across a PADDED shard boundary: the frame-bottom
    clamp must read the true last phase row (a pad row sits below it)."""
    require_devices(3)
    desc = QUAD_SP_CHAIN.replace("vignette=0.4", "sharpness=0.7")
    plain = _run_plain(desc, 2)
    p3 = _run_sp_pipeline(desc, 2, {"dp": 1, "sp": 3})
    _assert_pad_kept_quad(p3, (64, 72))
    _assert_close_1lsb(p3.sinks[0].frames, plain)


def test_sp_grid_misaligned_two_heights():
    """Grid16 2x upscale carries TWO heights (64 in, 128 out) in exact
    ratio; one frame ratio pads both consistently (64->72, 128->144)."""
    require_devices(3)
    desc = (
        "videotestsrc num-buffers=2 pattern=smpte "
        "! video/x-raw,format=NV12,width=96,height=64 "
        "! vfmetalconvertscale "
        "! video/x-raw,format=BGRA,width=192,height=128 "
        "! vfmetalvideofilter brightness=0.1 contrast=1.2 "
        "! appsink"
    )
    plain = _run_plain(desc, 2)
    p3 = _run_sp_pipeline(desc, 2, {"dp": 1, "sp": 3})
    _assert_pad_kept_quad(p3, (64, 72))
    _assert_close_1lsb(p3.sinks[0].frames, plain, frac=0.02)


def test_sp_quad_misaligned_deinterlace_state_continuity():
    """greedyh prev-frame state pads with the planes, resumes padded
    across calls (_mesh_state), and crops back for non-mesh use."""
    require_devices(3)
    desc = (
        "videotestsrc num-buffers=4 pattern=ball "
        "! video/x-raw,format=NV12,width=96,height=64 "
        "! vfmetaldeinterlace method=greedyh "
        "! appsink"
    )
    ref = parse_pipeline(desc)
    ref.negotiate(); ref.build()
    ref.run_batched(2, batch_size=2)
    ref.run_batched(2, batch_size=2)
    p = parse_pipeline(desc)
    p.negotiate(); p.build()
    m = pmesh.make_mesh({"dp": 1, "sp": 3})
    p.run_batched(2, batch_size=2, mesh=m, sp_axis="sp")
    p.run_batched(2, batch_size=2, mesh=m, sp_axis="sp")
    _assert_pad_kept_quad(p, (64, 72))
    _assert_close_1lsb(p.sinks[0].frames, ref.sinks[0].frames)
    # published dp=1 state is CROPPED back to true rows for non-mesh use
    for leaf in jax.tree_util.tree_leaves(p._state):
        if np.ndim(leaf) >= 2:
            assert np.asarray(leaf).shape[-2] in (32, 16), leaf.shape


def test_sp_quad_misaligned_overlay_bottom_edge():
    """Overlay rect reaching the TRUE frame bottom under padding: phase
    pieces zero-extend through shard_rows, pad rows get no blend."""
    require_devices(3)
    import os
    from tpuvf.io import png as tpng

    path = "/tmp/tpuvf-sp-pad-overlay.png"
    if not os.path.exists(path):
        r = np.random.default_rng(11)
        tpng.write(path, r.integers(0, 256, (12, 14, 4)).astype(np.uint8))
    desc = (
        "videotestsrc num-buffers=2 pattern=smpte "
        "! video/x-raw,format=NV12,width=96,height=64 "
        "! vfmetalconvertscale ! video/x-raw,format=BGRA "
        f"! vfmetaloverlay location={path} x=9 y=52 alpha=0.7 "
        "! appsink"
    )
    plain = _run_plain(desc, 2)
    p3 = _run_sp_pipeline(desc, 2, {"dp": 1, "sp": 3})
    _assert_pad_kept_quad(p3, (64, 72))
    _assert_close_1lsb(p3.sinks[0].frames, plain)


def test_sp_quad_misaligned_dp_mesh_combined():
    require_devices(6)
    plain = _run_plain(QUAD_SP_CHAIN, 2)
    p = _run_sp_pipeline(QUAD_SP_CHAIN, 2, {"dp": 2, "sp": 3},
                         batch_size=2)
    _assert_pad_kept_quad(p, (64, 72))
    _assert_close_1lsb(p.sinks[0].frames, plain)


def test_sp_pad_does_not_apply_to_full_plans():
    """Padding is scoped to whole-chain phase plans: a full-plane chain
    with a misaligned height still gets the round-3 clear error."""
    require_devices(3)
    desc = ("videotestsrc num-buffers=2 "
            "! video/x-raw,format=BGRA,width=96,height=64 "
            "! vfmetaltransform method=clockwise "
            "! appsink")
    p = parse_pipeline(desc)
    p.negotiate(); p.build()
    m = pmesh.make_mesh({"dp": 1, "sp": 3})
    with pytest.raises(ValueError, match="cannot split|does not support"):
        p.run_batched(2, batch_size=2, mesh=m, sp_axis="sp")
