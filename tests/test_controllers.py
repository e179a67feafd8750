"""Per-frame controlled-property animation (GstController analog).

The reference snapshots element properties under GST_OBJECT_LOCK every
frame (gstvfmetalvideofilter.m:183-205), so a controller-driven ramp
animates frame-by-frame.  Element.control attaches a schedule;
Pipeline.run syncs it before every frame and Pipeline.run_batched scans
per-frame traced-scalar snapshots alongside the inputs — the two paths
must produce identical frames (VERDICT round-3 item 5)."""

import numpy as np
import pytest

from tpuvf.cli.launch import parse_pipeline

DESC = ("videotestsrc num-buffers=8 pattern=ball ! "
        "video/x-raw,format=BGRA,width=96,height=64 ! "
        "vfmetalvideofilter saturation=1.2 ! appsink")

RAMP = np.linspace(0.02, 0.3, 8).astype(np.float32)


def _vf(p):
    return next(e for e in p.elements if e.ELEMENT_NAME == "vfvideofilter")


def _run(schedule, batched, batch_size=8, calls=1):
    p = parse_pipeline(DESC)
    _vf(p).control("brightness", schedule)
    p.negotiate()
    p.build()
    if batched:
        for _ in range(calls):
            p.run_batched(8 // calls, batch_size=batch_size)
    else:
        p.run()
    return [np.asarray(f) for f in p.sinks[0].frames]


def test_ramp_batched_matches_run_bitwise():
    """A brightness ramp over an 8-frame batch equals 8 per-frame run()
    outputs bitwise (the VERDICT done-condition)."""
    a = _run(RAMP, batched=False)
    b = _run(RAMP, batched=True)
    assert len(a) == len(b) == 8
    for i, (fa, fb) in enumerate(zip(a, b)):
        np.testing.assert_array_equal(fa, fb, err_msg=f"frame {i}")


def test_ramp_actually_animates():
    frames = _run(RAMP, batched=True)
    assert any(not np.array_equal(frames[0], f) for f in frames[1:])


def test_callable_schedule_and_clamping():
    """Callable schedules work; sequence schedules clamp at their last
    entry once exhausted."""
    fn = lambda i: float(RAMP[min(i, 7)])
    a = _run(fn, batched=True)
    b = _run(list(RAMP[:4]), batched=True)  # clamps at RAMP[3] for 4..7
    c = _run(list(RAMP[:4]) + [RAMP[3]] * 4, batched=True)
    np.testing.assert_array_equal(a[3], b[3])
    for i in range(8):
        np.testing.assert_array_equal(b[i], c[i])


def test_schedule_rides_the_pipeline_clock():
    """Controllers index OUTPUT frame number on the pipeline clock — the
    same k _select_buffers uses — so a schedule entry and a source
    buffer line up on the same timeline.  Each call restarts that clock
    (like buffer selection does): two 4-frame calls each replay frames
    0-3 of both the source and the schedule."""
    a = _run(RAMP, batched=True, calls=1)
    b = _run(RAMP, batched=True, batch_size=4, calls=2)
    assert len(b) == 8
    for i in range(4):
        np.testing.assert_array_equal(b[i], a[i], err_msg=f"frame {i}")
        np.testing.assert_array_equal(b[4 + i], a[i],
                                      err_msg=f"replayed frame {i}")


def test_multi_batch_single_call_spans_schedule():
    """One run_batched call split into two scan dispatches (batch_size=4)
    still walks the full 8-entry schedule."""
    a = _run(RAMP, batched=True, batch_size=8)
    b = _run(RAMP, batched=True, batch_size=4)
    for i in range(8):
        np.testing.assert_array_equal(b[i], a[i], err_msg=f"frame {i}")


def test_mixed_run_then_batched_same_clock():
    """run(4) then run_batched(4) both restart the pipeline clock, so
    both emit schedule frames 0-3 — identical to each other."""
    p = parse_pipeline(DESC)
    _vf(p).control("brightness", RAMP)
    p.negotiate(); p.build()
    p.run(4)
    p.run_batched(4)
    got = [np.asarray(f) for f in p.sinks[0].frames]
    assert len(got) == 8
    for i in range(4):
        np.testing.assert_array_equal(got[4 + i], got[i],
                                      err_msg=f"frame {i}")


def test_structure_flip_raises_at_control_time():
    """A sequence schedule that flips a static effect gate (gamma crossing
    1.0) raises IMMEDIATELY at control() with the offending frame index —
    not at dispatch, where a long job would die late (VERDICT r4 item 7)."""
    p = parse_pipeline(DESC)
    with pytest.raises(ValueError, match="frame 2"):
        _vf(p).control("gamma", [1.0, 1.0, 1.5, 1.5, 1.5, 1.5, 1.5, 1.5])
    # nothing attached after the failed control()
    assert not _vf(p)._controllers


def test_structure_flip_raises_in_batched_for_callable():
    """Callable schedules cannot be enumerated at control() time, so the
    gate-flip check stays at dispatch for them — still a clear error."""
    p = parse_pipeline(DESC)
    _vf(p).control("gamma", lambda i: 1.0 if i < 2 else 1.5)
    p.negotiate(); p.build()
    with pytest.raises(ValueError, match="structure"):
        p.run_batched(8)


def test_passthrough_flip_raises_at_control_time():
    """A schedule passing through the element's all-defaults point flips
    passthrough — also caught at control()."""
    p = parse_pipeline(DESC.replace(" saturation=1.2", ""))
    with pytest.raises(ValueError, match="frame 1"):
        _vf(p).control("brightness", [0.0, 0.1, 0.2])


def test_structure_flip_ok_in_run():
    """run() rebuilds per frame, so a gate-flipping schedule animates
    correctly there when explicitly allowed (matches per-frame property
    writes)."""
    sched = [1.0, 1.0, 1.5, 1.5, 1.5, 1.5, 1.5, 1.5]
    p = parse_pipeline(DESC)
    _vf(p).control("gamma", sched, allow_structure_change=True)
    p.negotiate(); p.build(); p.run()
    got = [np.asarray(f) for f in p.sinks[0].frames]

    # oracle: one pipeline per gamma value, no controller
    for i, g in enumerate(sched):
        q = parse_pipeline(DESC.replace(
            "vfmetalvideofilter saturation=1.2",
            f"vfmetalvideofilter saturation=1.2 gamma={g}"))
        q.negotiate(); q.build(); q.run(i + 1)
        np.testing.assert_array_equal(
            got[i], np.asarray(q.sinks[0].frames[i]), err_msg=f"frame {i}")


def test_control_validates_property_name():
    p = parse_pipeline(DESC)
    with pytest.raises(KeyError):
        _vf(p).control("no-such-prop", [0.1])
    el = _vf(p)
    el.control("brightness", [0.1])
    el.control("brightness", None)  # clears
    assert not el._controllers


# -- controllers under mesh mode (round-5: VERDICT r4 item 1) -------------
#
# The reference syncs controllable properties every frame regardless of
# how the pipeline runs (gstvfmetalvideofilter.m:183-205,
# gstvfmetalcompositorpad.m:282-315); the mesh path now matches: stacked
# per-frame schedule snapshots shard over dp with the batch and replicate
# over sp.


def _run_mesh(schedule, axes, sp_axis=None, batch_size=8):
    import jax

    from tpuvf.parallel.mesh import make_mesh

    need = int(np.prod(list(axes.values())))
    if len(jax.devices()) < need:
        pytest.skip(f"needs >= {need} devices")
    mesh = make_mesh(axes)
    p = parse_pipeline(DESC)
    _vf(p).control("brightness", schedule)
    p.negotiate()
    p.build()
    p.run_batched(8, batch_size=batch_size, mesh=mesh, sp_axis=sp_axis,
                  independent_streams=True)
    return [np.asarray(f) for f in p.sinks[0].frames]


def test_ramp_on_dp_sp_mesh_matches_run():
    """8-frame brightness ramp under dp=2 x sp=2 equals 8 per-frame run()
    outputs (<= 1 LSB: dp>1 batching flips knife-edge pixels even
    unsharded — CLAUDE.md round-3 batch-dim finding)."""
    a = _run(RAMP, batched=False)
    b = _run_mesh(RAMP, {"dp": 2, "sp": 2}, sp_axis="sp")
    assert len(a) == len(b) == 8
    for i, (fa, fb) in enumerate(zip(a, b)):
        diff = np.abs(fa.astype(np.int16) - fb.astype(np.int16))
        assert diff.max() <= 1, f"frame {i}: max diff {diff.max()}"
        assert not np.array_equal(fb, b[0]) or i == 0  # ramp animates


def test_ramp_on_sp_only_mesh_matches_run_bitwise():
    """sp-only meshes keep the batch shape, so the ramp is BITWISE equal
    to run() (the round-3 sp contract extends to scanned schedules)."""
    a = _run(RAMP, batched=False)
    b = _run_mesh(RAMP, {"dp": 1, "sp": 4}, sp_axis="sp")
    for i, (fa, fb) in enumerate(zip(a, b)):
        np.testing.assert_array_equal(fa, fb, err_msg=f"frame {i}")


def test_mesh_ramp_spans_batches_on_the_pipeline_clock():
    """Two dp=2 batches of 4 continue the schedule at frame 4 (the
    stacked snapshots index the global output-frame clock)."""
    a = _run_mesh(RAMP, {"dp": 2}, batch_size=8)
    b = _run_mesh(RAMP, {"dp": 2}, batch_size=4)
    assert len(a) == len(b) == 8
    for i in range(8):
        diff = np.abs(a[i].astype(np.int16) - b[i].astype(np.int16))
        assert diff.max() <= 1, f"frame {i}: max diff {diff.max()}"


def test_mesh_tail_pad_with_controllers():
    """A 6-frame run at batch_size=4 pads the second batch's tail; the
    schedule stack pads by repeating its last row and the phantom
    outputs are dropped."""
    import jax

    from tpuvf.parallel.mesh import make_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    mesh = make_mesh({"dp": 2})
    p = parse_pipeline(DESC.replace("num-buffers=8", "num-buffers=6"))
    _vf(p).control("brightness", RAMP)
    p.negotiate(); p.build()
    p.run_batched(6, batch_size=4, mesh=mesh, independent_streams=True)
    got = [np.asarray(f) for f in p.sinks[0].frames]
    assert len(got) == 6
    ref = _run(RAMP, batched=False)
    for i in range(6):
        diff = np.abs(got[i].astype(np.int16) - ref[i].astype(np.int16))
        assert diff.max() <= 1, f"frame {i}: max diff {diff.max()}"


COMP_DESC = (
    "videotestsrc num-buffers=8 pattern=smpte ! "
    "video/x-raw,format=BGRA,width=64,height=48 ! comp.sink_0 "
    "videotestsrc num-buffers=8 pattern=ball ! "
    "video/x-raw,format=BGRA,width=32,height=24 ! comp.sink_1 "
    "vfcompositor name=comp sink_1::xpos=4 sink_1::ypos=6 ! appsink")


def _comp_frames(p):
    return [np.asarray(f) for f in p.sinks[0].frames]


def _comp(p):
    return next(e for e in p.elements if e.ELEMENT_NAME == "vfcompositor")


XPOS_RAMP = list(range(0, 32, 4))


def test_pad_xpos_ramp_run_matches_per_frame_writes():
    """Pad property schedules ("sink_1::xpos") animate in run() exactly
    like per-frame set() writes (xpos is traced: zero rebuilds)."""
    p = parse_pipeline(COMP_DESC)
    _comp(p).control("sink_1::xpos", XPOS_RAMP)
    p.negotiate(); p.build(); p.run()
    got = _comp_frames(p)

    for i, x in enumerate(XPOS_RAMP):
        q = parse_pipeline(COMP_DESC.replace("sink_1::xpos=4",
                                             f"sink_1::xpos={x}"))
        q.negotiate(); q.build(); q.run(i + 1)
        np.testing.assert_array_equal(
            got[i], np.asarray(q.sinks[0].frames[i]), err_msg=f"frame {i}")


def test_pad_xpos_ramp_batched_and_mesh_match_run():
    """The same pad ramp rides run_batched's scanned schedule stacks,
    with and without a dp x sp mesh (VERDICT r4 item 1 done-condition)."""
    import jax

    from tpuvf.parallel.mesh import make_mesh

    p = parse_pipeline(COMP_DESC)
    _comp(p).control("sink_1::xpos", XPOS_RAMP)
    p.negotiate(); p.build(); p.run()
    ref = _comp_frames(p)

    q = parse_pipeline(COMP_DESC)
    _comp(q).control("sink_1::xpos", XPOS_RAMP)
    q.negotiate(); q.build(); q.run_batched(8)
    for i, (fa, fb) in enumerate(zip(ref, _comp_frames(q))):
        np.testing.assert_array_equal(fa, fb, err_msg=f"frame {i}")

    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 devices")
    mesh = make_mesh({"dp": 2, "sp": 2})
    r = parse_pipeline(COMP_DESC)
    _comp(r).control("sink_1::xpos", XPOS_RAMP)
    r.negotiate(); r.build()
    r.run_batched(8, mesh=mesh, sp_axis="sp", independent_streams=True)
    for i, (fa, fb) in enumerate(zip(ref, _comp_frames(r))):
        diff = np.abs(fa.astype(np.int16) - fb.astype(np.int16))
        assert diff.max() <= 1, f"frame {i}: max diff {diff.max()}"


def test_pad_control_validates_static_pad_props():
    """zorder is a STATIC pad prop (changes draw order => structure):
    a zorder schedule raises at control() time."""
    p = parse_pipeline(COMP_DESC)
    with pytest.raises(ValueError, match="frame 1"):
        _comp(p).control("sink_1::zorder", [0, 1])
    with pytest.raises(KeyError):
        _comp(p).control("sink_1::no-such-prop", [0])
