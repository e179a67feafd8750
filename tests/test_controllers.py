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


def test_structure_flip_raises_in_batched():
    """A schedule that flips a static effect gate (gamma crossing 1.0)
    cannot animate inside one scanned program — clear error."""
    p = parse_pipeline(DESC)
    _vf(p).control("gamma", [1.0, 1.0, 1.5, 1.5, 1.5, 1.5, 1.5, 1.5])
    p.negotiate(); p.build()
    with pytest.raises(ValueError, match="structure"):
        p.run_batched(8)


def test_structure_flip_ok_in_run():
    """run() rebuilds per frame, so the same gate-flipping schedule
    animates correctly there (matches per-frame property writes)."""
    sched = [1.0, 1.0, 1.5, 1.5, 1.5, 1.5, 1.5, 1.5]
    p = parse_pipeline(DESC)
    _vf(p).control("gamma", sched)
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


def test_mesh_with_controllers_raises():
    import jax

    from tpuvf.parallel.mesh import make_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    mesh = make_mesh({"dp": 2})
    p = parse_pipeline(DESC)
    _vf(p).control("brightness", RAMP)
    p.negotiate(); p.build()
    with pytest.raises(ValueError, match="controlled properties"):
        p.run_batched(8, mesh=mesh, independent_streams=True)
