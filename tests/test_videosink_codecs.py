"""videosink, pngenc and vf-inspect tests."""

import numpy as np
import pytest

from tests.util import random_host_frame

from tpuvf.cli.launch import launch, parse_pipeline
from tpuvf.cli.inspect import format_element, main as inspect_main
from tpuvf.core.formats import VideoFormat
from tpuvf.core.registry import lookup, make
from tpuvf.core.spec import FrameSpec
from tpuvf.io import png

RNG = np.random.default_rng(41)


# -- videosink --------------------------------------------------------------

@pytest.mark.parametrize("fmt", ["BGRA", "RGBA", "NV12", "I420"])
def test_videosink_renders(fmt):
    pipe = parse_pipeline(
        f"videotestsrc num-buffers=2 ! video/x-raw,format={fmt},width=64,height=48 "
        "! vfmetalvideosink"
    )
    pipe.negotiate()
    pipe.build()
    pipe.run()
    sink = pipe.sinks[0]
    assert sink.frame_count == 2
    assert sink.window.shape == (48, 64, 4)


def test_videosink_aspect_fit_letterbox():
    sink = make("vfvideosink")
    sink.set_window_size(128, 48)  # wider than 64x48 video -> pillarbox
    spec = FrameSpec(VideoFormat.RGBA, 64, 48)
    host = np.full((48, 64, 4), 255, np.uint8)
    sink.prepare(spec)
    sink.consume(host, spec, 0)
    win = sink.window
    assert win.shape == (48, 128, 4)
    # display rect: 64-wide video scaled to 64x48 centered -> x in [32, 96)
    assert (win[:, :30, :3] == 0).all()     # left black bar
    assert (win[:, 98:, :3] == 0).all()     # right black bar
    assert (win[10, 64, :3] == 255).all()   # content
    assert sink._display_rect == (32, 0, 64, 48)


def test_videosink_stretch_without_aspect():
    sink = make("vfvideosink")
    sink.set_property("force-aspect-ratio", False)
    sink.set_window_size(128, 48)
    spec = FrameSpec(VideoFormat.RGBA, 64, 48)
    host = np.full((48, 64, 4), 200, np.uint8)
    host[..., 3] = 255
    sink.prepare(spec)
    sink.consume(host, spec, 0)
    assert (sink.window[:, :, 0] == 200).all()  # fills the whole window


def test_videosink_navigation_transform():
    sink = make("vfvideosink")
    sink.set_window_size(128, 48)
    spec = FrameSpec(VideoFormat.RGBA, 64, 48)
    sink.prepare(spec)
    sink.consume(random_host_frame(RNG, spec), spec, 0)
    events = []
    sink.navigation_callback = events.append
    ev = sink.send_navigation_event("mouse-move", 64.0, 24.0)  # window center
    assert ev["pointer_x"] == pytest.approx(32.0)  # video center x
    assert ev["pointer_y"] == pytest.approx(24.0)
    assert events
    # outside the display rect clamps into the video
    ev = sink.send_navigation_event("mouse-move", 0.0, 0.0)
    assert ev["pointer_x"] == 0.0
    # disabled navigation produces nothing
    sink.set_property("enable-navigation-events", False)
    assert sink.send_navigation_event("mouse-move", 10, 10) is None


def test_videosink_snapshot(tmp_path):
    pat = str(tmp_path / "f-%02d.png")
    launch(
        "videotestsrc num-buffers=2 ! video/x-raw,format=RGBA,width=32,height=24 "
        f"! vfmetalvideosink snapshot-location={pat}", quiet=True)
    img = png.read(str(tmp_path / "f-01.png"))
    assert img.shape == (24, 32, 4)


# -- pngenc -----------------------------------------------------------------

def test_pngenc_filesink(tmp_path):
    out = str(tmp_path / "frame.png")
    launch(
        "videotestsrc num-buffers=1 pattern=smpte "
        "! video/x-raw,format=RGBA,width=64,height=48 "
        f"! pngenc ! filesink location={out}", quiet=True)
    img = png.read(out)
    assert img.shape == (48, 64, 4)
    # smpte top-left bar is 75% white
    assert tuple(img[0, 0][:3]) == (191, 191, 191)


def test_pngenc_fixture_roundtrip_into_overlay(tmp_path):
    """The exact reference fixture flow: generate a PNG with a pipeline,
    then overlay it (test-overlay.sh:27-31 + :84-96)."""
    fixture = str(tmp_path / "overlay.png")
    launch(
        "videotestsrc num-buffers=1 pattern=red "
        "! video/x-raw,format=RGBA,width=16,height=16 "
        f"! pngenc ! filesink location={fixture}", quiet=True)
    n = launch(
        "videotestsrc num-buffers=2 ! video/x-raw,format=BGRA,width=64,height=48 "
        f"! vfmetaloverlay location={fixture} x=10 y=10 ! fakesink", quiet=True)
    assert n == 2


# -- vf-inspect -------------------------------------------------------------

def test_inspect_videofilter_properties():
    text = format_element(lookup("vfmetalvideofilter"))
    for prop in ("brightness", "contrast", "saturation", "hue", "gamma",
                 "sharpness", "sepia", "invert", "noise", "vignette",
                 "chroma-key-enabled", "chroma-key-color", "lut-file"):
        assert prop in text, prop
    assert "controllable" in text
    assert "Range: -1.0 - 1.0" in text


def test_inspect_compositor_pad_props():
    text = format_element(lookup("vfmetalcompositor"))
    for prop in ("xpos", "ypos", "alpha", "operator", "sizing-policy", "zorder"):
        assert prop in text, prop
    assert "keep-aspect-ratio" in text


def test_inspect_main(capsys):
    assert inspect_main([]) == 0
    out = capsys.readouterr().out
    assert "vfconvertscale" in out
    assert inspect_main(["vfmetaltransform"]) == 0
    assert inspect_main(["nope"]) == 1


# -- codec-chain placement + failure attribution (round-2 hardening) ---------

def test_pngenc_behind_queue_still_encodes(tmp_path):
    """pngenc ! queue ! filesink must encode (the codec walk crosses
    passthrough elements) — previously wrote raw plane bytes silently."""
    out = str(tmp_path / "frame.png")
    launch(
        "videotestsrc num-buffers=1 pattern=smpte "
        "! video/x-raw,format=RGBA,width=64,height=48 "
        f"! pngenc ! queue ! filesink location={out}", quiet=True)
    img = png.read(out)
    assert img.shape == (48, 64, 4)


def test_pngenc_not_at_sink_edge_rejected(tmp_path):
    """A codec feeding a non-passthrough element can't encode host-side:
    reject the graph loudly instead of writing unencoded bytes."""
    out = str(tmp_path / "frame.png")
    with pytest.raises(Exception, match="host-codec"):
        launch(
            "videotestsrc num-buffers=1 "
            "! video/x-raw,format=RGBA,width=64,height=48 "
            "! pngenc ! vfmetalvideofilter brightness=0.2 "
            f"! filesink location={out}", quiet=True)


def test_pngenc_in_run_batched(tmp_path):
    out = str(tmp_path / "frames.png")
    p = parse_pipeline(
        "videotestsrc num-buffers=5 "
        "! video/x-raw,format=RGBA,width=32,height=24 "
        f"! pngenc ! filesink location={out}")
    p.negotiate()
    p.build()
    assert p.run_batched(5, batch_size=2) == 5
    data = open(out, "rb").read()
    assert data.count(b"\x89PNG\r\n\x1a\n") == 5  # 5 encoded streams
    img = png.decode(data[:data.index(b"\x89PNG", 1)])
    assert img.shape == (24, 32, 4)


def test_src_pad_fanout_without_tee_rejected():
    # a src pad links exactly once (GStreamer semantics); fan-out to
    # multiple sinks goes through `tee` (tests/test_tee.py)
    from tpuvf.core.registry import make
    from tpuvf.runtime.pipeline import Pipeline

    p = Pipeline()
    src = p.add(make("videotestsrc", "src"))
    src.set_property("num-buffers", 1)
    s1 = p.add(make("fakesink", "s1"))
    s2 = p.add(make("fakesink", "s2"))
    p.link(src, s1)
    p.link(src, s2)
    with pytest.raises(ValueError, match="tee"):
        p.negotiate()


def _two_filter_pipeline():
    from tpuvf.core.registry import make
    from tpuvf.runtime.pipeline import Pipeline

    p = Pipeline()
    src = p.add(make("videotestsrc", "src"))
    src.set_property("num-buffers", 1)
    first = p.add(make("vfmetalvideofilter", "firstfilter"))
    first.set_property("brightness", 0.3)
    second = p.add(make("vfmetalvideofilter", "secondfilter"))
    second.set_property("contrast", 1.5)
    sink = p.add(make("fakesink", "sink"))
    p.link(src, first)
    p.link(first, second)
    p.link(second, sink)
    p.negotiate()
    p.build()
    return p


def test_failure_attribution_names_failing_element():
    """PipelineError must name the element whose stage raised, not the last
    active element (round-1: _locate_failure always blamed the last)."""
    from tpuvf.runtime.pipeline import PipelineError

    p = _two_filter_pipeline()
    stage = next(s for s in p._stages if s.element.name == "firstfilter")

    def boom(planes, state, params):
        raise RuntimeError("injected kernel failure")

    stage.process = boom  # the step closure reads st.process at trace time
    with pytest.raises(PipelineError) as ei:
        p.run(1)
    assert ei.value.element == "firstfilter"
    assert ei.value.frame_index == 0


# -- expose() + navigation routing (round 2) ----------------------------------

def test_expose_reblits_after_render_rectangle_change():
    """expose() re-presents the LAST frame through a changed render
    rectangle without a new buffer (GstVideoOverlay expose analog)."""
    sink = make("vfvideosink")
    sink.set_window_size(128, 48)
    spec = FrameSpec(VideoFormat.RGBA, 64, 48)
    host = np.full((48, 64, 4), 255, np.uint8)
    sink.prepare(spec)
    sink.consume(host, spec, 0)
    assert sink._display_rect == (32, 0, 64, 48)
    before = sink.window.copy()

    sink.set_render_rectangle(0, 0, 64, 48)  # left half of the window
    sink.expose()  # no new frame
    after = sink.window
    assert sink.frame_count == 1
    assert (before != after).any()
    assert (after[:, :64, 0] == 255).all()   # content now in the left half
    assert (after[:, 64:, :3] == 0).all()    # right half letterboxed black


def test_expose_noop_before_first_frame():
    sink = make("vfvideosink")
    sink.expose()  # must not raise
    assert sink.window is None


def test_navigation_routed_to_compositor_pad_source():
    """A pointer event on the videosink routes upstream: sink window->video
    transform, compositor pad hit-test + rescale into the pad's input
    coordinates, delivered at the hit pad's source
    (gstvfmetalvideosink.m:407-440 -> gstvfmetalcompositor.m:705-787)."""
    pipe = parse_pipeline(
        "vfmetalcompositor name=c background=black sink_1::xpos=100 "
        "sink_1::ypos=50 sink_1::width=64 sink_1::height=48 "
        "! video/x-raw,format=RGBA,width=200,height=120 ! vfmetalvideosink "
        "videotestsrc name=srcA num-buffers=1 "
        "! video/x-raw,format=RGBA,width=200,height=120 ! c.sink_0 "
        "videotestsrc name=srcB num-buffers=1 "
        "! video/x-raw,format=NV12,width=32,height=24 ! c.sink_1 "
    )
    pipe.negotiate()
    pipe.build()
    pipe.run()
    sink = pipe.sinks[0]
    # window == video size here; point inside sink_1's 64x48 rect at (100,50)
    sink.send_navigation_event("mouse-move", 132.0, 74.0)
    assert pipe.navigation_events, "event was not routed"
    ev = pipe.navigation_events[-1]
    assert ev["source"] == "srcB"
    # rescaled into the 32x24 input of the scaled 64x48 pad
    assert ev["pointer_x"] == pytest.approx((132 - 100) * 32 / 64)
    assert ev["pointer_y"] == pytest.approx((74 - 50) * 24 / 48)
    # a point over only the base pad routes to srcA
    sink.send_navigation_event("mouse-move", 10.0, 10.0)
    assert pipe.navigation_events[-1]["source"] == "srcA"


def test_navigation_rescaled_through_convertscale():
    """Coordinates crossing a resizing element scale by in/out ratio (the
    videoscale src_event convention)."""
    pipe = parse_pipeline(
        "videotestsrc name=src num-buffers=1 "
        "! video/x-raw,format=RGBA,width=64,height=48 "
        "! vfmetalconvertscale ! video/x-raw,format=RGBA,width=128,height=96 "
        "! vfmetalvideosink")
    pipe.negotiate()
    pipe.build()
    pipe.run()
    pipe.sinks[0].send_navigation_event("mouse-move", 64.0, 48.0)
    ev = pipe.navigation_events[-1]
    assert ev["source"] == "src"
    assert ev["pointer_x"] == pytest.approx(32.0)
    assert ev["pointer_y"] == pytest.approx(24.0)
