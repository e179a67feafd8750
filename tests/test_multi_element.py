"""Multi-element chain tests — port of tests/test-multi-element.sh.

The reference exercises per-element command queues with 2/3/4-element
chains; here the same pipelines validate whole-chain fusion into one XLA
program (including compositor pre/post chains and YUV-format hops).
"""

import numpy as np
import pytest

from tpuvf.cli.launch import launch, parse_pipeline

SRC64 = "videotestsrc num-buffers=2 ! video/x-raw,format={fmt},width=64,height=48 "


def run_ok(desc, n=2):
    assert launch(desc, quiet=True) == n


def test_two_element_chain():
    run_ok(SRC64.format(fmt="BGRA") +
           "! vfmetalvideofilter brightness=0.1 ! vfmetaltransform "
           "method=horizontal-flip ! fakesink")


def test_three_element_chain():
    run_ok(SRC64.format(fmt="NV12") +
           "! vfmetaldeinterlace method=bob ! vfmetalvideofilter contrast=1.2 "
           "! vfmetalconvertscale ! video/x-raw,format=RGBA,width=32,height=24 "
           "! fakesink")


def test_four_element_chain():
    run_ok(SRC64.format(fmt="I420") +
           "! vfmetaldeinterlace method=linear ! vfmetalvideofilter "
           "saturation=1.4 ! vfmetaltransform method=rotate-180 "
           "! vfmetalconvertscale ! video/x-raw,format=NV12,width=32,height=24 "
           "! fakesink")


def test_yuv_format_hops():
    """NV12 -> filter(NV12) -> convert to I420 -> transform(I420)."""
    run_ok(SRC64.format(fmt="NV12") +
           "! vfmetalvideofilter brightness=0.05 ! vfmetalconvertscale "
           "! video/x-raw,format=I420 ! vfmetaltransform method=vertical-flip "
           "! fakesink")


def test_compositor_with_pre_chains():
    run_ok(
        "vfmetalcompositor name=c background=black sink_1::xpos=16 "
        "! video/x-raw,format=BGRA ! fakesink "
        + SRC64.format(fmt="BGRA") + "! vfmetalvideofilter invert=true ! c.sink_0 "
        + SRC64.format(fmt="NV12") + "! vfmetaltransform method=clockwise ! c.sink_1"
    )


def test_compositor_with_post_chain():
    run_ok(
        "vfmetalcompositor name=c ! video/x-raw,format=NV12 "
        "! vfmetalvideofilter sepia=0.5 ! vfmetalconvertscale "
        "! video/x-raw,format=UYVY,width=32,height=24 ! fakesink "
        + SRC64.format(fmt="RGBA") + "! c.sink_0"
    )


def test_chain_is_single_program():
    """All transform stages fuse into one jitted step (no per-element
    dispatch)."""
    pipe = parse_pipeline(
        SRC64.format(fmt="BGRA") +
        "! vfmetalvideofilter brightness=0.1 ! vfmetaltransform "
        "method=clockwise ! vfmetalconvertscale "
        "! video/x-raw,format=NV12,width=32,height=24 ! fakesink")
    pipe.negotiate()
    pipe.build()
    assert pipe._step is not None  # one fused jit callable for the chain
    active = [s for s in pipe._stages if not s.passthrough]
    assert len(active) == 3
    pipe.run()
    assert pipe.stats.frames == 2
    assert pipe.stats.fps > 0


def test_passthrough_chain_elides_everything():
    pipe = parse_pipeline(
        SRC64.format(fmt="BGRA") +
        "! vfmetalvideofilter ! vfmetaltransform ! vfmetaloverlay "
        "! vfmetalconvertscale ! video/x-raw,format=BGRA,width=64,height=48 "
        "! appsink")
    pipe.negotiate()
    pipe.build()
    active = [s for s in pipe._stages if not s.passthrough]
    assert active == []  # zero-copy passthrough end to end
    pipe.run()
    src = pipe.sources[0]
    from tpuvf.core.formats import VideoFormat
    from tpuvf.core.spec import FrameSpec

    want = src.generate(0, FrameSpec(VideoFormat.BGRA, 64, 48))
    np.testing.assert_array_equal(pipe.sinks[0].frames[0], want)


def test_pipeline_error_reports_element(tmp_path):
    """A mid-run failure surfaces as PipelineError; attribution bisects the
    eager step, so a stage failure names the stage while an unreproducible
    fused-program failure reports '<pipeline>' (never a wrong element)."""
    from tpuvf.runtime.observability import PipelineError

    pipe = parse_pipeline(
        SRC64.format(fmt="BGRA") + "! vfmetalvideofilter gamma=0.5 ! appsink")
    pipe.negotiate()
    pipe.build()

    # 1) failure inside a stage's kernels -> named element
    stage = next(s for s in pipe._stages if not s.passthrough)

    def stage_boom(*a, **k):
        raise RuntimeError("kernel failure")

    orig = stage.process
    stage.process = stage_boom
    with pytest.raises(PipelineError) as ei:
        pipe.run()
    assert "videofilter" in str(ei.value)
    stage.process = orig

    # 2) failure only in the fused dispatch (not reproducible per-stage)
    #    -> honest '<pipeline>' attribution, not a guessed element
    def boom(*a, **k):
        raise RuntimeError("device lost")

    pipe._step = boom
    with pytest.raises(PipelineError) as ei:
        pipe.run()
    assert "<pipeline>" in str(ei.value)

def test_run_batched_matches_per_frame():
    """Batched scan execution produces the same frames as the per-frame
    loop, including carried state (deinterlace history).

    Note: the film-grain hash is excluded — its fract/dot chain is
    chaotically sensitive to FMA contraction, so different compiled program
    shapes legitimately produce different grain (true of Metal shader
    compilers as well); everything else must match bit-for-bit."""
    desc = ("videotestsrc num-buffers=6 pattern=ball "
            "! video/x-raw,format=NV12,width=48,height=32 "
            "! vfmetaldeinterlace method=greedyh ! vfmetalvideofilter "
            "brightness=0.1 contrast=1.3 vignette=0.5 ! appsink")
    p1 = parse_pipeline(desc)
    p1.negotiate(); p1.build(); p1.run()
    p2 = parse_pipeline(desc)
    p2.negotiate(); p2.build(); p2.run_batched(6, batch_size=3)
    assert len(p1.sinks[0].frames) == len(p2.sinks[0].frames) == 6
    for a, b in zip(p1.sinks[0].frames, p2.sinks[0].frames):
        np.testing.assert_array_equal(a["y"], b["y"])
        np.testing.assert_array_equal(a["uv"], b["uv"])


def test_run_batched_error_reports_element():
    """run_batched failures attribute like run(): stage failures name the
    element, unreproducible dispatch failures say '<pipeline>'."""
    from tpuvf.runtime.observability import PipelineError

    pipe = parse_pipeline(
        SRC64.format(fmt="BGRA") + "! vfmetalvideofilter gamma=0.5 ! appsink")
    pipe.negotiate()
    pipe.build()
    stage = next(s for s in pipe._stages if not s.passthrough)

    def stage_boom(*a, **k):
        raise RuntimeError("kernel failure")

    stage.process = stage_boom
    with pytest.raises(PipelineError) as ei:
        pipe.run_batched(4, batch_size=2)
    assert "videofilter" in str(ei.value)
