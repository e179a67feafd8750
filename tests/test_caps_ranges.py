"""Caps ranges/lists + reference-faithful fixation.

Mirrors gstvfmetalconvertscale.m transform_caps/fixate_caps semantics
(m:105-248): format lists fixate to the input format when offered
(gst_structure_fixate_field_string), non-fixed dimensions resolve nearest
to the DAR-preserving value (gst_structure_fixate_field_nearest_int).
"""

from __future__ import annotations

import numpy as np
import pytest

from tpuvf.core.formats import VideoFormat
from tpuvf.core.registry import make
from tpuvf.core.spec import CapsFilter, Fraction, FrameSpec, Range, ValueList


# -- parsing ----------------------------------------------------------------

def test_parse_int_range():
    f = CapsFilter.parse("video/x-raw,width=[320,1280],height=240")
    assert f.width == Range(320, 1280)
    assert f.height == 240


def test_parse_format_list():
    f = CapsFilter.parse("video/x-raw,format={BGRA,NV12}")
    assert f.format == ValueList((VideoFormat.BGRA, VideoFormat.NV12))


def test_parse_fraction_range_and_list():
    f = CapsFilter.parse(
        "video/x-raw,framerate=[25/1,30/1],pixel-aspect-ratio={1/1,4/3}")
    assert f.fps == Range(Fraction(25, 1), Fraction(30, 1))
    assert f.par == ValueList((Fraction(1, 1), Fraction(4, 3)))


def test_parse_mixed_with_exact_fields():
    f = CapsFilter.parse(
        "video/x-raw,format=NV12,width=[2,2048],height=[2,2048]")
    assert f.format == VideoFormat.NV12
    assert f.width == Range(2, 2048)


def test_empty_range_rejected():
    with pytest.raises(ValueError):
        CapsFilter.parse("video/x-raw,width=[100,50]")


# -- accepts ----------------------------------------------------------------

def test_accepts_range_and_list():
    f = CapsFilter.parse("video/x-raw,format={BGRA,NV12},width=[320,1280]")
    ok = FrameSpec(VideoFormat.NV12, 640, 480)
    assert f.accepts(ok)
    assert not f.accepts(ok.with_(width=1281))
    assert not f.accepts(FrameSpec(VideoFormat.I420, 640, 480))


# -- generic fixation (apply) ----------------------------------------------

def test_apply_fixates_nearest():
    f = CapsFilter.parse("video/x-raw,width=[320,1280]")
    spec = FrameSpec(VideoFormat.BGRA, 640, 480)
    assert f.apply(spec).width == 640  # in range: unchanged
    assert f.apply(spec.with_(width=2000)).width == 1280  # clamped
    assert f.apply(spec.with_(width=100)).width == 320


def test_apply_list_prefers_member_then_first():
    f = CapsFilter.parse("video/x-raw,format={BGRA,NV12}")
    spec = FrameSpec(VideoFormat.NV12, 64, 48)
    assert f.apply(spec).format == VideoFormat.NV12  # preserved
    spec2 = FrameSpec(VideoFormat.I420, 64, 48)
    assert f.apply(spec2).format == VideoFormat.BGRA  # first entry


# -- convertscale fixation (gstvfmetalconvertscale.m:160-248) ---------------

def _cs():
    return make("vfconvertscale")


def test_fixate_preserve_format_from_list():
    in_spec = FrameSpec(VideoFormat.NV12, 1920, 1080)
    out = _cs().transform_spec(
        in_spec, CapsFilter.parse("video/x-raw,format={BGRA,NV12,I420}"))
    assert out.format == VideoFormat.NV12  # preserve input format


def test_fixate_width_range_keeps_input_width():
    # neither dim fixed: keep input width (nearest in range), DAR height
    in_spec = FrameSpec(VideoFormat.BGRA, 1280, 720)
    out = _cs().transform_spec(
        in_spec,
        CapsFilter.parse("video/x-raw,width=[320,1920],height=[240,1080]"))
    assert (out.width, out.height) == (1280, 720)


def test_fixate_width_range_clamps_then_dar_height():
    # input width outside the range: clamp, then DAR-derive height
    in_spec = FrameSpec(VideoFormat.BGRA, 1920, 1080)
    out = _cs().transform_spec(
        in_spec, CapsFilter.parse("video/x-raw,width=[320,960],height=[1,2000]"))
    assert out.width == 960
    assert out.height == 540  # 960 * 1080/1920


def test_fixate_fixed_width_dar_height_nearest_in_range():
    # width fixed, height range: DAR height 360 clamps into [400,600]
    in_spec = FrameSpec(VideoFormat.BGRA, 1280, 720)
    out = _cs().transform_spec(
        in_spec, CapsFilter.parse("video/x-raw,width=640,height=[400,600]"))
    assert (out.width, out.height) == (640, 400)


def test_fixate_fixed_height_computes_width():
    in_spec = FrameSpec(VideoFormat.BGRA, 1920, 1080)
    out = _cs().transform_spec(
        in_spec, CapsFilter.parse("video/x-raw,height=540"))
    assert (out.width, out.height) == (960, 540)


def test_fixate_output_par_scales_dar_height():
    # DAR preserved under output PAR 2/1: 1280x720 PAR 1/1 -> width 1280
    # needs height 720*2 = 1440 at par 2/1?  DAR = 16/9; h = w*dar_d*par_n/
    # (dar_n*par_d) = 1280*9*2/16 = 1440
    in_spec = FrameSpec(VideoFormat.BGRA, 1280, 720)
    out = _cs().transform_spec(
        in_spec, CapsFilter.parse("video/x-raw,pixel-aspect-ratio=2/1"))
    assert (out.width, out.height) == (1280, 1440)
    assert out.par == Fraction(2, 1)


def test_fixate_fps_range():
    in_spec = FrameSpec(VideoFormat.BGRA, 64, 48, fps=Fraction(60, 1))
    out = _cs().transform_spec(
        in_spec, CapsFilter.parse("video/x-raw,framerate=[25/1,30/1]"))
    assert out.fps == Fraction(30, 1)


# -- end-to-end through a pipeline string -----------------------------------

def test_pipeline_with_range_caps_runs():
    from tpuvf.cli.launch import parse_pipeline

    p = parse_pipeline(
        "videotestsrc num-buffers=1 "
        "! video/x-raw,format=NV12,width=192,height=108 "
        "! vfmetalconvertscale "
        "! video/x-raw,format={BGRA,RGBA},width=[64,96] ! appsink")
    p.negotiate()
    p.build()
    p.run()
    frame = p.sinks[0].frames[0]
    # width clamps to 96, height DAR-derives to 54
    assert frame.shape == (54, 96, 4)


def test_compositor_fixates_against_ranges():
    from tpuvf.cli.launch import parse_pipeline

    p = parse_pipeline(
        "videotestsrc num-buffers=1 "
        "! video/x-raw,format=NV12,width=128,height=96 "
        "! vfmetalcompositor "
        "! video/x-raw,width=[32,1024],height=[32,1024] ! appsink")
    p.negotiate()
    p.build()
    p.run()
    assert p.sinks[0].frames[0].shape == (96, 128, 4)


def test_fraction_ordering_by_value():
    # regression: dataclass order=True compared (num, den) field-wise,
    # ranking 3/2 above 2/1
    assert Fraction(3, 2) < Fraction(2, 1)
    assert Fraction(30000, 1001) < Fraction(30, 1)
    assert max([Fraction(24, 1), Fraction(30000, 1001), Fraction(25, 1)]) \
        == Fraction(30000, 1001)
