"""End-to-end pipeline tests: parser, negotiation, convertscale semantics.

Ports the shape of tests/test-convertscale.sh from the reference (pipeline
smoke runs) and adds golden-frame checks the reference lacks.
"""

import numpy as np
import pytest

from tests.oracle import metal_ref as oracle
from tests.util import assert_planes_close

from tpuvf.cli.launch import launch, parse_pipeline
from tpuvf.core.frame import host_to_planes
from tpuvf.core.formats import VideoFormat
from tpuvf.core.spec import FrameSpec


def run_ok(desc, n=None):
    assert launch(desc, num_frames=n, quiet=True) > 0


FORMATS4 = ["BGRA", "RGBA", "NV12", "I420"]


@pytest.mark.parametrize("fmt", FORMATS4)
def test_passthrough(fmt):
    # same format and size -> passthrough (m:272-280)
    run_ok(
        f"videotestsrc num-buffers=2 ! video/x-raw,format={fmt},width=64,height=48 "
        f"! vfmetalconvertscale ! video/x-raw,format={fmt},width=64,height=48 "
        f"! fakesink"
    )


@pytest.mark.parametrize("src_fmt", FORMATS4)
@pytest.mark.parametrize("dst_fmt", FORMATS4)
def test_conversion_matrix(src_fmt, dst_fmt):
    if src_fmt == dst_fmt:
        pytest.skip("covered by passthrough")
    run_ok(
        f"videotestsrc num-buffers=1 pattern=snow "
        f"! video/x-raw,format={src_fmt},width=64,height=48 "
        f"! vfmetalconvertscale ! video/x-raw,format={dst_fmt},width=64,height=48 "
        f"! fakesink"
    )


@pytest.mark.parametrize("fmt", ["UYVY", "YUY2"])
def test_packed_formats(fmt):
    run_ok(
        f"videotestsrc num-buffers=1 ! video/x-raw,format={fmt},width=64,height=48 "
        f"! vfmetalconvertscale ! video/x-raw,format=BGRA ! fakesink"
    )
    run_ok(
        f"videotestsrc num-buffers=1 ! video/x-raw,format=BGRA,width=64,height=48 "
        f"! vfmetalconvertscale ! video/x-raw,format={fmt} ! fakesink"
    )


def test_scaling_and_letterbox():
    run_ok(
        "videotestsrc num-buffers=1 ! video/x-raw,format=RGBA,width=64,height=48 "
        "! vfmetalconvertscale method=nearest "
        "! video/x-raw,format=RGBA,width=128,height=96 ! fakesink"
    )
    run_ok(
        "videotestsrc num-buffers=1 ! video/x-raw,format=NV12,width=64,height=48 "
        "! vfmetalconvertscale add-borders=true border-color=0xFF00FF00 "
        "! video/x-raw,format=NV12,width=100,height=30 ! fakesink"
    )


def test_odd_dimensions():
    run_ok(
        "videotestsrc num-buffers=1 ! video/x-raw,format=I420,width=37,height=23 "
        "! vfmetalconvertscale ! video/x-raw,format=BGRA,width=129,height=95 "
        "! fakesink"
    )


def test_dar_fixation():
    """Width-only caps fixes height preserving DAR (fixate_caps m:160-248)."""
    pipe = parse_pipeline(
        "videotestsrc ! video/x-raw,format=RGBA,width=320,height=240 "
        "! vfmetalconvertscale ! video/x-raw,width=160 ! fakesink"
    )
    pipe.negotiate()
    sink_in = [l for l in pipe.links if l.downstream is pipe.sinks[0]][0]
    assert (sink_in.spec.width, sink_in.spec.height) == (160, 120)
    assert sink_in.spec.format == VideoFormat.RGBA  # format preserved


def test_golden_convert_scale_vs_oracle():
    """Full-element golden test: NV12 64x48 -> BGRA 40x30 bilinear."""
    in_spec = FrameSpec(VideoFormat.NV12, 64, 48)
    out_spec = FrameSpec(VideoFormat.BGRA, 40, 30, matrix=in_spec.matrix)

    pipe = parse_pipeline(
        "videotestsrc pattern=smpte num-buffers=1 "
        "! video/x-raw,format=NV12,width=64,height=48 "
        "! vfmetalconvertscale ! video/x-raw,format=BGRA,width=40,height=30 "
        "! appsink"
    )
    pipe.negotiate()
    pipe.build()
    pipe.run()
    sink = pipe.sinks[0]
    got = sink.frames[0]  # (30, 40, 4) BGRA bytes

    src_host = pipe.sources[0].generate(0, in_spec)
    planes = host_to_planes(src_host, in_spec)
    rgba = oracle.sample_rgba(planes, "NV12", in_spec.matrix_index, 40, 30)
    rgba_q = oracle.quant(rgba).transpose(2, 0, 1)
    want_planes = oracle.pack_rgba(rgba_q, "BGRA", out_spec.matrix_index)
    want = want_planes["rgba"].transpose(1, 2, 0)[..., [2, 1, 0, 3]]

    assert_planes_close(
        {"frame": got.astype(np.int32)},
        {"frame": want.astype(np.int32)},
        tol=2,
        context="convertscale golden",
    )


def test_parser_errors():
    with pytest.raises(Exception):
        parse_pipeline("! fakesink")
    with pytest.raises(Exception):
        parse_pipeline("nosuchelement ! fakesink").negotiate()


def test_reference_odd_dims_641x479():
    """The reference's hardest edge case (test-convertscale.sh:193-198)."""
    run_ok(
        "videotestsrc num-buffers=1 ! video/x-raw,format=I420,width=641,height=479 "
        "! vfmetalconvertscale ! video/x-raw,format=BGRA,width=321,height=239 "
        "! fakesink")
    run_ok(
        "videotestsrc num-buffers=1 ! video/x-raw,format=NV12,width=641,height=479 "
        "! vfmetalconvertscale ! video/x-raw,format=NV12,width=639,height=481 "
        "! fakesink")


def test_tiny_to_large():
    """16x16 -> much larger (test-convertscale.sh edge case, scaled down)."""
    run_ok(
        "videotestsrc num-buffers=1 ! video/x-raw,format=RGBA,width=16,height=16 "
        "! vfmetalconvertscale ! video/x-raw,format=NV12,width=480,height=270 "
        "! fakesink")


def test_packed_to_packed():
    run_ok(
        "videotestsrc num-buffers=1 ! video/x-raw,format=UYVY,width=64,height=48 "
        "! vfmetalconvertscale ! video/x-raw,format=YUY2 ! fakesink")


def test_golden_uyvy_output_element():
    """Full element golden: RGBA -> UYVY via the packed output kernels."""
    in_spec = FrameSpec(VideoFormat.RGBA, 64, 48)
    pipe = parse_pipeline(
        "videotestsrc pattern=snow num-buffers=1 "
        "! video/x-raw,format=RGBA,width=64,height=48 "
        "! vfmetalconvertscale ! video/x-raw,format=UYVY ! appsink")
    pipe.negotiate()
    pipe.build()
    pipe.run()
    got_raw = pipe.sinks[0].frames[0]  # (48, 128) bytes

    src_host = pipe.sources[0].generate(0, in_spec)
    planes = host_to_planes(src_host, in_spec)
    rgba = oracle.sample_rgba(planes, "RGBA", in_spec.matrix_index, 64, 48)
    rgba_q = oracle.quant(rgba).transpose(2, 0, 1)
    want = oracle.pack_rgba(rgba_q, "UYVY", in_spec.matrix_index)
    raw = np.asarray(got_raw).reshape(48, 32, 4)
    got = {"u": raw[..., 0], "y0": raw[..., 1], "v": raw[..., 2],
           "y1": raw[..., 3]}
    want_split = {"u": want["u"], "v": want["v"],
                  "y0": want["y"][:, 0::2], "y1": want["y"][:, 1::2]}
    assert_planes_close(got, want_split, tol=2, context="uyvy element")


def test_hd_negotiates_bt709():
    """1080p caps re-derive BT.709 colorimetry (regression: the source's
    SD default leaked bt601 into HD pipelines)."""
    pipe = parse_pipeline(
        "videotestsrc num-buffers=1 "
        "! video/x-raw,format=NV12,width=1920,height=1080 "
        "! vfmetalconvertscale ! video/x-raw,format=BGRA,width=640,height=480 "
        "! fakesink")
    pipe.negotiate()
    specs = [l.spec for l in pipe.links]
    assert specs[0].matrix == "bt709"   # HD input
    assert specs[1].matrix == "bt709"   # convertscale preserves input matrix


def test_golden_nv12_to_nv12_resize():
    """Chroma down+up round trip through a size change (NV12 -> NV12)."""
    in_spec = FrameSpec(VideoFormat.NV12, 64, 48)
    pipe = parse_pipeline(
        "videotestsrc pattern=smpte num-buffers=1 "
        "! video/x-raw,format=NV12,width=64,height=48 "
        "! vfmetalconvertscale ! video/x-raw,format=NV12,width=44,height=36 "
        "! appsink")
    pipe.negotiate()
    pipe.build()
    pipe.run()
    got = pipe.sinks[0].frames[0]

    host = pipe.sources[0].generate(0, in_spec)
    planes = host_to_planes(host, in_spec)
    rgba = oracle.sample_rgba(planes, "NV12", in_spec.matrix_index, 44, 36)
    want = oracle.pack_rgba(
        oracle.quant(rgba).transpose(2, 0, 1), "NV12", in_spec.matrix_index)
    got_planes = {"y": got["y"],
                  "u": got["uv"][:, 0::2], "v": got["uv"][:, 1::2]}
    assert_planes_close(got_planes, want, tol=2, context="nv12->nv12 resize")


def test_convertscale_blockband_ab_parity(monkeypatch, tmp_path):
    """Downscale with blockband column tiles vs dense (TPUVF_NO_BLOCKBAND):
    <=1 LSB through the full pipeline (NV12 source, BGRA 384-col output
    gives a real 3-tile plan)."""
    def run():
        p = parse_pipeline(
            "videotestsrc num-buffers=1 ! "
            "video/x-raw,format=NV12,width=768,height=320 ! "
            "vfmetalconvertscale ! "
            "video/x-raw,format=BGRA,width=384,height=192 ! appsink")
        p.negotiate(); p.build(); p.run()
        return np.asarray(p.sinks[0].frames[0]).astype(np.int16)

    banded = run()
    monkeypatch.setenv("TPUVF_NO_BLOCKBAND", "1")
    dense = run()
    diff = np.abs(banded - dense)
    assert diff.max() <= 1, f"max diff {diff.max()}"


def test_scaled_split_link_bitwise(monkeypatch):
    """A scaled convertscale feeding a split-capable consumer negotiates
    the phase-matrix split link; output is BITWISE equal to the canonical
    (TPUVF_NO_SPLIT_SCALED) run."""
    pipe = ("videotestsrc num-buffers=1 ! "
            "video/x-raw,format=NV12,width=256,height=128 ! "
            "vfmetalconvertscale ! "
            "video/x-raw,format=BGRA,width=128,height=96 ! "
            "vfmetalvideofilter brightness=0.1 saturation=1.3 ! appsink")

    def run(expect_split):
        p = parse_pipeline(pipe)
        p.negotiate(); p.build()
        cs = next(e.name for e in p.elements
                  if e.ELEMENT_NAME == "vfconvertscale")
        in_split, out_mode = p.link_plan.get(cs, (False, "full"))
        if expect_split:  # not vacuous: the scaled split link must engage
            assert in_split and out_mode == "split", p.link_plan
        else:
            assert (in_split, out_mode) == (False, "full"), p.link_plan
        p.run()
        return np.asarray(p.sinks[0].frames[0])

    split = run(True)
    monkeypatch.setenv("TPUVF_NO_SPLIT_SCALED", "1")
    canonical = run(False)
    # the source provisions a presplit upload, so the K axis decomposes
    # by input phase: <=1 LSB on knife-edge pixels (FMA rounding; see
    # TestSplitScaled in test_kernels_convert.py)
    diff = np.abs(split.astype(np.int16) - canonical.astype(np.int16))
    assert diff.max() <= 1, diff.max()


def test_upscale2x_split_link_bitwise(monkeypatch):
    """A 2x-UPSAMPLE convertscale feeding a split consumer engages the
    phase-stencil split link; the source stays interleaved
    (source_split_worth_it: the stencils read the full-width plane).
    Luma rides bitwise-identical stencils; NV12 chroma is a 4x column
    matmul with the <= 1 ulp scaled-split contract, so the end-to-end
    assertion is <= 1 LSB (measured 0 on CPU and on the real TPU at 4K,
    scripts/tpu_upscale_parity.py).

    TPUVF_NO_QUAD_LINKS pins the 2-PHASE plan this test targets — with
    it unset, the grid16 (4x4 phase) upgrade supersedes the split link
    on this chain (tests/test_grid_links.py covers that plan)."""
    monkeypatch.setenv("TPUVF_NO_QUAD_LINKS", "1")
    pipe = ("videotestsrc num-buffers=1 ! "
            "video/x-raw,format=NV12,width=128,height=64 ! "
            "vfmetalconvertscale ! "
            "video/x-raw,format=BGRA,width=256,height=128 ! "
            "vfmetalvideofilter brightness=0.1 saturation=1.3 ! appsink")

    def run(expect_split):
        p = parse_pipeline(pipe)
        p.negotiate(); p.build()
        cs = next(e.name for e in p.elements
                  if e.ELEMENT_NAME == "vfconvertscale")
        in_split, out_mode = p.link_plan.get(cs, (False, "full"))
        if expect_split:
            assert (in_split, out_mode) == (False, "split"), p.link_plan
        else:
            assert (in_split, out_mode) == (False, "full"), p.link_plan
        p.run()
        return np.asarray(p.sinks[0].frames[0])

    split = run(True)
    monkeypatch.setenv("TPUVF_NO_SPLIT_SCALED", "1")
    canonical = run(False)
    diff = np.abs(split.astype(np.int16) - canonical.astype(np.int16))
    assert diff.max() <= 1, diff.max()


@pytest.mark.parametrize("desc", [
    # NV12 in: luma pair-averages both axes, chroma is identity at 2:1
    ("videotestsrc num-buffers=1 ! "
     "video/x-raw,format=NV12,width=256,height=128 ! "
     "vfmetalconvertscale ! "
     "video/x-raw,format=BGRA,width=128,height=64 ! appsink"),
    # RGB in, bilinear
    ("videotestsrc num-buffers=1 pattern=ball ! "
     "video/x-raw,format=BGRA,width=192,height=96 ! "
     "vfmetalconvertscale ! "
     "video/x-raw,format=BGRA,width=96,height=48 ! appsink"),
    # NEAREST 2:1 (single tap at 2j+1)
    ("videotestsrc num-buffers=1 pattern=ball ! "
     "video/x-raw,format=BGRA,width=192,height=96 ! "
     "vfmetalconvertscale method=nearest ! "
     "video/x-raw,format=BGRA,width=96,height=48 ! appsink"),
    # 2:1 rows only, identity columns
    ("videotestsrc num-buffers=1 ! "
     "video/x-raw,format=NV12,width=128,height=128 ! "
     "vfmetalconvertscale ! "
     "video/x-raw,format=BGRA,width=128,height=64 ! appsink"),
    # 4:1 (even k > 2: taps k/2-1, k/2 at 0.5/0.5)
    ("videotestsrc num-buffers=1 pattern=ball ! "
     "video/x-raw,format=BGRA,width=192,height=96 ! "
     "vfmetalconvertscale ! "
     "video/x-raw,format=BGRA,width=48,height=24 ! appsink"),
    # 3:1 NEAREST (single tap k//2; odd-k LINEAR keeps the matrix path)
    ("videotestsrc num-buffers=1 pattern=ball ! "
     "video/x-raw,format=BGRA,width=192,height=96 ! "
     "vfmetalconvertscale method=nearest ! "
     "video/x-raw,format=BGRA,width=64,height=32 ! appsink"),
    # NEAREST floor-boundary geometry (22->11 rows: dense f64 texcoord
    # noise lands BELOW the k*j+k//2 boundary for one row, like
    # 2160->1080 at 22/1080 rows).  _downsample_int_ok must fall back
    # to the matrix path here or this parity assertion fails by a
    # whole source texel (round-4 advisor finding).
    ("videotestsrc num-buffers=1 pattern=ball ! "
     "video/x-raw,format=BGRA,width=192,height=22 ! "
     "vfmetalconvertscale method=nearest ! "
     "video/x-raw,format=BGRA,width=96,height=11 ! appsink"),
    # same boundary geometry on the LANE axis (exercised under "both")
    ("videotestsrc num-buffers=1 pattern=ball ! "
     "video/x-raw,format=BGRA,width=44,height=96 ! "
     "vfmetalconvertscale method=nearest ! "
     "video/x-raw,format=BGRA,width=11,height=48 ! appsink"),
])
def test_downscale2x_closed_form_bitwise(monkeypatch, desc):
    """Integer-factor downscales ride the closed-form tap slices (no
    weight matrix, no matmul); BITWISE vs the dense-matrix program
    (TPUVF_DOWN2X=off) under the default rows-only mode AND with the
    lane-axis form forced on ("both") — scaling by 0.5 is exact, so
    every form rounds once per add (see convert._downsample_int_ok)."""
    def run(mode=None):
        if mode is None:
            monkeypatch.delenv("TPUVF_DOWN2X", raising=False)
        else:
            monkeypatch.setenv("TPUVF_DOWN2X", mode)
        p = parse_pipeline(desc)
        p.negotiate(); p.build(); p.run()
        return np.asarray(p.sinks[0].frames[0])

    dense = run("off")
    np.testing.assert_array_equal(run(), dense)        # rows default
    np.testing.assert_array_equal(run("both"), dense)  # + lane axis


@pytest.mark.parametrize("out_wh", [(128, 64), (64, 32)])
def test_downscale2x_split_link_bitwise(monkeypatch, out_wh):
    """A k:1 downscale feeding a split consumer keeps the phase split
    link; the per-phase closed forms (plan_cols_phase_sampler[_presplit]
    k:1 paths) are BITWISE vs the phase-matrix program (k=2 and k=4)."""
    ow, oh = out_wh
    desc = ("videotestsrc num-buffers=1 ! "
            "video/x-raw,format=NV12,width=256,height=128 ! "
            "vfmetalconvertscale ! "
            f"video/x-raw,format=BGRA,width={ow},height={oh} ! "
            "vfmetalvideofilter brightness=0.1 saturation=1.3 ! appsink")

    def run():
        p = parse_pipeline(desc)
        p.negotiate(); p.build()
        cs = next(e.name for e in p.elements
                  if e.ELEMENT_NAME == "vfconvertscale")
        in_split, out_mode = p.link_plan.get(cs, (False, "full"))
        assert out_mode == "split", p.link_plan  # not vacuous
        p.run()
        return np.asarray(p.sinks[0].frames[0])

    fast = run()
    monkeypatch.setenv("TPUVF_DOWN2X", "both")
    both = run()
    monkeypatch.setenv("TPUVF_DOWN2X", "off")
    dense = run()
    monkeypatch.delenv("TPUVF_DOWN2X")
    np.testing.assert_array_equal(fast, dense)
    np.testing.assert_array_equal(both, dense)
