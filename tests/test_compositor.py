"""vfcompositor tests: negotiation, geometry, blending parity, smoke cases.

Ports the shape of tests/test-compositor.sh plus golden-frame checks.
"""

import numpy as np
import pytest

from tests.oracle import element_ref, metal_ref
from tests.util import assert_planes_close, random_host_frame

from tpuvf.cli.launch import launch, parse_pipeline
from tpuvf.core.frame import host_to_planes
from tpuvf.core.formats import VideoFormat
from tpuvf.core.registry import make
from tpuvf.core.spec import CapsFilter, FrameSpec

RNG = np.random.default_rng(31)


def run_compositor(pad_defs, out_caps=None, comp_props=None):
    """pad_defs: list of (fmt, w, h, pad_props, host or None).
    Returns (out_planes, out_spec, inputs_planes)."""
    import jax.numpy as jnp

    comp = make("vfcompositor")
    for k, v in (comp_props or {}).items():
        comp.set_property(k, v)
    pad_specs = {}
    inputs = {}
    hosts = {}
    for i, (fmt, w, h, props, host) in enumerate(pad_defs):
        name = f"sink_{i}"
        bag = comp.get_pad(name)
        for k, v in (props or {}).items():
            bag.set(k, v)
        spec = FrameSpec(VideoFormat(fmt), w, h)
        pad_specs[name] = spec
        host = random_host_frame(RNG, spec) if host is None else host
        hosts[name] = host
        planes = host_to_planes(host, spec)
        inputs[name] = {k: jnp.asarray(v) for k, v in planes.items()}
    filt = CapsFilter.parse(out_caps) if out_caps else None
    out_spec = comp.aggregate_spec(pad_specs, filt)
    proc = comp.make_aggregate(pad_specs, out_spec)
    out, _ = proc(inputs, (), comp.traced_params())
    return ({k: np.asarray(v) for k, v in out.items()}, out_spec,
            {n: host_to_planes(hosts[n], pad_specs[n]) for n in pad_specs},
            pad_specs)


# -- negotiation ------------------------------------------------------------

def test_output_bounding_box():
    _, out_spec, _, _ = run_compositor([
        ("BGRA", 64, 48, {}, None),
        ("BGRA", 32, 24, {"xpos": 100, "ypos": 50}, None),
    ])
    assert (out_spec.width, out_spec.height) == (132, 74)
    assert out_spec.format == VideoFormat.BGRA  # BGRA preferred


def test_negative_positions_clamp_to_input_size():
    _, out_spec, _, _ = run_compositor([
        ("RGBA", 64, 48, {"xpos": -20, "ypos": -10}, None),
    ])
    assert (out_spec.width, out_spec.height) == (64, 48)


def test_max_fps_and_default():
    comp = make("vfcompositor")
    comp.get_pad("sink_0")
    from tpuvf.core.spec import Fraction

    s1 = FrameSpec(VideoFormat.BGRA, 32, 32, fps=Fraction(15, 1))
    s2 = FrameSpec(VideoFormat.BGRA, 32, 32, fps=Fraction(30, 1))
    out = comp.aggregate_spec({"sink_0": s1, "sink_1": s2}, None)
    assert out.fps == Fraction(30, 1)


def test_pad_scaling_geometry():
    """pad width/height scale the input into the pad rect."""
    host = np.full((24, 32, 4), 200, np.uint8)
    host[..., 3] = 255  # opaque: premultiply must not dim the content
    out, out_spec, _, _ = run_compositor([
        ("RGBA", 32, 24, {"width": 64, "height": 48}, host),
    ], comp_props={"background": 1})
    assert (out_spec.width, out_spec.height) == (64, 48)
    rgba = out["rgba"]
    assert rgba[0, 10, 10] == 200  # scaled content fills the rect


def test_keep_aspect_ratio_centering():
    """4:3 input into a 2:1 pad rect => pillarboxed with x offset."""
    host = np.full((24, 32, 4), 255, np.uint8)
    out, out_spec, _, _ = run_compositor([
        ("RGBA", 32, 24, {"width": 96, "height": 36, "sizing-policy": 1}, host),
    ], comp_props={"background": 1})
    rgba = out["rgba"]
    # fitted rect: 48x36 centered at x=24..72 (within the 96x36 pad)
    assert rgba[0, 18, 50] == 255   # inside fitted content
    assert rgba[0, 18, 10] == 0     # left bar = black background
    assert rgba[0, 18, 90] == 0     # right bar


# -- blending golden --------------------------------------------------------

def _oracle_composite(pad_draws, out_w, out_h, background=0):
    if background == 0:
        dst = element_ref.checker_bg(out_w, out_h)
    elif background == 1:
        dst = np.zeros((out_h, out_w, 4), np.float32)
        dst[..., 3] = 1.0
    elif background == 2:
        dst = np.ones((out_h, out_w, 4), np.float32)
    else:
        dst = np.zeros((out_h, out_w, 4), np.float32)
    dst = metal_ref.dequant(metal_ref.quant(dst))
    for planes, fmt, matrix, rect, alpha, op in pad_draws:
        x, y, w, h = rect
        dst = element_ref.composite_draw(
            dst, planes, fmt, matrix, x, y, w, h, alpha, op)
    return metal_ref.pack_rgba(
        metal_ref.quant(dst).transpose(2, 0, 1), "BGRA", 0)


def test_golden_two_inputs_over():
    out, out_spec, in_planes, pad_specs = run_compositor([
        ("BGRA", 32, 24, {}, None),
        ("NV12", 24, 16, {"xpos": 16, "ypos": 8, "alpha": 0.6}, None),
    ], comp_props={"background": 0})
    draws = [
        (in_planes["sink_0"], "BGRA", pad_specs["sink_0"].matrix_index,
         (0, 0, 32, 24), 1.0, 1),
        (in_planes["sink_1"], "NV12", pad_specs["sink_1"].matrix_index,
         (16, 8, 24, 16), 0.6, 1),
    ]
    want = _oracle_composite(draws, out_spec.width, out_spec.height, 0)
    assert_planes_close(out, want, tol=2, context="2-input over")


@pytest.mark.parametrize("op,opname", [(0, "source"), (1, "over"), (2, "add")])
def test_golden_operators(op, opname):
    out, out_spec, in_planes, pad_specs = run_compositor([
        ("RGBA", 32, 24, {}, None),
        ("RGBA", 32, 24, {"xpos": 8, "ypos": 4, "alpha": 0.5, "operator": op},
         None),
    ], comp_props={"background": 1})
    draws = [
        (in_planes["sink_0"], "RGBA", 0, (0, 0, 32, 24), 1.0, 1),
        (in_planes["sink_1"], "RGBA", 0, (8, 4, 32, 24), 0.5, op),
    ]
    want = _oracle_composite(draws, out_spec.width, out_spec.height, 1)
    assert_planes_close(out, want, tol=2, context=f"operator {opname}")


@pytest.mark.parametrize("bg", [0, 1, 2, 3])
def test_backgrounds(bg):
    out, out_spec, in_planes, _ = run_compositor([
        ("RGBA", 16, 16, {"xpos": 32}, None),
    ], comp_props={"background": bg})
    want = _oracle_composite(
        [(in_planes["sink_0"], "RGBA", 0, (32, 0, 16, 16), 1.0, 1)],
        out_spec.width, out_spec.height, bg)
    assert_planes_close(out, want, tol=2, context=f"background {bg}")


def test_zorder_ordering():
    """Lower zorder draws first; swapping zorder swaps layering."""
    red = np.zeros((16, 16, 4), np.uint8)
    red[..., 0] = 255
    red[..., 3] = 255
    blue = np.zeros((16, 16, 4), np.uint8)
    blue[..., 2] = 255
    blue[..., 3] = 255
    out1, _, _, _ = run_compositor([
        ("RGBA", 16, 16, {"zorder": 1}, red),
        ("RGBA", 16, 16, {"zorder": 2}, blue),
    ], comp_props={"background": 1})
    assert out1["rgba"][2, 8, 8] == 255  # blue on top
    out2, _, _, _ = run_compositor([
        ("RGBA", 16, 16, {"zorder": 2}, red),
        ("RGBA", 16, 16, {"zorder": 1}, blue),
    ], comp_props={"background": 1})
    assert out2["rgba"][0, 8, 8] == 255  # red on top


def test_alpha_zero_pad_skipped():
    red = np.zeros((16, 16, 4), np.uint8)
    red[..., 0] = 255
    red[..., 3] = 255
    out, _, _, _ = run_compositor([
        ("RGBA", 16, 16, {"alpha": 0.0}, red),
    ], comp_props={"background": 1})
    assert out["rgba"][0].max() == 0  # black background only


def test_obscured_background_becomes_transparent():
    """Opaque full-coverage NV12 pad => checker background not drawn."""
    out, out_spec, in_planes, pad_specs = run_compositor([
        ("NV12", 32, 24, {}, None),
    ], comp_props={"background": 0})
    # background must be transparent-cleared; output = the pad content alone
    draws = [(in_planes["sink_0"], "NV12", pad_specs["sink_0"].matrix_index,
              (0, 0, 32, 24), 1.0, 1)]
    want = _oracle_composite(draws, out_spec.width, out_spec.height, 3)
    assert_planes_close(out, want, tol=2, context="obscured bg")


# -- pipeline parsing + smoke (ported test-compositor.sh cases) -------------

def test_pipeline_string_two_inputs():
    n = launch(
        "vfmetalcompositor name=comp sink_1::xpos=32 sink_1::ypos=16 "
        "sink_1::alpha=0.5 ! video/x-raw,format=BGRA ! fakesink "
        "videotestsrc num-buffers=2 ! video/x-raw,format=BGRA,width=64,height=48 "
        "! comp.sink_0 "
        "videotestsrc num-buffers=2 pattern=snow "
        "! video/x-raw,format=NV12,width=32,height=24 ! comp.sink_1",
        quiet=True)
    assert n == 2


def test_pipeline_mixed_formats_and_yuv_output():
    n = launch(
        "vfmetalcompositor name=c background=white "
        "! video/x-raw,format=I420 ! fakesink "
        "videotestsrc num-buffers=1 ! video/x-raw,format=BGRA,width=64,height=48 ! c.sink_0 "
        "videotestsrc num-buffers=1 ! video/x-raw,format=I420,width=32,height=24 ! c.sink_1",
        quiet=True)
    assert n == 1


def test_pipeline_compositor_then_chain():
    n = launch(
        "vfmetalcompositor name=c ! video/x-raw,format=NV12 "
        "! vfmetalvideofilter brightness=0.1 ! vfmetalconvertscale "
        "! video/x-raw,format=RGBA,width=32,height=24 ! fakesink "
        "videotestsrc num-buffers=2 ! video/x-raw,format=RGBA,width=64,height=48 ! c.sink_0",
        quiet=True)
    assert n == 2


def test_navigation_hit_testing():
    comp = make("vfcompositor")
    b0 = comp.get_pad("sink_0")
    b1 = comp.get_pad("sink_1")
    b1.set("xpos", 100)
    b1.set("ypos", 50)
    b1.set("width", 64)
    b1.set("height", 48)
    pad_specs = {
        "sink_0": FrameSpec(VideoFormat.BGRA, 64, 48),
        "sink_1": FrameSpec(VideoFormat.NV12, 32, 24),  # scaled 2x into pad
    }
    # top pad (higher index = later = on top) hit inside its rect
    hit = comp.navigation_event(132.0, 74.0, pad_specs)
    assert hit is not None
    name, ix, iy = hit
    assert name == "sink_1"
    assert ix == pytest.approx((132 - 100) * 32 / 64)
    assert iy == pytest.approx((74 - 50) * 24 / 48)
    # point only over the base pad
    assert comp.navigation_event(10.0, 10.0, pad_specs)[0] == "sink_0"
    # point over nothing
    assert comp.navigation_event(500.0, 400.0, pad_specs) is None


def test_controllable_pad_alpha_between_frames():
    """Changing a controllable element property mid-run takes effect on the
    next frame without recompiling (traced scalar path)."""
    from tpuvf.cli.launch import parse_pipeline

    pipe = parse_pipeline(
        "videotestsrc num-buffers=4 ! video/x-raw,format=RGBA,width=32,height=24 "
        "! vfmetalvideofilter brightness=0.0 contrast=1.2 ! appsink")
    pipe.negotiate()
    pipe.build()
    vf = [e for e in pipe.elements if e.ELEMENT_NAME == "vfvideofilter"][0]

    # run 2 frames, bump brightness, run 2 more within the same run loop is
    # not exposed; emulate via two runs with carried state
    pipe.run(num_frames=2)
    first = pipe.sinks[0].frames[-1].copy()
    vf.set_property("brightness", 0.5)
    pipe.run(num_frames=2)
    second = pipe.sinks[0].frames[-1]
    assert second.astype(int).mean() > first.astype(int).mean() + 30


@pytest.mark.parametrize("fmt", ["BGRA", "RGBA", "NV12", "I420"])
def test_single_input_all_formats(fmt):
    n = launch(
        "vfmetalcompositor name=c ! video/x-raw,format=BGRA ! fakesink "
        f"videotestsrc num-buffers=2 ! video/x-raw,format={fmt},width=48,height=32 "
        "! c.sink_0", quiet=True)
    assert n == 2


def test_pad_output_size_dar_correction():
    """pad_get_output_size math (m:202-325) with non-square PARs."""
    from tpuvf.core.spec import Fraction
    from tpuvf.elements.compositor import CompositorPadConfig

    comp = make("vfcompositor")
    # anamorphic input: 720x576 PAR 16/11 displayed into square-pixel output
    bag = comp.get_pad("sink_0")
    bag.set("width", 720)
    bag.set("height", 576)
    spec = FrameSpec(VideoFormat.BGRA, 720, 576, par=Fraction(16, 11))
    pad = CompositorPadConfig("sink_0", spec, bag)
    w, h, xo, yo = pad.output_size(comp, Fraction(1, 1))
    # dar = (720*16)/(576*11) = 20/11; sizing NONE adjusts one axis:
    # 576 % 20 != 0, 720 % 11 != 0 -> width = 576*20//11 = 1047
    assert (w, h, xo, yo) == (1047, 576, 0, 0)


def test_pad_output_size_keep_aspect_with_par():
    from tpuvf.core.spec import Fraction
    from tpuvf.elements.compositor import CompositorPadConfig

    comp = make("vfcompositor")
    bag = comp.get_pad("sink_0")
    bag.set("width", 200)
    bag.set("height", 100)
    bag.set("sizing-policy", 1)
    spec = FrameSpec(VideoFormat.BGRA, 100, 100)  # square content
    pad = CompositorPadConfig("sink_0", spec, bag)
    w, h, xo, yo = pad.output_size(comp, Fraction(1, 1))
    # square content aspect-fit into 200x100 -> 100x100 centered at x=50
    assert (w, h) == (100, 100)
    assert (xo, yo) == (50, 0)


def test_zero_size_is_unscaled_false():
    from tpuvf.core.spec import Fraction
    from tpuvf.elements.compositor import CompositorPadConfig

    comp = make("vfcompositor")
    comp.set_property("zero-size-is-unscaled", False)
    bag = comp.get_pad("sink_0")
    bag.set("width", 0)   # with the flag off, 0 means literally zero
    spec = FrameSpec(VideoFormat.BGRA, 64, 48)
    pad = CompositorPadConfig("sink_0", spec, bag)
    w, h, xo, yo = pad.output_size(comp, Fraction(1, 1))
    assert (w, h) == (0, 0)  # pad skipped


# -- round 2: timestamps, traced geometry, inactive pads ----------------------

def _run_collect(pipeline_str, n=None):
    pipe = parse_pipeline(pipeline_str)
    pipe.negotiate()
    pipe.build()
    pipe.run(n)
    return pipe, [f.copy() for f in pipe.sinks[0].frames]


def test_timestamp_aggregation_mixed_rates():
    """30 fps + 15 fps pads into a 30 fps composite: each slow-pad buffer is
    shown twice (latest-buffer-by-pts selection, the GstVideoAggregator
    model; gstvfmetalcompositor.m:574-684)."""
    pipe, frames = _run_collect(
        "vfmetalcompositor name=c background=black sink_1::xpos=32 "
        "! video/x-raw,format=RGBA,width=64,height=24 ! appsink "
        "videotestsrc num-buffers=4 pattern=ball "
        "! video/x-raw,format=RGBA,width=32,height=24,framerate=30/1 ! c.sink_0 "
        "videotestsrc num-buffers=2 pattern=snow "
        "! video/x-raw,format=RGBA,width=32,height=24,framerate=15/1 ! c.sink_1 "
    )
    assert len(frames) == 4
    slow = [f[:, 32:, :] for f in frames]
    # slow pad buffer 0 covers output frames 0-1, buffer 1 covers 2-3
    np.testing.assert_array_equal(slow[0], slow[1])
    np.testing.assert_array_equal(slow[2], slow[3])
    assert (slow[0] != slow[2]).any()


def test_eos_pad_freezes_last_frame_by_default():
    """A pad whose stream ended holds its last buffer (frozen frame) while
    other pads continue — aggregator EOS semantics."""
    _, frames = _run_collect(
        "vfmetalcompositor name=c background=black sink_1::xpos=32 "
        "! video/x-raw,format=RGBA,width=64,height=24 ! appsink "
        "videotestsrc num-buffers=4 pattern=ball "
        "! video/x-raw,format=RGBA,width=32,height=24,framerate=25/1 ! c.sink_0 "
        "videotestsrc num-buffers=2 pattern=snow "
        "! video/x-raw,format=RGBA,width=32,height=24,framerate=25/1 ! c.sink_1 "
    )
    assert len(frames) == 4  # runs until ALL pads past their last buffer
    slow = [f[:, 32:, :] for f in frames]
    assert (slow[0] != slow[1]).any()          # live: distinct snow frames
    np.testing.assert_array_equal(slow[1], slow[2])  # frozen last buffer
    np.testing.assert_array_equal(slow[1], slow[3])


def test_ignore_inactive_pads_drops_eos_pad():
    """With ignore-inactive-pads=true the EOS pad stops being drawn."""
    _, frames = _run_collect(
        "vfmetalcompositor name=c background=black ignore-inactive-pads=true sink_1::xpos=32 "
        "! video/x-raw,format=RGBA,width=64,height=24 ! appsink "
        "videotestsrc num-buffers=4 pattern=ball "
        "! video/x-raw,format=RGBA,width=32,height=24,framerate=25/1 ! c.sink_0 "
        "videotestsrc num-buffers=2 pattern=snow "
        "! video/x-raw,format=RGBA,width=32,height=24,framerate=25/1 ! c.sink_1 "
    )
    assert len(frames) == 4
    slow = [f[:, 32:, :] for f in frames]
    assert (slow[0] != slow[1]).any()
    # after EOS: background (black) where the pad was
    assert (slow[2][..., :3] == 0).all()
    assert (slow[3][..., :3] == 0).all()


def test_late_start_pad_skipped_until_first_buffer():
    """A pad whose stream starts later (timestamp-offset) is not drawn
    before its first buffer's pts."""
    offset_ns = int(2 / 25 * 1e9)  # starts at output frame 2 (25 fps)
    _, frames = _run_collect(
        "vfmetalcompositor name=c background=black sink_1::xpos=32 "
        "! video/x-raw,format=RGBA,width=64,height=24 ! appsink "
        "videotestsrc num-buffers=4 pattern=ball "
        "! video/x-raw,format=RGBA,width=32,height=24,framerate=25/1 ! c.sink_0 "
        f"videotestsrc num-buffers=2 pattern=white timestamp-offset={offset_ns} "
        "! video/x-raw,format=RGBA,width=32,height=24,framerate=25/1 ! c.sink_1 "
    )
    assert len(frames) == 4
    late = [f[:, 32:, :] for f in frames]
    assert (late[0][..., :3] == 0).all()   # not started: background
    assert (late[1][..., :3] == 0).all()
    assert (late[2][..., :3] == 255).all()  # white pad visible
    assert (late[3][..., :3] == 255).all()


def test_animated_xpos_zero_rebuilds():
    """xpos/ypos are CONTROLLABLE (gstvfmetalcompositorpad.m:282-315):
    animating them triggers zero rebuilds and the draw moves."""
    pipe = parse_pipeline(
        "vfmetalcompositor name=c background=black "
        "! video/x-raw,format=RGBA,width=64,height=24 ! appsink "
        "videotestsrc num-buffers=8 pattern=white "
        "! video/x-raw,format=RGBA,width=8,height=8 ! c.sink_0 "
    )
    pipe.negotiate()
    pipe.build()
    comp = pipe["c"]
    bag = comp.get_pad("sink_0")
    sink = pipe.sinks[0]

    pipe.run(num_frames=1)
    assert (sink.frames[0][:8, :8, 0] == 255).all()

    bag.set("xpos", 40)
    bag.set("ypos", 8)
    assert not pipe._maybe_rebuild()  # controllable: no structural change
    pipe.run(num_frames=1)
    f = sink.frames[-1]
    assert (f[8:16, 40:48, 0] == 255).all()
    assert (f[:8, :8, 0] == 0).all()

    # negative position: left/top-cropped, no shift-back
    bag.set("xpos", -4)
    bag.set("ypos", -4)
    assert not pipe._maybe_rebuild()
    pipe.run(num_frames=1)
    f = sink.frames[-1]
    assert (f[:4, :4, 0] == 255).all()
    assert (f[:4, 4:8, 0] == 0).all() or (f[:4, 4:8, 0] == 255).any() is False

    # fully offscreen: nothing drawn
    bag.set("xpos", 200)
    bag.set("ypos", 0)
    assert not pipe._maybe_rebuild()
    pipe.run(num_frames=1)
    assert (pipe.sinks[0].frames[-1][..., :3] == 0).all()


def test_golden_negative_position_crop():
    """Pad partially above/left of the canvas is cropped, matching the
    numpy oracle's mask semantics."""
    out, out_spec, in_planes, pad_specs = run_compositor([
        ("RGBA", 32, 24, {}, None),
        ("RGBA", 16, 16, {"xpos": -8, "ypos": -4, "alpha": 0.7}, None),
    ], comp_props={"background": 1})
    draws = [
        (in_planes["sink_0"], "RGBA", 0, (0, 0, 32, 24), 1.0, 1),
        (in_planes["sink_1"], "RGBA", 0, (-8, -4, 16, 16), 0.7, 1),
    ]
    want = _oracle_composite(draws, out_spec.width, out_spec.height, 1)
    assert_planes_close(out, want, tol=2, context="negative pos crop")


def test_add_operator_full_coverage_makes_background_transparent():
    """An opaque full-coverage pad obscures the background even in ADD mode
    (pad_obscures_rectangle checks alpha/format/containment only,
    m:328-358): background must be cleared transparent, so ADD composites
    onto zeros, not onto the checker."""
    out, out_spec, in_planes, pad_specs = run_compositor([
        ("NV12", 32, 24, {"operator": 2}, None),
    ], comp_props={"background": 0})
    draws = [(in_planes["sink_0"], "NV12", pad_specs["sink_0"].matrix_index,
              (0, 0, 32, 24), 1.0, 2)]
    want = _oracle_composite(draws, out_spec.width, out_spec.height, 3)
    assert_planes_close(out, want, tol=2, context="ADD obscures bg")


def test_scaled_pads_keep_interleaved_renderer():
    """Pads with width/height props (scaled draws) reject the split
    canvas: the phase-matrix reader measured ~2x SLOWER than the
    interleaved renderer at 4K in both split bodies
    (scripts/bench_comp_scaled_ab*.py; note in aggregate_split_ok).
    Identity pads still split."""
    comp = make("vfcompositor")
    comp.set_property("background", 1)
    pad_specs = {
        "sink_0": FrameSpec(VideoFormat.BGRA, 64, 48),
        "sink_1": FrameSpec(VideoFormat.NV12, 32, 24),
    }
    comp.get_pad("sink_0")
    b1 = comp.get_pad("sink_1")
    b1.set("xpos", 10); b1.set("ypos", 6)
    b1.set("width", 24); b1.set("height", 18)  # scaled NV12 draw
    out_spec = comp.aggregate_spec(
        pad_specs, CapsFilter(format=VideoFormat.BGRA))
    assert not comp.aggregate_split_ok(pad_specs, out_spec)
    b1.set("width", -1); b1.set("height", -1)  # back to native size
    assert comp.aggregate_split_ok(pad_specs, out_spec)


# -- host PAIR chroma provisioning (round 5, VERDICT r4 item 4) --------------
#
# 4:2:0 split-provisioned pads upload full-height (main, adj) u8 chroma
# planes (frame.chroma_pair_rows) so the LINEAR chroma row 2x-upsample is
# the pure elementwise 0.25*adj + 0.75*main inside every consumer fold —
# no multi-consumer f32 relayout (the characterized config-5 residual:
# 17.6 MB/op re-read by 8 sibling cell fusions).  Everything here asserts
# BITWISE equality vs the pair-disabled program.


def _pair_agg(out_mode="packed16"):
    comp = make("vfcompositor")
    comp.set_property("background", 1)
    pad_specs = {
        "sink_0": FrameSpec(VideoFormat.BGRA, 256, 128),
        "sink_1": FrameSpec(VideoFormat.NV12, 128, 64),
        "sink_2": FrameSpec(VideoFormat.BGRA, 64, 32),
        "sink_3": FrameSpec(VideoFormat.NV12, 64, 32),
    }
    comp.get_pad("sink_0")
    b1 = comp.get_pad("sink_1"); b1.set("xpos", 128); b1.set("ypos", 0)
    b2 = comp.get_pad("sink_2"); b2.set("xpos", 0); b2.set("ypos", 64)
    b2.set("alpha", 0.7)
    # odd offsets: exercise the phase mapping + off-alignment cell windows
    b3 = comp.get_pad("sink_3"); b3.set("xpos", 37); b3.set("ypos", 21)
    b3.set("operator", 2)
    out_spec = comp.aggregate_spec(
        pad_specs, CapsFilter(format=VideoFormat.BGRA))
    assert comp.aggregate_split_ok(pad_specs, out_spec)
    split_pads = frozenset(pad_specs)
    agg = comp.make_aggregate(pad_specs, out_spec, out_mode=out_mode,
                              split_pads=split_pads)
    return comp, pad_specs, split_pads, agg


def _pair_planes(pad_specs, split_pads, pair):
    from tpuvf.runtime.benchmark import random_planes_for_spec

    rng = np.random.default_rng(7)
    out = {}
    for name, spec in pad_specs.items():
        mode = False
        if name in split_pads:
            mode = ("pair" if pair and spec.format == VideoFormat.NV12
                    else True)
        out[name] = {k: v[0] for k, v in random_planes_for_spec(
            spec, 1, rng, split=mode).items()}
    return out


def test_pair_chroma_cells_and_fast_bitwise(monkeypatch):
    comp, pad_specs, split_pads, agg = _pair_agg()
    params = comp.traced_params()
    pp = _pair_planes(pad_specs, split_pads, pair=True)
    pn = _pair_planes(pad_specs, split_pads, pair=False)
    # same rng stream: the shared planes are identical data
    for n in pad_specs:
        for k in pn[n]:
            assert np.array_equal(np.asarray(pp[n][k]), np.asarray(pn[n][k]))

    monkeypatch.delenv("TPUVF_NO_CHROMA_PAIR", raising=False)
    out_cells, _ = agg.variants["cells"](pp, (), params)
    out_fast, _ = agg.variants["fast"](pp, (), params)
    monkeypatch.setenv("TPUVF_NO_CHROMA_PAIR", "1")
    base_cells, _ = agg.variants["cells"](pn, (), params)
    base_fast, _ = agg.variants["fast"](pn, (), params)
    for k in base_cells:
        np.testing.assert_array_equal(np.asarray(out_cells[k]),
                                      np.asarray(base_cells[k]), err_msg=k)
    for k in base_fast:
        np.testing.assert_array_equal(np.asarray(out_fast[k]),
                                      np.asarray(base_fast[k]), err_msg=k)


def test_pair_chroma_planes_are_consumed():
    """Corrupting u_m must change the cells output — proves the lazy
    4:2:0 cell readers actually read the PAIR planes (not the canonical
    u/v fallback)."""
    import jax.numpy as jnp

    comp, pad_specs, split_pads, agg = _pair_agg()
    params = comp.traced_params()
    pp = _pair_planes(pad_specs, split_pads, pair=True)
    out0, _ = agg.variants["cells"](pp, (), params)
    pp2 = {n: dict(d) for n, d in pp.items()}
    pp2["sink_1"]["u_m"] = jnp.asarray(
        np.asarray(pp["sink_1"]["u_m"]) ^ 255)
    out1, _ = agg.variants["cells"](pp2, (), params)
    changed = sum(int(np.sum(np.asarray(out0[k]) != np.asarray(out1[k])))
                  for k in out0)
    assert changed > 0


def test_pair_chroma_pipeline_provisioning_bitwise(monkeypatch):
    """End-to-end: source-fed 4:2:0 pads negotiate the cols_pair upload
    (Pipeline._link_plan) and the pipeline output bit-matches the
    pair-disabled build."""
    # a split edge needs a downstream split consumer (a compositor
    # feeding the sink directly keeps the canonical layout by design)
    desc = (
        "vfmetalcompositor name=c background=black "
        "sink_1::xpos=37 sink_1::ypos=21 "
        "! video/x-raw,format=BGRA "
        "! vfmetalvideofilter brightness=0.1 ! appsink "
        "videotestsrc num-buffers=2 "
        "! video/x-raw,format=BGRA,width=128,height=64 ! c.sink_0 "
        "videotestsrc num-buffers=2 pattern=ball "
        "! video/x-raw,format=NV12,width=64,height=32 ! c.sink_1"
    )

    def run(no_pair):
        if no_pair:
            monkeypatch.setenv("TPUVF_NO_CHROMA_PAIR", "1")
        else:
            monkeypatch.delenv("TPUVF_NO_CHROMA_PAIR", raising=False)
        p = parse_pipeline(desc)
        p.negotiate()
        p.build()
        p.run()
        return p

    p_pair = run(False)
    assert any(v == "cols_pair" for v in p_pair._source_split.values())
    p_base = run(True)
    assert all(v != "cols_pair" for v in p_base._source_split.values())
    monkeypatch.delenv("TPUVF_NO_CHROMA_PAIR", raising=False)
    fa = p_pair.sinks[0].frames
    fb = p_base.sinks[0].frames
    assert len(fa) == len(fb) == 2
    for a, b in zip(fa, fb):
        if not isinstance(a, dict):
            a, b = {"rgba": a}, {"rgba": b}
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]),
                                          np.asarray(b[k]), err_msg=k)


def test_chroma_pair_rows_layout():
    from tpuvf.core.frame import chroma_pair_rows

    c = np.arange(4 * 3, dtype=np.uint8).reshape(4, 3)
    m, a = chroma_pair_rows(c)
    assert m.shape == a.shape == (8, 3)
    for k in range(4):
        assert np.array_equal(m[2 * k], c[k])
        assert np.array_equal(m[2 * k + 1], c[k])
        assert np.array_equal(a[2 * k], c[max(k - 1, 0)])
        assert np.array_equal(a[2 * k + 1], c[min(k + 1, 3)])
