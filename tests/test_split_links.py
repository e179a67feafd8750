"""Cross-element column-phase links + packed16 edge layout.

The pipeline negotiates boundary layouts (core/element.py docs): split
phase planes between phase-capable elements, u16-word packed planes at the
sink edge (bytes identical to interleaved u8).  Everything here asserts
BIT-equality against the same pipeline with links disabled — the layouts
must never change values.
"""

from __future__ import annotations

import numpy as np
import pytest

from tpuvf.cli.launch import parse_pipeline
from tpuvf.kernels import convert
from tpuvf.runtime.pipeline import Pipeline

import jax.numpy as jnp


def test_pack_words_u16_bytes_equal_interleave():
    rng = np.random.default_rng(0)
    e = rng.integers(0, 256, (4, 16, 64), np.uint8)
    o = rng.integers(0, 256, (4, 16, 64), np.uint8)
    inter = np.asarray(convert.interleave_cols_u8(jnp.asarray(e), jnp.asarray(o)))
    words = np.asarray(convert.pack_words_u16(jnp.asarray(e), jnp.asarray(o)))
    assert words.dtype == np.uint16 and words.shape == (4, 16, 64)
    assert words.tobytes() == inter.tobytes()


def _run(pipeline_str, disable_links=False, frames=2):
    p = parse_pipeline(pipeline_str)
    if disable_links:
        p._link_plan = lambda: ({}, {}, {})
    p.negotiate()
    p.build()
    p.run()
    return p


CHAIN = (
    "videotestsrc num-buffers=2 ! video/x-raw,format=NV12,width=192,height=108 "
    "! vfmetalconvertscale ! video/x-raw,format=BGRA "
    "! vfmetalvideofilter brightness=0.1 contrast=1.2 saturation=1.3 "
    "! appsink"
)


def test_chain_link_plan_negotiated():
    p = _run(CHAIN)
    plan = p.link_plan
    names = {e.ELEMENT_NAME: e.name for e in p.elements}
    cs, vf = names["vfconvertscale"], names["vfvideofilter"]
    # round 3d: the whole 4:2:0-identity chain upgrades to QUAD
    # (row x col phase) links with a quad-provisioned source upload
    assert plan[cs] == ("quad", "quad")
    assert plan[vf] == ("quad", "packed32q")  # RGB edge: u32 word quads


def test_chain_bit_exact_vs_unlinked():
    linked = _run(CHAIN).sinks[0].frames
    plain = _run(CHAIN, disable_links=True).sinks[0].frames
    for a, b in zip(linked, plain):
        assert a.dtype == np.uint8 and a.shape == b.shape
        np.testing.assert_array_equal(a, b)


def test_vf_to_vf_420_split_link_bit_exact():
    s = (
        "videotestsrc num-buffers=2 ! video/x-raw,format=NV12,width=128,height=64 "
        "! vfmetalvideofilter brightness=0.05 "
        "! vfmetalvideofilter contrast=1.3 vignette=0.4 "
        "! appsink"
    )
    p = _run(s)
    names = [e.name for e in p.elements if e.ELEMENT_NAME == "vfvideofilter"]
    assert p.link_plan[names[0]] == ("quad", "quad")
    assert p.link_plan[names[1]] == ("quad", "packed16q")  # NV12 edge
    plain = _run(s, disable_links=True).sinks[0].frames
    for a, b in zip(p.sinks[0].frames, plain):
        np.testing.assert_array_equal(a["y"], b["y"])
        np.testing.assert_array_equal(a["uv"], b["uv"])


def test_packed16_edge_single_element():
    s = (
        "videotestsrc num-buffers=2 ! video/x-raw,format=NV12,width=128,height=64 "
        "! vfmetalconvertscale ! video/x-raw,format=BGRA ! appsink"
    )
    p = _run(s)
    cs = next(e.name for e in p.elements if e.ELEMENT_NAME == "vfconvertscale")
    assert p.link_plan[cs] == ("quad", "packed32q")
    plain = _run(s, disable_links=True).sinks[0].frames
    for a, b in zip(p.sinks[0].frames, plain):
        np.testing.assert_array_equal(a, b)


def test_sharpness_chain_still_links():
    # the 9-tap blur decomposes per axis into phase-local stencils
    # (blur9_h_split / blur9_v_split, bit-exact incl. cross-phase edge
    # clamps), so sharpened chains keep phase links — since round 3d the
    # full QUAD plan (the vertical blur crosses row phases in-plane)
    s = CHAIN.replace("saturation=1.3", "saturation=1.3 sharpness=0.5")
    p = _run(s)
    vf = next(e.name for e in p.elements if e.ELEMENT_NAME == "vfvideofilter")
    assert p.link_plan[vf] == ("quad", "packed32q")
    plain = _run(s, disable_links=True).sinks[0].frames
    for a, b in zip(p.sinks[0].frames, plain):
        np.testing.assert_array_equal(a, b)


def test_blur_split_negative_sharpness_bit_exact():
    s = CHAIN.replace("saturation=1.3", "saturation=1.3 sharpness=-0.7")
    linked = _run(s).sinks[0].frames
    plain = _run(s, disable_links=True).sinks[0].frames
    for a, b in zip(linked, plain):
        np.testing.assert_array_equal(a, b)


def test_split_through_passthrough_elements():
    s = (
        "videotestsrc num-buffers=2 ! video/x-raw,format=NV12,width=128,height=64 "
        "! vfmetalconvertscale ! video/x-raw,format=BGRA ! queue "
        "! vfmetalvideofilter brightness=0.2 ! appsink"
    )
    p = _run(s)
    cs = next(e.name for e in p.elements if e.ELEMENT_NAME == "vfconvertscale")
    vf = next(e.name for e in p.elements if e.ELEMENT_NAME == "vfvideofilter")
    # round 3d: quad links walk THROUGH passthrough elements too
    assert p.link_plan[cs] == ("quad", "quad")
    assert p.link_plan[vf] == ("quad", "packed32q")
    plain = _run(s, disable_links=True).sinks[0].frames
    for a, b in zip(p.sinks[0].frames, plain):
        np.testing.assert_array_equal(a, b)


def test_pack_words_u32_bytes_equal_interleaved_bgra():
    rng = np.random.default_rng(1)
    q = tuple(jnp.asarray(rng.integers(0, 256, (16, 64), np.uint8))
              for _ in range(4))  # r, g, b, a phase planes
    words = np.asarray(convert.pack_words_u32(q, convert.VideoFormat.BGRA))
    assert words.dtype == np.uint32 and words.shape == (16, 64)
    b = words.view(np.uint8).reshape(16, 64, 4)
    np.testing.assert_array_equal(b[..., 0], np.asarray(q[2]))  # B first
    np.testing.assert_array_equal(b[..., 1], np.asarray(q[1]))
    np.testing.assert_array_equal(b[..., 2], np.asarray(q[0]))
    np.testing.assert_array_equal(b[..., 3], np.asarray(q[3]))


def test_lut_and_grain_through_split_link():
    # grain varies by compiled program shape only across DIFFERENT programs;
    # linked vs unlinked are different programs, so compare with the
    # established tolerance-and-outliers rule for noise
    lut = "/tmp/tpuvf-splitlink-lut.cube"
    size = 9
    with open(lut, "w") as fh:
        fh.write(f"LUT_3D_SIZE {size}\n")
        for b in range(size):
            for g in range(size):
                for r in range(size):
                    fh.write(f"{(r/(size-1))**0.9:.5f} "
                             f"{(g/(size-1))**0.9:.5f} "
                             f"{(b/(size-1))**0.9:.5f}\n")
    extra = f" lut-file={lut}"
    s = (
        "videotestsrc num-buffers=2 ! video/x-raw,format=NV12,width=128,height=64 "
        f"! vfmetalconvertscale ! video/x-raw,format=BGRA "
        f"! vfmetalvideofilter brightness=0.1 noise=0.3{extra} ! appsink"
    )
    linked = _run(s).sinks[0].frames
    plain = _run(s, disable_links=True).sinks[0].frames
    for a, b in zip(linked, plain):
        diff = np.abs(a.astype(np.int32) - b.astype(np.int32))
        assert (diff > 2).mean() < 1e-3
        assert np.median(diff) <= 1


def test_codec_after_split_producer(tmp_path):
    # pngenc is host-side: the packed16 edge plane must normalize to u8
    # bytes before encoding
    out = tmp_path / "frame.png"
    s = (
        "videotestsrc num-buffers=1 ! video/x-raw,format=NV12,width=64,height=32 "
        "! vfmetalconvertscale ! video/x-raw,format=BGRA "
        f"! pngenc ! filesink location={out}"
    )
    _run(s)
    import tpuvf.io.png as pngio

    img = pngio.read(str(out))
    assert img.shape == (32, 64, 4)


COMP_CHAIN = (
    "vfmetalcompositor name=c background=black "
    "sink_1::xpos={x1} sink_1::ypos=32 sink_1::alpha=0.7 sink_2::operator=2 "
    "sink_2::xpos=33 sink_2::ypos=1 "
    "! video/x-raw,format=BGRA ! vfmetaloverlay location={ov} x=37 y=11 "
    "! appsink  "
    "videotestsrc num-buffers=2 ! video/x-raw,format=BGRA,width=192,height=108 ! c.sink_0  "
    "videotestsrc num-buffers=2 pattern=ball ! video/x-raw,format=NV12,width=64,height=32 ! c.sink_1  "
    "videotestsrc num-buffers=2 pattern=snow ! video/x-raw,format=RGBA,width=48,height=24 ! c.sink_2"
)


def _overlay_png(tmp_path):
    import tpuvf.io.png as pngio

    img = np.zeros((16, 20, 4), np.uint8)
    img[..., 1] = 200
    img[..., 3] = 128
    p = str(tmp_path / "ov.png")
    pngio.write(p, img)
    return p


@pytest.mark.parametrize("x1", [96, 33])  # even and ODD xpos (phase swap)
def test_compositor_overlay_split_chain(tmp_path, x1):
    s = COMP_CHAIN.format(x1=x1, ov=_overlay_png(tmp_path))
    p = _run(s)
    comp = next(e.name for e in p.elements
                if e.ELEMENT_NAME == "vfcompositor")
    ov = next(e.name for e in p.elements if e.ELEMENT_NAME == "vfoverlay")
    assert p.link_plan[comp] == (False, "split")
    assert p.link_plan[ov] == (True, "packed32")
    plain = _run(s, disable_links=True).sinks[0].frames
    for a, b in zip(p.sinks[0].frames, plain):
        np.testing.assert_array_equal(a, b)


def test_compositor_canonical_edge():
    s = (
        "vfmetalcompositor name=c sink_1::xpos=17 ! video/x-raw,format=BGRA "
        "! appsink  "
        "videotestsrc num-buffers=2 ! video/x-raw,format=BGRA,width=128,height=64 ! c.sink_0  "
        "videotestsrc num-buffers=2 pattern=ball ! video/x-raw,format=NV12,width=32,height=16 ! c.sink_1"
    )
    p = _run(s)
    comp = next(e.name for e in p.elements
                if e.ELEMENT_NAME == "vfcompositor")
    # the u8 phase canvas would pay a pure u8->u16 relayout at a packed16
    # edge, so a compositor feeding the sink keeps the canonical layout
    assert p.link_plan.get(comp, (False, "full")) == (False, "full")
    plain = _run(s, disable_links=True).sinks[0].frames
    for a, b in zip(p.sinks[0].frames, plain):
        np.testing.assert_array_equal(a, b)


def test_compositor_split_animated_general_branch(tmp_path):
    # animate xpos mid-run: frames off the baked geometry run the general
    # branch, whose split emission must still match the unlinked pipeline
    s = COMP_CHAIN.format(x1=96, ov=_overlay_png(tmp_path))

    def run(disable):
        p = parse_pipeline(s)
        if disable:
            p._link_plan = lambda: ({}, {}, {})
        p.negotiate()
        p.build()
        comp = next(e for e in p.elements
                    if e.ELEMENT_NAME == "vfcompositor")
        frames = []
        p.run(num_frames=1)
        frames.append(p.sinks[0].frames[-1])
        comp.get_pad("sink_1").set("xpos", 41)  # odd, off-baked
        p.run(num_frames=1)
        frames.append(p.sinks[0].frames[-1])
        return frames

    linked = run(False)
    plain = run(True)
    for a, b in zip(linked, plain):
        np.testing.assert_array_equal(a, b)


def test_compositor_scaled_pad_disables_split(tmp_path):
    # a pad drawn at non-native size keeps canonical layouts
    s = (
        "vfmetalcompositor name=c sink_0::width=100 sink_0::height=50 "
        "! video/x-raw,format=BGRA ! appsink  "
        "videotestsrc num-buffers=1 ! video/x-raw,format=BGRA,width=128,height=64 ! c.sink_0"
    )
    p = _run(s)
    comp = next(e.name for e in p.elements
                if e.ELEMENT_NAME == "vfcompositor")
    assert p.link_plan.get(comp, (False, "full"))[1] == "full"


def test_quant_sim_and_units_match_u8_roundtrip():
    from tpuvf.kernels.color import (
        as_unit_float, dequant, quant, quant_sim, quant_units)

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((64, 128)).astype(np.float32) * 1.4 - 0.2)
    ref = dequant(quant(x))
    np.testing.assert_array_equal(np.asarray(quant_sim(x)), np.asarray(ref))
    np.testing.assert_array_equal(
        np.asarray(as_unit_float(quant_units(x))), np.asarray(ref))
    np.testing.assert_array_equal(
        np.asarray(as_unit_float(quant(x))), np.asarray(ref))
    # f32 passthrough
    np.testing.assert_array_equal(
        np.asarray(as_unit_float(ref)), np.asarray(ref))


@pytest.mark.parametrize("method,fmt", [
    ("bob", "NV12"), ("weave", "NV12"), ("greedyh", "I420"),
    ("linear", "BGRA"),
])
def test_deinterlace_split_chain_bit_exact(method, fmt):
    # deinterlace (stateful: prev-frame phases) -> videofilter, linked
    s = (
        f"videotestsrc num-buffers=3 pattern=ball "
        f"! video/x-raw,format={fmt},width=128,height=64 "
        f"! vfmetaldeinterlace method={method} "
        f"! vfmetalvideofilter contrast=1.2 ! appsink"
    )
    p = _run(s)
    di = next(e.name for e in p.elements
              if e.ELEMENT_NAME == "vfdeinterlace")
    vf = next(e.name for e in p.elements
              if e.ELEMENT_NAME == "vfvideofilter")
    if fmt == "BGRA":
        # RGB heads keep the column-split plan (the quad win is the 4:2:0
        # chroma row-stencil fusion)
        assert p.link_plan[di] == (True, "split")
        assert p.link_plan[vf] == (True, "packed32")
    else:
        # round 3d: 4:2:0 deinterlace chains upgrade to QUAD links
        assert p.link_plan[di] == ("quad", "quad")
        assert p.link_plan[vf] == ("quad", "packed16q")
    plain = _run(s, disable_links=True).sinks[0].frames
    assert len(p.sinks[0].frames) == 3
    for a, b in zip(p.sinks[0].frames, plain):
        if isinstance(a, dict):
            for k in a:
                np.testing.assert_array_equal(a[k], b[k])
        else:
            np.testing.assert_array_equal(a, b)


def test_compositor_variant_selection(tmp_path):
    s = COMP_CHAIN.format(x1=96, ov=_overlay_png(tmp_path))
    p = parse_pipeline(s)
    p.negotiate()
    p.build()
    assert p._variant_stage is not None and p._step_fast is not None
    comp = next(e for e in p.elements if e.ELEMENT_NAME == "vfcompositor")
    proc = p._variant_stage.process
    assert proc.variant_select(comp.traced_params()) == "fast"
    comp.get_pad("sink_1").set("xpos", 97)
    assert proc.variant_select(comp.traced_params()) == "general"
    comp.get_pad("sink_1").set("xpos", 96)
    assert proc.variant_select(comp.traced_params()) == "fast"


def test_source_split_provisioning_bit_exact(tmp_path):
    # sources feeding split-capable consumers upload pre-split planes (no
    # device-side u8 deinterleave); compositor pads too
    s = COMP_CHAIN.format(x1=96, ov=_overlay_png(tmp_path))
    p = _run(s)
    assert p._source_split, "expected split-provisioned sources"
    comp = next(e.name for e in p.elements
                if e.ELEMENT_NAME == "vfcompositor")
    assert p._comp_split_pads.get(comp), "expected split pads"
    plain = _run(s, disable_links=True).sinks[0].frames
    for a, b in zip(p.sinks[0].frames, plain):
        np.testing.assert_array_equal(a, b)


def test_source_split_linear_chain():
    p = _run(CHAIN)
    src = next(e.name for e in p.elements if "testsrc" in e.ELEMENT_NAME)
    assert src in p._source_split
    # outputs already asserted bit-exact in test_chain_bit_exact_vs_unlinked


def test_odd_width_falls_back_to_canonical():
    s = (
        "videotestsrc num-buffers=1 ! video/x-raw,format=NV12,width=129,height=64 "
        "! vfmetalvideofilter brightness=0.2 ! appsink"
    )
    # NV12 needs even dims; use 130x64 with odd-width BGRA instead
    s = (
        "videotestsrc num-buffers=1 ! video/x-raw,format=BGRA,width=129,height=64 "
        "! vfmetalvideofilter brightness=0.2 ! appsink"
    )
    p = _run(s)
    vf = next(e.name for e in p.elements if e.ELEMENT_NAME == "vfvideofilter")
    assert p.link_plan.get(vf, (False, "full")) == (False, "full")
    assert not p._source_split


def test_odd_height_overlay_falls_back_to_canonical(tmp_path):
    # regression (round-3 advisor): overlay's phase gate must match
    # videofilter/deinterlace (can_split_420) — an odd-height I420 input
    # previously negotiated a split link whose chroma row-upsample produced
    # H+1 rows and crashed at run
    s = (
        "videotestsrc num-buffers=1 "
        "! video/x-raw,format=I420,width=64,height=33 "
        f"! vfmetaloverlay location={_overlay_png(tmp_path)} ! appsink"
    )
    p = _run(s)
    ov = next(e.name for e in p.elements if e.ELEMENT_NAME == "vfoverlay")
    assert p.link_plan.get(ov, (False, "full")) == (False, "full")
    assert len(p.sinks[0].frames) == 1


def test_packed_422_output_takes_packed16_edge():
    """Round 4: packed 4:2:2 joined the identity split dataflow — a 4:2:0
    -> UYVY identity conversion now emits the packed16 sink edge (y u16
    words whose bytes equal the interleaved u8 columns + stacked uv);
    values stay bitwise vs the canonical layout."""
    s = (
        "videotestsrc num-buffers=1 ! video/x-raw,format=NV12,width=128,height=64 "
        "! vfmetalconvertscale ! video/x-raw,format=UYVY ! appsink"
    )
    p = _run(s)
    cs = next(e.name for e in p.elements if e.ELEMENT_NAME == "vfconvertscale")
    assert p.link_plan.get(cs, (False, "full"))[1] == "packed16"
    plain = _run(s, disable_links=True).sinks[0].frames
    for a, b in zip(p.sinks[0].frames, plain):
        np.testing.assert_array_equal(a, b)


def _assert_frames_equal(frames_a, frames_b):
    assert len(frames_a) == len(frames_b)
    for a, b in zip(frames_a, frames_b):
        if isinstance(a, dict):
            assert a.keys() == b.keys()
            for k in a:
                np.testing.assert_array_equal(np.asarray(a[k]),
                                              np.asarray(b[k]), err_msg=k)
        else:
            np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("fmt,out_fmt,edge", [
    ("UYVY", "NV12", "packed16"),   # packed -> planar 4:2:0
    ("YUY2", "BGRA", "packed32"),   # packed -> RGB
    ("UYVY", "YUY2", "packed16"),   # packed -> packed (byte-order swap)
])
def test_packed_422_input_identity_split(fmt, out_fmt, edge):
    """Round 4: packed 4:2:2 INPUT joined the identity split dataflow
    (can_split_422) — 4:2:2 chroma is column-subsampled only and the
    canonical path is NEAREST, so both output column phases read the
    half-width plane unchanged (u_e = u_o = u, zero chroma work).
    Only convertscale accepts UYVY/YUY2 (gstvfmetalconvertscale.m:48),
    so the split path shows up as the packed sink edge.  Bitwise."""
    s = (
        f"videotestsrc num-buffers=2 ! video/x-raw,format={fmt},"
        "width=128,height=64 "
        f"! vfmetalconvertscale ! video/x-raw,format={out_fmt} ! appsink"
    )
    p = _run(s)
    cs = next(e.name for e in p.elements
              if e.ELEMENT_NAME == "vfconvertscale")
    assert p.link_plan.get(cs, (False, "full"))[1] == edge
    _assert_frames_equal(p.sinks[0].frames,
                         _run(s, disable_links=True).sinks[0].frames)


def test_packed_422_odd_height_gates():
    """4:2:2 has no row pairing, so ODD heights keep the split plan for
    RGB output — but a 4:2:0 OUTPUT at odd height must not (the 4:2:0
    pack's 2x2 box average needs row pairs)."""
    s = (
        "videotestsrc num-buffers=1 ! video/x-raw,format=YUY2,"
        "width=64,height=33 "
        "! vfmetalconvertscale ! video/x-raw,format=BGRA ! appsink"
    )
    p = _run(s)
    cs = next(e.name for e in p.elements
              if e.ELEMENT_NAME == "vfconvertscale")
    assert p.link_plan.get(cs, (False, "full"))[1] == "packed32"
    _assert_frames_equal(p.sinks[0].frames,
                         _run(s, disable_links=True).sinks[0].frames)
    s2 = (
        "videotestsrc num-buffers=1 ! video/x-raw,format=UYVY,"
        "width=64,height=33 "
        "! vfmetalconvertscale ! video/x-raw,format=NV12 ! appsink"
    )
    p2 = _run(s2)
    cs = next(e.name for e in p2.elements
              if e.ELEMENT_NAME == "vfconvertscale")
    assert p2.link_plan.get(cs, (False, "full"))[1] == "full"
    _assert_frames_equal(p2.sinks[0].frames,
                         _run(s2, disable_links=True).sinks[0].frames)


@pytest.mark.parametrize("fmt", ["UYVY", "YUY2"])
def test_packed_422_scaled_split_link(fmt):
    """Round 4 (late): packed 4:2:2 INPUT joined the SCALED split dataflow
    (can_split_scaled) — NEAREST forced like the canonical planner, chroma
    at half width / full height.  A scaled 4:2:2 -> RGB conversion feeding
    a split consumer takes the split link; <= 1 LSB vs canonical (the
    scaled-split program-shape contract)."""
    s = (
        f"videotestsrc num-buffers=2 ! video/x-raw,format={fmt},"
        "width=128,height=64 "
        "! vfmetalconvertscale ! video/x-raw,format=BGRA,width=64,height=32 "
        "! vfmetalvideofilter brightness=0.1 ! appsink"
    )
    p = _run(s)
    cs = next(e.name for e in p.elements
              if e.ELEMENT_NAME == "vfconvertscale")
    assert p.link_plan.get(cs, (False, "full"))[1] == "split"
    plain = _run(s, disable_links=True).sinks[0].frames
    for a, b in zip(p.sinks[0].frames, plain):
        diff = np.abs(a.astype(np.int16) - b.astype(np.int16))
        assert diff.max() <= 1, diff.max()


def test_packed_422_scaled_output_split_link():
    """Scaled 4:2:2 OUTPUT joins too: the phase-mean chroma pack is
    geometry-independent, so a scaled RGB -> UYVY conversion feeding a
    split-capable consumer (the only 4:2:2 consumer is convertscale)
    links split; <= 1 LSB vs canonical."""
    s = (
        "videotestsrc num-buffers=2 ! video/x-raw,format=BGRA,"
        "width=128,height=64 "
        "! vfmetalconvertscale ! video/x-raw,format=UYVY,width=64,height=32 "
        "! vfmetalconvertscale ! video/x-raw,format=NV12 ! appsink"
    )
    p = _run(s)
    names = [e.name for e in p.elements
             if e.ELEMENT_NAME == "vfconvertscale"]
    assert p.link_plan.get(names[0], (False, "full"))[1] == "split"
    plain = _run(s, disable_links=True).sinks[0].frames
    for a, b in zip(p.sinks[0].frames, plain):
        for k in a:
            diff = np.abs(np.asarray(a[k]).astype(np.int16)
                          - np.asarray(b[k]).astype(np.int16))
            assert diff.max() <= 1, (k, diff.max())


def test_scaled_split_engages_only_on_element_links():
    """Round 3b: scaled geometry joins the split dataflow, but ONLY where
    it buys a boundary — a standalone scaled convertscale keeps the
    canonical edge (the phase formulation costs more than canonical:
    60.3 vs 76.4 us/frame device, edge_packed16_ok), while a scaled
    convertscale feeding a split consumer takes the split link."""
    standalone = (
        "videotestsrc num-buffers=1 ! video/x-raw,format=NV12,width=128,height=64 "
        "! vfmetalconvertscale ! video/x-raw,format=BGRA,width=64,height=32 "
        "! appsink"
    )
    p = _run(standalone)
    cs = next(e.name for e in p.elements if e.ELEMENT_NAME == "vfconvertscale")
    assert p.link_plan.get(cs, (False, "full")) == (False, "full")
    assert not p._source_split

    chained = (
        "videotestsrc num-buffers=1 ! video/x-raw,format=NV12,width=128,height=64 "
        "! vfmetalconvertscale ! video/x-raw,format=BGRA,width=64,height=32 "
        "! vfmetalvideofilter brightness=0.1 ! appsink"
    )
    p2 = _run(chained)
    cs2 = next(e.name for e in p2.elements
               if e.ELEMENT_NAME == "vfconvertscale")
    assert p2.link_plan.get(cs2, (False, "full"))[1] == "split"
    assert p2._source_split  # presplit upload feeds the scaled sampler
    # <= 1 LSB vs the canonical layout (presplit K decomposition - FMA
    # rounding on knife-edge pixels)
    plain = _run(chained, disable_links=True).sinks[0].frames
    for a, b in zip(p2.sinks[0].frames, plain):
        diff = np.abs(a.astype(np.int16) - b.astype(np.int16))
        assert diff.max() <= 1, diff.max()


def test_layout_flip_mid_run_resets_stateful_carry():
    # toggling a downstream structural prop (sharpness) mid-run flips the
    # deinterlacer's boundary layout; its prev-frame carry re-shapes, so it
    # resets (weave falls back to bob for one frame — the same behavior as
    # a caps renegotiation in the reference, which rebuilds the renderer
    # and clears prevFrame).  The pipeline must keep running.
    s = (
        "videotestsrc num-buffers=6 pattern=ball "
        "! video/x-raw,format=NV12,width=64,height=32 "
        "! vfmetaldeinterlace method=weave "
        "! vfmetalvideofilter contrast=1.1 ! appsink"
    )
    p = parse_pipeline(s)
    p.negotiate()
    p.build()
    vf = next(e for e in p.elements if e.ELEMENT_NAME == "vfvideofilter")
    p.run(num_frames=2)
    vf.set_property("sharpness", 0.5)   # breaks the split link -> rebuild
    p.run(num_frames=2)
    vf.set_property("sharpness", 0.0)   # back to split -> rebuild again
    p.run(num_frames=2)
    frames = p.sinks[0].frames
    assert len(frames) == 6
    for f in frames:
        assert f["y"].shape == (32, 64)


def test_two_compositor_variant_combinations(tmp_path):
    # two variant-capable elements: each gets its own host pick, and the
    # per-combination steps are cached (animating one compositor must not
    # drop the other to its general body)
    s = (
        "videotestsrc num-buffers=4 pattern=smpte "
        "! video/x-raw,format=BGRA,width=64,height=48 ! a.sink_0 "
        "vfmetalcompositor name=a background=black ! b.sink_0 "
        "videotestsrc num-buffers=4 pattern=ball "
        "! video/x-raw,format=BGRA,width=32,height=24 ! b.sink_1 "
        "vfmetalcompositor name=b background=white sink_1::xpos=16 "
        "! appsink"
    )
    p = parse_pipeline(s)
    p.negotiate()
    p.build()
    assert len(p._variant_stages) == 2
    params = {st.element.name: st.element.traced_params()
              for st in p._variant_stages}
    all_fast = p._select_step(params)
    assert all_fast is p._step_fast
    # animate compositor b only: a stays on its steady body
    p["b"].get_pad("sink_1").set("xpos", 17)
    params2 = {st.element.name: st.element.traced_params()
               for st in p._variant_stages}
    mixed = p._select_step(params2)
    assert mixed is not p._step and mixed is not p._step_fast
    assert p._select_step(params2) is mixed  # cached
    p.run()  # end-to-end still runs
    assert len(p.sinks[0].frames) == 4
