"""compositor!overlay draw folding — one render pass.

The pipeline absorbs a downstream vfoverlay's rect blend as a final 'mix'
draw of the compositor's render pass (the reference draws the overlay
quad inside the same command buffer; here the fold removes the overlay's
full-canvas read+write round trip, measured ~6-15% on the 4-pad 4K
config).  Values must match the unfolded pipeline within 1 LSB (identical
per-pixel math; fusion-order FMA reassociation may flip knife-edge
roundings, the documented cross-program-shape class).
"""

from __future__ import annotations

import numpy as np
import pytest

from tpuvf.cli.launch import parse_pipeline


def _ov_png(tmp_path):
    import tpuvf.io.png as pngio

    img = np.zeros((12, 16, 4), np.uint8)
    img[..., 1] = 220
    img[..., 3] = 140
    p = str(tmp_path / "ov.png")
    pngio.write(p, img)
    return p


COMP_OV = (
    "videotestsrc num-buffers=2 pattern=smpte "
    "! video/x-raw,format=BGRA,width=128,height=96 ! c.sink_0 "
    "videotestsrc num-buffers=2 pattern=ball "
    "! video/x-raw,format=NV12,width=64,height=48 ! c.sink_1 "
    "vfmetalcompositor name=c background=black sink_1::xpos=64 "
    "sink_1::ypos=48 {mid} "
    "! vfmetaloverlay location={ov} x=20 y=10 alpha=0.8 ! appsink"
)


def _run(s, unfold=False, frames=None):
    p = parse_pipeline(s)
    if unfold:
        p._plan_overlay_folds = lambda link_plan: ({}, set())
    p.negotiate()
    p.build()
    p.run(num_frames=frames)
    return p


def _close(a, b, tol=1):
    if isinstance(a, dict):
        for k in a:
            _close(a[k], b[k], tol)
        return
    d = np.abs(a.astype(np.int32) - b.astype(np.int32))
    assert d.max() <= tol, f"max diff {d.max()}"


def test_fold_detected_and_matches_unfolded(tmp_path):
    s = COMP_OV.format(ov=_ov_png(tmp_path), mid="")
    p = _run(s)
    comp = next(e.name for e in p.elements
                if e.ELEMENT_NAME == "vfcompositor")
    ov = next(e for e in p.elements if e.ELEMENT_NAME == "vfoverlay")
    assert p.overlay_folds.get(comp) == [ov]
    # the folded overlay's stage is a forward
    st = next(st for st in p._stages if st.element is ov)
    assert st.passthrough
    plain = _run(s, unfold=True)
    assert not plain.overlay_folds
    for a, b in zip(p.sinks[0].frames, plain.sinks[0].frames):
        _close(a, b)


def test_fold_through_queue(tmp_path):
    s = COMP_OV.format(ov=_ov_png(tmp_path), mid="! queue")
    p = _run(s)
    comp = next(e.name for e in p.elements
                if e.ELEMENT_NAME == "vfcompositor")
    assert comp in p.overlay_folds
    plain = _run(s, unfold=True)
    for a, b in zip(p.sinks[0].frames, plain.sinks[0].frames):
        _close(a, b)


def test_no_fold_for_yuv_output(tmp_path):
    # YUV compositor output: the separate overlay mixes after the YUV
    # round trip — folding would change values, so it must not happen
    s = (
        "videotestsrc num-buffers=1 "
        "! video/x-raw,format=NV12,width=64,height=48 ! c.sink_0 "
        "vfmetalcompositor name=c ! video/x-raw,format=NV12 "
        f"! vfmetaloverlay location={_ov_png(tmp_path)} ! appsink"
    )
    p = _run(s)
    assert not p.overlay_folds


def test_no_fold_without_image():
    s = (
        "videotestsrc num-buffers=1 "
        "! video/x-raw,format=BGRA,width=64,height=48 ! c.sink_0 "
        "vfmetalcompositor name=c ! vfmetaloverlay ! appsink"
    )
    p = _run(s)
    assert not p.overlay_folds  # passthrough overlay: nothing to fold


def test_folded_alpha_stays_controllable(tmp_path):
    s = COMP_OV.format(ov=_ov_png(tmp_path), mid="")
    p = parse_pipeline(s)
    p.negotiate()
    p.build()
    ov = next(e for e in p.elements if e.ELEMENT_NAME == "vfoverlay")
    p.run(num_frames=1)
    f_a = p.sinks[0].frames[-1]
    ov.set_property("alpha", 0.0)  # traced: no rebuild
    sig = p._built_signature
    p.run(num_frames=2)
    assert p._built_signature == sig  # alpha change did not rebuild
    f_b = p.sinks[0].frames[-1]
    assert not np.array_equal(f_a, f_b)  # blend visibly changed


def test_two_chained_overlays_fold(tmp_path):
    ov1, ov2 = _ov_png(tmp_path), _ov_png(tmp_path)
    s = (
        "videotestsrc num-buffers=1 pattern=smpte "
        "! video/x-raw,format=BGRA,width=96,height=64 ! c.sink_0 "
        "vfmetalcompositor name=c background=white "
        f"! vfmetaloverlay location={ov1} x=4 y=4 "
        f"! vfmetaloverlay location={ov2} x=40 y=30 ! appsink"
    )
    p = _run(s)
    comp = next(e.name for e in p.elements
                if e.ELEMENT_NAME == "vfcompositor")
    assert len(p.overlay_folds.get(comp, [])) == 2
    plain = _run(s, unfold=True)
    for a, b in zip(p.sinks[0].frames, plain.sinks[0].frames):
        _close(a, b)
