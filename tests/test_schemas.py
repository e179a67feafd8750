"""Property-schema checks for every element — the ports of the reference's
gst-inspect greps (e.g. test-videofilter.sh:82-97, test-compositor.sh:90+).

The typed descriptor registry is the framework's de-facto schema; these
tests pin names, types, defaults and ranges against the reference's
GParamSpec tables.
"""

import pytest

from tpuvf.core.registry import lookup
from tpuvf.elements.compositor import PAD_PROPERTIES


def props_of(name):
    return {d.name: d for d in lookup(name).PROPERTIES}


def test_convertscale_schema():
    p = props_of("vfmetalconvertscale")
    assert p["method"].enum_values == (("bilinear", 0), ("nearest", 1))
    assert p["method"].default == 0
    assert p["add-borders"].default is False
    assert p["border-color"].default == 0xFF000000
    fmts = [f.value for f in lookup("vfmetalconvertscale").IN_FORMATS]
    assert fmts == ["BGRA", "RGBA", "NV12", "I420", "UYVY", "YUY2"]


def test_transform_schema():
    p = props_of("vfmetaltransform")
    nicks = [n for n, _ in p["method"].enum_values]
    assert nicks == ["none", "clockwise", "rotate-180", "counterclockwise",
                     "horizontal-flip", "vertical-flip",
                     "upper-left-diagonal", "upper-right-diagonal"]
    for crop in ("crop-top", "crop-bottom", "crop-left", "crop-right"):
        assert p[crop].default == 0
        assert p[crop].minimum == 0


def test_deinterlace_schema():
    p = props_of("vfmetaldeinterlace")
    assert [n for n, _ in p["method"].enum_values] == [
        "bob", "weave", "linear", "greedyh"]
    assert [n for n, _ in p["field-layout"].enum_values] == [
        "auto", "top-field-first", "bottom-field-first"]
    assert p["motion-threshold"].default == pytest.approx(0.1)
    assert p["motion-threshold"].minimum == 0.0
    assert p["motion-threshold"].maximum == 1.0


def test_overlay_schema():
    p = props_of("vfmetaloverlay")
    assert p["location"].default is None
    assert p["alpha"].default == 1.0
    assert p["relative-x"].default == -1.0
    assert p["relative-x"].minimum == -1.0
    assert p["relative-x"].maximum == 1.0
    assert p["width"].default == 0  # 0 = native image size


def test_compositor_schema():
    p = props_of("vfmetalcompositor")
    assert [n for n, _ in p["background"].enum_values] == [
        "checker", "black", "white", "transparent"]
    assert p["zero-size-is-unscaled"].default is True
    pad = {d.name: d for d in PAD_PROPERTIES}
    assert [n for n, _ in pad["operator"].enum_values] == [
        "source", "over", "add"]
    assert pad["operator"].default == 1  # over
    assert [n for n, _ in pad["sizing-policy"].enum_values] == [
        "none", "keep-aspect-ratio"]
    assert pad["alpha"].default == 1.0
    assert pad["width"].default == -1
    for controllable in ("xpos", "ypos", "alpha", "zorder"):
        assert pad[controllable].controllable


def test_videosink_schema():
    p = props_of("vfmetalvideosink")
    assert p["force-aspect-ratio"].default is True
    assert p["enable-navigation-events"].default is True


def test_videofilter_controllable_set():
    """The 10 color/effect props are CONTROLLABLE (m:435-503)."""
    p = props_of("vfmetalvideofilter")
    controllable = {n for n, d in p.items() if d.controllable}
    assert {"brightness", "contrast", "saturation", "hue", "gamma",
            "sharpness", "sepia", "invert", "noise", "vignette"} <= controllable


def test_all_elements_registered_with_aliases():
    for name in ("vfmetalconvertscale", "vfmetalvideofilter",
                 "vfmetalcompositor", "vfmetaltransform",
                 "vfmetaldeinterlace", "vfmetaloverlay", "vfmetalvideosink"):
        cls = lookup(name)
        assert cls.ELEMENT_NAME.startswith("vf")
        assert cls.DESCRIPTION


def test_stock_gst_names_resolve():
    # the reference positions its elements as drop-in replacements for
    # the stock CPU elements (README.md:3,20,98) — the stock names
    # resolve to the corresponding vf element
    assert lookup("videoconvert") is lookup("vfmetalconvertscale")
    assert lookup("videoscale") is lookup("vfmetalconvertscale")
    assert lookup("autovideosink") is lookup("vfmetalvideosink")
