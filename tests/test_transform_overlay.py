"""vftransform and vfoverlay tests: golden parity + ported smoke cases."""

import numpy as np
import pytest

from tests.oracle import element_ref, metal_ref
from tests.util import assert_planes_close, random_host_frame

from tpuvf.cli.launch import launch
from tpuvf.core.frame import host_to_planes
from tpuvf.core.formats import VideoFormat
from tpuvf.core.registry import make
from tpuvf.core.spec import FrameSpec
from tpuvf.io import png

RNG = np.random.default_rng(11)


def run_element(name, fmt, w, h, props, host=None, pre_set=None):
    import jax.numpy as jnp

    spec = FrameSpec(VideoFormat(fmt), w, h)
    host = random_host_frame(RNG, spec) if host is None else host
    planes = host_to_planes(host, spec)
    elem = make(name)
    for k, v in (props or {}).items():
        elem.set_property(k, v)
    static = elem.static_config(spec, spec)
    proc = elem.make_process(spec, spec, static)
    state = elem.init_state(spec, spec)
    dev = {k: jnp.asarray(v) for k, v in planes.items()}
    out, _ = proc(dev, state, elem.traced_params())
    return {k: np.asarray(v) for k, v in out.items()}, planes


# -- transform --------------------------------------------------------------

@pytest.mark.parametrize("fmt", ["RGBA", "NV12"])
@pytest.mark.parametrize("method", list(range(8)))
def test_transform_methods_golden(fmt, method):
    w, h = 48, 32
    got, planes = run_element("vftransform", fmt, w, h, {"method": method})
    spec = FrameSpec(VideoFormat(fmt), w, h)
    rgba_q = element_ref.transform(planes, fmt, spec.matrix_index, w, h, method)
    want = metal_ref.pack_rgba(rgba_q, fmt, spec.matrix_index)
    assert_planes_close(got, want, tol=2, context=f"transform m{method} {fmt}")


@pytest.mark.parametrize("crops", [(4, 0, 0, 0), (4, 6, 2, 8)])
@pytest.mark.parametrize("method", [0, 1, 2])
def test_transform_crop_golden(crops, method):
    w, h = 48, 32
    cl, cr, ct, cb = crops
    got, planes = run_element(
        "vftransform", "RGBA", w, h,
        {"method": method, "crop-left": cl, "crop-right": cr,
         "crop-top": ct, "crop-bottom": cb},
    )
    spec = FrameSpec(VideoFormat.RGBA, w, h)
    rgba_q = element_ref.transform(
        planes, "RGBA", spec.matrix_index, w, h, method, cl, cr, ct, cb)
    want = metal_ref.pack_rgba(rgba_q, "RGBA", spec.matrix_index)
    assert_planes_close(got, want, tol=2,
                        context=f"transform crop{crops} m{method}")


def test_transform_passthrough_and_smoke():
    assert launch(
        "videotestsrc num-buffers=2 ! video/x-raw,format=BGRA,width=64,height=48 "
        "! vfmetaltransform ! fakesink", quiet=True) == 2
    for m in ("clockwise", "rotate-180", "upper-left-diagonal"):
        assert launch(
            "videotestsrc num-buffers=1 ! video/x-raw,format=I420,width=64,height=48 "
            f"! vfmetaltransform method={m} crop-left=4 ! fakesink",
            quiet=True) == 1


def test_transform_rotation_content():
    """90R: output(r,c) should equal input sampled rotated — spot-check a
    solid asymmetric pattern."""
    w, h = 32, 32
    host = np.zeros((h, w, 4), np.uint8)
    host[..., 3] = 255
    host[:, :16, 0] = 255  # left half red
    got, _ = run_element("vftransform", "RGBA", w, h, {"method": 1}, host=host)
    out = got["rgba"]
    # after 90° clockwise the red (left) half becomes the top half
    assert out[0].mean(axis=1)[:12].mean() > 200  # top rows red
    assert out[0].mean(axis=1)[-12:].mean() < 50  # bottom rows not


# -- overlay ----------------------------------------------------------------

def _make_png(tmp_path, w=16, h=12, alpha=255):
    img = np.zeros((h, w, 4), np.uint8)
    img[..., 0] = np.linspace(0, 255, w, dtype=np.uint8)[None, :]
    img[..., 1] = 128
    img[..., 2] = np.linspace(255, 0, h, dtype=np.uint8)[:, None]
    img[..., 3] = alpha
    path = str(tmp_path / "ov.png")
    png.write(path, img)
    return path, img


@pytest.mark.parametrize("fmt", ["RGBA", "NV12"])
def test_overlay_golden(fmt, tmp_path):
    w, h = 48, 32
    path, img = _make_png(tmp_path, alpha=200)
    got, planes = run_element(
        "vfoverlay", fmt, w, h,
        {"location": path, "x": 8, "y": 4, "alpha": 0.7},
    )
    spec = FrameSpec(VideoFormat(fmt), w, h)
    video = metal_ref.sample_rgba(planes, fmt, spec.matrix_index, w, h)
    premult = png.decode_premultiplied(open(path, "rb").read())
    out_f = element_ref.overlay(video, premult, 8, 4, 16, 12, 0.7)
    want = metal_ref.pack_rgba(
        metal_ref.quant(out_f).transpose(2, 0, 1), fmt, spec.matrix_index)
    assert_planes_close(got, want, tol=2, context=f"overlay {fmt}")


def test_overlay_scaled_and_relative(tmp_path):
    w, h = 64, 48
    path, _ = _make_png(tmp_path)
    got, planes = run_element(
        "vfoverlay", "RGBA", w, h,
        {"location": path, "relative-x": 0.5, "relative-y": 0.25,
         "width": 20, "height": 10},
    )
    spec = FrameSpec(VideoFormat.RGBA, w, h)
    video = metal_ref.sample_rgba(planes, "RGBA", spec.matrix_index, w, h)
    premult = png.decode_premultiplied(open(path, "rb").read())
    out_f = element_ref.overlay(video, premult, 32.0, 12.0, 20, 10, 1.0)
    want = metal_ref.pack_rgba(
        metal_ref.quant(out_f).transpose(2, 0, 1), "RGBA", spec.matrix_index)
    assert_planes_close(got, want, tol=2, context="overlay relative")


def test_overlay_alpha_zero_is_identity(tmp_path):
    w, h = 32, 24
    path, _ = _make_png(tmp_path)
    spec = FrameSpec(VideoFormat.RGBA, w, h)
    host = random_host_frame(RNG, spec)
    got, planes = run_element(
        "vfoverlay", "RGBA", w, h, {"location": path, "alpha": 0.0}, host=host)
    # alpha 0: mix(v, o, 0) = v, but still quantize roundtrip => exact
    np.testing.assert_array_equal(got["rgba"], planes["rgba"])


def test_overlay_missing_file_passthrough():
    assert launch(
        "videotestsrc num-buffers=2 ! video/x-raw,format=BGRA,width=64,height=48 "
        "! vfmetaloverlay location=/nonexistent/file.png ! fakesink",
        quiet=True) == 2


def test_overlay_pipeline_with_pngenc_fixture(tmp_path):
    """The reference generates its overlay PNG with a gst pipeline
    (test-overlay.sh:27-31); exercise the same flow via our png io."""
    img = np.full((8, 8, 4), 200, np.uint8)
    p = str(tmp_path / "fixture.png")
    png.write(p, img)
    assert launch(
        "videotestsrc num-buffers=1 ! video/x-raw,format=NV12,width=64,height=48 "
        f"! vfmetaloverlay location={p} x=10 y=10 alpha=0.5 ! fakesink",
        quiet=True) == 1


@pytest.mark.parametrize("method", [1, 3, 6, 7])
def test_transform_square_fast_path_golden(method):
    """Square frames take the pure-layout rotation path — must still match
    the sampled-texcoord oracle exactly."""
    n = 32
    got, planes = run_element("vftransform", "NV12", n, n, {"method": method})
    spec = FrameSpec(VideoFormat.NV12, n, n)
    rgba_q = element_ref.transform(planes, "NV12", spec.matrix_index, n, n, method)
    want = metal_ref.pack_rgba(rgba_q, "NV12", spec.matrix_index)
    assert_planes_close(got, want, tol=2, context=f"square fast m{method}")


def test_transform_blockband_ab_parity(monkeypatch):
    """Blockband plans (sample.blockband_plan) vs dense matmuls at a size
    big enough for real plans (>=3 column tiles): <=1 LSB — dropped terms
    are exact zeros, only MXU K-tile accumulation boundaries shift."""
    from tpuvf.kernels import sample as ksample

    w, h = 384, 160
    props = {"method": 1, "crop-left": 17, "crop-top": 9}
    host = random_host_frame(RNG, FrameSpec(VideoFormat.RGBA, w, h))
    # the plan must actually exist at this geometry or the test is vacuous
    src = np.linspace(0.9, 0.05, w)
    assert ksample.blockband_plan(
        ksample.sample_matrix(src, w, ksample.LINEAR)) is not None
    banded, _ = run_element("vftransform", "RGBA", w, h, props, host=host)
    monkeypatch.setenv("TPUVF_NO_BLOCKBAND", "1")
    dense, _ = run_element("vftransform", "RGBA", w, h, props, host=host)
    assert_planes_close(banded, dense, tol=1, context="blockband A/B")
