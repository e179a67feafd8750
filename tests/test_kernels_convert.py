"""Golden tests: sampling/conversion kernels vs the Metal-semantics oracle."""

import numpy as np
import pytest

from tests.oracle import metal_ref as oracle
from tests.util import assert_planes_close, assert_rgba_close, random_host_frame

from tpuvf.core.formats import VideoFormat
from tpuvf.core.frame import host_to_planes, planes_to_host
from tpuvf.core.spec import FrameSpec
from tpuvf.kernels import convert
from tpuvf.kernels.color import quant
from tpuvf.kernels.sample import LINEAR, NEAREST, letterbox_scales

RNG = np.random.default_rng(42)

ALL = ["BGRA", "RGBA", "NV12", "I420", "UYVY", "YUY2"]


def device_planes(spec, host):
    import jax

    return {k: jax.numpy.asarray(v) for k, v in host_to_planes(host, spec).items()}


@pytest.mark.parametrize("fmt", ALL)
def test_host_roundtrip(fmt):
    """host layout -> canonical planes -> host layout is lossless."""
    spec = FrameSpec(VideoFormat(fmt), 64, 48)
    host = random_host_frame(RNG, spec)
    planes = host_to_planes(host, spec)
    back = planes_to_host(planes, spec)
    if isinstance(host, dict):
        for k in host:
            np.testing.assert_array_equal(back[k], host[k])
    else:
        np.testing.assert_array_equal(back, host)


@pytest.mark.parametrize("fmt", ALL)
@pytest.mark.parametrize("size", [(64, 48), (37, 23) , (130, 94)])
def test_sample_rgba_identity(fmt, size):
    """Same-size sampling matches the oracle fragment stage."""
    w, h = size
    if fmt in ("UYVY", "YUY2") and w % 2:
        w += 1
    spec = FrameSpec(VideoFormat(fmt), w, h)
    host = random_host_frame(RNG, spec)
    planes = host_to_planes(host, spec)

    got = convert.sample_rgba(device_planes(spec, host), spec, w, h)
    want = oracle.sample_rgba(planes, fmt, spec.matrix_index, w, h)
    got_hw4 = np.moveaxis(np.asarray(got), 0, -1)
    assert_rgba_close(got_hw4, want, context=f"{fmt}@{w}x{h}")


@pytest.mark.parametrize("fmt", ["BGRA", "NV12", "I420", "UYVY"])
@pytest.mark.parametrize("filt", [LINEAR, NEAREST])
@pytest.mark.parametrize("scale", [((64, 48), (32, 24)), ((32, 24), (80, 50)), ((64, 48), (41, 31))])
def test_sample_rgba_scaled(fmt, filt, scale):
    (iw, ih), (ow, oh) = scale
    spec = FrameSpec(VideoFormat(fmt), iw, ih)
    host = random_host_frame(RNG, spec)
    planes = host_to_planes(host, spec)

    got = convert.sample_rgba(device_planes(spec, host), spec, ow, oh, filter=filt)
    ofilt = "nearest" if (filt == NEAREST or fmt in ("UYVY", "YUY2")) else "linear"
    want = oracle.sample_rgba(planes, fmt, spec.matrix_index, ow, oh, filt=ofilt)
    got_hw4 = np.moveaxis(np.asarray(got), 0, -1)
    assert_rgba_close(got_hw4, want, context=f"{fmt} {iw}x{ih}->{ow}x{oh} {filt}")


def test_sample_rgba_letterbox_border():
    """Aspect-mismatched scale with borders: border color fills the bars."""
    spec = FrameSpec(VideoFormat.RGBA, 64, 48)
    host = random_host_frame(RNG, spec)
    planes = host_to_planes(host, spec)
    ow, oh = 100, 30
    sx, sy = letterbox_scales(64, 48, ow, oh)
    border = (0.0, 0.0, 1.0, 1.0)

    got = convert.sample_rgba(
        device_planes(spec, host), spec, ow, oh,
        scale_x=sx, scale_y=sy, border=border,
    )
    want = oracle.sample_rgba(
        planes, "RGBA", spec.matrix_index, ow, oh,
        scale_x=sx, scale_y=sy, border=border,
    )
    got_hw4 = np.moveaxis(np.asarray(got), 0, -1)
    assert_rgba_close(got_hw4, want, context="letterbox")
    # bars really are the border color (pillarbox: source wider? 64/48=1.33 vs
    # 100/30=3.33 -> source taller -> bars left/right)
    assert np.allclose(got_hw4[0, 0], border)


@pytest.mark.parametrize("fmt", ALL)
@pytest.mark.parametrize("size", [(64, 48), (37, 23)])
def test_pack_rgba(fmt, size):
    w, h = size
    if fmt in ("UYVY", "YUY2") and w % 2:
        w += 1
    import jax.numpy as jnp

    rgba_q = RNG.integers(0, 256, (4, h, w), dtype=np.uint8)
    matrix = 1
    got = convert.pack_rgba(jnp.asarray(rgba_q), VideoFormat(fmt), matrix)
    want = oracle.pack_rgba(rgba_q, fmt, matrix)
    assert_planes_close({k: np.asarray(v) for k, v in got.items()}, want,
                        context=f"pack {fmt} {w}x{h}")


def test_quant_dequant_roundtrip():
    import jax.numpy as jnp

    x = jnp.asarray(RNG.integers(0, 256, (8, 128), dtype=np.uint8))
    from tpuvf.kernels.color import dequant

    np.testing.assert_array_equal(np.asarray(quant(dequant(x))), np.asarray(x))
