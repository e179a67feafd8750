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


import jax.numpy as jnp

# -- even/odd column-phase dataflow parity (round 2) --------------------------

class TestSplitDataflow:
    """The split (even/odd column-phase) fast path must be BIT-exact vs the
    generic interleaving path — same float ops in the same order."""

    @staticmethod
    def _planes(w, h, seed=5):
        rng = np.random.default_rng(seed)
        return {
            "y": jnp.asarray(rng.integers(0, 256, (h, w), np.uint8)),
            "u": jnp.asarray(rng.integers(0, 256, (h // 2, w // 2), np.uint8)),
            "v": jnp.asarray(rng.integers(0, 256, (h // 2, w // 2), np.uint8)),
        }

    @pytest.mark.parametrize("out_fmt", ["BGRA", "RGBA", "NV12", "I420",
                                         "UYVY", "YUY2"])
    def test_convertscale_split_matches_generic(self, out_fmt):
        from tpuvf.core.registry import make

        w, h = 64, 48
        in_spec = FrameSpec(VideoFormat.NV12, w, h)
        out_spec = FrameSpec(VideoFormat(out_fmt), w, h)
        planes = self._planes(w, h)

        elem = make("vfconvertscale")
        static = elem.static_config(in_spec, out_spec)
        split_proc = elem.make_process(in_spec, out_spec, static)
        split_out, _ = split_proc(planes, (), elem.traced_params())

        # generic path: force-disable the split by lying about parity
        from tpuvf.kernels import convert as kconvert
        from tpuvf.kernels.sample import WeightBuffers

        bufs = WeightBuffers("ref")
        sampler = kconvert.plan_rgba_sampler(
            in_spec, w, h, bufs, matrix_index=in_spec.matrix_index)
        chans = sampler.tuple(planes, dict(bufs.buffers))
        ref_out = kconvert.pack_rgba_t(
            chans, out_spec.format, out_spec.matrix_index)

        assert set(split_out) == set(ref_out)
        for k in ref_out:
            np.testing.assert_array_equal(
                np.asarray(split_out[k]), np.asarray(ref_out[k]),
                err_msg=f"{out_fmt} plane {k}")

    def test_convertscale_split_i420_input(self):
        from tpuvf.core.registry import make

        w, h = 32, 24
        in_spec = FrameSpec(VideoFormat.I420, w, h)
        out_spec = FrameSpec(VideoFormat.RGBA, w, h)
        planes = self._planes(w, h, seed=9)
        elem = make("vfconvertscale")
        proc = elem.make_process(
            in_spec, out_spec, elem.static_config(in_spec, out_spec))
        out, _ = proc(planes, (), elem.traced_params())

        from tpuvf.kernels import convert as kconvert
        from tpuvf.kernels.sample import WeightBuffers

        bufs = WeightBuffers("ref")
        sampler = kconvert.plan_rgba_sampler(
            in_spec, w, h, bufs, matrix_index=in_spec.matrix_index)
        ref = kconvert.pack_rgba_t(
            sampler.tuple(planes, dict(bufs.buffers)),
            out_spec.format, out_spec.matrix_index)
        np.testing.assert_array_equal(np.asarray(out["rgba"]),
                                      np.asarray(ref["rgba"]))

    def test_convertscale_nearest_split(self):
        from tpuvf.core.registry import make

        w, h = 32, 16
        in_spec = FrameSpec(VideoFormat.NV12, w, h)
        out_spec = FrameSpec(VideoFormat.RGBA, w, h)
        planes = self._planes(w, h, seed=3)
        elem = make("vfconvertscale", method=1)  # nearest
        proc = elem.make_process(
            in_spec, out_spec, elem.static_config(in_spec, out_spec))
        out, _ = proc(planes, (), elem.traced_params())

        from tpuvf.kernels import convert as kconvert
        from tpuvf.kernels.sample import NEAREST, WeightBuffers

        bufs = WeightBuffers("ref")
        sampler = kconvert.plan_rgba_sampler(
            in_spec, w, h, bufs, filter=NEAREST,
            matrix_index=in_spec.matrix_index)
        ref = kconvert.pack_rgba_t(
            sampler.tuple(planes, dict(bufs.buffers)),
            out_spec.format, out_spec.matrix_index)
        np.testing.assert_array_equal(np.asarray(out["rgba"]),
                                      np.asarray(ref["rgba"]))

    def test_videofilter_split_matches_generic(self):
        """All position-dependent effects + chroma key + LUT through the
        split path vs the generic path.  Grain is excluded (hash12 is
        FMA-chaotic across program shapes, see CLAUDE.md)."""
        from tpuvf.core.registry import make
        import tempfile, os

        w, h = 64, 48
        in_spec = FrameSpec(VideoFormat.NV12, w, h)
        planes = self._planes(w, h, seed=11)

        lut_path = os.path.join(tempfile.mkdtemp(), "t.cube")
        rng = np.random.default_rng(2)
        size = 9
        with open(lut_path, "w") as fh:
            fh.write(f"LUT_3D_SIZE {size}\n")
            for val in rng.random((size ** 3, 3)):
                fh.write(f"{val[0]:.6f} {val[1]:.6f} {val[2]:.6f}\n")

        props = dict(brightness=0.1, contrast=1.2, saturation=0.8,
                     vignette=0.5)

        def run(force_generic):
            elem = make("vfvideofilter")
            for k, v in props.items():
                elem.set_property(k, v)
            elem.set_property("chroma-key-enabled", True)
            elem.set_property("lut-file", lut_path)
            if force_generic:
                elem.set_property("sharpness", 1e-9)  # keeps output identical
                # (|sharpness| <= 0.001 -> blur phase still gated OFF, but
                # can_split requires use_sharpness False... use a direct hook)
            static = elem.static_config(in_spec, in_spec)
            proc = elem.make_process(in_spec, in_spec, static)
            state = elem.init_state(in_spec, in_spec)
            out, _ = proc(planes, state, elem.traced_params())
            return {k: np.asarray(v) for k, v in out.items()}

        split_out = run(False)

        # generic reference: build via kernels directly
        from tpuvf.kernels import convert as kconvert, filter as kfilter
        from tpuvf.kernels.sample import WeightBuffers

        elem = make("vfvideofilter")
        for k, v in props.items():
            elem.set_property(k, v)
        elem.set_property("chroma-key-enabled", True)
        elem.set_property("lut-file", lut_path)
        static = dict(elem.static_config(in_spec, in_spec))
        gates = dict(static["gates"])
        bufs = WeightBuffers("ref")
        sampler = kconvert.plan_rgba_sampler(
            in_spec, w, h, bufs, matrix_index=in_spec.matrix_index)
        params = elem.traced_params()
        params.update(bufs.buffers)
        chans = sampler.tuple(planes, params)
        chans = kfilter.apply_color_adjustments_t(
            chans, params, np.uint32(0), w, h, gates=gates)
        chans = kfilter.apply_lut_t(chans, params["lut"], size)
        ref_out = kconvert.pack_rgba_t(
            chans, in_spec.format, in_spec.matrix_index)

        for k in ref_out:
            np.testing.assert_array_equal(
                split_out[k], np.asarray(ref_out[k]), err_msg=f"plane {k}")


class TestSplitScaled:
    """Scaled column-phase sampler (round 3b): bitwise vs canonical —
    output phases are row-slices of the dense sampling matrices; presplit
    inputs contract one tap per input phase (two-term f32 sums are
    order-exact)."""

    def _canonical(self, spec, host, ow, oh, filt=LINEAR, **kw):
        import jax.numpy as jnp
        from tpuvf.kernels.sample import WeightBuffers

        bufs = WeightBuffers("t")
        run = convert.plan_rgba_sampler(spec, ow, oh, bufs, filter=filt, **kw)
        dev = device_planes(spec, host)
        params = {k: jnp.asarray(v) for k, v in bufs.buffers.items()}
        chans = run.tuple(dev, params)
        return tuple(np.asarray(quant(c)) for c in chans)

    def _split(self, spec, host, ow, oh, filt=LINEAR, presplit=False, **kw):
        import jax.numpy as jnp
        from tpuvf.core.frame import split_planes_host
        from tpuvf.kernels.sample import WeightBuffers

        bufs = WeightBuffers("t")
        run = convert.plan_rgba_sampler_split_scaled(
            spec, ow, oh, bufs, filter=filt, presplit=presplit, **kw)
        planes = host_to_planes(host, spec)
        if presplit:
            planes = split_planes_host(planes, spec)
        dev = {k: jnp.asarray(v) for k, v in planes.items()}
        params = {k: jnp.asarray(v) for k, v in bufs.buffers.items()}
        ch_e, ch_o = run(dev, params)
        out = []
        for e, o in zip(ch_e, ch_o):
            full = np.empty(e.shape[:-1] + (2 * e.shape[-1],), np.uint8)
            full[..., 0::2] = np.asarray(quant(e))
            full[..., 1::2] = np.asarray(quant(o))
            out.append(full)
        return tuple(out)

    @pytest.mark.parametrize("fmt", ["NV12", "I420", "BGRA", "UYVY", "YUY2"])
    @pytest.mark.parametrize("geom", [((768, 320), (384, 192)),
                                      ((64, 48), (130, 94)),
                                      ((130, 94), (64, 48)),
                                      ((64, 48), (128, 96)),
                                      ((64, 48), (64, 96))])
    @pytest.mark.parametrize("presplit", [False, True])
    def test_bitwise_vs_canonical(self, fmt, geom, presplit):
        (iw, ih), (ow, oh) = geom
        spec = FrameSpec(VideoFormat(fmt), iw, ih)
        host = random_host_frame(RNG, spec)
        want = self._canonical(spec, host, ow, oh)
        got = self._split(spec, host, ow, oh, presplit=presplit)
        # presplit decomposes the contraction K axis by input phase (the
        # canonical dot's FMA keeps w0*x UNROUNDED when adding w1*y, the
        # split sum rounds each product); non-presplit phases are
        # row-slices of the same dot, but the backend may GROUP the
        # K-reduction differently for the half-width output shape.
        # Both are <=1 ulp — knife-edge pixels may flip 1 LSB.
        tol = 1
        for c, (g, w) in enumerate(zip(got, want)):
            diff = np.abs(g.astype(np.int16) - w.astype(np.int16))
            assert diff.max() <= tol, (
                f"{fmt} {geom} presplit={presplit} chan {c}: "
                f"max diff {diff.max()} at {np.argwhere(diff == diff.max())[0]}")

    @pytest.mark.parametrize("fmt", ["NV12", "BGRA"])
    @pytest.mark.parametrize("filt", [LINEAR, NEAREST])
    def test_upsample2x_cols_exact(self, fmt, filt):
        """2x-upsample columns from an interleaved operand are the
        _upsample2x_linear stencil expressions verbatim — BITWISE equal
        to the canonical fast path for stencil-covered planes (all of
        RGB; NV12 luma).  NV12 CHROMA is a 4x column upsample (no 2x
        fast path — dense/blockband K contraction), so it carries the
        scaled-split <= 1 ulp contract, not the bitwise one."""
        spec = FrameSpec(VideoFormat(fmt), 64, 48)
        host = random_host_frame(RNG, spec)
        want = self._canonical(spec, host, 128, 96, filt=filt)
        got = self._split(spec, host, 128, 96, filt=filt, presplit=False)
        tol = 0 if fmt == "BGRA" else 1
        for c, (g, w) in enumerate(zip(got, want)):
            diff = np.abs(g.astype(np.int16) - w.astype(np.int16))
            assert diff.max() <= tol, f"{fmt} {filt} chan {c}: {diff.max()}"

    @pytest.mark.parametrize("filt", [LINEAR, NEAREST])
    def test_letterbox_border_bitwise(self, filt):
        from tpuvf.kernels.sample import letterbox_scales

        iw, ih, ow, oh = 64, 48, 96, 40
        sx, sy = letterbox_scales(iw, ih, ow, oh)
        border = (0.2, 0.4, 0.6, 1.0)
        spec = FrameSpec(VideoFormat.NV12, iw, ih)
        host = random_host_frame(RNG, spec)
        kw = dict(scale_x=sx, scale_y=sy, border=border, filt=filt)
        want = self._canonical(spec, host, ow, oh, filt=kw.pop("filt"),
                               scale_x=sx, scale_y=sy, border=border)
        got = self._split(spec, host, ow, oh, filt=filt,
                          scale_x=sx, scale_y=sy, border=border)
        for g, w in zip(got, want):
            diff = np.abs(g.astype(np.int16) - w.astype(np.int16))
            assert diff.max() <= 1, diff.max()  # K-grouping, see above


class TestDownsampleIntGate:
    """_downsample_int_ok gate semantics (round-4 advisor findings)."""

    def test_nearest_floor_boundary_sizes_fall_back(self, monkeypatch):
        """NEAREST closed form is refused where the dense f64 tap
        disagrees (2160->1080 shifts 22 taps; 22->11 one) and accepted
        where it agrees — sample_axis output must equal the dense
        matrix either way."""
        monkeypatch.setenv("TPUVF_DOWN2X", "both")
        for axis in (-2, -1):
            assert not convert._downsample_int_ok(2160, 1080, NEAREST, axis)
            assert not convert._downsample_int_ok(22, 11, NEAREST, axis)
            assert convert._downsample_int_ok(192, 96, NEAREST, axis)
        # end-to-end: the boundary size samples identically to dense
        img = np.asarray(
            RNG.random((22, 48), dtype=np.float32))
        got = np.asarray(convert.sample_axis(img, -2, 11, NEAREST))
        monkeypatch.setenv("TPUVF_DOWN2X", "off")
        want = np.asarray(convert.sample_axis(img, -2, 11, NEAREST))
        np.testing.assert_array_equal(got, want)

    def test_even_k_linear_unaffected(self, monkeypatch):
        """Even-k LINEAR stays on the closed form at boundary sizes (the
        f32 cast of the fractional weight absorbs the texcoord noise)."""
        monkeypatch.setenv("TPUVF_DOWN2X", "both")
        assert convert._downsample_int_ok(2160, 1080, LINEAR, -2)
        assert convert._downsample_int_ok(2160, 1080, LINEAR, -1)

    def test_unknown_mode_falls_back_to_rows(self, monkeypatch):
        """A typo'd TPUVF_DOWN2X must NOT silently enable the lane-axis
        form that is deliberately off by default."""
        monkeypatch.setenv("TPUVF_DOWN2X", "row")  # typo
        assert convert._downsample_int_ok(192, 96, LINEAR, -2)
        assert not convert._downsample_int_ok(192, 96, LINEAR, -1)
        monkeypatch.setenv("TPUVF_DOWN2X", "")
        assert convert._downsample_int_ok(192, 96, LINEAR, -2)
        assert not convert._downsample_int_ok(192, 96, LINEAR, -1)


# -- round 4: kx (k >= 3) integer-factor upsample closed form ---------------


def _ulp_diff(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return int(np.abs(a.view(np.int32).astype(np.int64)
                      - b.view(np.int32).astype(np.int64)).max())


def test_upsample_int_taps_gate():
    from tpuvf.kernels import convert

    # even k: phase-fixed everywhere (weights are exact multiples of
    # 1/(2k) only structurally; the gate checks constancy + edge fold)
    assert convert._upsample_int_taps(540, 4 * 540, "linear") is not None
    assert convert._upsample_int_taps(24, 4 * 24, "linear") is not None
    # odd k: f64 texcoord noise varies the fractional weight at many
    # sizes — measured at 540; small sizes stay closed
    assert convert._upsample_int_taps(540, 3 * 540, "linear") is None
    assert convert._upsample_int_taps(24, 3 * 24, "linear") is not None
    assert convert._upsample_int_taps(540, 5 * 540, "linear") is None
    # 2x keeps its dedicated path; nearest and non-integer are out
    assert convert._upsample_int_taps(64, 128, "linear") is None
    assert convert._upsample_int_taps(64, 192, "nearest") is None
    assert convert._upsample_int_taps(64, 100, "linear") is None


@pytest.mark.parametrize("k,n", [(3, 24), (4, 24), (4, 180), (4, 540),
                                 (6, 24), (8, 180)])
def test_upsample_int_within_1ulp_of_dense(k, n, monkeypatch):
    """The closed form sits <= 1 ulp from the dense matmul (the dense
    dot's FMA keeps the first product unrounded — repo K-decomposition
    rule); clamp-folded frame-edge rows are EXACT."""
    import jax
    import jax.numpy as jnp

    from tpuvf.kernels import convert, sample

    monkeypatch.setenv("TPUVF_UPKX", "both")  # cover the lane axis too

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 1, (n, 64)).astype(np.float32))
    t = sample.texcoords(k * n)
    w = jnp.asarray(sample.sample_matrix(t, n, "linear"))
    ref = jnp.einsum("oh,hw->ow", w, x,
                     precision=jax.lax.Precision.HIGHEST)
    got = convert.sample_axis(x, -2, k * n, "linear")
    assert _ulp_diff(ref, got) <= 1
    # frame-edge rows (clamp-folded single-tap) are the exact source row
    np.testing.assert_array_equal(np.asarray(got)[0], np.asarray(x)[0])
    np.testing.assert_array_equal(np.asarray(got)[-1], np.asarray(x)[-1])
    # columns axis
    ref_c = jnp.einsum("hw,ow->ho", x.T, w,
                       precision=jax.lax.Precision.HIGHEST)
    got_c = convert.sample_axis(x.T, -1, k * n, "linear")
    assert _ulp_diff(ref_c, got_c) <= 1


def test_upsample_int_pipeline_4x_vs_matrix(monkeypatch):
    """End-to-end 4x upscale chain: closed form within 1 LSB of the
    matrix path (knife-edge quantize flips only)."""
    from tpuvf.cli.launch import parse_pipeline

    desc = ("videotestsrc num-buffers=2 pattern=smpte "
            "! video/x-raw,format=NV12,width=96,height=48 "
            "! vfmetalconvertscale "
            "! video/x-raw,format=BGRA,width=384,height=192 ! appsink")

    def run():
        p = parse_pipeline(desc)
        p.negotiate()
        p.build()
        p.run()
        return [np.asarray(f) for f in p.sinks[0].frames]

    a = run()
    monkeypatch.setenv("TPUVF_UPKX", "off")
    b = run()
    for fa, fb in zip(a, b):
        d = np.abs(fa.astype(np.int32) - fb.astype(np.int32))
        assert d.max() <= 1, int(d.max())
        assert (d > 0).mean() < 0.02


# -- round 4: rational-factor (q-phase, stride-p) downscale closed form -----


def test_rational_rows_taps_gate():
    from tpuvf.kernels import convert

    # config-1 geometries: 1080->480 and 540->240 are 9:4
    p, q, taps = convert._rational_rows_taps(1080, 480, "linear")
    assert (p, q) == (9, 4) and len(taps) == 4
    p, q, taps = convert._rational_rows_taps(540, 240, "linear")
    assert (p, q) == (9, 4)
    # NEAREST rides the same machinery when the dense taps are arithmetic
    assert convert._rational_rows_taps(1080, 480, "nearest") is not None
    # ... and keeps the matrix where dense floor noise mixes taps
    # (2160->1080: the round-4 advisor geometry)
    assert convert._rational_rows_taps(2160, 1080, "nearest") is None
    # upscales, q > 8, and identity are out
    assert convert._rational_rows_taps(480, 1080, "linear") is None
    assert convert._rational_rows_taps(110, 99, "linear") is None
    assert convert._rational_rows_taps(64, 64, "linear") is None


@pytest.mark.parametrize("i,o,f", [
    (1080, 480, "linear"), (540, 240, "linear"), (720, 480, "linear"),
    (100, 40, "linear"), (96, 36, "linear"), (1080, 480, "nearest"),
])
def test_rational_rows_vs_dense(i, o, f):
    """The rational closed form sits <= 1 ulp from the dense
    HIGHEST-precision matmul (bitwise on CPU, where the dot is mul+add;
    the contract allows the TPU dot's FMA to differ in the last ulp)."""
    import jax
    import jax.numpy as jnp

    from tpuvf.kernels import convert, sample

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(0, 1, (i, 64)).astype(np.float32))
    w = jnp.asarray(sample.sample_matrix(sample.texcoords(o), i, f))
    ref = jnp.einsum("oh,hw->ow", w, x,
                     precision=jax.lax.Precision.HIGHEST)
    got = convert.sample_axis(x, -2, o, f)
    assert _ulp_diff(ref, got) <= 1
    # the planner path takes the same closed form
    bufs = sample.WeightBuffers()
    run = convert.plan_axis_sampler(i, o, -2, f, 1.0, bufs)
    got2 = run(x, dict(bufs.buffers))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(got2))


def test_rational_pipeline_vs_matrix(monkeypatch):
    """End-to-end 9:4 downscale chain: closed form within 1 LSB of the
    matrix path (knife-edge quantize flips only)."""
    from tpuvf.cli.launch import parse_pipeline

    desc = ("videotestsrc num-buffers=2 pattern=smpte "
            "! video/x-raw,format=NV12,width=128,height=108 "
            "! vfmetalconvertscale "
            "! video/x-raw,format=BGRA,width=64,height=48 ! appsink")

    def run():
        p = parse_pipeline(desc)
        p.negotiate()
        p.build()
        p.run()
        return [np.asarray(f) for f in p.sinks[0].frames]

    a = run()
    monkeypatch.setenv("TPUVF_RATPHASE", "off")
    b = run()
    for fa, fb in zip(a, b):
        d = np.abs(fa.astype(np.int32) - fb.astype(np.int32))
        assert d.max() <= 1, int(d.max())
        assert (d > 0).mean() < 0.02


def test_letterbox2x_rows_closed_form_bitwise(monkeypatch):
    """Letterboxed exactly-2x rows (round 4): the covered band rides the
    2x stencil + zero pad; BITWISE vs the dense matrix path, border
    bars identical."""
    from tpuvf.cli.launch import parse_pipeline
    from tpuvf.kernels import convert, sample

    # plan detection: 270 -> 600 rows with 540-row content at y0=30
    t = sample.texcoords(600, 540 / 600)
    m = sample.coverage_mask(600, 540 / 600)
    w = sample.sample_matrix(t, 270, "linear", m)
    assert convert._letterbox2x_rows_offset(w, m, 270) == 30

    desc = ("videotestsrc num-buffers=2 pattern=smpte "
            "! video/x-raw,format=NV12,width=96,height=48 "
            "! vfmetalconvertscale add-borders=true "
            "border-color=0xFF336699 "
            "! video/x-raw,format=BGRA,width=192,height=120 ! appsink")

    def run():
        p = parse_pipeline(desc)
        p.negotiate()
        p.build()
        p.run()
        return [np.asarray(f) for f in p.sinks[0].frames]

    a = run()
    monkeypatch.setenv("TPUVF_NO_LB2X", "1")
    b = run()
    for fa, fb in zip(a, b):
        np.testing.assert_array_equal(fa, fb)
    # bars are the border color (ARGB 0xFF336699 in BGRA byte order)
    assert a[0][0, 0].tolist() == [0x99, 0x66, 0x33, 0xFF]
