"""Native extension tests: C++ repack paths vs numpy fallbacks."""

import numpy as np
import pytest

from tpuvf import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)

RNG = np.random.default_rng(53)


def test_interleaved_roundtrip():
    from tpuvf.native import lib

    src = RNG.integers(0, 256, (33, 47, 4), dtype=np.uint8)
    planar = lib.interleaved_to_planar(src, (2, 1, 0, 3))
    np.testing.assert_array_equal(planar[0], src[..., 2])
    np.testing.assert_array_equal(planar[3], src[..., 3])
    back = lib.planar_to_interleaved(planar, (2, 1, 0, 3))
    np.testing.assert_array_equal(back, src)


def test_deinterleave2_roundtrip():
    from tpuvf.native import lib

    uv = RNG.integers(0, 256, (12, 40), dtype=np.uint8)
    u, v = lib.deinterleave2(uv)
    np.testing.assert_array_equal(u, uv[:, 0::2])
    np.testing.assert_array_equal(v, uv[:, 1::2])
    np.testing.assert_array_equal(lib.interleave2(u, v), uv)


def test_interleave_grid_u32_matches_numpy():
    from tpuvf.native import lib

    grid = [RNG.integers(0, 2**32, (5, 7), dtype=np.uint32)
            for _ in range(64)]
    out = lib.interleave_grid_u32(grid, 8)
    want = np.empty((40, 56), np.uint32)
    for i, g in enumerate(grid):
        want[i // 8::8, i % 8::8] = g
    np.testing.assert_array_equal(out, want)


def test_interleave2_u32_matches_numpy():
    from tpuvf.native import lib

    a = RNG.integers(0, 2**32, (6, 9), dtype=np.uint32)
    b = RNG.integers(0, 2**32, (6, 9), dtype=np.uint32)
    out = lib.interleave2_u32(a, b)
    np.testing.assert_array_equal(out[:, 0::2], a)
    np.testing.assert_array_equal(out[:, 1::2], b)


@pytest.mark.parametrize("fmt", ["UYVY", "YUY2"])
def test_pack_422_roundtrip(fmt):
    from tpuvf.native import lib

    y = RNG.integers(0, 256, (10, 32), dtype=np.uint8)
    u = RNG.integers(0, 256, (10, 16), dtype=np.uint8)
    v = RNG.integers(0, 256, (10, 16), dtype=np.uint8)
    raw = lib.pack_422(y, u, v, fmt)
    y2, u2, v2 = lib.unpack_422(raw, fmt)
    np.testing.assert_array_equal(y2, y)
    np.testing.assert_array_equal(u2, u)
    np.testing.assert_array_equal(v2, v)
    # byte order spot check
    if fmt == "UYVY":
        assert raw[0, 0] == u[0, 0] and raw[0, 1] == y[0, 0]
    else:
        assert raw[0, 0] == y[0, 0] and raw[0, 1] == u[0, 0]


def test_host_roundtrip_uses_native():
    """host_to_planes/planes_to_host stay lossless through the C++ path."""
    from tpuvf.core import frame as frame_mod
    from tpuvf.core.frame import host_to_planes, planes_to_host
    from tpuvf.core.formats import VideoFormat
    from tpuvf.core.spec import FrameSpec

    assert frame_mod._get_native() is not None
    for fmt in ("BGRA", "NV12", "UYVY"):
        spec = FrameSpec(VideoFormat(fmt), 64, 48)
        from tests.util import random_host_frame

        host = random_host_frame(RNG, spec)
        back = planes_to_host(host_to_planes(host, spec), spec)
        if isinstance(host, dict):
            for k in host:
                np.testing.assert_array_equal(back[k], host[k])
        else:
            np.testing.assert_array_equal(back, host)


def test_png_unfilter_native_matches_python():
    """Encode/decode with all-filter-type synthetic data."""
    from tpuvf.io import png

    img = RNG.integers(0, 256, (20, 20, 4), dtype=np.uint8)
    data = png.encode(img)
    out = png.decode(data)
    np.testing.assert_array_equal(out, img)


class TestJpeg:
    """Baseline JPEG decoder vs PIL-generated fixtures."""

    @staticmethod
    def _roundtrip(img, **save_kw):
        import io
        from PIL import Image
        from tpuvf.native import jpeg as njpeg

        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="JPEG", **save_kw)
        data = buf.getvalue()
        got = njpeg.decode(data)
        want = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        return got, want

    def test_gradient_420(self):
        h, w = 64, 80
        img = np.zeros((h, w, 3), np.uint8)
        img[..., 0] = np.linspace(0, 255, w, dtype=np.uint8)[None, :]
        img[..., 1] = np.linspace(255, 0, h, dtype=np.uint8)[:, None]
        img[..., 2] = 128
        got, want = self._roundtrip(img, quality=95)
        assert got.shape == (h, w, 4)
        diff = np.abs(got[..., :3].astype(int) - want.astype(int))
        # nearest vs fancy chroma upsampling differ at edges; gradients are
        # smooth so the agreement must be tight
        assert diff.mean() < 2.0 and diff.max() <= 40

    def test_gray(self):
        img = np.tile(np.linspace(0, 255, 64, dtype=np.uint8), (32, 1))
        got, want = self._roundtrip(img, quality=90)
        diff = np.abs(got[..., 0].astype(int) - want[..., 0].astype(int))
        assert diff.mean() < 2.0

    def test_444_subsampling(self):
        rng2 = np.random.default_rng(3)
        img = rng2.integers(0, 255, (40, 40, 3), dtype=np.uint8)
        got, want = self._roundtrip(img, quality=92, subsampling=0)
        diff = np.abs(got[..., :3].astype(int) - want.astype(int))
        assert diff.mean() < 3.0

    def test_restart_markers(self):
        img = np.full((48, 48, 3), 90, np.uint8)
        img[10:30, 10:30] = (200, 50, 120)
        import io
        from PIL import Image
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="JPEG", quality=90, restart_marker_blocks=2)
        from tpuvf.native import jpeg as njpeg
        got = njpeg.decode(buf.getvalue())
        want = np.asarray(Image.open(buf).convert("RGB"))
        diff = np.abs(got[..., :3].astype(int) - want.astype(int))
        assert diff.mean() < 3.0

    def test_progressive_gradient_420(self):
        h, w = 64, 80
        img = np.zeros((h, w, 3), np.uint8)
        img[..., 0] = np.linspace(0, 255, w, dtype=np.uint8)[None, :]
        img[..., 1] = np.linspace(255, 0, h, dtype=np.uint8)[:, None]
        img[..., 2] = 128
        got, want = self._roundtrip(img, quality=95, progressive=True)
        diff = np.abs(got[..., :3].astype(int) - want.astype(int))
        assert diff.mean() < 2.0 and diff.max() <= 40

    def test_progressive_noise_444(self):
        rng2 = np.random.default_rng(3)
        img = rng2.integers(0, 255, (40, 40, 3), dtype=np.uint8)
        got, want = self._roundtrip(img, quality=92, subsampling=0,
                                    progressive=True)
        diff = np.abs(got[..., :3].astype(int) - want.astype(int))
        assert diff.mean() < 1.0

    def test_progressive_gray(self):
        img = np.tile(np.linspace(0, 255, 64, dtype=np.uint8), (32, 1))
        got, want = self._roundtrip(img, quality=90, progressive=True)
        diff = np.abs(got[..., 0].astype(int) - want[..., 0].astype(int))
        assert diff.mean() < 1.0

    def test_progressive_restart_markers(self):
        img = np.full((48, 48, 3), 90, np.uint8)
        img[10:30, 10:30] = (200, 50, 120)
        got, want = self._roundtrip(img, quality=90, progressive=True,
                                    restart_marker_blocks=2)
        diff = np.abs(got[..., :3].astype(int) - want.astype(int))
        assert diff.mean() < 3.0

    def test_progressive_odd_dims_444(self):
        rng2 = np.random.default_rng(7)
        img = rng2.integers(0, 255, (37, 23, 3), dtype=np.uint8)
        got, want = self._roundtrip(img, quality=95, subsampling=0,
                                    progressive=True)
        diff = np.abs(got[..., :3].astype(int) - want.astype(int))
        assert diff.mean() < 1.0

    def test_malformed_inputs_rejected_not_crash(self):
        """File-controlled table ids / truncated segments must error cleanly
        (round-1 advisory: OOB writes on DQT/DHT id > 3, reads past se)."""
        import io
        from PIL import Image
        from tpuvf.native import jpeg as njpeg

        img = np.full((16, 16, 3), 128, np.uint8)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="JPEG", quality=90)
        data = bytearray(buf.getvalue())

        # corrupt the DQT table id to 0x0F (would index qt[15] unchecked)
        dqt = bytes(data).find(b"\xff\xdb")
        assert dqt >= 0
        bad = bytearray(data)
        bad[dqt + 4] = 0x0F
        with pytest.raises(Exception):
            njpeg.decode(bytes(bad))

        # corrupt a DHT table id
        dht = bytes(data).find(b"\xff\xc4")
        assert dht >= 0
        bad = bytearray(data)
        bad[dht + 4] = 0x3F
        with pytest.raises(Exception):
            njpeg.decode(bytes(bad))

        # truncate mid-segment at every marker boundary
        for cut in (4, 6, dqt + 3, dht + 3, len(data) // 2):
            try:
                njpeg.decode(bytes(data[:cut]))
            except Exception:
                pass  # must raise or succeed, never crash

    def test_overlay_element_loads_jpeg(self, tmp_path):
        import io
        from PIL import Image
        from tpuvf.cli.launch import launch

        img = np.full((16, 16, 3), 180, np.uint8)
        p = str(tmp_path / "ov.jpg")
        Image.fromarray(img).save(p, format="JPEG", quality=95)
        assert launch(
            "videotestsrc num-buffers=1 ! video/x-raw,format=BGRA,width=64,height=48 "
            f"! vfmetaloverlay location={p} x=4 y=4 ! fakesink", quiet=True) == 1
