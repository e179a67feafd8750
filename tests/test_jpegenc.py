"""jpegenc + multifilesink: encode quality, cross-decoder parity, sinks."""

from __future__ import annotations

import glob

import numpy as np
import pytest

from tpuvf.cli.launch import parse_pipeline
from tpuvf.native import jpeg as njpeg


def _run(desc):
    p = parse_pipeline(desc)
    p.negotiate()
    p.build()
    p.run()
    return p


def _gradient(h, w):
    img = np.zeros((h, w, 4), np.uint8)
    img[..., 0] = np.linspace(0, 255, w)[None, :].astype(np.uint8)
    img[..., 1] = np.linspace(0, 255, h)[:, None].astype(np.uint8)
    img[..., 2] = 96
    img[..., 3] = 255
    return img


class TestEncoder:
    @pytest.mark.parametrize("dims", [(64, 48), (123, 97), (16, 16),
                                      (17, 9)])
    def test_roundtrip_own_decoder(self, dims):
        """Round trip through OUR decoder: its simple chroma upsample
        adds error on steep small-image gradients (measured: PIL decodes
        the same bytes ~3x closer), so the mean bound is loose here —
        the tight encoder-quality assertion is the PIL cross-check."""
        w, h = dims
        img = _gradient(h, w)
        data = njpeg.encode(img, 92)
        assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
        back = njpeg.decode(data)
        assert back.shape == (h, w, 4)
        err = np.abs(back[..., :3].astype(np.int16)
                     - img[..., :3].astype(np.int16))
        assert err.max() <= 24 and err.mean() < 8.0, (err.max(), err.mean())

    @pytest.mark.parametrize("dims", [(100, 80), (16, 16), (17, 9)])
    def test_cross_decoder_pil(self, dims):
        """PIL decoding OUR bytes matches PIL's own same-settings round
        trip (measured within ~0.1 mean) — the encoder itself is at
        reference quality."""
        PIL = pytest.importorskip("PIL.Image")
        import io

        w, h = dims
        img = _gradient(h, w)
        data = njpeg.encode(img, 92)
        pil = np.asarray(PIL.open(io.BytesIO(data)).convert("RGB"))
        err = np.abs(pil.astype(np.int16) - img[..., :3].astype(np.int16))

        buf = io.BytesIO()
        PIL.fromarray(img[..., :3]).save(buf, "JPEG", quality=92,
                                         subsampling=2)
        ref = np.asarray(PIL.open(buf).convert("RGB"))
        ref_err = np.abs(ref.astype(np.int16)
                         - img[..., :3].astype(np.int16))
        assert err.mean() <= ref_err.mean() + 0.5, (
            err.mean(), ref_err.mean())
        assert err.max() <= ref_err.max() + 4, (err.max(), ref_err.max())

    def test_quality_orders_size(self):
        rng = np.random.default_rng(1)
        img = rng.integers(0, 256, (64, 64, 4)).astype(np.uint8)
        img[..., 3] = 255
        sizes = [len(njpeg.encode(img, q)) for q in (20, 60, 95)]
        assert sizes[0] < sizes[1] < sizes[2], sizes

    def test_bad_input(self):
        with pytest.raises(njpeg.JpegError):
            njpeg.encode(np.zeros((4, 4, 3), np.uint8))


class TestPipeline:
    def test_jpegenc_multifilesink(self, tmp_path):
        pat = str(tmp_path / "f%03d.jpg")
        p = _run("videotestsrc num-buffers=3 pattern=smpte "
                 "! video/x-raw,format=BGRA,width=64,height=48 "
                 f"! jpegenc quality=92 ! multifilesink location={pat}")
        files = sorted(glob.glob(str(tmp_path / "f*.jpg")))
        assert len(files) == 3
        # decode one back and compare to the direct frame (BGRA byte order)
        direct = _run(
            "videotestsrc num-buffers=1 pattern=smpte "
            "! video/x-raw,format=BGRA,width=64,height=48 ! appsink")
        want = np.asarray(direct.sinks[0].frames[0])[..., [2, 1, 0]]
        got = njpeg.decode(open(files[0], "rb").read())[..., :3]
        err = np.abs(got.astype(np.int16) - want.astype(np.int16))
        # smpte bars are flat fields; bar edges ring at block boundaries
        # and our decoder's chroma upsample spreads them (see above)
        assert err.mean() < 8.0, err.mean()
        assert np.median(err) <= 2.0, np.median(err)
        assert p.sinks[0].paths == files

    def test_jpegenc_rejects_yuv(self):
        with pytest.raises(ValueError, match="RGB formats only"):
            p = parse_pipeline(
                "videotestsrc num-buffers=1 "
                "! video/x-raw,format=NV12,width=64,height=48 "
                "! jpegenc ! fakesink")
            p.negotiate()

    def test_multifilesink_pattern_validation(self, tmp_path):
        for loc in (str(tmp_path / "fixed.jpg"), None):
            p = parse_pipeline(
                "videotestsrc num-buffers=1 "
                "! video/x-raw,format=BGRA,width=16,height=16 "
                + (f"! multifilesink location={loc}" if loc
                   else "! multifilesink"))
            with pytest.raises(ValueError):
                p.negotiate()

    def test_multifilesink_raw_frames(self, tmp_path):
        pat = str(tmp_path / "r%02d.raw")
        _run("videotestsrc num-buffers=2 "
             "! video/x-raw,format=I420,width=32,height=16 "
             f"! multifilesink location={pat}")
        files = sorted(glob.glob(str(tmp_path / "r*.raw")))
        assert len(files) == 2
        assert all(len(open(f, "rb").read()) == 32 * 16 * 3 // 2
                   for f in files)
