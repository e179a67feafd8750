"""YUV4MPEG2 source/encoder: header semantics, round-trips, error paths."""

from __future__ import annotations

import numpy as np
import pytest

from tpuvf.cli.launch import parse_pipeline
from tpuvf.io import y4m


def _run(desc):
    p = parse_pipeline(desc)
    p.negotiate()
    p.build()
    p.run()
    return p


class TestIO:
    def test_header_roundtrip(self):
        hdr = y4m.parse_header(
            b"YUV4MPEG2 W320 H240 F30000:1001 It A4:3 C420mpeg2\n")
        assert (hdr["width"], hdr["height"]) == (320, 240)
        assert hdr["fps"] == (30000, 1001)
        assert hdr["par"] == (4, 3)
        assert hdr["interlacing"] == "t"
        assert hdr["colorspace"] == "420mpeg2"

    def test_header_defaults_and_unknown_aspect(self):
        hdr = y4m.parse_header(b"YUV4MPEG2 W64 H48 A0:0\n")
        assert hdr["fps"] == (30, 1)
        assert hdr["par"] == (1, 1)
        assert hdr["interlacing"] == "p"

    def test_header_rejects(self):
        with pytest.raises(y4m.Y4MError):
            y4m.parse_header(b"JUNK W64 H48\n")
        with pytest.raises(y4m.Y4MError):
            y4m.parse_header(b"YUV4MPEG2 W64\n")  # missing H
        with pytest.raises(y4m.Y4MError):
            y4m.frame_bytes({"width": 64, "height": 48,
                             "colorspace": "444"})
        with pytest.raises(y4m.Y4MError):
            y4m.frame_bytes({"width": 63, "height": 48,
                             "colorspace": "420"})

    def test_c422_reads_as_uyvy(self, tmp_path):
        w, h = 8, 4
        rng = np.random.default_rng(5)
        y = rng.integers(0, 256, (h, w), np.uint8)
        u = rng.integers(0, 256, (h, w // 2), np.uint8)
        v = rng.integers(0, 256, (h, w // 2), np.uint8)
        path = tmp_path / "t.y4m"
        with open(path, "wb") as fh:
            fh.write(f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C422\n".encode())
            for _ in range(2):
                fh.write(b"FRAME\n" + y.tobytes() + u.tobytes()
                         + v.tobytes())
        r = y4m.Reader(str(path))
        assert r.num_frames() == 2
        f = r.read_frame(1)
        assert f.shape == (h, 2 * w)
        assert (f[:, 1::4] == y[:, 0::2]).all()
        assert (f[:, 3::4] == y[:, 1::2]).all()
        assert (f[:, 0::4] == u).all() and (f[:, 2::4] == v).all()

    def test_mono_flat_chroma(self, tmp_path):
        w, h = 6, 4
        y = np.arange(w * h, dtype=np.uint8).reshape(h, w)
        path = tmp_path / "m.y4m"
        with open(path, "wb") as fh:
            fh.write(f"YUV4MPEG2 W{w} H{h} Cmono\n".encode())
            fh.write(b"FRAME\n" + y.tobytes())
        f = y4m.Reader(str(path)).read_frame(0)
        assert (f["y"] == y).all()
        assert (f["u"] == 128).all() and (f["v"] == 128).all()


class TestPipeline:
    def test_enc_src_roundtrip(self, tmp_path):
        """testsrc -> y4menc -> filesink, read back with y4msrc: frames
        bit-equal to the direct appsink capture, header carries the
        negotiated fps."""
        path = tmp_path / "out.y4m"
        _run("videotestsrc num-buffers=3 pattern=smpte "
             "! video/x-raw,format=I420,width=64,height=48,"
             "framerate=25/1 "
             f"! y4menc ! filesink location={path}")

        hdr = y4m.parse_header(open(path, "rb").readline())
        assert (hdr["width"], hdr["height"]) == (64, 48)
        assert hdr["fps"] == (25, 1)
        assert hdr["colorspace"] == "420mpeg2"

        direct = _run(
            "videotestsrc num-buffers=3 pattern=smpte "
            "! video/x-raw,format=I420,width=64,height=48 ! appsink")
        back = _run(f"y4msrc location={path} ! appsink")
        a, b = direct.sinks[0].frames, back.sinks[0].frames
        assert len(a) == len(b) == 3
        for fa, fb in zip(a, b):
            for k in ("y", "u", "v"):
                assert (np.asarray(fa[k]) == np.asarray(fb[k])).all()

    def test_y4mdec_alias_and_processing(self, tmp_path):
        """y4mdec alias resolves; a y4m stream feeds a processing chain."""
        path = tmp_path / "s.y4m"
        _run("videotestsrc num-buffers=2 pattern=ball "
             "! video/x-raw,format=I420,width=64,height=48 "
             f"! y4menc ! filesink location={path}")
        p = _run(f"y4mdec location={path} ! vfmetalvideofilter "
                 "brightness=0.2 ! vfmetalconvertscale "
                 "! video/x-raw,format=BGRA,width=64,height=48 ! appsink")
        assert len(p.sinks[0].frames) == 2
        assert p.sinks[0].frames[0].shape == (48, 64, 4)

    def test_interlaced_header_feeds_deinterlace(self, tmp_path):
        """An It stream negotiates interlaced=True/tff and deinterlaces
        without explicit caps."""
        path = tmp_path / "i.y4m"
        w, h = 32, 16
        rng = np.random.default_rng(9)
        with open(path, "wb") as fh:
            fh.write(f"YUV4MPEG2 W{w} H{h} F30:1 It C420\n".encode())
            for _ in range(3):
                fh.write(b"FRAME\n" + rng.integers(
                    0, 256, w * h + (w // 2) * (h // 2) * 2,
                    dtype=np.uint8).astype(np.uint8).tobytes())
        p = _run(f"y4msrc location={path} "
                 "! vfmetaldeinterlace method=greedyh ! appsink")
        assert len(p.sinks[0].frames) == 3
        assert p.sinks[0].spec.interlaced is False  # progressive out

    def test_enc_rejects_non_i420_and_odd(self, tmp_path):
        with pytest.raises(ValueError, match="I420 only"):
            p = parse_pipeline(
                "videotestsrc num-buffers=1 "
                "! video/x-raw,format=BGRA,width=64,height=48 "
                f"! y4menc ! filesink location={tmp_path / 'x.y4m'}")
            p.negotiate()
        with pytest.raises((ValueError, Exception)):
            p = parse_pipeline(
                "videotestsrc num-buffers=1 "
                "! video/x-raw,format=I420,width=63,height=48 "
                f"! y4menc ! filesink location={tmp_path / 'x.y4m'}")
            p.negotiate()

    def test_src_missing_file(self):
        with pytest.raises(ValueError, match="no such file"):
            p = parse_pipeline("y4msrc location=/tmp/definitely-not-here.y4m "
                               "! fakesink")
            p.negotiate()

    def test_caps_contradicting_header_rejected(self, tmp_path):
        """Caps that contradict the stream header fail at negotiate (the
        not-negotiated analog) instead of delivering header-shaped frames
        under a lying spec."""
        path = tmp_path / "c.y4m"
        _run("videotestsrc num-buffers=1 "
             "! video/x-raw,format=I420,width=64,height=48 "
             f"! y4menc ! filesink location={path}")
        with pytest.raises(ValueError, match="contradicts the stream"):
            p = parse_pipeline(
                f"y4msrc location={path} "
                "! video/x-raw,format=I420,width=32,height=32 ! fakesink")
            p.negotiate()
        # consistent caps still negotiate
        p = _run(f"y4msrc location={path} "
                 "! video/x-raw,format=I420,width=64,height=48 ! appsink")
        assert len(p.sinks[0].frames) == 1

    def test_truncated_final_frame_dropped(self, tmp_path):
        """A cut-off last frame (interrupted writer) is excluded from
        num_frames instead of crashing mid-run."""
        path = tmp_path / "t.y4m"
        _run("videotestsrc num-buffers=3 "
             "! video/x-raw,format=I420,width=32,height=16 "
             f"! y4menc ! filesink location={path}")
        data = open(path, "rb").read()
        open(path, "wb").write(data[:-100])  # cut into the last frame
        p = _run(f"y4msrc location={path} ! appsink")
        assert len(p.sinks[0].frames) == 2

    def test_rewritten_file_not_stale(self, tmp_path):
        """Rewriting the file at the same path between pipelines re-reads
        the header (the reader cache keys on mtime+size)."""
        import os

        path = tmp_path / "r.y4m"
        from tpuvf.core.registry import make

        src = make("y4msrc")
        src.set_property("location", str(path))

        def write(w, h, n):
            _run(f"videotestsrc num-buffers={n} "
                 f"! video/x-raw,format=I420,width={w},height={h} "
                 f"! y4menc ! filesink location={path}")

        write(32, 16, 1)
        spec1 = src.output_spec(None)
        assert (spec1.width, spec1.height) == (32, 16)
        write(64, 48, 2)
        os.utime(path, ns=(1, 1))  # force a distinct mtime either way
        spec2 = src.output_spec(None)
        assert (spec2.width, spec2.height) == (64, 48)
        assert src.num_frames() == 2
