"""Shared test helpers: random host-layout frames, plane comparison."""

from __future__ import annotations

import numpy as np

from tpuvf.core.formats import VideoFormat, chroma_dims_420
from tpuvf.core.spec import FrameSpec


def random_host_frame(rng: np.random.Generator, spec: FrameSpec):
    """Random frame in the native host byte layout for spec.format."""
    w, h = spec.width, spec.height
    fmt = spec.format
    if fmt in (VideoFormat.BGRA, VideoFormat.RGBA):
        return rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
    if fmt == VideoFormat.NV12:
        cw, ch = chroma_dims_420(w, h)
        return {
            "y": rng.integers(0, 256, (h, w), dtype=np.uint8),
            "uv": rng.integers(0, 256, (ch, 2 * cw), dtype=np.uint8),
        }
    if fmt == VideoFormat.I420:
        cw, ch = chroma_dims_420(w, h)
        return {
            "y": rng.integers(0, 256, (h, w), dtype=np.uint8),
            "u": rng.integers(0, 256, (ch, cw), dtype=np.uint8),
            "v": rng.integers(0, 256, (ch, cw), dtype=np.uint8),
        }
    if fmt in (VideoFormat.UYVY, VideoFormat.YUY2):
        return rng.integers(0, 256, (h, 2 * w), dtype=np.uint8)
    raise ValueError(fmt)


def assert_planes_close(got: dict, want: dict, tol: int = 2, context: str = ""):
    """Per-pixel uint8 comparison within `tol` LSB."""
    assert set(got) == set(want), f"{context}: plane sets differ {set(got)} vs {set(want)}"
    for name in sorted(want):
        g = np.asarray(got[name]).astype(np.int32)
        w = np.asarray(want[name]).astype(np.int32)
        assert g.shape == w.shape, f"{context}:{name}: shape {g.shape} vs {w.shape}"
        diff = np.abs(g - w)
        worst = int(diff.max()) if diff.size else 0
        frac_bad = float((diff > tol).mean()) if diff.size else 0.0
        assert worst <= tol or frac_bad < 1e-4, (
            f"{context}:{name}: max diff {worst} LSB, {frac_bad:.2%} pixels over "
            f"tolerance {tol}"
        )


def assert_rgba_close(got, want, tol: float = 2.5 / 255.0, context: str = ""):
    g = np.asarray(got, np.float32)
    w = np.asarray(want, np.float32)
    assert g.shape == w.shape, f"{context}: shape {g.shape} vs {w.shape}"
    worst = float(np.abs(g - w).max()) if g.size else 0.0
    assert worst <= tol, f"{context}: max float diff {worst} > {tol}"
