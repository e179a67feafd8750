"""FrameSpec — the static type of a video stream.

Replaces GStreamer caps (`video/x-raw,format=...,width=...`) with an explicit,
hashable spec that drives negotiation, jit-cache keys and plane geometry.
Semantics follow GstVideoInfo: pixel-aspect-ratio and framerate are exact
fractions; the color matrix mirrors vf_metal_color_matrix_for_frame
(/root/reference/src/common/vfmetaltextureutil.m:25-41 — BT.709 if the caps
say so, BT.601 otherwise).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, replace

from tpuvf.core.formats import (
    VideoFormat,
    canonical_planes,
    parse_format,
    validate_dims,
)


@dataclass(frozen=True, order=True)
class Fraction:
    """Exact rational, always stored reduced with positive denominator."""

    num: int
    den: int = 1

    def __post_init__(self):
        if self.den == 0:
            raise ZeroDivisionError("fraction with zero denominator")
        g = math.gcd(self.num, self.den) or 1
        num, den = self.num // g, self.den // g
        if den < 0:
            num, den = -num, -den
        object.__setattr__(self, "num", num)
        object.__setattr__(self, "den", den)

    @classmethod
    def parse(cls, text: str) -> "Fraction":
        if "/" in text:
            n, d = text.split("/", 1)
            return cls(int(n), int(d))
        return cls(int(text), 1)

    def __mul__(self, other: "Fraction") -> "Fraction":
        return Fraction(self.num * other.num, self.den * other.den)

    def __truediv__(self, other: "Fraction") -> "Fraction":
        return Fraction(self.num * other.den, self.den * other.num)

    def __float__(self) -> float:
        return self.num / self.den

    def __str__(self) -> str:
        return f"{self.num}/{self.den}"


DEFAULT_FPS = Fraction(30, 1)
DEFAULT_PAR = Fraction(1, 1)


def default_matrix_for_size(width: int, height: int) -> str:
    """GStreamer convention: BT.709 for HD (height > 576), BT.601 for SD."""
    return "bt709" if height > 576 else "bt601"


@dataclass(frozen=True)
class FrameSpec:
    """Static description of a video stream (one negotiated caps set)."""

    format: VideoFormat
    width: int
    height: int
    fps: Fraction = DEFAULT_FPS
    par: Fraction = DEFAULT_PAR
    matrix: str = ""  # "bt601" | "bt709"; "" = derive from size
    interlaced: bool = False
    tff: bool = True  # top-field-first flag for interlaced content

    def __post_init__(self):
        validate_dims(self.format, self.width, self.height)
        if not self.matrix:
            object.__setattr__(
                self, "matrix", default_matrix_for_size(self.width, self.height)
            )
        if self.matrix not in ("bt601", "bt709"):
            raise ValueError(f"unknown color matrix {self.matrix!r}")

    # -- helpers -----------------------------------------------------------

    @property
    def matrix_index(self) -> int:
        """0=BT.601, 1=BT.709 (vfmetaltextureutil.m:25-41)."""
        return 1 if self.matrix == "bt709" else 0

    @property
    def planes(self):
        return canonical_planes(self.format, self.width, self.height)

    @property
    def dar(self) -> Fraction:
        """Display aspect ratio = (w/h) * par."""
        return Fraction(self.width, self.height) * self.par

    def with_(self, **kw) -> "FrameSpec":
        return replace(self, **kw)

    def __str__(self) -> str:
        return (
            f"video/x-raw,format={self.format.value},width={self.width},"
            f"height={self.height},framerate={self.fps},"
            f"pixel-aspect-ratio={self.par},matrix={self.matrix}"
        )


@dataclass(frozen=True)
class CapsFilter:
    """Partial constraints on a FrameSpec — the analog of a caps filter
    string between two elements (``video/x-raw,format=NV12,width=320``).

    Any field left None is unconstrained.
    """

    format: VideoFormat | None = None
    width: int | None = None
    height: int | None = None
    fps: Fraction | None = None
    par: Fraction | None = None
    interlaced: bool | None = None
    matrix: str | None = None  # explicit colorimetry constraint

    @classmethod
    def parse(cls, text: str) -> "CapsFilter":
        """Parse a gst-launch style caps string.

        Accepts 'video/x-raw' with comma-separated fields; typed values like
        '(fraction)30/1' or '(string)NV12' have their type tags stripped.
        """
        fields: dict = {}
        parts = [p.strip() for p in text.split(",")]
        for part in parts:
            if part in ("video/x-raw", ""):
                continue
            if "=" not in part:
                raise ValueError(f"bad caps field {part!r} in {text!r}")
            key, val = part.split("=", 1)
            key = key.strip()
            val = val.strip()
            if val.startswith("("):  # strip type annotation e.g. (fraction)
                val = val.split(")", 1)[1]
            if key == "format":
                fields["format"] = parse_format(val)
            elif key == "width":
                fields["width"] = int(val)
            elif key == "height":
                fields["height"] = int(val)
            elif key == "framerate":
                fields["fps"] = Fraction.parse(val)
            elif key == "pixel-aspect-ratio":
                fields["par"] = Fraction.parse(val)
            elif key == "interlace-mode":
                fields["interlaced"] = val == "interleaved"
            elif key == "colorimetry":
                # map GStreamer colorimetry strings to the YUV matrix
                # (vf_metal_color_matrix_for_frame: BT.709 else BT.601)
                fields["matrix"] = (
                    "bt709" if "709" in val else "bt601")
            elif key == "chroma-site":
                pass  # accepted but not constrained
            else:
                raise ValueError(f"unsupported caps field {key!r}")
        return cls(**fields)

    def accepts(self, spec: FrameSpec) -> bool:
        if self.format is not None and spec.format != self.format:
            return False
        if self.width is not None and spec.width != self.width:
            return False
        if self.height is not None and spec.height != self.height:
            return False
        if self.fps is not None and spec.fps != self.fps:
            return False
        if self.par is not None and spec.par != self.par:
            return False
        if self.interlaced is not None and spec.interlaced != self.interlaced:
            return False
        if self.matrix is not None and spec.matrix != self.matrix:
            return False
        return True

    def apply(self, spec: FrameSpec) -> FrameSpec:
        """Constrain `spec` to this filter (fields set here win)."""
        kw = {}
        if self.format is not None:
            kw["format"] = self.format
        if self.width is not None:
            kw["width"] = self.width
        if self.height is not None:
            kw["height"] = self.height
        if self.fps is not None:
            kw["fps"] = self.fps
        if self.par is not None:
            kw["par"] = self.par
        if self.interlaced is not None:
            kw["interlaced"] = self.interlaced
        if self.matrix is not None:
            kw["matrix"] = self.matrix
        elif "width" in kw or "height" in kw:
            # size change re-derives the default colorimetry (HD -> BT.709,
            # SD -> BT.601), like caps renegotiation would; a spec whose
            # matrix was derived from its old size must not leak it
            kw["matrix"] = ""
        return spec.with_(**kw)
