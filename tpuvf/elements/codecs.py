"""Host-side codec elements (pngenc analog).

The reference test suite generates fixtures with
``videotestsrc ! pngenc ! filesink`` (tests/test-overlay.sh:27-31).  Encoders
run on the host at the pipeline edge: the graph treats them as passthrough
device-side and the frame loop applies `encode` before the sink consumes.
"""

from __future__ import annotations

import numpy as np

from tpuvf.core.element import Element
from tpuvf.core.formats import RGB_FORMATS, VideoFormat
from tpuvf.core.properties import PropertyDescriptor
from tpuvf.core.registry import register
from tpuvf.core.spec import FrameSpec
from tpuvf.io import png


class HostCodec(Element):
    """Marker base: encodes host frames to bytes at the sink edge."""

    HOST_CODEC = True

    def encode(self, host_frame, spec: FrameSpec) -> bytes:
        raise NotImplementedError


@register
class PngEnc(HostCodec):
    ELEMENT_NAME = "pngenc"
    DESCRIPTION = "PNG encoder"
    IN_FORMATS = RGB_FORMATS
    OUT_FORMATS = ()
    PROPERTIES = (
        PropertyDescriptor("compression-level", "int", 6, "zlib level", 0, 9),
    )

    def transform_spec(self, in_spec, out_filter=None):
        if not self.accepts_format(in_spec.format):
            raise ValueError(
                f"pngenc accepts RGB formats only, got {in_spec.format}")
        return in_spec

    def encode(self, host_frame, spec: FrameSpec) -> bytes:
        arr = np.asarray(host_frame)
        if spec.format == VideoFormat.BGRA:
            arr = arr[..., [2, 1, 0, 3]]
        return png.encode(arr)
