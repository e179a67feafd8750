"""tpuvf — a TPU-native video-frame processing framework.

A from-scratch rebuild of the capabilities of the GStreamer `vfmetal` element
suite (vfmetalconvertscale, vfmetalvideofilter, vfmetalcompositor,
vfmetaltransform, vfmetaldeinterlace, vfmetaloverlay, vfmetalvideosink) as an
idiomatic JAX/XLA/Pallas framework:

- Frames are HBM-resident planar arrays (width on the 128-lane axis).
- Scaling/sampling is expressed as separable weight-matrix matmuls (MXU),
  reproducing Metal's normalized-texcoord sampler semantics exactly.
- Each element's per-frame GPU pass becomes a pure jittable function;
  whole pipelines fuse into a single XLA program (frames never leave HBM
  between elements).
- Element/property semantics mirror the reference (see SURVEY.md §2); every
  quantization point (Metal RGBA8 texture write) is reproduced for per-pixel
  parity within 8-bit tolerance.
"""

from tpuvf.core.formats import VideoFormat
from tpuvf.core.spec import FrameSpec, Fraction
from tpuvf.core.frame import Frame

__version__ = "0.1.0"

__all__ = ["VideoFormat", "FrameSpec", "Fraction", "Frame", "__version__"]
