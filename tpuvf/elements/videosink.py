"""vfvideosink — display sink with aspect-fit letterboxing and navigation.

Rebuild of vfmetalvideosink (/root/reference/src/videosink/) for a headless
TPU host.  The reference renders into a CAMetalLayer inside an NSWindow/
NSView; the TPU-native analog renders the same aspect-fit letterboxed
"drawable" (gst_video_center_rect, metalvideosinkrenderer.m:426-462) into an
RGBA window buffer that an application can read, embed (set_window_handle
analog) or dump to numbered PNG files for inspection.

Semantics carried over:
- props force-aspect-ratio=TRUE, enable-navigation-events=TRUE
  (gstvfmetalvideosink.m:55-63)
- aspect-fit display rect with black letterbox bars; force-aspect-ratio=false
  stretches to the full window
- GstVideoOverlay analog: set_window_size / set_render_rectangle / expose
- GstNavigation analog: navigation_to_video_coords maps pointer coords from
  window space into video pixel space, inverting the display rect transform
  (metalvideosinkrenderer.m:690-703); events outside the display rect clamp
- the render path is async-present in the reference (no waitUntilCompleted);
  here frames are composed device-side and fetched once per consume
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np

from tpuvf.core.element import SinkElement
from tpuvf.core.formats import CORE_FORMATS
from tpuvf.core.properties import PropertyDescriptor
from tpuvf.core.registry import register
from tpuvf.core.spec import FrameSpec
from tpuvf.kernels import convert, sample
from tpuvf.kernels.color import quant


def center_rect(src_w, src_h, dst_w, dst_h, scaling=True):
    """gst_video_center_rect: aspect-fit src into dst, centered."""
    if not scaling:
        w, h = min(src_w, dst_w), min(src_h, dst_h)
    else:
        src_ratio = src_w / src_h
        dst_ratio = dst_w / dst_h
        if src_ratio > dst_ratio:
            w = dst_w
            h = int(round(dst_w / src_ratio))
        elif src_ratio < dst_ratio:
            h = dst_h
            w = int(round(dst_h * src_ratio))
        else:
            w, h = dst_w, dst_h
    return (dst_w - w) // 2, (dst_h - h) // 2, w, h


@register
class VideoSink(SinkElement):
    ELEMENT_NAME = "vfvideosink"
    # autovideosink: the auto-pick resolves to the one windowed sink
    # (README.md:98,106 uses it interchangeably with vfmetalvideosink).
    ALIASES = ("vfmetalvideosink", "videosink", "autovideosink")
    KLASS = "Sink/Video"
    DESCRIPTION = "Renders video into a window buffer with aspect-fit scaling"
    IN_FORMATS = CORE_FORMATS
    PROPERTIES = (
        PropertyDescriptor("force-aspect-ratio", "bool", True,
                           "Keep the display aspect ratio"),
        PropertyDescriptor("enable-navigation-events", "bool", True,
                           "Forward pointer/keyboard events upstream"),
        PropertyDescriptor("window-width", "int", 0,
                           "Window width (0 = video width)", 0, 2**31 - 1),
        PropertyDescriptor("window-height", "int", 0,
                           "Window height (0 = video height)", 0, 2**31 - 1),
        PropertyDescriptor("snapshot-location", "string", None,
                           "Write frames as PNG files to this printf pattern "
                           "(e.g. /tmp/frame-%04d.png)"),
    )

    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.window: Optional[np.ndarray] = None  # (H, W, 4) RGBA
        self.frame_count = 0
        self._spec: Optional[FrameSpec] = None
        self._display_rect: Optional[Tuple[int, int, int, int]] = None
        self._render = None
        self._render_rectangle = None
        self._last_planes = None  # device planes of the last frame (expose)
        self.navigation_callback: Optional[Callable] = None

    # -- GstVideoOverlay analog ------------------------------------------

    def set_window_size(self, width: int, height: int) -> None:
        """set_window_handle analog: embed into a window of this size."""
        self.props.set("window-width", width)
        self.props.set("window-height", height)
        self._render = None  # drawable-size change rebuilds the pipeline

    def set_render_rectangle(self, x, y, w, h) -> None:
        self._render_rectangle = (x, y, w, h)
        self._render = None

    def expose(self) -> None:
        """Re-present the last frame through the current window/render
        rectangle (the GstVideoOverlay expose analog,
        gstvfmetalvideosink.m:364-372): after set_render_rectangle or
        set_window_size, the window buffer refreshes without a new buffer
        arriving.  No-op when nothing has been rendered yet."""
        if self._last_planes is None or self._spec is None:
            return
        if self._render is None:
            self._build_render(self._spec)
        out = np.asarray(self._render(self._last_planes, self._render_params))
        self.window = np.ascontiguousarray(out.transpose(1, 2, 0))

    # -- GstNavigation analog --------------------------------------------

    def navigation_to_video_coords(self, wx: float, wy: float):
        """Window coords -> video pixel coords (renderer m:690-703)."""
        if self._display_rect is None or self._spec is None:
            return wx, wy
        dx, dy, dw, dh = self._display_rect
        vx = (wx - dx) * self._spec.width / max(dw, 1)
        vy = (wy - dy) * self._spec.height / max(dh, 1)
        vx = min(max(vx, 0.0), float(self._spec.width))
        vy = min(max(vy, 0.0), float(self._spec.height))
        return vx, vy

    def send_navigation_event(self, event: str, wx: float, wy: float):
        if not self.props.get("enable-navigation-events"):
            return None
        vx, vy = self.navigation_to_video_coords(wx, wy)
        ev = {"event": event, "pointer_x": vx, "pointer_y": vy}
        if self.navigation_callback:
            self.navigation_callback(ev)
        return ev

    # -- rendering --------------------------------------------------------

    def prepare(self, in_spec: FrameSpec):
        self._spec = in_spec

    def _build_render(self, spec: FrameSpec):
        import jax
        import jax.numpy as jnp

        win_w = self.props.get("window-width") or spec.width
        win_h = self.props.get("window-height") or spec.height
        if self._render_rectangle is not None:
            rx, ry, rw, rh = self._render_rectangle
        else:
            rx, ry, rw, rh = 0, 0, win_w, win_h
        if self.props.get("force-aspect-ratio"):
            dx, dy, dw, dh = center_rect(spec.width, spec.height, rw, rh)
        else:
            dx, dy, dw, dh = 0, 0, rw, rh
        dx, dy = dx + rx, dy + ry
        self._display_rect = (dx, dy, dw, dh)

        # like the compositor, the display rect has integer origin/size, so
        # the draw is resample-to-rect + slice placement into the window
        from tpuvf.kernels.sample import WeightBuffers

        bufs = WeightBuffers(self.name)
        to_rgba = convert.plan_rgba_sampler(
            spec, spec.width, spec.height, bufs,
            matrix_index=spec.matrix_index)
        scale = convert.plan_plane_sampler(
            spec.width, spec.height, dw, dh, sample.LINEAR, 1.0, 1.0, bufs)
        self._render_params = jax.device_put(dict(bufs.buffers))

        def render(planes, params):
            rgba = to_rgba(planes, params)
            scaled = quant(scale(rgba, params))
            # black letterbox clear (renderer m:541-560)
            window = jnp.zeros((4, win_h, win_w), jnp.uint8)
            window = window.at[3].set(jnp.uint8(255))
            return window.at[:, dy:dy + dh, dx:dx + dw].set(scaled)

        self._render = jax.jit(render)
        self._win_shape = (win_h, win_w)

    def consume(self, host_frame, spec: FrameSpec, frame_index: int) -> None:
        from tpuvf.core.frame import host_to_planes
        import jax.numpy as jnp

        if self._render is None or self._spec != spec:
            self._spec = spec
            self._build_render(spec)
        planes = host_to_planes(host_frame, spec)
        dev = {k: jnp.asarray(v) for k, v in planes.items()}
        self._last_planes = dev  # kept for expose() re-blits
        out = np.asarray(self._render(dev, self._render_params))  # (4, H, W)
        self.window = np.ascontiguousarray(out.transpose(1, 2, 0))
        self.frame_count += 1
        pattern = self.props.get("snapshot-location")
        if pattern:
            from tpuvf.io import png

            path = pattern % (frame_index,) if "%" in pattern else pattern
            png.write(path, self.window)
