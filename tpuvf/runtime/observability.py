"""Tracing, metrics and failure handling — the aux-subsystem layer.

The reference's observability is GStreamer debug categories driven by the
GST_DEBUG env var (SURVEY.md §5: one category per element,
vfmetaldevice.m:24-50) plus per-frame MTLCommandBufferStatusError checks.
The TPU-native equivalents:

- ``TPUVF_DEBUG`` env var configures per-category log levels with the same
  syntax family ("3", "convertscale:5,*:2").  Categories are created per
  element name.
- ``PipelineStats`` counts frames and wall time per pipeline run and per
  element-compile, the telemetry the reference lacks entirely.
- ``trace()`` wraps a region in jax.profiler.TraceAnnotation so xprof shows
  per-element spans (the Metal-signpost analog).
- Failure model mirrors the reference: per-frame device errors surface as
  PipelineError (GST_FLOW_ERROR analog) with the failing element named;
  soft failures (bad LUT, missing overlay) already warn-and-passthrough at
  the element layer.
"""

from __future__ import annotations

import logging
import os
import time
from contextlib import contextmanager
from dataclasses import dataclass, field
from typing import Dict

_LEVELS = {
    "0": logging.CRITICAL,  # none
    "1": logging.ERROR,
    "2": logging.WARNING,
    "3": logging.INFO,  # FIXME/INFO
    "4": logging.INFO,
    "5": logging.DEBUG,
    "6": logging.DEBUG,  # LOG/TRACE
    "7": logging.DEBUG,
    "9": logging.DEBUG,
}

_configured = False


def configure_from_env() -> None:
    """Parse TPUVF_DEBUG like GST_DEBUG: 'LEVEL' or 'cat:LEVEL,cat2:LEVEL'."""
    global _configured
    if _configured:
        return
    _configured = True
    spec = os.environ.get("TPUVF_DEBUG", "")
    if not spec:
        return
    logging.basicConfig(
        format="%(asctime)s %(levelname).1s %(name)s %(message)s")
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        if ":" in part:
            cat, level = part.rsplit(":", 1)
        else:
            cat, level = "*", part
        pylevel = _LEVELS.get(level.strip(), logging.DEBUG)
        name = "tpuvf" if cat in ("*", "") else f"tpuvf.{cat.strip()}"
        logging.getLogger(name).setLevel(pylevel)


def get_logger(category: str) -> logging.Logger:
    configure_from_env()
    return logging.getLogger(f"tpuvf.{category}")


class PipelineError(RuntimeError):
    """Per-frame processing failure (the GST_FLOW_ERROR analog)."""

    def __init__(self, element: str, frame_index: int, cause: Exception):
        super().__init__(
            f"element {element!r} failed at frame {frame_index}: {cause}")
        self.element = element
        self.frame_index = frame_index
        self.cause = cause


@dataclass
class PipelineStats:
    frames: int = 0
    wall_seconds: float = 0.0
    compile_seconds: float = 0.0
    # live mode (run_live): output clock ticks skipped because the
    # pipeline was still busy at their deadline (QoS frame dropping)
    frames_dropped: int = 0
    per_element_active: Dict[str, bool] = field(default_factory=dict)

    @property
    def fps(self) -> float:
        return self.frames / self.wall_seconds if self.wall_seconds else 0.0

    def summary(self) -> str:
        elided = [n for n, a in self.per_element_active.items() if not a]
        parts = [
            f"{self.frames} frames in {self.wall_seconds:.3f}s "
            f"({self.fps:.1f} fps)",
            f"compile {self.compile_seconds:.2f}s",
        ]
        if self.frames_dropped:
            parts.append(f"dropped {self.frames_dropped} (live QoS)")
        if elided:
            parts.append(f"passthrough-elided: {', '.join(elided)}")
        return "; ".join(parts)


@contextmanager
def trace(label: str):
    """jax.profiler span + wall-clock timing; usable even without a trace."""
    try:
        import jax.profiler

        ctx = jax.profiler.TraceAnnotation(label)
    except Exception:  # pragma: no cover
        ctx = None
    t0 = time.perf_counter()
    if ctx is not None:
        with ctx:
            yield
    else:
        yield
    get_logger("perf").debug("%s: %.3f ms", label, (time.perf_counter() - t0) * 1e3)


@contextmanager
def profiler_trace(log_dir: str):
    """Capture an xprof trace of the enclosed region (jax.profiler)."""
    import jax.profiler

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
