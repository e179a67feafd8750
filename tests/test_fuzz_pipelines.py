"""Seeded pipeline fuzz: random chains, formats, sizes and props must
either negotiate+run cleanly or fail with a clear ValueError/
NotImplementedError at build time — never crash mid-run with a shape
error (the class of bug the round-3 advisor found in the overlay's odd-
height split gate).

A deeper unbounded fuzzer lives in scripts/fuzz_pipelines.py; this seeded
subset runs in CI time.
"""

from __future__ import annotations

import numpy as np
import pytest

from tpuvf.cli.launch import parse_pipeline
from tpuvf.runtime.observability import PipelineError


FORMATS = ["BGRA", "RGBA", "NV12", "I420", "UYVY", "YUY2"]
SIZES = [(64, 48), (37, 23), (129, 65), (64, 33), (62, 46), (128, 96)]


def _filters(rng):
    choices = [
        "vfmetalvideofilter brightness=0.2",
        "vfmetalvideofilter sharpness=0.6 vignette=0.3",
        "vfmetalvideofilter noise=0.4 hue=0.3",
        "vfmetalvideofilter chroma-key-enabled=true",
        "vfmetaltransform method=clockwise",
        "vfmetaltransform crop-top=3 crop-left=5",
        "vfmetaldeinterlace method=greedyh",
        "vfmetaldeinterlace method=weave",
        "vfmetalconvertscale",
        "queue",
        "identity",
    ]
    n = rng.integers(1, 4)
    return [choices[rng.integers(len(choices))] for _ in range(n)]


def _run_one(seed):
    rng = np.random.default_rng(seed)
    fmt = FORMATS[rng.integers(len(FORMATS))]
    w, h = SIZES[rng.integers(len(SIZES))]
    if fmt in ("UYVY", "YUY2") and w % 2:
        w += 1
    desc = (
        f"videotestsrc num-buffers=2 pattern=ball "
        f"! video/x-raw,format={fmt},width={w},height={h} "
    )
    for f in _filters(rng):
        desc += f"! {f} "
    desc += "! appsink"
    try:
        p = parse_pipeline(desc)
        p.negotiate()
        p.build()
        p.run()
    except (ValueError, NotImplementedError):
        return "rejected", desc  # clear build-time rejection: acceptable
    except PipelineError as exc:
        raise AssertionError(f"mid-run failure for: {desc}\n{exc}") from exc
    frames = p.sinks[0].frames
    assert len(frames) == 2, desc
    return "ran", desc


@pytest.mark.parametrize("seed", range(40))
def test_random_chain(seed):
    _run_one(seed)


def test_fuzz_coverage():
    # the seeded set must actually exercise both outcomes
    results = {_run_one(seed)[0] for seed in range(40)}
    assert "ran" in results
