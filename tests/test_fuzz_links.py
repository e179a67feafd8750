"""Differential boundary-layout fuzz: random graphs run twice — once
with the negotiated link plan (split / packed16 boundaries, split source
provisioning, compositor split pads, overlay folds) and once with every
boundary forced canonical (TPUVF_NO_SPLIT_LINKS) — and the sink frames
must agree within 1 LSB.

The sp fuzzers compare sharded vs unsharded; this one compares LAYOUTS:
it is the oracle for the whole column-phase link machinery (including
the round-3c 2x-upsample stencil path) under random topologies, catching
wrong-pixel bugs that the crash-only fuzzers cannot.

Tolerance 1: different layouts are different program shapes, and XLA's
FMA fusion can flip quantization knife-edge pixels by 1 LSB between
program variants (CLAUDE.md round-3 findings).  Grain (noise) is
program-shape-chaotic and stays out of the element pool.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from tpuvf.cli.launch import parse_pipeline

FORMATS = ["BGRA", "RGBA", "NV12", "I420", "UYVY", "YUY2"]
# even sizes engage the split machinery; odd ones exercise the fallbacks;
# (64,48)->(128,96) transitions hit the 2x-upsample stencil path (grid16
# plans), (64,48)->(256,192) the 4x grid64 plans, (64,48)->(192,144)
# the 3x grid36 plans, and (64,48)->(96,72) / (128,96)->(192,144) the
# 1.5x grid9 plans (round 5)
SIZES = [(64, 48), (128, 96), (62, 46), (37, 23), (64, 32), (96, 64),
         (256, 192), (192, 144), (96, 72)]


def _fuzz_png():
    from tpuvf.io import png as tpng

    path = "/tmp/tpuvf-linkfuzz-ov.png"
    if not os.path.exists(path):
        r = np.random.default_rng(11)
        tpng.write(path, r.integers(0, 256, (10, 14, 4)).astype(np.uint8))
    return path


ELEMENTS = [
    "vfmetalvideofilter brightness=0.2 contrast=1.3",
    "vfmetalvideofilter sharpness=0.6 vignette=0.3",
    "vfmetalvideofilter chroma-key-enabled=true gamma=0.8",
    "vfmetaltransform method=clockwise",
    "vfmetaltransform crop-top=3 crop-left=5",
    "vfmetaldeinterlace method=greedyh",
    "vfmetaldeinterlace method=weave",
    "vfmetalconvertscale",
    "vfmetaloverlay location={png} x=7 y=4",
    "vfmetaloverlay location={png} relative-x=0.6 relative-y=0.3",
    "queue",
    "identity",
]


def _desc(rng):
    fmt = FORMATS[rng.integers(len(FORMATS))]
    w, h = SIZES[rng.integers(len(SIZES))]
    if fmt in ("UYVY", "YUY2") and w % 2:
        w += 1
    pat = ["ball", "smpte"][rng.integers(2)]
    if rng.random() < 0.25:
        # compositor topology: 2 pads + trailing chain (split pads,
        # aggregate split output, possible overlay fold)
        f2 = FORMATS[rng.integers(4)]
        w2, h2 = SIZES[rng.integers(len(SIZES))]
        desc = (
            f"videotestsrc num-buffers=2 pattern={pat} "
            f"! video/x-raw,format={fmt},width={w},height={h} "
            f"! comp.sink_0 "
            f"videotestsrc num-buffers=2 pattern=snow "
            f"! video/x-raw,format={f2},width={w2},height={h2} "
            f"! comp.sink_1 "
            f"vfcompositor name=comp sink_1::xpos={int(rng.integers(0, 9))} "
            f"sink_1::ypos={int(rng.integers(0, 7))} "
            f"sink_1::alpha=0.8 ")
    else:
        desc = (
            f"videotestsrc num-buffers=2 pattern={pat} "
            f"! video/x-raw,format={fmt},width={w},height={h} ")
    for _ in range(rng.integers(1, 4)):
        desc += "! {} ".format(
            ELEMENTS[rng.integers(len(ELEMENTS))].format(png=_fuzz_png()))
        if rng.random() < 0.3:
            f2 = FORMATS[rng.integers(4)]
            w2, h2 = SIZES[rng.integers(len(SIZES))]
            desc += f"! video/x-raw,format={f2},width={w2},height={h2} "
    return desc + "! appsink"


def _planes(frame):
    """appsink frames are arrays (RGB) or {plane: array} dicts (YUV)."""
    if isinstance(frame, dict):
        return {k: np.asarray(v) for k, v in frame.items()}
    return {"rgba": np.asarray(frame)}


def _run(desc):
    p = parse_pipeline(desc)
    p.negotiate()
    p.build()
    p.run()
    return [_planes(f) for f in p.sinks[0].frames], p.link_plan


def _run_one(seed, monkeypatch):
    rng = np.random.default_rng(10_000 + seed)
    desc = _desc(rng)
    # a pre-existing escape-hatch export would make BOTH runs canonical
    # (vacuously green); monkeypatch restores the user's value afterwards
    monkeypatch.delenv("TPUVF_NO_SPLIT_LINKS", raising=False)
    try:
        planned, plan = _run(desc)
    except (ValueError, NotImplementedError):
        return  # clean build-time rejection: fine (covered by fuzz_sp)
    monkeypatch.setenv("TPUVF_NO_SPLIT_LINKS", "1")
    try:
        canonical, plan_off = _run(desc)
        assert plan_off == {}, plan_off
    finally:
        monkeypatch.delenv("TPUVF_NO_SPLIT_LINKS", raising=False)
    assert len(planned) == len(canonical), desc
    # grid plans + sharpness: the unsharp mask reads a knife-edge-flipped
    # value twice (o + (o-bl)*amount), so the 1-LSB cross-program
    # contract amplifies to 2 through the pass's RGBA8 boundaries
    # (measured on grid9; same mechanism on every grid period)
    grid_plan = any(m.startswith(("grid", "packed32g", "packed420g"))
                    for pair in plan.values() for m in pair
                    if isinstance(m, str))
    tol = 2 if grid_plan and "sharpness" in desc else 1
    for i, (fa, fb) in enumerate(zip(planned, canonical)):
        assert fa.keys() == fb.keys(), desc
        for k in fa:
            a, b = fa[k], fb[k]
            assert a.shape == b.shape and a.dtype == b.dtype, desc
            diff = np.abs(a.astype(np.int16) - b.astype(np.int16))
            assert diff.max() <= tol, (
                f"seed {seed} frame {i} plane {k}: max diff {diff.max()} "
                f"(plan={plan})\n{desc}")


N_SEEDS = int(os.environ.get("TPUVF_FUZZ_SEEDS", "25"))


@pytest.mark.parametrize("seed", range(N_SEEDS))
def test_link_layout_differential(seed, monkeypatch):
    _run_one(seed, monkeypatch)
