"""Seeded sp fuzz over AGGREGATOR topologies: random compositor graphs
(1-3 pads, mixed formats/sizes, per-pad upstream chains, random baked
geometry incl. negative/straddling/off-canvas rects, operators, alpha,
downstream overlay folds) must bit-match the unsharded run whenever the
sp plan accepts them — and reject with a clear ValueError otherwise.

Exercises Pipeline._sp_plan (pad-branch replication), render_masked /
render_masked_split, and the compositor!overlay fold under row sharding.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax

from tpuvf.cli.launch import parse_pipeline
from tpuvf.parallel import mesh as pmesh
from tpuvf.runtime.observability import PipelineError


PAD_FORMATS = ["BGRA", "RGBA", "NV12", "I420"]
PAD_SIZES = [(38, 24), (64, 48), (37, 23), (20, 56), (128, 64)]
PAD_CHAINS = ["", "! vfmetalvideofilter contrast=1.3 ",
              "! vfmetaltransform method=vertical-flip ",
              "! vfmetalconvertscale ! video/x-raw,format=BGRA "]
OPERATORS = ["over", "add", "source"]
BACKGROUNDS = ["checker", "black", "white", "transparent"]
MESHES = [{"dp": 1, "sp": 2}, {"dp": 2, "sp": 2}, {"dp": 1, "sp": 4},
          {"dp": 2, "sp": 4}, {"dp": 1, "sp": 8}]


def _desc(rng, tmp_path):
    n_pads = int(rng.integers(1, 4))
    desc = ""
    pad_props = []
    for i in range(n_pads):
        fmt = PAD_FORMATS[rng.integers(len(PAD_FORMATS))]
        w, h = PAD_SIZES[rng.integers(len(PAD_SIZES))]
        chain = PAD_CHAINS[rng.integers(len(PAD_CHAINS))]
        # vertically ASYMMETRIC patterns must appear: a symmetric source
        # (ball) masks opposite-edge-row substitution bugs in the chroma
        # halo (the round-3 review's finding-1 class)
        pat = ["ball", "smpte"][rng.integers(2)]
        desc += (
            f"videotestsrc num-buffers=2 pattern={pat} "
            f"! video/x-raw,format={fmt},width={w},height={h} "
            f"{chain}! c.sink_{i} "
        )
        x = int(rng.integers(-20, 120))
        y = int(rng.integers(-20, 90))
        props = f"sink_{i}::xpos={x} sink_{i}::ypos={y}"
        if rng.random() < 0.5:
            props += f" sink_{i}::alpha={rng.choice([0.3, 0.8, 1.0])}"
        if rng.random() < 0.4:
            props += (f" sink_{i}::operator="
                      f"{OPERATORS[rng.integers(len(OPERATORS))]}")
        pad_props.append(props)
    bg = BACKGROUNDS[rng.integers(len(BACKGROUNDS))]
    desc += f"vfmetalcompositor name=c background={bg} "
    desc += " ".join(pad_props) + " "
    if rng.random() < 0.4:
        desc += "! video/x-raw,format=BGRA,width=128,height=96 "
    if rng.random() < 0.4:
        import tpuvf.io.png as pngio

        img = np.zeros((12, 16, 4), np.uint8)
        img[..., 1] = 200
        img[..., 3] = 140
        ov = str(tmp_path / "ov.png")
        pngio.write(ov, img)
        desc += f"! vfmetaloverlay location={ov} x=30 y=40 "
    elif rng.random() < 0.3:
        desc += "! vfmetalvideofilter sharpness=0.4 "
    desc += "! appsink"
    return desc


def _animate(rng, p):
    """Randomly move pad geometry OFF its baked values after build (the
    traced-controllable-props analog) so the general/animated render
    bodies — render_general_sp under sp — get fuzzed too."""
    comp = next(e for e in p.elements if type(e).__name__ == "Compositor")
    moves = []
    for name in sorted(comp.pads):
        if rng.random() < 0.5:
            continue
        bag = comp.get_pad(name)
        prop = ["xpos", "ypos", "operator", "alpha"][rng.integers(4)]
        if prop == "operator":
            val = int(rng.integers(0, 3))
        elif prop == "alpha":
            val = float(rng.choice([0.0, 0.4, 1.0]))
        else:
            val = int(rng.integers(-40, 140))
        bag.set(prop, val)
        moves.append((name, prop, val))
    assert not p._maybe_rebuild()  # animation must not recompile
    return moves


def _run_one(seed, tmp_path):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    rng = np.random.default_rng(7000 + seed)
    desc = _desc(rng, tmp_path)
    axes = MESHES[rng.integers(len(MESHES))]
    animate = rng.random() < 0.5
    try:
        plain = parse_pipeline(desc)
        plain.negotiate()
        plain.build()
        if animate:
            _animate(np.random.default_rng(7000 + seed + 500), plain)
        plain.run_batched(2, batch_size=2)
    except (ValueError, NotImplementedError):
        return "invalid", desc
    def run_sp(sp_axes):
        sp = parse_pipeline(desc)
        sp.negotiate()
        sp.build()
        if animate:
            _animate(np.random.default_rng(7000 + seed + 500), sp)
        m = pmesh.make_mesh(sp_axes)
        sp.run_batched(2, batch_size=2, mesh=m, sp_axis="sp")
        return sp.sinks[0].frames

    try:
        a_frames = run_sp(axes)
    except ValueError:
        return "sp-rejected", desc
    except PipelineError as exc:
        raise AssertionError(
            f"mid-run sp failure for: {desc} mesh={axes}\n{exc}") from exc
    b_frames = plain.sinks[0].frames
    assert len(a_frames) == len(b_frames) == 2, desc
    for a, b in zip(a_frames, b_frames):
        planes_a = a if isinstance(a, dict) else {"m": a}
        planes_b = b if isinstance(b, dict) else {"m": b}
        assert set(planes_a) == set(planes_b)
        for k in planes_a:
            # the masked sp render body is a different PROGRAM SHAPE from
            # the unsharded cells/fast bodies, and fractional-alpha blends
            # land on exact-half quantization boundaries (0.3*s + 0.7*255
            # = x.5), so flat regions may round 1 LSB apart — the repo's
            # documented cross-variant FMA-chaos convention (CLAUDE.md).
            # Anything > 1 LSB is a real bug (wrong rows/halo/geometry
            # produce large content diffs, not +-1).
            d = np.abs(planes_a[k].astype(int) - planes_b[k].astype(int))
            assert d.max() <= 1, f"{desc} mesh={axes} max diff {d.max()}"
    # cross-shard-count oracle: two different sp layouts run the SAME
    # masked render body, so they must agree BITWISE — a boundary-row /
    # halo / mask-offset bug is shard-layout-dependent and cannot pass
    alt = dict(axes, sp=2 if axes.get("sp", 1) != 2 else 4)
    if alt["dp"] * alt["sp"] <= len(jax.devices()):
        try:
            c_frames = run_sp(alt)
        except ValueError:
            c_frames = None  # alt layout gated (rows/shard constraints)
        if c_frames is not None:
            for a, c in zip(a_frames, c_frames):
                planes_a = a if isinstance(a, dict) else {"m": a}
                planes_c = c if isinstance(c, dict) else {"m": c}
                for k in planes_a:
                    np.testing.assert_array_equal(
                        planes_a[k], planes_c[k],
                        err_msg=f"sp layouts disagree (halo bug): "
                                f"{desc} {axes} vs {alt}")
    return "ran", desc


import os

N_SEEDS = int(os.environ.get("TPUVF_FUZZ_SEEDS", "20"))


@pytest.mark.parametrize("seed", range(N_SEEDS))
def test_random_sp_compositor(seed, tmp_path):
    _run_one(seed, tmp_path)


def test_sp_compositor_fuzz_coverage(tmp_path):
    results = {_run_one(seed, tmp_path)[0] for seed in range(20)}
    assert "ran" in results
