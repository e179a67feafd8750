"""QUAD (row x column phase) link layout (round 3d).

The row-phase extension of the column-split links: a 4:2:0-identity chain
whose elements are all quad-capable carries FOUR (row, col) phase planes
from a quad-provisioned source upload to a packed32q/packed16q sink edge,
so the chroma row 2x-upsample fuses into the emits as 2-tap stencils (the
_upsample2x_linear expressions verbatim) instead of materializing
full-height f32 planes.  Everything here asserts BIT-equality against the
canonical (links-disabled) pipeline — the layout must never change values.
"""

from __future__ import annotations

import numpy as np
import pytest

from tpuvf.cli.launch import parse_pipeline
from tpuvf.core.formats import VideoFormat
from tpuvf.core.spec import FrameSpec


def _run(desc, disable_links=False):
    p = parse_pipeline(desc)
    if disable_links:
        p._link_plan = lambda: ({}, {}, {})
    p.negotiate()
    p.build()
    p.run()
    return p


def _frames(p):
    out = []
    for f in p.sinks[0].frames:
        out.append(f if isinstance(f, dict) else {"rgba": f})
    return out


def _assert_bit_exact(desc):
    a = _frames(_run(desc))
    b = _frames(_run(desc, disable_links=True))
    assert len(a) == len(b)
    for fa, fb in zip(a, b):
        assert fa.keys() == fb.keys()
        for k in fa:
            np.testing.assert_array_equal(np.asarray(fa[k]),
                                          np.asarray(fb[k]), err_msg=k)


CHAIN_RGB = (
    "videotestsrc num-buffers=2 ! video/x-raw,format=NV12,width=192,height=108 "
    "! vfmetalconvertscale ! video/x-raw,format=BGRA "
    "! vfmetalvideofilter brightness=0.1 contrast=1.2 saturation=1.3 "
    "! appsink"
)


def test_quad_negotiated_and_bit_exact_rgb_edge():
    p = _run(CHAIN_RGB)
    names = {e.ELEMENT_NAME: e.name for e in p.elements}
    assert p.link_plan[names["vfconvertscale"]] == ("quad", "quad")
    assert p.link_plan[names["vfvideofilter"]] == ("quad", "packed32q")
    assert list(p._source_split.values()) == ["quad"]
    _assert_bit_exact(CHAIN_RGB)


def test_quad_420_edge_bit_exact():
    # I420 in/out through two filters: quad boundary + packed16q edge,
    # chroma emitted phase-averaged with no interleave
    _assert_bit_exact(
        "videotestsrc num-buffers=2 pattern=ball "
        "! video/x-raw,format=I420,width=96,height=48 "
        "! vfmetalvideofilter brightness=0.05 "
        "! vfmetalvideofilter contrast=1.3 vignette=0.4 ! appsink")


def test_quad_grain_row_coordinates():
    # grain hashes the TRUE pixel coordinates: the quad path feeds
    # x_index/y_index per phase (filter.apply_color_adjustments_t), so the
    # hash INPUTS match the canonical program — but grain is FMA-chaotic
    # across program shapes (CLAUDE.md), and sub-LSB noise differences flip
    # knife-edge quantizations (luma absorbs them; the chroma box average
    # shows a handful of 1-3 LSB pixels).  Compare with the repo's
    # established tolerance-and-outliers rule for noise, and assert the
    # luma separately at bit-exactness (measured 0 mismatches: the row
    # coordinates ARE right — a wrong y_index would shift every grain row).
    desc = ("videotestsrc num-buffers=3 pattern=smpte "
            "! video/x-raw,format=NV12,width=128,height=64 "
            "! vfmetalvideofilter noise=0.5 vignette=0.3 saturation=1.4 "
            "! appsink")
    a = _frames(_run(desc))
    b = _frames(_run(desc, disable_links=True))
    assert len(a) == len(b)
    for fa, fb in zip(a, b):
        np.testing.assert_array_equal(np.asarray(fa["y"]),
                                      np.asarray(fb["y"]), err_msg="y")
        for k in fa:
            diff = np.abs(np.asarray(fa[k]).astype(np.int32)
                          - np.asarray(fb[k]).astype(np.int32))
            assert (diff > 2).mean() < 1e-3, k
            assert np.median(diff) <= 1, k


def test_quad_all_gates_bit_exact():
    _assert_bit_exact(
        "videotestsrc num-buffers=2 ! video/x-raw,format=NV12,"
        "width=128,height=64 "
        "! vfmetalvideofilter gamma=0.8 hue=0.3 invert=true sepia=0.5 "
        "chroma-key-enabled=true ! appsink")


def test_odd_height_falls_back():
    # 4:2:0 needs even dims for quad (and for column split): odd height
    # keeps canonical layouts and still runs
    p = _run(
        "videotestsrc num-buffers=1 ! video/x-raw,format=BGRA,"
        "width=64,height=33 "
        "! vfmetalvideofilter brightness=0.2 ! appsink")
    assert all(m[1] not in ("quad", "packed32q", "packed16q")
               for m in p.link_plan.values())


def test_lut_chain_keeps_column_split(tmp_path):
    # LUT gathers keep the measured-optimal two-site column layout
    lut = tmp_path / "id.cube"
    lines = ["LUT_3D_SIZE 2"]
    for b in range(2):
        for g in range(2):
            for r in range(2):
                lines.append(f"{r:.1f} {g:.1f} {b:.1f}")
    lut.write_text("\n".join(lines) + "\n")
    p = _run(
        "videotestsrc num-buffers=1 ! video/x-raw,format=NV12,"
        f"width=64,height=32 ! vfmetalvideofilter lut-file={lut} "
        "! appsink")
    vf = next(e.name for e in p.elements
              if e.ELEMENT_NAME == "vfvideofilter")
    assert p.link_plan[vf] == (True, "packed16")


def test_no_quad_links_escape_hatch(monkeypatch):
    monkeypatch.setenv("TPUVF_NO_QUAD_LINKS", "1")
    p = _run(CHAIN_RGB)
    names = {e.ELEMENT_NAME: e.name for e in p.elements}
    assert p.link_plan[names["vfconvertscale"]] == (True, "split")
    assert p.link_plan[names["vfvideofilter"]] == (True, "packed32")


def test_sp_request_rebuilds_without_quad():
    # quad links don't compose with row shards: run_batched(sp_axis=...)
    # must fall back to the column-split plan and still run
    import jax

    from tpuvf.parallel.mesh import make_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    desc = CHAIN_RGB.replace("appsink", "appsink")  # copy
    p = _run(desc)
    assert any(v == "quad" for v in p._source_split.values())
    mesh = make_mesh({"dp": 1, "sp": 2})
    p.run_batched(2, batch_size=2, mesh=mesh, sp_axis="sp")
    assert all(v != "quad" for v in p._source_split.values())
    assert all(m[1] not in ("quad", "packed32q", "packed16q")
               for m in p.link_plan.values())


# -- kernel/host-edge unit tests --------------------------------------------


def test_pack_words_u32_quad_bytes_equal_interleave():
    import jax.numpy as jnp

    from tpuvf.kernels import convert

    rng = np.random.default_rng(3)
    chans = {
        ph: tuple(jnp.asarray(rng.random((8, 16)).astype(np.float32))
                  for _ in range(4))
        for ph in convert.QUAD_PHASES
    }
    # quad pack vs per-phase column pack + numpy row/col interleave
    out = convert.pack_rgba_quad(chans, VideoFormat.BGRA, 0,
                                 mode="packed32q", unit_range=True)
    ref = {ph: np.asarray(convert.pack_words_u32(
        tuple(jnp.round(c * 255.0).astype(jnp.uint8) for c in chans[ph]),
        VideoFormat.BGRA)) for ph in convert.QUAD_PHASES}
    for ph in convert.QUAD_PHASES:
        np.testing.assert_array_equal(np.asarray(out[f"w_{ph}"]), ref[ph])


def test_quad_planes_host_matches_numpy():
    from tpuvf.core.frame import quad_planes_host

    rng = np.random.default_rng(5)
    spec = FrameSpec(VideoFormat.NV12, 64, 32)
    y = rng.integers(0, 256, (32, 64), np.uint8)
    u = rng.integers(0, 256, (16, 32), np.uint8)
    v = rng.integers(0, 256, (16, 32), np.uint8)
    out = quad_planes_host({"y": y, "u": u, "v": v}, spec)
    np.testing.assert_array_equal(out["y_ee"], y[0::2, 0::2])
    np.testing.assert_array_equal(out["y_eo"], y[0::2, 1::2])
    np.testing.assert_array_equal(out["y_oe"], y[1::2, 0::2])
    np.testing.assert_array_equal(out["y_oo"], y[1::2, 1::2])
    np.testing.assert_array_equal(out["u"], u)


def test_interleave4_u32_native_matches_numpy():
    from tpuvf.native import lib as nat

    rng = np.random.default_rng(7)
    quads = [rng.integers(0, 2**32, (6, 10), dtype=np.uint32)
             for _ in range(4)]
    try:
        got = nat.interleave4_u32(*quads)
    except (OSError, AttributeError):
        pytest.skip("native library unavailable")
    ref = np.empty((12, 20), np.uint32)
    ref[0::2, 0::2], ref[0::2, 1::2] = quads[0], quads[1]
    ref[1::2, 0::2], ref[1::2, 1::2] = quads[2], quads[3]
    np.testing.assert_array_equal(got, ref)
