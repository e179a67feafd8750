"""GRID16 (4x4 row x col phase) link layout (round 3e).

The 2x-upscale extension of the quad links: at EXACTLY 2x/2x
4:2:0 -> RGB geometry every bilinear tap is phase-fixed (luma .25/.75,
chroma .375/.625 and .125/.875), so the head convertscale reads the
quad-provisioned source and emits SIXTEEN (row mod 4, col mod 4) output
phase planes; downstream grid-capable elements stay per-phase to a
packed32g sink edge and the whole upscale chain fuses with zero
resampling materialization (421 -> 233 us/frame at 1080p->4K on v5e,
scripts/bench_upscale_p44.py).

Parity: the grid stencils are the canonical 2x fast-path expressions
regrouped by output phase, but XLA contracts FMAs differently across the
two program shapes (the repo-wide rule, CLAUDE.md round 3) — knife-edge
pixels may flip 1 LSB, so the chain comparisons assert max 1 LSB with a
small flip fraction (several cases measure bit-exact; e.g. brightness=0.1
alone flips ~1.3% by 1 LSB on CPU).
"""

from __future__ import annotations

import jax.numpy as jnp
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


def _assert_within_1lsb(desc, tol=1):
    a = _frames(_run(desc))
    b = _frames(_run(desc, disable_links=True))
    assert len(a) == len(b)
    for fa, fb in zip(a, b):
        assert fa.keys() == fb.keys()
        for k in fa:
            diff = np.abs(np.asarray(fa[k]).astype(np.int32)
                          - np.asarray(fb[k]).astype(np.int32))
            assert diff.max() <= tol, (k, int(diff.max()))
            assert (diff > 0).mean() < 0.02, (k, float((diff > 0).mean()))


CHAIN = (
    "videotestsrc num-buffers=2 ! video/x-raw,format=NV12,width=96,height=52 "
    "! vfmetalconvertscale ! video/x-raw,format=BGRA,width=192,height=104 "
    "! vfmetalvideofilter brightness=0.1 contrast=1.2 saturation=1.3 "
    "! appsink"
)


def test_grid_negotiated_and_close():
    p = _run(CHAIN)
    names = {e.ELEMENT_NAME: e.name for e in p.elements}
    assert p.link_plan[names["vfconvertscale"]] == ("quad", "grid")
    assert p.link_plan[names["vfvideofilter"]] == ("grid", "packed32g")
    assert list(p._source_split.values()) == ["quad"]
    _assert_within_1lsb(CHAIN)


def test_grid_head_only_packed32g_edge():
    desc = ("videotestsrc num-buffers=2 pattern=ball "
            "! video/x-raw,format=I420,width=96,height=52 "
            "! vfmetalconvertscale "
            "! video/x-raw,format=RGBA,width=192,height=104 ! appsink")
    p = _run(desc)
    cs = next(e.name for e in p.elements
              if e.ELEMENT_NAME == "vfconvertscale")
    assert p.link_plan[cs] == ("quad", "packed32g")
    _assert_within_1lsb(desc)


def test_grid_snow_content_close():
    # random content exercises the quantize knife edges
    _assert_within_1lsb(
        "videotestsrc num-buffers=2 pattern=snow "
        "! video/x-raw,format=NV12,width=64,height=36 "
        "! vfmetalconvertscale ! video/x-raw,format=BGRA,"
        "width=128,height=72 "
        "! vfmetalvideofilter contrast=1.4 vignette=0.4 ! appsink")


def test_grid_all_gates_close():
    _assert_within_1lsb(
        "videotestsrc num-buffers=2 ! video/x-raw,format=NV12,"
        "width=64,height=36 "
        "! vfmetalconvertscale ! video/x-raw,format=BGRA,"
        "width=128,height=72 "
        "! vfmetalvideofilter gamma=0.8 hue=0.3 invert=true sepia=0.5 "
        "chroma-key-enabled=true ! appsink")


def test_grid_grain_coordinates():
    # grain hashes the TRUE pixel coordinates: the grid path feeds
    # x_index/y_index at stride 4 per phase — hash INPUTS match the
    # canonical program, but grain is FMA-chaotic across program shapes
    # (CLAUDE.md): compare with the repo's tolerance-and-outliers rule.
    desc = ("videotestsrc num-buffers=3 pattern=smpte "
            "! video/x-raw,format=NV12,width=64,height=36 "
            "! vfmetalconvertscale ! video/x-raw,format=BGRA,"
            "width=128,height=72 "
            "! vfmetalvideofilter noise=0.5 vignette=0.3 saturation=1.4 "
            "! appsink")
    a = _frames(_run(desc))
    b = _frames(_run(desc, disable_links=True))
    assert len(a) == len(b)
    for fa, fb in zip(a, b):
        for k in fa:
            diff = np.abs(np.asarray(fa[k]).astype(np.int32)
                          - np.asarray(fb[k]).astype(np.int32))
            assert (diff > 2).mean() < 1e-3, k
            assert np.median(diff) <= 1, k


def test_grid_through_passthrough_elements():
    # queue/identity forward the phase dict untouched
    _assert_within_1lsb(
        "videotestsrc num-buffers=2 ! video/x-raw,format=NV12,"
        "width=64,height=36 "
        "! vfmetalconvertscale ! video/x-raw,format=BGRA,"
        "width=128,height=72 ! queue "
        "! vfmetalvideofilter brightness=0.1 ! identity ! appsink")


def test_sharpness_stays_on_grid():
    # the 9-tap blur decomposes into mod-4 cross-phase stencils
    # (kfilter.blur9_grid4): sharpened upscale chains keep the grid plan
    for sharp in ("0.5", "-0.4"):
        desc = ("videotestsrc num-buffers=1 ! video/x-raw,format=NV12,"
                "width=64,height=36 "
                "! vfmetalconvertscale ! video/x-raw,format=BGRA,"
                "width=128,height=72 "
                f"! vfmetalvideofilter sharpness={sharp} ! appsink")
        p = _run(desc)
        assert any(m[1] in ("grid", "packed32g")
                   for m in p.link_plan.values()), sharp
        _assert_within_1lsb(desc)
    # and on a 4:2:0 grid boundary chain
    desc = ("videotestsrc num-buffers=1 pattern=ball "
            "! video/x-raw,format=NV12,width=64,height=36 "
            "! vfmetalconvertscale ! video/x-raw,format=NV12,"
            "width=128,height=72 "
            "! vfmetalvideofilter sharpness=0.6 brightness=0.05 ! appsink")
    p = _run(desc)
    assert any(m[1] == "packed420g" for m in p.link_plan.values())
    _assert_within_1lsb(desc)


def test_lut_falls_back(tmp_path):
    lut = tmp_path / "id.cube"
    lines = ["LUT_3D_SIZE 2"]
    for b in range(2):
        for g in range(2):
            for r in range(2):
                lines.append(f"{r:.1f} {g:.1f} {b:.1f}")
    lut.write_text("\n".join(lines) + "\n")
    p = _run(
        "videotestsrc num-buffers=1 ! video/x-raw,format=NV12,"
        "width=64,height=36 ! vfmetalconvertscale "
        "! video/x-raw,format=BGRA,width=128,height=72 "
        f"! vfmetalvideofilter lut-file={lut} ! appsink")
    assert all(m[1] not in ("grid", "packed32g")
               for m in p.link_plan.values())


def test_non_2x_geometry_keeps_other_plans():
    # 1.5x is not a grid geometry: the scaled split plan (or canonical)
    # applies instead
    p = _run(
        "videotestsrc num-buffers=1 ! video/x-raw,format=NV12,"
        "width=64,height=36 ! vfmetalconvertscale "
        "! video/x-raw,format=BGRA,width=96,height=54 "
        "! vfmetalvideofilter brightness=0.1 ! appsink")
    assert all(m[1] not in ("grid", "packed32g")
               for m in p.link_plan.values())


def test_non_mod4_input_dims_still_grid():
    # 4:2:0 inputs are always even, so every exactly-2x case qualifies
    # (2 * even is mod 4); 62x38 -> 124x76 exercises the non-mod-4 input
    desc = ("videotestsrc num-buffers=1 ! video/x-raw,format=NV12,"
            "width=62,height=38 ! vfmetalconvertscale "
            "! video/x-raw,format=BGRA,width=124,height=76 "
            "! vfmetalvideofilter brightness=0.1 ! appsink")
    p = _run(desc)
    assert any(m[1] in ("grid", "packed32g") for m in p.link_plan.values())
    _assert_within_1lsb(desc)


def test_grid_420_out_packed420g_edge():
    # format-preserving 2x upscale (the default fixation): the head emits
    # the 4:2:0 edge directly (convert.pack_420_grid16)
    for fmt in ("NV12", "I420"):
        desc = ("videotestsrc num-buffers=2 pattern=ball "
                f"! video/x-raw,format={fmt},width=96,height=52 "
                f"! vfmetalconvertscale ! video/x-raw,format={fmt},"
                "width=192,height=104 ! appsink")
        p = _run(desc)
        cs = next(e.name for e in p.elements
                  if e.ELEMENT_NAME == "vfconvertscale")
        assert p.link_plan[cs] == ("quad", "packed420g"), fmt
        _assert_within_1lsb(desc)


def test_grid_420_boundary_with_filter():
    # a 4:2:0 grid BOUNDARY carries per-phase luma + 2x2-phase chroma
    # (pack_rgba_grid16 mode="grid" / plan_rgba_sampler_grid420); the
    # filter re-upsamples chroma per phase and emits the packed420g edge
    desc = ("videotestsrc num-buffers=2 ! video/x-raw,format=NV12,"
            "width=96,height=52 ! vfmetalconvertscale "
            "! video/x-raw,format=NV12,width=192,height=104 "
            "! vfmetalvideofilter brightness=0.1 vignette=0.3 ! appsink")
    p = _run(desc)
    names = {e.ELEMENT_NAME: e.name for e in p.elements}
    assert p.link_plan[names["vfconvertscale"]] == ("quad", "grid")
    assert p.link_plan[names["vfvideofilter"]] == ("grid", "packed420g")
    _assert_within_1lsb(desc)
    # and a two-filter 4:2:0 grid chain (grid -> grid -> packed420g)
    desc2 = ("videotestsrc num-buffers=1 pattern=ball "
             "! video/x-raw,format=I420,width=64,height=36 "
             "! vfmetalconvertscale ! video/x-raw,format=I420,"
             "width=128,height=72 "
             "! vfmetalvideofilter contrast=1.2 "
             "! vfmetalvideofilter saturation=1.3 ! appsink")
    p2 = _run(desc2)
    assert any(m == ("grid", "grid") for m in p2.link_plan.values())
    _assert_within_1lsb(desc2)


def test_overlay_joins_grid(tmp_path):
    # an ACTIVE overlay slices its rect by (row mod 4, col mod 4)
    # host-side and blends per phase (Overlay._make_process_grid); odd
    # rect origins exercise the mod-4 span math
    from PIL import Image

    png = tmp_path / "ov.png"
    Image.new("RGBA", (8, 8), (255, 0, 0, 128)).save(png)
    for fmt, pos in (("BGRA", "x=13 y=7"), ("BGRA", "relative-x=0.3 "
                                            "relative-y=0.4"),
                     ("NV12", "x=5 y=9")):
        desc = ("videotestsrc num-buffers=1 ! video/x-raw,format=NV12,"
                "width=64,height=36 ! vfmetalconvertscale "
                f"! video/x-raw,format={fmt},width=128,height=72 "
                "! vfmetalvideofilter brightness=0.1 "
                f"! vfmetaloverlay location={png} {pos} ! appsink")
        p = _run(desc)
        ov = next(e.name for e in p.elements
                  if e.ELEMENT_NAME == "vfoverlay")
        assert p.link_plan[ov][0] == "grid", (fmt, pos)
        _assert_within_1lsb(desc)


def test_no_quad_links_escape_hatch(monkeypatch):
    monkeypatch.setenv("TPUVF_NO_QUAD_LINKS", "1")
    p = _run(CHAIN)
    assert all(m[1] not in ("grid", "packed32g")
               for m in p.link_plan.values())


def test_sp_misaligned_rebuilds_without_grid():
    # CHAIN's h=52 -> 13 grid phase rows don't split over sp=2: the plan
    # must fall back to the column-split links and rebuild (round 4:
    # ALIGNED grid chains keep the grid plan under sp — tested below)
    import jax

    from tpuvf.parallel.mesh import make_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    p = _run(CHAIN)
    assert any(v == "quad" for v in p._source_split.values())
    mesh = make_mesh({"dp": 1, "sp": 2})
    p.run_batched(2, batch_size=2, mesh=mesh, sp_axis="sp")
    assert all(v != "quad" for v in p._source_split.values())
    assert all(m[1] not in ("grid", "packed32g")
               for m in p.link_plan.values())


def test_sp_aligned_keeps_grid():
    # round 4: h=64 -> 16 input grid phase rows (out 128 -> 32) split
    # evenly over sp=2 with >= 4 phase rows/shard, so the grid plan
    # STAYS under row sharding; output within the documented 1-LSB
    # program-shape tolerance of the unsharded grid run
    import jax

    from tpuvf.parallel.mesh import make_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    desc = CHAIN.replace("height=52", "height=64").replace(
        "height=104", "height=128")
    p = _run(desc)
    assert any(m[1] in ("grid", "packed32g") for m in p.link_plan.values())
    ref = [np.asarray(f) for f in p.sinks[0].frames]
    mesh = make_mesh({"dp": 1, "sp": 2})
    p.run_batched(2, batch_size=2, mesh=mesh, sp_axis="sp")
    assert any(m[1] in ("grid", "packed32g") for m in p.link_plan.values())
    got = [np.asarray(f) for f in p.sinks[0].frames[-2:]]
    for a, b in zip(got, ref):
        d = np.abs(a.astype(np.int32) - b.astype(np.int32))
        assert d.max() <= 1, int(d.max())
        assert (d > 0).mean() < 0.02, float((d > 0).mean())


# -- kernel/host-edge unit tests --------------------------------------------


def test_interleave16_numpy_vs_native():
    from tpuvf.core.frame import _get_native

    nat = _get_native()
    if nat is None:
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(7)
    grid = [rng.integers(0, 2**32, (6, 10), dtype=np.uint32)
            for _ in range(16)]
    out = nat.interleave16_u32(grid)
    ref = np.empty((24, 40), np.uint32)
    for i, g in enumerate(grid):
        ref[i // 4::4, i % 4::4] = g
    np.testing.assert_array_equal(out, ref)


def test_pack_rgba_grid16_words_match_per_phase_pack():
    import jax.numpy as jnp

    from tpuvf.kernels import convert

    rng = np.random.default_rng(3)
    chans = {
        ph: tuple(jnp.asarray(rng.random((4, 8)).astype(np.float32))
                  for _ in range(4))
        for ph in convert.GRID16_PHASES
    }
    out = convert.pack_rgba_grid16(chans, VideoFormat.BGRA, 0,
                                   mode="packed32g", unit_range=True)
    wg = np.asarray(out["w_g"])
    assert wg.shape == (16, 4, 8)
    for i, ph in enumerate(convert.GRID16_PHASES):
        ref = np.asarray(convert.pack_words_u32(
            tuple(jnp.round(c * 255.0).astype(jnp.uint8)
                  for c in chans[ph]),
            VideoFormat.BGRA))
        np.testing.assert_array_equal(wg[i], ref, ph)


def test_grid_sampler_matches_canonical_sampler():
    # plan_rgba_sampler_grid16 vs the canonical dense sampler on random
    # planes: reassembling the 16 phases must reproduce the full-res RGBA
    import jax.numpy as jnp

    from tpuvf.core.frame import quad_planes_host
    from tpuvf.kernels import convert
    from tpuvf.kernels.sample import WeightBuffers

    rng = np.random.default_rng(11)
    w_in, h_in = 32, 20
    spec = FrameSpec(VideoFormat.NV12, w_in, h_in)
    y = rng.integers(0, 256, (h_in, w_in), np.uint8)
    u = rng.integers(0, 256, (h_in // 2, w_in // 2), np.uint8)
    v = rng.integers(0, 256, (h_in // 2, w_in // 2), np.uint8)

    gplanes = quad_planes_host({"y": y, "u": u, "v": v}, spec)
    grid = convert.plan_rgba_sampler_grid16(spec)(
        {k: jnp.asarray(p) for k, p in gplanes.items()}, {})

    bufs = WeightBuffers("t")
    sampler = convert.plan_rgba_sampler(spec, 2 * w_in, 2 * h_in, bufs)
    chans = sampler.tuple({"y": jnp.asarray(y), "u": jnp.asarray(u),
                           "v": jnp.asarray(v)}, dict(bufs.buffers))

    for c in range(4):
        full = np.zeros((2 * h_in, 2 * w_in), np.float32)
        for qq in range(4):
            for p in range(4):
                full[qq::4, p::4] = np.asarray(grid[f"{qq}{p}"][c])
        ref = np.asarray(chans[c])
        # same expressions regrouped -> tiny FMA-contraction residue only
        np.testing.assert_allclose(full, ref, atol=1e-6, err_msg=f"chan {c}")


# -- GRID64 (8x8 phase) 4x-upscale head (round 5, VERDICT r4 item 5) ---------
#
# The mod-8 resolution of the round-3f gap: writing the output col as
# 8n+q makes the 4x luma taps quarter-phase stencils over the quad
# parity planes (src col 2n + (q>=4)) and the 8x chroma taps
# eighth-phase stencils (src n + (q-3.5)/8) — all phase-fixed.


def test_grid64_sampler_matches_canonical_sampler():
    import jax.numpy as jnp

    from tpuvf.core.frame import quad_planes_host
    from tpuvf.kernels import convert
    from tpuvf.kernels.sample import WeightBuffers

    rng = np.random.default_rng(11)
    w_in, h_in = 32, 20
    spec = FrameSpec(VideoFormat.NV12, w_in, h_in)
    y = rng.integers(0, 256, (h_in, w_in), np.uint8)
    u = rng.integers(0, 256, (h_in // 2, w_in // 2), np.uint8)
    v = rng.integers(0, 256, (h_in // 2, w_in // 2), np.uint8)

    gplanes = quad_planes_host({"y": y, "u": u, "v": v}, spec)
    grid = convert.plan_rgba_sampler_grid64(spec)(
        {k: jnp.asarray(p) for k, p in gplanes.items()}, {})

    bufs = WeightBuffers("t")
    sampler = convert.plan_rgba_sampler(spec, 4 * w_in, 4 * h_in, bufs)
    chans = sampler.tuple({"y": jnp.asarray(y), "u": jnp.asarray(u),
                           "v": jnp.asarray(v)}, dict(bufs.buffers))

    for c in range(4):
        full = np.zeros((4 * h_in, 4 * w_in), np.float32)
        for qr in range(8):
            for qc in range(8):
                full[qr::8, qc::8] = np.asarray(grid[f"{qr}{qc}"][c])
        ref = np.asarray(chans[c])
        np.testing.assert_allclose(full, ref, atol=1e-6, err_msg=f"chan {c}")


def test_grid64_element_within_1lsb_of_canonical():
    from tpuvf.core.frame import planes_to_host
    from tpuvf.core.registry import make
    from tpuvf.runtime.benchmark import random_planes_for_spec

    in_spec = FrameSpec(VideoFormat.NV12, 96, 54)
    out_spec = FrameSpec(VideoFormat.BGRA, 384, 216, matrix=in_spec.matrix)

    elem = make("vfconvertscale")
    static = elem.static_config(in_spec, out_spec)
    assert elem.grid64_head_ok(in_spec, out_spec)
    proc_g = elem.make_process_linked(in_spec, out_spec, static,
                                      in_split="quad",
                                      out_mode="packed32g8")
    elem2 = make("vfconvertscale")
    proc_c = elem2.make_process_linked(
        in_spec, out_spec, elem2.static_config(in_spec, out_spec))

    rng = np.random.default_rng(3)
    pq = {k: v[0] for k, v in random_planes_for_spec(
        in_spec, 1, rng, split="quad").items()}
    rng = np.random.default_rng(3)
    pc = {k: v[0] for k, v in random_planes_for_spec(
        in_spec, 1, rng).items()}

    og, _ = proc_g(pq, (), elem.traced_params())
    oc, _ = proc_c(pc, (), elem2.traced_params())
    assert set(og) == {"w_g8"}
    assert np.asarray(og["w_g8"]).shape == (64, 216 // 8, 384 // 8)
    img_g = planes_to_host({k: np.asarray(x) for k, x in og.items()},
                           out_spec)
    img_c = planes_to_host({k: np.asarray(x) for k, x in oc.items()},
                           out_spec)
    d = np.abs(img_g.astype(np.int16) - img_c.astype(np.int16))
    # stencil-vs-matmul contraction class: <= 1 LSB on knife edges
    # (measured bitwise on CPU seeds)
    assert int(d.max()) <= 1
    assert float((d > 0).mean()) < 0.02


def test_grid64_gates():
    from tpuvf.core.registry import make

    elem = make("vfconvertscale")
    in_spec = FrameSpec(VideoFormat.NV12, 96, 54)
    ok = FrameSpec(VideoFormat.BGRA, 384, 216, matrix=in_spec.matrix)
    assert elem.grid64_head_ok(in_spec, ok)
    # not 4x
    assert not elem.grid64_head_ok(
        in_spec, FrameSpec(VideoFormat.BGRA, 192, 108,
                           matrix=in_spec.matrix))
    # 4:2:0 output joined in round 5 (packed420g8 edge)
    assert elem.grid64_head_ok(
        in_spec, FrameSpec(VideoFormat.NV12, 384, 216,
                           matrix=in_spec.matrix))
    # packed 4:2:2 output stays off grid64
    assert not elem.grid64_head_ok(
        in_spec, FrameSpec(VideoFormat.UYVY, 384, 216,
                           matrix=in_spec.matrix))
    # nearest method
    elem.set_property("method", 1)
    try:
        assert not elem.grid64_head_ok(in_spec, ok)
    finally:
        elem.set_property("method", 0)


def test_w_g8_host_interleave_layout():
    from tpuvf.core.frame import planes_to_host

    out_spec = FrameSpec(VideoFormat.BGRA, 16, 8)
    wg = np.arange(64 * 1 * 2, dtype=np.uint32).reshape(64, 1, 2)
    img = planes_to_host({"w_g8": wg}, out_spec)
    words = img.view(np.uint32).reshape(8, 16)
    for qr in range(8):
        for qc in range(8):
            ph = wg[qr * 8 + qc]
            assert np.array_equal(words[qr::8, qc::8], ph), (qr, qc)


CHAIN64 = (
    "videotestsrc num-buffers=2 ! video/x-raw,format=NV12,width=96,height=56 "
    "! vfmetalconvertscale ! video/x-raw,format=BGRA,width=384,height=224 "
    "! vfmetalvideofilter brightness=0.1 contrast=1.2 saturation=1.3 "
    "! appsink"
)


def test_grid64_chain_negotiated_and_close():
    p = _run(CHAIN64)
    names = {e.ELEMENT_NAME: e.name for e in p.elements}
    assert p.link_plan[names["vfconvertscale"]] == ("quad", "grid8")
    assert p.link_plan[names["vfvideofilter"]] == ("grid8", "packed32g8")
    assert any(v == "quad" for v in p._source_split.values())
    _assert_within_1lsb(CHAIN64)


def test_grid64_head_only_packed32g8_edge():
    desc = (
        "videotestsrc num-buffers=2 "
        "! video/x-raw,format=NV12,width=96,height=56 "
        "! vfmetalconvertscale ! video/x-raw,format=BGRA,"
        "width=384,height=224 ! appsink"
    )
    p = _run(desc)
    names = {e.ELEMENT_NAME: e.name for e in p.elements}
    assert p.link_plan[names["vfconvertscale"]] == ("quad", "packed32g8")
    _assert_within_1lsb(desc)


def test_grid64_420_out_packed420g8_edge():
    # format-preserving 4x upscale (the default fixation at 4x): the
    # head emits the 4:2:0 edge directly (convert.pack_420_grid64);
    # cross-4:2:0 outputs (NV12 -> I420) ride the same edge
    for infmt, outfmt in (("NV12", "NV12"), ("I420", "I420"),
                          ("NV12", "I420")):
        desc = ("videotestsrc num-buffers=2 pattern=ball "
                f"! video/x-raw,format={infmt},width=96,height=56 "
                f"! vfmetalconvertscale ! video/x-raw,format={outfmt},"
                "width=384,height=224 ! appsink")
        p = _run(desc)
        cs = next(e.name for e in p.elements
                  if e.ELEMENT_NAME == "vfconvertscale")
        assert p.link_plan[cs] == ("quad", "packed420g8"), (infmt, outfmt)
        _assert_within_1lsb(desc)


def test_pack_420_grid64_edge_layout():
    # y_g8 entry 2*qr+h packs row phase qr's col phases 4h..4h+3 one
    # byte per word; uv_g8 entry 2*ca+h bytes are NV12's interleaved uv
    # bytes for chroma cols 4c+2h, 4c+2h+1 — checked via the host
    # repack against the canonical interleave of per-phase bytes
    from tpuvf.core.frame import planes_to_host

    out_spec = FrameSpec(VideoFormat.NV12, 16, 16)
    rng = np.random.default_rng(11)
    yg = rng.integers(0, 2**32, (16, 2, 2), dtype=np.uint32)
    uvg = rng.integers(0, 2**32, (8, 2, 2), dtype=np.uint32)
    out = planes_to_host({"y_g8": yg, "uv_g8": uvg}, out_spec)
    y, uv = out["y"], out["uv"]
    yb = yg.view(np.uint8).reshape(16, 2, 2, 4)
    for qr in range(8):
        for c in range(2):
            for h in range(2):
                for j in range(4):
                    assert np.array_equal(y[qr::8, 8 * c + 4 * h + j],
                                          yb[2 * qr + h, :, c, j]), (qr, h)
    uvb = uvg.view(np.uint8).reshape(8, 2, 2, 4)
    for ca in range(4):
        for c in range(2):
            for h in range(2):
                for j in range(4):
                    assert np.array_equal(uv[ca::4, 8 * c + 4 * h + j],
                                          uvb[2 * ca + h, :, c, j]), (ca, h)


def test_grid64_420_edge_sp_composition():
    # packed420g8 keeps the grid64 plan under sp row sharding: aligned
    # heights directly, misaligned heights via the proportional pad
    # plan (which accepts grid64's ratio-4 height sets); bitwise vs
    # unsharded in both cases
    import jax

    from tpuvf.parallel.mesh import make_mesh

    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 devices")
    for w, h, sp in ((96, 128, 4),   # aligned: 16 phase rows / sp=4
                     (96, 64, 4)):   # misaligned: 8 phase rows -> pad
        desc = ("videotestsrc num-buffers=4 pattern=ball "
                f"! video/x-raw,format=NV12,width={w},height={h} "
                f"! vfmetalconvertscale ! video/x-raw,format=NV12,"
                f"width={4 * w},height={4 * h} ! appsink")
        p = _run(desc)
        cs = next(e.name for e in p.elements
                  if e.ELEMENT_NAME == "vfconvertscale")
        assert p.link_plan[cs] == ("quad", "packed420g8"), (h, sp)
        mesh = make_mesh({"dp": 1, "sp": sp})
        p.run_batched(4, batch_size=4, mesh=mesh, sp_axis="sp")
        assert p.link_plan[cs] == ("quad", "packed420g8"), (h, sp)
        ref = _run(desc)
        for fa, fb in zip(p.sinks[0].frames, ref.sinks[0].frames):
            for k in fa:
                np.testing.assert_array_equal(fa[k], fb[k], err_msg=str(h))


CHAIN36 = (
    "videotestsrc num-buffers=2 ! video/x-raw,format=NV12,width=96,height=48 "
    "! vfmetalconvertscale ! video/x-raw,format=BGRA,width=288,height=144 "
    "! vfmetalvideofilter brightness=0.1 contrast=1.2 saturation=1.3 "
    "! appsink"
)


def test_grid36_chain_negotiated_and_close():
    p = _run(CHAIN36)
    names = {e.ELEMENT_NAME: e.name for e in p.elements}
    assert p.link_plan[names["vfconvertscale"]] == ("quad", "grid6")
    assert p.link_plan[names["vfvideofilter"]] == ("grid6", "packed32g6")
    assert any(v == "quad" for v in p._source_split.values())
    _assert_within_1lsb(CHAIN36)


def test_grid36_head_only_and_sharpness():
    desc = ("videotestsrc num-buffers=2 "
            "! video/x-raw,format=NV12,width=96,height=48 "
            "! vfmetalconvertscale ! video/x-raw,format=BGRA,"
            "width=288,height=144 ! appsink")
    p = _run(desc)
    names = {e.ELEMENT_NAME: e.name for e in p.elements}
    assert p.link_plan[names["vfconvertscale"]] == ("quad", "packed32g6")
    _assert_within_1lsb(desc)
    # sharpness stays on grid36 (blur9_gridk period=6)
    desc2 = CHAIN36.replace("brightness=0.1", "brightness=0.1 sharpness=0.5")
    p2 = _run(desc2)
    names = {e.ELEMENT_NAME: e.name for e in p2.elements}
    assert p2.link_plan[names["vfvideofilter"]] == ("grid6", "packed32g6")
    _assert_within_1lsb(desc2)


def test_grid36_gates():
    from tpuvf.core.registry import make

    elem = make("vfconvertscale")
    in_spec = FrameSpec(VideoFormat.NV12, 96, 48)
    ok = FrameSpec(VideoFormat.BGRA, 288, 144, matrix=in_spec.matrix)
    assert elem.grid36_head_ok(in_spec, ok)
    # not 3x
    assert not elem.grid36_head_ok(
        in_spec, FrameSpec(VideoFormat.BGRA, 192, 96,
                           matrix=in_spec.matrix))
    # 4:2:0 outputs ride the packed420g6 sink edge (round 5)
    assert elem.grid36_head_ok(
        in_spec, FrameSpec(VideoFormat.NV12, 288, 144,
                           matrix=in_spec.matrix))
    # but not packed 4:2:2
    assert not elem.grid36_head_ok(
        in_spec, FrameSpec(VideoFormat.UYVY, 288, 144,
                           matrix=in_spec.matrix))
    # nearest method
    elem.set_property("method", 1)
    try:
        assert not elem.grid36_head_ok(in_spec, ok)
    finally:
        elem.set_property("method", 0)


def test_grid36_overlay_joins(tmp_path):
    from PIL import Image

    png = tmp_path / "ov.png"
    Image.new("RGBA", (20, 20), (0, 255, 0, 100)).save(png)
    desc = ("videotestsrc num-buffers=1 ! video/x-raw,format=NV12,"
            "width=96,height=48 ! vfmetalconvertscale "
            "! video/x-raw,format=BGRA,width=288,height=144 "
            "! vfmetalvideofilter brightness=0.1 "
            f"! vfmetaloverlay location={png} x=11 y=5 ! appsink")
    p = _run(desc)
    ov = next(e.name for e in p.elements if e.ELEMENT_NAME == "vfoverlay")
    assert p.link_plan[ov] == ("grid6", "packed32g6")
    _assert_within_1lsb(desc)


def test_grid36_720p_geometry_gate_passes():
    # the real 720p -> 4K geometry passes the dense-weight consistency
    # gate (stray 1e-15 epsilon taps on exact-integer phases are
    # dropped by the table derivation; see convert._phase_stencil_table)
    from tpuvf.kernels import convert as kconvert

    spec = FrameSpec(VideoFormat.NV12, 1280, 720)
    assert kconvert.can_grid36(spec, 3840, 2160)


def test_grid36_420_out_packed420g6_edge():
    # format-preserving 3x upscale (the default fixation at 3x): the
    # head emits the 4:2:0 edge directly (convert.pack_420_grid36);
    # cross-4:2:0 outputs (NV12 -> I420) ride the same edge
    for infmt, outfmt in (("NV12", "NV12"), ("I420", "I420"),
                          ("NV12", "I420")):
        desc = ("videotestsrc num-buffers=2 pattern=ball "
                f"! video/x-raw,format={infmt},width=96,height=48 "
                f"! vfmetalconvertscale ! video/x-raw,format={outfmt},"
                "width=288,height=144 ! appsink")
        p = _run(desc)
        cs = next(e.name for e in p.elements
                  if e.ELEMENT_NAME == "vfconvertscale")
        assert p.link_plan[cs] == ("quad", "packed420g6"), (infmt, outfmt)
        _assert_within_1lsb(desc)


def test_pack_420_grid36_edge_layout():
    # a_g6 entries 0-5: luma row phase qr's col phases 0-3 one byte per
    # u32 word; b_g6: col phases 4-5 per u16; entries 6-8: chroma row
    # phase ca, NV12-ordered uv bytes for chroma cols 3c+{0,1} (a) and
    # 3c+2 (b) — checked via the host repack against the canonical
    # per-phase byte interleave
    from tpuvf.core.frame import planes_to_host

    out_spec = FrameSpec(VideoFormat.NV12, 24, 24)
    rng = np.random.default_rng(13)
    ag = rng.integers(0, 2**32, (9, 4, 4), dtype=np.uint32)
    bg = rng.integers(0, 2**16, (9, 4, 4), dtype=np.uint16)
    out = planes_to_host({"a_g6": ag, "b_g6": bg}, out_spec)
    y, uv = out["y"], out["uv"]
    ab = ag.view(np.uint8).reshape(9, 4, 4, 4)
    bb = bg.view(np.uint8).reshape(9, 4, 4, 2)
    for qr in range(6):
        for c in range(4):
            for j in range(4):
                assert np.array_equal(y[qr::6, 6 * c + j],
                                      ab[qr, :, c, j]), (qr, c, j)
            for j in range(2):
                assert np.array_equal(y[qr::6, 6 * c + 4 + j],
                                      bb[qr, :, c, j]), (qr, c, j)
    for ca in range(3):
        for c in range(4):
            for j in range(4):
                assert np.array_equal(uv[ca::3, 6 * c + j],
                                      ab[6 + ca, :, c, j]), (ca, c, j)
            for j in range(2):
                assert np.array_equal(uv[ca::3, 6 * c + 4 + j],
                                      bb[6 + ca, :, c, j]), (ca, c, j)


def test_grid36_420_edge_sp_composition():
    # packed420g6 keeps the grid36 plan under sp row sharding; bitwise
    # vs unsharded (aligned and pad-plan heights)
    import jax

    from tpuvf.parallel.mesh import make_mesh

    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 devices")
    for w, h, sp in ((96, 96, 4),   # aligned: 48 phase rows / sp=4
                     (96, 48, 4)):  # misaligned: 24 phase rows -> pad
        desc = ("videotestsrc num-buffers=4 pattern=ball "
                f"! video/x-raw,format=NV12,width={w},height={h} "
                f"! vfmetalconvertscale ! video/x-raw,format=NV12,"
                f"width={3 * w},height={3 * h} ! appsink")
        p = _run(desc)
        cs = next(e.name for e in p.elements
                  if e.ELEMENT_NAME == "vfconvertscale")
        assert p.link_plan[cs] == ("quad", "packed420g6"), (h, sp)
        mesh = make_mesh({"dp": 1, "sp": sp})
        p.run_batched(4, batch_size=4, mesh=mesh, sp_axis="sp")
        assert p.link_plan[cs] == ("quad", "packed420g6"), (h, sp)
        ref = _run(desc)
        for fa, fb in zip(p.sinks[0].frames, ref.sinks[0].frames):
            for k in fa:
                np.testing.assert_array_equal(fa[k], fb[k], err_msg=str(h))


CHAIN9 = (
    "videotestsrc num-buffers=2 ! video/x-raw,format=NV12,width=96,height=48 "
    "! vfmetalconvertscale ! video/x-raw,format=BGRA,width=144,height=72 "
    "! vfmetalvideofilter brightness=0.1 contrast=1.2 saturation=1.3 "
    "! appsink"
)


def test_grid9_chain_negotiated_and_close():
    p = _run(CHAIN9)
    names = {e.ELEMENT_NAME: e.name for e in p.elements}
    assert p.link_plan[names["vfconvertscale"]] == ("quad", "grid3")
    assert p.link_plan[names["vfvideofilter"]] == ("grid3", "packed32g3")
    assert any(v == "quad" for v in p._source_split.values())
    _assert_within_1lsb(CHAIN9)


def test_grid9_head_only_and_sharpness():
    desc = ("videotestsrc num-buffers=2 "
            "! video/x-raw,format=NV12,width=96,height=48 "
            "! vfmetalconvertscale ! video/x-raw,format=BGRA,"
            "width=144,height=72 ! appsink")
    p = _run(desc)
    names = {e.ELEMENT_NAME: e.name for e in p.elements}
    assert p.link_plan[names["vfconvertscale"]] == ("quad", "packed32g3")
    _assert_within_1lsb(desc)
    # sharpness stays on grid9 (blur9_gridk period=3).  tol 2: the
    # sampler's 1-LSB knife-edge flips (1/6-weight sums contract
    # differently across program shapes) pass through the unsharp
    # mask's o + (o-bl)*amount TWICE — measured max 2 LSB at 0.012% of
    # pixels on CPU seeds; head-only is bitwise, so this is the
    # double-quantize amplification class, not a stencil bug
    desc2 = CHAIN9.replace("brightness=0.1", "brightness=0.1 sharpness=0.5")
    p2 = _run(desc2)
    names = {e.ELEMENT_NAME: e.name for e in p2.elements}
    assert p2.link_plan[names["vfvideofilter"]] == ("grid3", "packed32g3")
    _assert_within_1lsb(desc2, tol=2)


def test_grid9_gates():
    from tpuvf.core.registry import make

    elem = make("vfconvertscale")
    in_spec = FrameSpec(VideoFormat.NV12, 96, 48)
    ok = FrameSpec(VideoFormat.BGRA, 144, 72, matrix=in_spec.matrix)
    assert elem.grid9_head_ok(in_spec, ok)
    # not 1.5x
    assert not elem.grid9_head_ok(
        in_spec, FrameSpec(VideoFormat.BGRA, 192, 96,
                           matrix=in_spec.matrix))
    # 4:2:0 output: grid9 is RGB-out only (a 1.5x chroma output would
    # need lane-strided column-parity reads)
    assert not elem.grid9_head_ok(
        in_spec, FrameSpec(VideoFormat.NV12, 144, 72,
                           matrix=in_spec.matrix))
    # nearest method
    elem.set_property("method", 1)
    try:
        assert not elem.grid9_head_ok(in_spec, ok)
    finally:
        elem.set_property("method", 0)


def test_grid9_overlay_joins(tmp_path):
    from PIL import Image

    png = tmp_path / "ov.png"
    Image.new("RGBA", (20, 20), (0, 255, 0, 100)).save(png)
    desc = ("videotestsrc num-buffers=1 ! video/x-raw,format=NV12,"
            "width=96,height=48 ! vfmetalconvertscale "
            "! video/x-raw,format=BGRA,width=144,height=72 "
            "! vfmetalvideofilter brightness=0.1 "
            f"! vfmetaloverlay location={png} x=11 y=5 ! appsink")
    p = _run(desc)
    ov = next(e.name for e in p.elements if e.ELEMENT_NAME == "vfoverlay")
    assert p.link_plan[ov] == ("grid3", "packed32g3")
    _assert_within_1lsb(desc)


def test_grid9_720p_geometry_gate_passes():
    # the real 720p -> 1080p geometry passes the dense-weight
    # consistency gate
    from tpuvf.kernels import convert as kconvert

    spec = FrameSpec(VideoFormat.NV12, 1280, 720)
    assert kconvert.can_grid9(spec, 1920, 1080)


def test_grid9_sp_composition():
    # grid9 plans keep under sp row sharding when phase rows align;
    # bitwise vs unsharded
    import jax

    from tpuvf.parallel.mesh import make_mesh

    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 devices")
    # aligned: out 144 -> 48 phase rows / sp=4; misaligned: sp=3 leaves
    # the input's 96/3 = 32 phase rows unsplit -> the HALF-INTEGER-ratio
    # pad plan (round 5: heights {h, 1.5h} carry m = 2h/h1 in {2, 3})
    for w, h, sp in ((96, 96, 4), (96, 96, 3)):
        desc = ("videotestsrc num-buffers=4 pattern=ball "
                f"! video/x-raw,format=NV12,width={w},height={h} "
                f"! vfmetalconvertscale ! video/x-raw,format=BGRA,"
                f"width={3 * w // 2},height={3 * h // 2} ! appsink")
        p = _run(desc)
        cs = next(e.name for e in p.elements
                  if e.ELEMENT_NAME == "vfconvertscale")
        assert p.link_plan[cs] == ("quad", "packed32g3"), (h, sp)
        mesh = make_mesh({"dp": 1, "sp": sp})
        p.run_batched(4, batch_size=4, mesh=mesh, sp_axis="sp")
        assert p.link_plan[cs] == ("quad", "packed32g3"), (h, sp)
        ref = _run(desc)
        for fa, fb in zip(_frames(p), _frames(ref)):
            for k in fa:
                np.testing.assert_array_equal(fa[k], fb[k],
                                              err_msg=str((h, sp)))


def test_grid_head_behind_quad_mids():
    # round 5: quad-capable identity stages (deinterlace, filter) before
    # a grid upscale head ride quad links; the head reads the quad
    # boundary (same contract as the provisioned source planes).
    # Bitwise on these seeds.
    cases = (
        # deinterlace then 2x upscale -> grid16 head
        ("videotestsrc num-buffers=3 ! video/x-raw,format=NV12,"
         "width=96,height=64,interlace-mode=interleaved "
         "! vfmetaldeinterlace method=greedyh ! vfmetalconvertscale "
         "! video/x-raw,format=BGRA,width=192,height=128 ! appsink",
         "vfdeinterlace", ("quad", "quad"),
         "vfconvertscale", ("quad", "packed32g")),
        # NV12 filter then 4x upscale -> grid64 head, packed420g8 edge
        ("videotestsrc num-buffers=2 ! video/x-raw,format=NV12,"
         "width=96,height=64 "
         "! vfmetalvideofilter brightness=0.1 ! vfmetalconvertscale "
         "! video/x-raw,format=NV12,width=384,height=256 ! appsink",
         "vfvideofilter", ("quad", "quad"),
         "vfconvertscale", ("quad", "packed420g8")),
        # deinterlace then 1.5x upscale -> grid9 head (round 5)
        ("videotestsrc num-buffers=3 ! video/x-raw,format=NV12,"
         "width=96,height=64,interlace-mode=interleaved "
         "! vfmetaldeinterlace method=linear ! vfmetalconvertscale "
         "! video/x-raw,format=BGRA,width=144,height=96 ! appsink",
         "vfdeinterlace", ("quad", "quad"),
         "vfconvertscale", ("quad", "packed32g3")),
        # NV12 filter then 3x upscale -> grid36 head, packed420g6 edge
        ("videotestsrc num-buffers=2 ! video/x-raw,format=NV12,"
         "width=96,height=64 "
         "! vfmetalvideofilter brightness=0.1 ! vfmetalconvertscale "
         "! video/x-raw,format=NV12,width=288,height=192 ! appsink",
         "vfvideofilter", ("quad", "quad"),
         "vfconvertscale", ("quad", "packed420g6")),
    )
    for desc, mid, mid_plan, head, head_plan in cases:
        p = _run(desc)
        names = {e.ELEMENT_NAME: e.name for e in p.elements}
        assert p.link_plan[names[mid]] == mid_plan, desc
        assert p.link_plan[names[head]] == head_plan, desc
        assert any(v == "quad" for v in p._source_split.values())
        _assert_within_1lsb(desc)


def test_overlay_joins_grid64(tmp_path):
    # an ACTIVE overlay slices its rect by (row mod 8, col mod 8)
    # host-side and blends per phase (Overlay._make_process_grid
    # period=8); odd rect origins exercise the mod-8 span math
    from PIL import Image

    png = tmp_path / "ov.png"
    Image.new("RGBA", (24, 24), (255, 0, 0, 128)).save(png)
    for pos in ("x=13 y=7", "relative-x=0.3 relative-y=0.4"):
        desc = ("videotestsrc num-buffers=1 ! video/x-raw,format=NV12,"
                "width=96,height=56 ! vfmetalconvertscale "
                "! video/x-raw,format=BGRA,width=384,height=224 "
                "! vfmetalvideofilter brightness=0.1 "
                f"! vfmetaloverlay location={png} {pos} ! appsink")
        p = _run(desc)
        ov = next(e.name for e in p.elements
                  if e.ELEMENT_NAME == "vfoverlay")
        assert p.link_plan[ov] == ("grid8", "packed32g8"), pos
        _assert_within_1lsb(desc)


def test_grid64_sharpness_stays_on_grid():
    # round 5: blur9 decomposes into mod-8 cross-phase stencils
    # (kfilter.blur9_gridk period=8), so sharpened 4x chains KEEP the
    # grid64 plan and still match the canonical run
    for sharp in ("0.5", "-0.4"):
        desc = CHAIN64.replace("brightness=0.1",
                               f"brightness=0.1 sharpness={sharp}")
        p = _run(desc)
        names = {e.ELEMENT_NAME: e.name for e in p.elements}
        assert p.link_plan[names["vfvideofilter"]] == (
            "grid8", "packed32g8"), sharp
        _assert_within_1lsb(desc)


def test_blur9_gridk8_bitwise_vs_blur9():
    # the mod-8 decomposition is expression-exact vs the interleaved
    # 9-tap blur on both axes, including the cross-phase edge clamps
    from tpuvf.kernels import filter as kfilter

    rng = np.random.default_rng(7)
    img = rng.random((1, 40, 64), dtype=np.float32)
    for axis in (-1, -2):
        ref = np.asarray(kfilter.blur9(jnp.asarray(img), axis))
        n = img.shape[axis]
        if axis == -1:
            phases = [jnp.asarray(img[..., p::8]) for p in range(8)]
        else:
            phases = [jnp.asarray(img[..., p::8, :]) for p in range(8)]
        out = kfilter.blur9_gridk(phases, axis, 8)
        for p in range(8):
            got = np.asarray(out[p])
            want = ref[..., p::8] if axis == -1 else ref[..., p::8, :]
            np.testing.assert_array_equal(got, want, err_msg=f"{axis}/{p}")


def test_grid64_all_pointwise_gates_close():
    desc = CHAIN64.replace(
        "brightness=0.1 contrast=1.2 saturation=1.3",
        "brightness=0.05 contrast=1.1 saturation=1.2 hue=0.2 gamma=1.2 "
        "sepia=0.4 vignette=0.3 noise=0.05 chroma-key-enabled=true")
    p = _run(desc)
    names = {e.ELEMENT_NAME: e.name for e in p.elements}
    assert p.link_plan[names["vfvideofilter"]] == ("grid8", "packed32g8")
    _assert_within_1lsb(desc)


def test_sp_keeps_grid64_bitwise():
    # grid64 x sp: h_in=64 -> 32 quad phase rows, out 256 -> 32 grid8
    # phase rows — both split evenly over sp=2 with >= 4 rows/shard, so
    # the grid64 plan stays under row sharding; the stencils ride the
    # same shift_rows_cross_phase halo machinery as grid16 (sp-only
    # meshes preserve the batch shape -> bitwise vs unsharded batched)
    import jax

    from tpuvf.parallel.mesh import make_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    desc = CHAIN64.replace("height=56", "height=64").replace(
        "height=224", "height=256")
    plain = _run(desc)
    assert any(m[1] in ("grid8", "packed32g8")
               for m in plain.link_plan.values())
    p = parse_pipeline(desc)
    p.negotiate()
    p.build()
    plain2 = parse_pipeline(desc)
    plain2.negotiate()
    plain2.build()
    plain2.run_batched(2, batch_size=2)
    mesh = make_mesh({"dp": 1, "sp": 2})
    p.run_batched(2, batch_size=2, mesh=mesh, sp_axis="sp")
    assert any(m[1] in ("grid8", "packed32g8")
               for m in p.link_plan.values())
    for a, b in zip(p.sinks[0].frames, plain2.sinks[0].frames):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
