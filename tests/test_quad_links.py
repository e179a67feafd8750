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


def test_sp_aligned_keeps_quad():
    # round 4: quad links COMPOSE with row shards when the phase rows
    # split evenly (a phase-plane row shard is a contiguous frame band;
    # cross-row-phase stencils exchange spctx halos).  h=108 -> 54 phase
    # rows, sp=2 -> 27/shard: the plan must STAY quad and the output must
    # match the unsharded quad run within the documented 1-LSB
    # program-shape tolerance.
    import jax

    from tpuvf.parallel.mesh import make_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    p = _run(CHAIN_RGB)
    assert any(v == "quad" for v in p._source_split.values())
    ref = [np.asarray(f) for f in p.sinks[0].frames]
    mesh = make_mesh({"dp": 1, "sp": 2})
    p.run_batched(2, batch_size=2, mesh=mesh, sp_axis="sp")
    assert any(v == "quad" for v in p._source_split.values())
    assert any(m[1] in ("quad", "packed32q", "packed16q")
               for m in p.link_plan.values())
    got = [np.asarray(f) for f in p.sinks[0].frames[-2:]]
    for a, b in zip(got, ref):
        d = np.abs(a.astype(np.int32) - b.astype(np.int32))
        assert d.max() <= 1, int(d.max())
        assert (d > 0).mean() < 0.005, float((d > 0).mean())


def test_sp_misaligned_keeps_quad_via_row_padding():
    # h=24 -> 12 phase rows over sp=4 gives 3 phase rows/shard — below
    # the 4-row phase-halo floor.  Round 5 (VERDICT r4 item 2): instead
    # of falling back to the column-split plan, a pure phase-link chain
    # bottom-pads every sharded plane's rows proportionally
    # (Pipeline._sp_pad_plan) and KEEPS the quad links; outputs stay
    # bitwise vs the unsharded batched run (sp-only meshes preserve the
    # batch shape).
    import jax

    from tpuvf.parallel.mesh import make_mesh

    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 devices")
    desc = CHAIN_RGB.replace("height=108", "height=24")
    p = _run(desc)
    assert any(v == "quad" for v in p._source_split.values())

    plain = parse_pipeline(desc)
    plain.negotiate()
    plain.build()
    plain.run_batched(2, batch_size=2)

    mesh = make_mesh({"dp": 1, "sp": 4})
    p2 = parse_pipeline(desc)
    p2.negotiate()
    p2.build()
    p2.run_batched(2, batch_size=2, mesh=mesh, sp_axis="sp")
    # the quad plan survived (no column-split rebuild), via row padding
    assert any(v == "quad" for v in p2._source_split.values())
    assert p2._sp_row_pad is not None
    assert len(p2.sinks[0].frames) == len(plain.sinks[0].frames)
    for fa, fb in zip(p2.sinks[0].frames, plain.sinks[0].frames):
        if not isinstance(fa, dict):
            fa, fb = {"rgba": fa}, {"rgba": fb}
        assert fa.keys() == fb.keys()
        for k in fa:
            np.testing.assert_array_equal(np.asarray(fa[k]),
                                          np.asarray(fb[k]), err_msg=k)


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
    # (w_q stacks the phases on a leading axis: one scan output, so the
    # lax.scan stack stays in place — see pack_rgba_quad's docstring)
    out = convert.pack_rgba_quad(chans, VideoFormat.BGRA, 0,
                                 mode="packed32q", unit_range=True)
    wq = np.asarray(out["w_q"])
    assert wq.shape == (4, 8, 16)
    for i, ph in enumerate(convert.QUAD_PHASES):
        ref = np.asarray(convert.pack_words_u32(
            tuple(jnp.round(c * 255.0).astype(jnp.uint8)
                  for c in chans[ph]),
            VideoFormat.BGRA))
        np.testing.assert_array_equal(wq[i], ref, ph)


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


# -- deinterlace: fields ARE row phases (round 3d) ---------------------------


@pytest.mark.parametrize("method", ["bob", "weave", "linear", "greedyh"])
def test_quad_deinterlace_bit_exact(method):
    desc = (f"videotestsrc num-buffers=3 pattern=ball "
            "! video/x-raw,format=I420,width=96,height=48,"
            "interlace-mode=interleaved "
            f"! vfmetaldeinterlace method={method} motion-threshold=0.3 "
            "! appsink")
    p = _run(desc)
    name = next(e.name for e in p.elements
                if e.ELEMENT_NAME == "vfdeinterlace")
    assert p.link_plan[name] == ("quad", "packed16q")
    _assert_bit_exact(desc)


def test_quad_deinterlace_in_chain_bit_exact():
    # stateful quad boundary mid-chain: deinterlace ! videofilter, RGB edge
    _assert_bit_exact(
        "videotestsrc num-buffers=3 pattern=smpte "
        "! video/x-raw,format=NV12,width=128,height=64,"
        "interlace-mode=interleaved "
        "! vfmetaldeinterlace method=greedyh "
        "! vfmetalvideofilter contrast=1.2 vignette=0.3 ! appsink")


def test_quad_deinterlace_fast_variant_selected():
    # a steady stream runs the baked-field-order fast body every frame
    p = parse_pipeline(
        "videotestsrc num-buffers=3 "
        "! video/x-raw,format=I420,width=64,height=32,"
        "interlace-mode=interleaved "
        "! vfmetaldeinterlace method=greedyh ! appsink")
    p.negotiate(); p.build()
    picks = []
    orig = p._variant_step
    p._variant_step = lambda names: (picks.append(set(names)), orig(names))[1]
    p.run()
    name = next(e.name for e in p.elements
                if e.ELEMENT_NAME == "vfdeinterlace")
    assert picks and all(name in s for s in picks)


def test_quad_deinterlace_mid_stream_tff_flip():
    """A flipped buffer falls back to the general (traced-TFF) body and
    still deinterlaces with ITS field order; steady buffers run fast."""
    from tpuvf.core.spec import FrameSpec as FS

    w, h = 32, 16
    spec = FS(VideoFormat.I420, w, h, interlaced=True)
    rng = np.random.default_rng(11)

    def host():
        return {"y": rng.integers(0, 256, (h, w), np.uint8),
                "u": rng.integers(0, 256, (h // 2, w // 2), np.uint8),
                "v": rng.integers(0, 256, (h // 2, w // 2), np.uint8)}

    hosts = [host() for _ in range(3)]
    tffs = [True, False, True]

    def run_stream(layout=None):
        sel = " field-layout=" + layout if layout else ""
        p = parse_pipeline(
            f"appsrc format=I420 width={w} height={h} "
            f"! video/x-raw,interlace-mode=interleaved "
            f"! vfmetaldeinterlace method=bob{sel} ! appsink")
        return p

    p = run_stream()
    for hf, tf in zip(hosts, tffs):
        p.sources[0].push(hf, tff=tf)
    p.sources[0].end_of_stream()
    p.negotiate(); p.build(); p.run()
    name = next(e.name for e in p.elements
                if e.ELEMENT_NAME == "vfdeinterlace")
    assert p.link_plan[name] == ("quad", "packed16q")
    frames = p.sinks[0].frames
    assert len(frames) == 3

    def forced(hf, layout):
        q = run_stream(layout)
        q.sources[0].push(hf)
        q.sources[0].end_of_stream()
        q.negotiate(); q.build(); q.run()
        return q.sinks[0].frames[0]

    for i, (hf, tf) in enumerate(zip(hosts, tffs)):
        layout = "top-field-first" if tf else "bottom-field-first"
        want = forced(hf, layout)
        for k in want:
            np.testing.assert_array_equal(
                np.asarray(frames[i][k]), np.asarray(want[k]),
                err_msg=f"frame {i} tff={tf} {k}")
    # the two field orders genuinely differ on this data
    a = forced(hosts[1], "top-field-first")
    b = forced(hosts[1], "bottom-field-first")
    assert any((np.asarray(a[k]) != np.asarray(b[k])).any() for k in a)


# -- overlay: rect quad slices (round 3d) ------------------------------------


def _overlay_png(tmp_path):
    from tpuvf.io import png as pngio

    img = np.zeros((20, 24, 4), np.uint8)
    img[..., 1] = 200
    img[..., 3] = 150
    path = str(tmp_path / "quad-ov.png")
    pngio.write(path, img)
    return path


@pytest.mark.parametrize("x,y", [(5, 7), (0, 0), (11, 3)])
def test_quad_overlay_420_edge(tmp_path, x, y):
    """4:2:0 overlay chains negotiate quad; the output matches canonical
    within the repo's 1-LSB layout tolerance — chroma boxes straddling the
    rect's row edge mix blended and unblended pixels whose sub-ulp FMA
    contraction differs between program shapes (CLAUDE.md cross-program
    -shape chaos); luma and fully-inside/outside boxes are bitwise."""
    ov = _overlay_png(tmp_path)
    desc = ("videotestsrc num-buffers=2 pattern=smpte "
            "! video/x-raw,format=NV12,width=96,height=48 "
            f"! vfmetaloverlay location={ov} x={x} y={y} alpha=0.6 "
            "! vfmetalvideofilter brightness=0.1 ! appsink")
    p = _run(desc)
    name = next(e.name for e in p.elements if e.ELEMENT_NAME == "vfoverlay")
    assert p.link_plan[name] == ("quad", "quad")
    plain = _run(desc, disable_links=True)
    for fa, fb in zip(_frames(p), _frames(plain)):
        for k in fa:
            d = np.abs(np.asarray(fa[k]).astype(np.int32)
                       - np.asarray(fb[k]).astype(np.int32))
            assert d.max() <= 1, k
            assert (d > 0).mean() < 1e-2, k
        np.testing.assert_array_equal(np.asarray(fa["y"]),
                                      np.asarray(fb["y"]))


def test_quad_overlay_rgb_edge_bit_exact(tmp_path):
    ov = _overlay_png(tmp_path)
    desc = ("videotestsrc num-buffers=2 "
            "! video/x-raw,format=NV12,width=64,height=32 "
            "! vfmetalconvertscale ! video/x-raw,format=BGRA "
            f"! vfmetaloverlay location={ov} x=3 y=5 ! appsink")
    p = _run(desc)
    name = next(e.name for e in p.elements if e.ELEMENT_NAME == "vfoverlay")
    assert p.link_plan[name] == ("quad", "packed32q")
    _assert_bit_exact(desc)


@pytest.mark.parametrize("sharp", [0.7, -0.5])
def test_quad_sharpness_bit_exact(sharp):
    # blur9_h_split per row phase + blur9_v_split per column phase, RGBA8
    # boundaries between passes — bit-exact incl. cross-phase edge clamps
    desc = (f"videotestsrc num-buffers=2 pattern=smpte "
            "! video/x-raw,format=NV12,width=96,height=48 "
            f"! vfmetalvideofilter sharpness={sharp} contrast=1.2 "
            "! appsink")
    p = _run(desc)
    vf = next(e.name for e in p.elements if e.ELEMENT_NAME == "vfvideofilter")
    assert p.link_plan[vf] == ("quad", "packed16q")
    _assert_bit_exact(desc)


def test_blur9_v_split_matches_full():
    import jax.numpy as jnp

    from tpuvf.kernels import filter as kf

    rng = np.random.default_rng(2)
    for h, w in ((16, 24), (6, 10)):
        img = rng.random((h, w)).astype(np.float32)
        full = np.asarray(kf.blur9(jnp.asarray(img), axis=-2))
        be, bo = kf.blur9_v_split(jnp.asarray(img[0::2]),
                                  jnp.asarray(img[1::2]))
        got = np.empty_like(img)
        got[0::2], got[1::2] = np.asarray(be), np.asarray(bo)
        np.testing.assert_array_equal(got, full, err_msg=f"{h}x{w}")
