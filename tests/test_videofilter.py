"""vfvideofilter tests: schema, passthrough, golden parity, LUT, blur.

Ports the shape of tests/test-videofilter.sh and adds the golden-frame
numeric assertions the reference lacks.
"""

import numpy as np
import pytest

from tests.oracle import filter_ref, metal_ref
from tests.util import assert_planes_close, random_host_frame

from tpuvf.cli.launch import launch, parse_pipeline
from tpuvf.core.frame import host_to_planes
from tpuvf.core.formats import VideoFormat
from tpuvf.core.registry import lookup
from tpuvf.core.spec import FrameSpec
from tpuvf.io import lut as lutio, png

RNG = np.random.default_rng(7)


# -- schema checks (the gst-inspect greps, test-videofilter.sh:82-97) -------

def test_property_schema():
    cls = lookup("vfmetalvideofilter")
    names = {d.name for d in cls.PROPERTIES}
    expected = {
        "brightness", "contrast", "saturation", "hue", "gamma", "sharpness",
        "sepia", "invert", "noise", "vignette", "chroma-key-enabled",
        "chroma-key-color", "chroma-key-tolerance", "chroma-key-smoothness",
        "lut-file",
    }
    assert expected <= names
    by_name = {d.name: d for d in cls.PROPERTIES}
    assert by_name["brightness"].minimum == -1.0
    assert by_name["brightness"].maximum == 1.0
    assert by_name["contrast"].default == 1.0
    assert by_name["gamma"].minimum == 0.01
    assert by_name["chroma-key-color"].default == 0xFF00FF00
    assert by_name["chroma-key-tolerance"].default == 0.2
    assert by_name["brightness"].controllable


# -- passthrough (m:114-138) ------------------------------------------------

def test_passthrough_at_defaults():
    pipe = parse_pipeline(
        "videotestsrc num-buffers=1 ! video/x-raw,format=RGBA,width=32,height=24 "
        "! vfmetalvideofilter ! appsink"
    )
    pipe.negotiate()
    pipe.build()
    # filter must be elided
    active = [s.element.ELEMENT_NAME for s in pipe._stages if not s.passthrough]
    assert "vfvideofilter" not in active
    pipe.run()
    src_host = pipe.sources[0].generate(0, FrameSpec(VideoFormat.RGBA, 32, 24))
    np.testing.assert_array_equal(pipe.sinks[0].frames[0], src_host)


def test_not_passthrough_when_prop_set():
    pipe = parse_pipeline(
        "videotestsrc num-buffers=1 ! video/x-raw,format=RGBA,width=32,height=24 "
        "! vfmetalvideofilter brightness=0.2 ! appsink"
    )
    pipe.negotiate()
    pipe.build()
    active = [s.element.ELEMENT_NAME for s in pipe._stages if not s.passthrough]
    assert "vfvideofilter" in active


# -- golden parity ----------------------------------------------------------

def _run_filter(fmt: str, w: int, h: int, props: dict, host=None, lut_file=None,
                frames: int = 1):
    """Run the element on one random frame; return (got_planes, in_planes)."""
    spec = FrameSpec(VideoFormat(fmt), w, h)
    host = random_host_frame(RNG, spec) if host is None else host
    in_planes = host_to_planes(host, spec)

    from tpuvf.core.registry import make
    import jax.numpy as jnp

    elem = make("vfvideofilter")
    for k, v in props.items():
        elem.set_property(k, v)
    if lut_file:
        elem.set_property("lut-file", lut_file)
    static = elem.static_config(spec, spec)
    proc = elem.make_process(spec, spec, static)
    state = elem.init_state(spec, spec)
    dev = {k: jnp.asarray(v) for k, v in in_planes.items()}
    out = None
    for _ in range(frames):
        out, state = proc(dev, state, elem.traced_params())
    return {k: np.asarray(v) for k, v in out.items()}, in_planes, elem


def _oracle_filter(in_planes, fmt, w, h, uniforms, frame_index=0, lut=None,
                   sharpness=0.0):
    spec = FrameSpec(VideoFormat(fmt), w, h)
    rgba = metal_ref.sample_rgba(in_planes, fmt, spec.matrix_index, w, h)
    tx = (np.arange(w, dtype=np.float32) + 0.5) / w
    ty = (np.arange(h, dtype=np.float32) + 0.5) / h
    tc = np.stack(np.broadcast_arrays(tx[None, :], ty[:, None]), -1)
    rgba = filter_ref.apply_color_adjustments(rgba, uniforms, tc, frame_index)
    if lut is not None:
        rgba = filter_ref.apply_lut(rgba, lut, lut.shape[0])
    q1 = metal_ref.quant(rgba)
    final = q1
    if abs(sharpness) > 0.001:
        bh = metal_ref.quant(filter_ref.blur_axis(metal_ref.dequant(q1), 1))
        bv = metal_ref.quant(filter_ref.blur_axis(metal_ref.dequant(bh), 0))
        final = metal_ref.quant(
            filter_ref.unsharp(
                metal_ref.dequant(q1), metal_ref.dequant(bv), sharpness
            )
        )
    return metal_ref.pack_rgba(final.transpose(2, 0, 1), fmt, spec.matrix_index)


DEFAULT_U = dict(
    brightness=0.0, contrast=1.0, saturation=1.0, hue=0.0, gamma=1.0,
    sepia=0.0, invert=False, chroma_key_enabled=False,
    key_r=0.0, key_g=1.0, key_b=0.0, key_tolerance=0.2, key_smoothness=0.1,
    vignette=0.0, noise=0.0,
)


CASES = [
    ("brightness", {"brightness": 0.3}, {"brightness": 0.3}),
    ("contrast", {"contrast": 1.5}, {"contrast": 1.5}),
    ("saturation", {"saturation": 0.25}, {"saturation": 0.25}),
    ("hue", {"hue": 0.25}, {"hue": 0.25 * np.pi}),
    ("gamma", {"gamma": 2.2}, {"gamma": 2.2}),
    ("sepia", {"sepia": 0.8}, {"sepia": 0.8}),
    ("invert", {"invert": True}, {"invert": True}),
    ("vignette", {"vignette": 0.7}, {"vignette": 0.7}),
    ("noise", {"noise": 0.5}, {"noise": 0.5}),
    ("chromakey", {"chroma-key-enabled": True, "chroma-key-color": 0xFF11AA33,
                   "chroma-key-tolerance": 0.3, "chroma-key-smoothness": 0.2},
     {"chroma_key_enabled": True, "key_r": 0x11 / 255.0, "key_g": 0xAA / 255.0,
      "key_b": 0x33 / 255.0, "key_tolerance": 0.3, "key_smoothness": 0.2}),
    ("combo", {"brightness": -0.1, "contrast": 1.3, "saturation": 1.4,
               "hue": -0.2, "gamma": 0.8, "sepia": 0.3, "vignette": 0.4},
     {"brightness": -0.1, "contrast": 1.3, "saturation": 1.4,
      "hue": -0.2 * np.pi, "gamma": 0.8, "sepia": 0.3, "vignette": 0.4}),
]


@pytest.mark.parametrize("fmt", ["RGBA", "NV12"])
@pytest.mark.parametrize("name,props,uvals", CASES, ids=[c[0] for c in CASES])
def test_golden_adjustments(fmt, name, props, uvals):
    w, h = 48, 32
    got, in_planes, _ = _run_filter(fmt, w, h, props)
    u = dict(DEFAULT_U)
    u.update(uvals)
    want = _oracle_filter(in_planes, fmt, w, h, u)
    assert_planes_close(got, want, tol=2, context=f"filter {name} {fmt}")


@pytest.mark.parametrize("sharp", [0.8, -0.6])
def test_golden_sharpness(sharp):
    w, h = 48, 32
    got, in_planes, _ = _run_filter("RGBA", w, h, {"sharpness": sharp})
    want = _oracle_filter(in_planes, "RGBA", w, h, dict(DEFAULT_U),
                          sharpness=sharp)
    assert_planes_close(got, want, tol=2, context=f"sharpness {sharp}")


def test_grain_changes_per_frame():
    w, h = 32, 32
    spec = FrameSpec(VideoFormat.RGBA, w, h)
    host = random_host_frame(RNG, spec)
    got1, in_planes, elem = _run_filter("RGBA", w, h, {"noise": 0.8}, host=host)
    # run 2 frames: second frame's grain must differ
    got2, _, _ = _run_filter("RGBA", w, h, {"noise": 0.8}, host=host, frames=2)
    assert (got1["rgba"] != got2["rgba"]).any()
    # and frame 1 matches oracle with frame_index=1
    u = dict(DEFAULT_U, noise=0.8)
    want2 = _oracle_filter(in_planes, "RGBA", w, h, u, frame_index=1)
    assert_planes_close(got2, want2, tol=2, context="grain frame 1")


# -- LUT --------------------------------------------------------------------

def _write_cube(path, size, fn):
    with open(path, "w") as fh:
        fh.write("TITLE \"test\"\nLUT_3D_SIZE %d\n" % size)
        fh.write("DOMAIN_MIN 0 0 0\nDOMAIN_MAX 1 1 1\n")
        for b in range(size):
            for g in range(size):
                for r in range(size):
                    rr, gg, bb = fn(r / (size - 1), g / (size - 1), b / (size - 1))
                    fh.write(f"{rr:.6f} {gg:.6f} {bb:.6f}\n")


def test_cube_lut_identity(tmp_path):
    p = str(tmp_path / "id.cube")
    _write_cube(p, 17, lambda r, g, b: (r, g, b))
    table = lutio.load(p)
    assert table.shape == (17, 17, 17, 3)
    w, h = 32, 24
    got, in_planes, _ = _run_filter("RGBA", w, h, {}, lut_file=p)
    # identity LUT ~= passthrough within interpolation rounding
    want = _oracle_filter(in_planes, "RGBA", w, h, dict(DEFAULT_U), lut=table)
    assert_planes_close(got, want, tol=2, context="cube identity")


def test_cube_lut_transform(tmp_path):
    p = str(tmp_path / "swap.cube")
    _write_cube(p, 9, lambda r, g, b: (b, r, g))
    table = lutio.load(p)
    w, h = 32, 24
    got, in_planes, _ = _run_filter("NV12", w, h, {"contrast": 1.2}, lut_file=p)
    u = dict(DEFAULT_U, contrast=1.2)
    want = _oracle_filter(in_planes, "NV12", w, h, u, lut=table)
    assert_planes_close(got, want, tol=2, context="cube swap")


def test_png_lut(tmp_path):
    # build an 8x8x8 grid LUT PNG (64x8: 8 slices horizontally)
    size = 8
    img = np.zeros((size, size * size, 4), np.uint8)
    for b in range(size):
        for g in range(size):
            for r in range(size):
                img[g, b * size + r] = (
                    int(r * 255 / (size - 1)),
                    int(g * 255 / (size - 1)),
                    int(b * 255 / (size - 1)),
                    255,
                )
    p = str(tmp_path / "lut.png")
    png.write(p, img)
    table = lutio.load(p)
    assert table.shape == (size, size, size, 3)
    # approximate identity
    assert abs(table[7, 0, 0][2] - 1.0) < 0.01
    assert abs(table[0, 0, 7][0] - 1.0) < 0.01


def test_bcs_fold_matches_sequential(monkeypatch):
    """The brightness/contrast/saturation affine fold (round 4) vs the
    sequential stage chain (TPUVF_NO_BCS_FOLD): the same mathematical
    map with different float association — <= 1 LSB on quantization
    knife edges, and EXACT at passthrough coefficients (the folded
    scalars degenerate to multiply-by-1/add-0)."""
    rng = np.random.default_rng(7)
    monkeypatch.delenv("TPUVF_NO_BCS_FOLD", raising=False)
    for trial in range(6):
        props = {
            "brightness": float(rng.uniform(-0.5, 0.5)),
            "contrast": float(rng.uniform(0.2, 2.0)),
            "saturation": float(rng.uniform(0.0, 2.0)),
        }
        spec = FrameSpec(VideoFormat.RGBA, 64, 48)
        host = random_host_frame(rng, spec)
        monkeypatch.delenv("TPUVF_NO_BCS_FOLD", raising=False)
        got, _, _ = _run_filter("RGBA", 64, 48, props, host=host)
        monkeypatch.setenv("TPUVF_NO_BCS_FOLD", "1")
        want, _, _ = _run_filter("RGBA", 64, 48, props, host=host)
        monkeypatch.delenv("TPUVF_NO_BCS_FOLD", raising=False)
        for k in want:
            d = np.abs(got[k].astype(np.int16) - want[k].astype(np.int16))
            assert d.max() <= 1, (trial, props, k, d.max())

    # passthrough coefficients: bitwise
    props = {"brightness": 0.0, "contrast": 1.0, "saturation": 1.0,
             "vignette": 0.3}  # vignette keeps the element non-elided
    spec = FrameSpec(VideoFormat.RGBA, 64, 48)
    host = random_host_frame(rng, spec)
    got, _, _ = _run_filter("RGBA", 64, 48, props, host=host)
    monkeypatch.setenv("TPUVF_NO_BCS_FOLD", "1")
    want, _, _ = _run_filter("RGBA", 64, 48, props, host=host)
    for k in want:
        np.testing.assert_array_equal(got[k], want[k], err_msg=k)


def test_lut_f32_exactness_knob(tmp_path, monkeypatch):
    # TPUVF_LUT_F32=1 keeps the corner table f32 (exact vs the reference's
    # RGBA32Float storage); default packs in-range tables to u8 fixed point
    # (<=0.5/255 per corner, inside the 2-LSB parity budget)
    from tpuvf.core.registry import make

    p = str(tmp_path / "t.cube")
    _write_cube(p, 9, lambda r, g, b: (b, r, g))
    vf = make("vfvideofilter")
    vf.set_property("lut-file", p)
    assert vf._lut.dtype == np.uint8
    monkeypatch.setenv("TPUVF_LUT_F32", "1")
    vf2 = make("vfvideofilter")
    vf2.set_property("lut-file", p)
    assert vf2._lut.dtype == np.float32


def test_bad_lut_is_soft_failure(tmp_path):
    p = str(tmp_path / "bad.cube")
    with open(p, "w") as fh:
        fh.write("LUT_3D_SIZE 900\n")
    # missing/bad LUT warns and stays passthrough (m:127-131, overlay-style)
    assert launch(
        "videotestsrc num-buffers=1 ! video/x-raw,format=RGBA,width=32,height=24 "
        f"! vfmetalvideofilter lut-file={p} ! fakesink",
        quiet=True,
    ) == 1


# -- pipeline smoke (ported test-videofilter.sh cases) ----------------------

@pytest.mark.parametrize("fmt", ["BGRA", "RGBA", "NV12", "I420"])
def test_smoke_formats(fmt):
    assert launch(
        f"videotestsrc num-buffers=2 ! video/x-raw,format={fmt},width=64,height=48 "
        "! vfmetalvideofilter brightness=0.1 contrast=1.2 ! fakesink",
        quiet=True,
    ) == 2


def test_smoke_chain_with_convertscale():
    assert launch(
        "videotestsrc num-buffers=2 ! video/x-raw,format=NV12,width=64,height=48 "
        "! vfmetalvideofilter saturation=1.5 ! vfmetalconvertscale "
        "! video/x-raw,format=BGRA,width=32,height=24 ! fakesink",
        quiet=True,
    ) == 2


def test_tiny_frame_160x120():
    assert launch(
        "videotestsrc num-buffers=2 ! video/x-raw,format=NV12,width=160,height=120 "
        "! vfmetalvideofilter brightness=0.2 sharpness=0.5 ! fakesink",
        quiet=True) == 2


# -- randomized property-combination parity fuzz ----------------------------

@pytest.mark.parametrize("seed", range(20))
def test_golden_random_prop_combos(seed):
    """Random prop subsets at random in-range values vs the oracle — the
    per-prop goldens can miss op-ORDER interactions; combinations can't."""
    rng = np.random.default_rng(1000 + seed)
    fmt = ["RGBA", "BGRA", "NV12", "I420"][rng.integers(4)]
    w, h = [(48, 32), (37, 23), (33, 34)][rng.integers(3)]
    props, u = {}, dict(DEFAULT_U)
    sharp = 0.0

    def maybe(p):
        return rng.random() < p

    if maybe(0.7):
        v = float(rng.uniform(-1, 1))
        props["brightness"] = v; u["brightness"] = v
    if maybe(0.7):
        v = float(rng.uniform(0, 2))
        props["contrast"] = v; u["contrast"] = v
    if maybe(0.7):
        v = float(rng.uniform(0, 2))
        props["saturation"] = v; u["saturation"] = v
    if maybe(0.5):
        v = float(rng.uniform(-1, 1))
        props["hue"] = v; u["hue"] = v * np.pi
    if maybe(0.5):
        v = float(rng.uniform(0.2, 5.0))
        props["gamma"] = v; u["gamma"] = v
    if maybe(0.4):
        v = float(rng.uniform(0, 1))
        props["sepia"] = v; u["sepia"] = v
    if maybe(0.3):
        props["invert"] = True; u["invert"] = True
    if maybe(0.4):
        v = float(rng.uniform(0, 1))
        props["vignette"] = v; u["vignette"] = v
    if maybe(0.3):
        key = int(rng.integers(0, 2**24)) | 0xFF000000
        tol_ = float(rng.uniform(0, 1)); sm = float(rng.uniform(0, 1))
        props.update({"chroma-key-enabled": True, "chroma-key-color": key,
                      "chroma-key-tolerance": tol_,
                      "chroma-key-smoothness": sm})
        u.update({"chroma_key_enabled": True,
                  "key_r": ((key >> 16) & 0xFF) / 255.0,
                  "key_g": ((key >> 8) & 0xFF) / 255.0,
                  "key_b": (key & 0xFF) / 255.0,
                  "key_tolerance": tol_, "key_smoothness": sm})
    if maybe(0.4):
        sharp = float(rng.uniform(-1, 1))
        if abs(sharp) < 0.01:
            sharp = 0.3
        props["sharpness"] = sharp

    got, in_planes, _ = _run_filter(fmt, w, h, props)
    want = _oracle_filter(in_planes, fmt, w, h, u, sharpness=sharp)
    assert_planes_close(got, want, tol=2,
                        context=f"random combo seed={seed} {fmt} {props}")
