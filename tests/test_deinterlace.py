"""vfdeinterlace tests: golden parity incl. temporal state + smoke cases."""

import numpy as np


def test_bob_linear_carry_no_state():
    """bob/linear never read the previous frame, so they carry NO state
    (a full prev round trip per frame otherwise — ~8 MB at 1080p);
    weave/greedyh keep the prev-frame carry."""
    from tpuvf.core.registry import make
    from tpuvf.core.spec import FrameSpec
    from tpuvf.core.formats import VideoFormat

    spec = FrameSpec(VideoFormat.I420, 64, 48, interlaced=True)
    for method, want_state in ((0, False), (2, False), (1, True),
                               (3, True)):
        e = make("vfdeinterlace")
        e.set_property("method", method)
        out = e.transform_spec(spec)
        e.make_process_linked(spec, out, e.static_config(spec, out))
        state = e.init_state(spec, out)
        assert bool(state) == want_state, (method, state.keys())
import pytest

from tests.oracle import element_ref, metal_ref
from tests.util import assert_planes_close, random_host_frame

from tpuvf.cli.launch import launch
from tpuvf.core.frame import host_to_planes
from tpuvf.core.formats import VideoFormat
from tpuvf.core.registry import make
from tpuvf.core.spec import FrameSpec

RNG = np.random.default_rng(23)


def run_frames(fmt, w, h, props, hosts, tff=True):
    import jax.numpy as jnp

    spec = FrameSpec(VideoFormat(fmt), w, h, interlaced=True, tff=tff)
    elem = make("vfdeinterlace")
    for k, v in (props or {}).items():
        elem.set_property(k, v)
    out_spec = elem.transform_spec(spec)
    static = elem.static_config(spec, out_spec)
    proc = elem.make_process(spec, out_spec, static)
    state = elem.init_state(spec, out_spec)
    outs = []
    for host in hosts:
        planes = host_to_planes(host, spec)
        dev = {k: jnp.asarray(v) for k, v in planes.items()}
        out, state = proc(dev, state, elem.traced_params())
        outs.append({k: np.asarray(v) for k, v in out.items()})
    return outs, spec


def oracle_frames(spec, hosts, method, tff, threshold=0.1):
    outs = []
    prev_q = None
    for host in hosts:
        planes = host_to_planes(host, spec)
        # input -> RGBA8 with nearest chroma upsample (renderer m:204-293)
        rgba = metal_ref.sample_rgba(
            planes, spec.format.value, spec.matrix_index,
            spec.width, spec.height, filt="nearest")
        cur_q = metal_ref.quant(rgba)
        cur = metal_ref.dequant(cur_q)
        prev = metal_ref.dequant(prev_q) if prev_q is not None else np.zeros_like(cur)
        out_f = element_ref.deinterlace(
            cur, prev, method, tff, threshold, has_prev=prev_q is not None)
        out_q = metal_ref.quant(out_f)
        outs.append(metal_ref.pack_rgba(
            out_q.transpose(2, 0, 1), spec.format.value, spec.matrix_index))
        prev_q = cur_q
    return outs


METHODS = [("bob", 0), ("weave", 1), ("linear", 2), ("greedyh", 3)]


@pytest.mark.parametrize("fmt", ["RGBA", "NV12", "I420"])
@pytest.mark.parametrize("mname,mval", METHODS, ids=[m[0] for m in METHODS])
@pytest.mark.parametrize("tff", [True, False])
def test_golden_methods(fmt, mname, mval, tff):
    w, h = 48, 32
    spec = FrameSpec(VideoFormat(fmt), w, h, interlaced=True, tff=tff)
    hosts = [random_host_frame(RNG, spec) for _ in range(3)]
    got, _ = run_frames(fmt, w, h, {"method": mval, "motion-threshold": 0.25},
                        hosts, tff=tff)
    want = oracle_frames(spec, hosts, mval, tff, threshold=0.25)
    for i, (g, w_) in enumerate(zip(got, want)):
        assert_planes_close(g, w_, tol=2,
                            context=f"deint {mname} {fmt} tff={tff} frame{i}")


def test_first_frame_fallback_to_bob():
    """weave on frame 0 must equal bob on frame 0 (m:326-338)."""
    w, h = 32, 24
    spec = FrameSpec(VideoFormat.RGBA, w, h, interlaced=True)
    host = random_host_frame(RNG, spec)
    got_weave, _ = run_frames("RGBA", w, h, {"method": 1}, [host])
    got_bob, _ = run_frames("RGBA", w, h, {"method": 0}, [host])
    np.testing.assert_array_equal(got_weave[0]["rgba"], got_bob[0]["rgba"])


def test_field_layout_override():
    """field-layout=bottom-field-first flips the kept rows."""
    w, h = 32, 24
    spec = FrameSpec(VideoFormat.RGBA, w, h, interlaced=True, tff=True)
    host = random_host_frame(RNG, spec)
    got_auto, _ = run_frames("RGBA", w, h, {"method": 0}, [host], tff=True)
    got_bff, _ = run_frames(
        "RGBA", w, h, {"method": 0, "field-layout": 2}, [host], tff=True)
    # even rows kept under tff: identical to input there
    inp = host_to_planes(host, spec)["rgba"]
    np.testing.assert_array_equal(got_auto[0]["rgba"][:, 0::2], inp[:, 0::2])
    np.testing.assert_array_equal(got_bff[0]["rgba"][:, 1::2], inp[:, 1::2])
    assert (got_auto[0]["rgba"] != got_bff[0]["rgba"]).any()


@pytest.mark.parametrize("mname", ["bob", "linear", "weave", "greedyh"])
def test_smoke_pipeline(mname):
    assert launch(
        "videotestsrc num-buffers=4 ! video/x-raw,format=I420,width=64,height=48 "
        f"! vfmetaldeinterlace method={mname} motion-threshold=0.3 ! fakesink",
        quiet=True) == 4


def test_auto_field_order_per_buffer_flip():
    """A stream whose TFF flag flips mid-run deinterlaces each buffer with
    its own field order (GST_VIDEO_BUFFER_FLAG_TFF analog,
    gstvfmetaldeinterlace.m:169-185) — no recompile between frames."""
    from tpuvf.cli.launch import parse_pipeline

    w, h = 16, 12
    spec = FrameSpec(VideoFormat.RGBA, w, h)
    hosts = [np.asarray(random_host_frame(RNG, spec)) for _ in range(3)]
    tffs = [True, False, True]

    pipe = parse_pipeline(
        f"appsrc format=RGBA width={w} height={h} "
        "! vfmetaldeinterlace method=bob field-layout=auto ! appsink")
    src = pipe.sources[0]
    for host, tff in zip(hosts, tffs):
        src.push(host, tff=tff)
    src.end_of_stream()
    pipe.negotiate()
    pipe.build()
    pipe.run()
    frames = pipe.sinks[0].frames
    assert len(frames) == 3

    # bob depends only on the current buffer: each output must equal a
    # forced-layout single-frame run with that buffer's field order
    def forced(host, layout):
        p = parse_pipeline(
            f"appsrc format=RGBA width={w} height={h} "
            f"! vfmetaldeinterlace method=bob field-layout={layout} ! appsink")
        p.sources[0].push(host)
        p.sources[0].end_of_stream()
        p.negotiate()
        p.build()
        p.run()
        return p.sinks[0].frames[0]

    for i, (host, tff) in enumerate(zip(hosts, tffs)):
        layout = "top-field-first" if tff else "bottom-field-first"
        np.testing.assert_array_equal(frames[i], forced(host, layout),
                                      err_msg=f"frame {i} tff={tff}")
    # and the two field orders genuinely differ on this data
    assert (forced(hosts[1], "top-field-first")
            != forced(hosts[1], "bottom-field-first")).any()
