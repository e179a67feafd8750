"""tee — 1-to-N fan-out with one sink per branch.

GStreamer pipelines fan out via `tee` to multiple sinks
(/root/reference/tests/demo-videofilter.sh uses sink+fakesink chains); the
fused-program analog evaluates each branch from the shared tee value inside
ONE XLA program and gives every sink its own host readback.
"""

from __future__ import annotations

import numpy as np
import pytest

from tpuvf.cli.launch import parse_pipeline


def _run(s, **kw):
    p = parse_pipeline(s)
    p.negotiate()
    p.build()
    p.run(**kw)
    return p


def test_tee_two_sinks_receive_frames(tmp_path):
    out = tmp_path / "t.raw"
    p = _run(
        "videotestsrc num-buffers=3 "
        "! video/x-raw,format=BGRA,width=64,height=48 "
        "! tee name=t t. ! fakesink t. ! filesink "
        f"location={out}"
    )
    assert out.stat().st_size == 3 * 64 * 48 * 4


def test_tee_branches_bit_identical(tmp_path):
    # both appsink branches read the same tee value
    p = _run(
        "videotestsrc num-buffers=2 pattern=ball "
        "! video/x-raw,format=RGBA,width=64,height=48 "
        "! vfmetalvideofilter contrast=1.2 "
        "! tee name=t t. ! appsink name=a t. ! appsink name=b"
    )
    a, b = p["a"].frames, p["b"].frames
    assert len(a) == len(b) == 2
    for fa, fb in zip(a, b):
        np.testing.assert_array_equal(fa, fb)


def test_tee_branch_processing_differs(tmp_path):
    # per-branch processing downstream of the tee: one branch filtered,
    # one raw — outputs must differ, raw branch matches a tee-less run
    s = (
        "videotestsrc num-buffers=1 pattern=smpte "
        "! video/x-raw,format=RGBA,width=64,height=48 "
        "! tee name=t "
        "t. ! vfmetalvideofilter brightness=0.3 ! appsink name=fx "
        "t. ! appsink name=raw"
    )
    p = _run(s)
    fx, raw = p["fx"].frames[0], p["raw"].frames[0]
    assert not np.array_equal(fx, raw)
    plain = _run(
        "videotestsrc num-buffers=1 pattern=smpte "
        "! video/x-raw,format=RGBA,width=64,height=48 ! appsink name=only"
    )["only"].frames[0]
    np.testing.assert_array_equal(raw, plain)


def test_tee_codec_branch(tmp_path):
    # the VERDICT done-criterion pipeline: fakesink + pngenc!filesink
    out = tmp_path / "f.png"
    p = _run(
        "videotestsrc num-buffers=2 "
        "! video/x-raw,format=RGBA,width=48,height=32 "
        "! tee name=t t. ! fakesink t. ! pngenc ! filesink "
        f"location={out}"
    )
    import tpuvf.io.png as pngio

    # filesink with an encoder writes per-frame files or appends; accept
    # either: the LAST written payload must decode as a PNG
    files = sorted(tmp_path.glob("*.png")) or [out]
    data = files[-1].read_bytes()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"


def test_tee_run_batched(tmp_path):
    p = parse_pipeline(
        "videotestsrc num-buffers=4 pattern=ball "
        "! video/x-raw,format=BGRA,width=64,height=48 "
        "! tee name=t t. ! appsink name=a t. "
        "! vfmetalvideofilter contrast=1.4 ! appsink name=b"
    )
    p.negotiate()
    p.build()
    p.run_batched(4, batch_size=2)
    assert len(p["a"].frames) == 4 and len(p["b"].frames) == 4
    assert not np.array_equal(p["a"].frames[0], p["b"].frames[0])


def test_tee_caps_constraint_rejects_conversion():
    # tee cannot convert: a branch caps filter demanding a different format
    # fails negotiation with a clear error
    p = parse_pipeline(
        "videotestsrc num-buffers=1 "
        "! video/x-raw,format=BGRA,width=64,height=48 "
        "! tee name=t t. ! fakesink t. ! video/x-raw,format=NV12 ! fakesink"
    )
    with pytest.raises(ValueError, match="tee"):
        p.negotiate()


def test_single_branch_tee_is_passthrough():
    p = _run(
        "videotestsrc num-buffers=1 "
        "! video/x-raw,format=BGRA,width=64,height=48 "
        "! tee ! appsink name=a"
    )
    assert len(p["a"].frames) == 1


def test_tee_run_batched_on_mesh():
    """Multi-sink output pytrees shard over dp (the per-sink dict rides
    through parallel_batch_fn's structure-aware specs)."""
    import jax
    from tpuvf.parallel import mesh as pmesh

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    desc = (
        "videotestsrc num-buffers=8 pattern=ball "
        "! video/x-raw,format=NV12,width=64,height=48 "
        "! vfmetalvideofilter contrast=1.3 ! tee name=t "
        "t. ! appsink name=a t. ! vfmetalconvertscale "
        "! video/x-raw,format=BGRA ! appsink name=b"
    )
    p = parse_pipeline(desc)
    p.negotiate()
    p.build()
    m = pmesh.make_mesh({"dp": 4})
    assert p.run_batched(8, batch_size=8, mesh=m) == 8
    plain = parse_pipeline(desc)
    plain.negotiate()
    plain.build()
    plain.run_batched(8, batch_size=8)
    for sk in ("a", "b"):
        for fa, fb in zip(p[sk].frames, plain[sk].frames):
            if isinstance(fa, dict):
                for k in fa:
                    np.testing.assert_array_equal(fa[k], fb[k])
            else:
                np.testing.assert_array_equal(fa, fb)
