"""Multi-device tests on the virtual 8-device CPU mesh: dp/sp sharding,
halo-exchange blur, and the driver dryrun."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpuvf.parallel import halo, mesh as pmesh


def require_devices(n):
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} devices")


def test_make_mesh_shapes():
    require_devices(8)
    m = pmesh.make_mesh({"dp": 4, "sp": 2})
    assert m.axis_names == ("dp", "sp")
    assert m.devices.shape == (4, 2)
    m2 = pmesh.make_mesh()
    assert m2.axis_names == ("dp",)


def test_data_parallel_batch_matches_single_device():
    require_devices(8)
    from tpuvf.core.formats import VideoFormat
    from tpuvf.core.registry import make
    from tpuvf.core.spec import FrameSpec

    in_spec = FrameSpec(VideoFormat.NV12, 64, 32)
    out_spec = FrameSpec(VideoFormat.BGRA, 32, 16, matrix=in_spec.matrix)
    elem = make("vfconvertscale")
    proc = elem.make_process(in_spec, out_spec,
                             elem.static_config(in_spec, out_spec))
    params = elem.traced_params()

    rng = np.random.default_rng(0)
    batch = 8
    planes = {
        "y": rng.integers(0, 256, (batch, 32, 64), dtype=np.uint8),
        "u": rng.integers(0, 256, (batch, 16, 32), dtype=np.uint8),
        "v": rng.integers(0, 256, (batch, 16, 32), dtype=np.uint8),
    }

    m = pmesh.make_mesh({"dp": 4, "sp": 2})
    run = pmesh.parallel_batch_fn(proc, m, params)
    outs, _ = run(planes, ())

    # single-device reference
    import jax.numpy as jnp

    singles = [
        proc({k: jnp.asarray(v[i]) for k, v in planes.items()}, (), params)[0]
        for i in range(batch)
    ]
    for i in range(batch):
        np.testing.assert_array_equal(
            np.asarray(outs["rgba"][i]), np.asarray(singles[i]["rgba"]))


def test_sharded_blur_matches_local():
    require_devices(8)
    from tpuvf.kernels import filter as kfilter

    m = pmesh.make_mesh({"sp": 8})
    rng = np.random.default_rng(1)
    img = rng.random((4, 64, 128), np.float32)

    want = np.asarray(kfilter.blur9(kfilter.blur9(
        jax.numpy.asarray(img), axis=-1), axis=-2))
    got = np.asarray(halo.sharded_blur9(jax.numpy.asarray(img), m))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_driver_dryrun_multichip():
    require_devices(8)
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_driver_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out, state = jax.jit(fn)(*args)
    # packed32 edge layout: stacked u32 pixel words (even/odd column
    # phases on the leading axis — one scan output, see pack_rgba_split)
    assert out["w_c"].shape == (2, 480, 320)
    assert out["w_c"].dtype == jnp.uint32


def test_pipeline_run_batched_on_mesh():
    """Full pipeline executes data-parallel over a dp mesh via shard_map."""
    require_devices(8)
    from tpuvf.cli.launch import parse_pipeline

    desc = ("videotestsrc num-buffers=8 pattern=ball "
            "! video/x-raw,format=NV12,width=64,height=32 "
            "! vfmetalvideofilter contrast=1.3 ! vfmetalconvertscale "
            "! video/x-raw,format=BGRA,width=32,height=16 ! appsink")
    p1 = parse_pipeline(desc)
    p1.negotiate(); p1.build(); p1.run()
    p2 = parse_pipeline(desc)
    p2.negotiate(); p2.build()
    m = pmesh.make_mesh({"dp": 4})
    assert p2.run_batched(8, batch_size=8, mesh=m) == 8
    for a, b in zip(p1.sinks[0].frames, p2.sinks[0].frames):
        np.testing.assert_array_equal(a, b)


def test_run_batched_tail_pad_freezes_state():
    """A short tail batch pads by repeating the last frame; the carried
    state must FREEZE across the phantom frames (mesh.py scanned __pad__
    handling) or deinterlace history / the grain counter advance and
    poison cross-call continuity.  dp=1 publishes the stream state, so a
    padded mesh run followed by a sequential run must match an all-
    sequential run bitwise (sp-only/dp=1: batch shapes equal)."""
    require_devices(1)
    from tpuvf.cli.launch import parse_pipeline

    desc = ("videotestsrc num-buffers=8 pattern=ball "
            "! video/x-raw,format=NV12,width=64,height=32,"
            "interlace-mode=interleaved "
            "! vfmetaldeinterlace method=weave "
            "! vfmetalvideofilter noise=0.4 ! appsink")
    import jax
    import jax.tree_util as jtu

    ref = parse_pipeline(desc)
    ref.negotiate(); ref.build(); ref.run(6)  # 6 sequential frames

    p = parse_pipeline(desc)
    p.negotiate(); p.build()
    m = pmesh.make_mesh({"dp": 1})
    # 6 frames at batch_size=4 -> second batch n=2 with pad=2
    assert p.run_batched(6, batch_size=4, mesh=m) == 6
    # outputs bitwise (pad outputs dropped)
    for i, (a, b) in enumerate(zip(ref.sinks[0].frames, p.sinks[0].frames)):
        for k in a:  # NV12 appsink frames are plane dicts
            np.testing.assert_array_equal(a[k], b[k],
                                          err_msg=f"frame {i} plane {k}")
    # the published carry equals the 6-frame sequential state: the two
    # phantom pad frames advanced NOTHING (deinterlace prev planes and
    # the grain frame counter both bitwise)
    got = jtu.tree_leaves_with_path(
        jax.tree_util.tree_map(np.asarray, p._state))
    want = jtu.tree_leaves_with_path(
        jax.tree_util.tree_map(np.asarray, ref._state))
    for (ka, a), (_, b) in zip(want, got):
        np.testing.assert_array_equal(a, b, err_msg=jtu.keystr(ka))


def test_run_batched_rebuilds_on_property_change():
    """Structural property writes between run_batched calls take effect
    (the passthrough-elision flip case run() already guards per frame)."""
    from tpuvf.cli.launch import parse_pipeline

    desc = ("videotestsrc num-buffers=4 "
            "! video/x-raw,format=RGBA,width=32,height=16 "
            "! vfmetalvideofilter ! appsink")
    p = parse_pipeline(desc)
    p.negotiate(); p.build()
    assert p.run_batched(2, batch_size=2) == 2
    passthrough = [np.asarray(f) for f in p.sinks[0].frames]
    vf = next(e for e in p.elements if e.ELEMENT_NAME == "vfvideofilter")
    vf.set_property("invert", True)  # flips is_passthrough
    assert p.run_batched(2, batch_size=2) == 2
    inverted = [np.asarray(f) for f in p.sinks[0].frames[2:]]
    for a, b in zip(passthrough[:2], inverted):
        assert not np.array_equal(a[..., :3], b[..., :3]), \
            "invert=true ignored: run_batched did not rebuild"


def test_mesh_without_dp_axis_rejected():
    require_devices(8)
    from tpuvf.cli.launch import parse_pipeline

    desc = ("videotestsrc num-buffers=4 "
            "! video/x-raw,format=RGBA,width=32,height=16 "
            "! vfmetalvideofilter brightness=0.1 ! appsink")
    p = parse_pipeline(desc)
    p.negotiate(); p.build()
    m = pmesh.make_mesh({"sp": 8})
    with np.testing.assert_raises_regex(ValueError, "no 'dp' axis"):
        p.run_batched(4, batch_size=4, mesh=m, sp_axis="sp")


def test_run_recovers_after_sink_failure():
    """A sink failure mid-run must not leave self._state pointing at
    donated buffers: the pipeline publishes the post-step carry before
    readback, so a subsequent run() continues the stream."""
    from tpuvf.cli.launch import parse_pipeline
    from tpuvf.runtime.pipeline import PipelineError

    desc = ("videotestsrc num-buffers=4 "
            "! video/x-raw,format=NV12,width=64,height=32,"
            "interlace-mode=interleaved "
            "! vfmetaldeinterlace method=weave ! appsink")
    p = parse_pipeline(desc)
    p.negotiate(); p.build()
    sink = p.sinks[0]
    real_consume = sink.consume
    calls = {"n": 0}

    def failing_consume(*a, **k):
        calls["n"] += 1
        if calls["n"] == 2:
            raise OSError("disk full")
        return real_consume(*a, **k)

    sink.consume = failing_consume
    with np.testing.assert_raises(PipelineError):
        p.run(4)
    sink.consume = real_consume
    # the stream continues — no 'Array has been deleted' on the carry
    assert p.run(2) == 2
