"""Pallas kernel tests (interpreter mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpuvf.kernels.pallas import resample as presample
from tpuvf.kernels import sample


@pytest.mark.parametrize("in_h,out_h", [(64, 32), (32, 80), (136, 60)])
def test_banded_resample_matches_dense(in_h, out_h):
    rng = np.random.default_rng(5)
    w = 256
    img = jnp.asarray(rng.random((in_h, w), dtype=np.float32))
    t = sample.texcoords(out_h)
    want = np.asarray(
        sample.apply_separable(
            img, sample.sample_matrix(t, in_h, sample.LINEAR),
            np.eye(w, dtype=np.float32),
        )
    )
    got = np.asarray(presample.banded_resample_rows(img, t, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("logical,out_h", [(540, 480), (33, 60), (130, 64)])
def test_banded_resample_padded_rows(logical, out_h):
    """Non-8-multiple logical heights ride a bottom-padded operand with
    sample_rows: pad rows are never read with nonzero weight, so the
    result matches the dense sampler on the unpadded plane."""
    rng = np.random.default_rng(7)
    w = 128
    img = rng.random((logical, w), dtype=np.float32)
    pad = (-logical) % 8
    padded = jnp.asarray(np.pad(img, ((0, pad), (0, 0))))
    t = sample.texcoords(out_h)
    want = np.asarray(
        sample.apply_separable(
            jnp.asarray(img), sample.sample_matrix(t, logical, sample.LINEAR),
            np.eye(w, dtype=np.float32),
        )
    )
    got = np.asarray(presample.banded_resample_rows(
        padded, t, interpret=True, sample_rows=logical))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_banded_resample_sample_rows_validation():
    img = jnp.zeros((16, 128), jnp.float32)
    t = sample.texcoords(8)
    with pytest.raises(ValueError):
        presample.banded_resample_rows(img, t, interpret=True, sample_rows=17)


def test_blockband_plan_matches_dense():
    """The block-banded column decomposition reproduces the dense product
    (<= 1 ulp; dropped terms are exact zeros) and skips the dead MACs."""
    from tpuvf.kernels import convert

    for in_w, out_w, scale in [(1920, 640, 1.0), (960, 640, 1.0),
                               (640, 512, 0.8)]:
        t = sample.texcoords(out_w, scale)
        mask = sample.coverage_mask(out_w, scale)
        w = sample.sample_matrix(t, in_w, sample.LINEAR, mask)
        plan = convert._blockband_plan(w)
        if plan is None:
            continue
        rng = np.random.default_rng(8)
        img = rng.random((48, in_w), dtype=np.float32)
        want = img @ w.T
        outs = []
        for (o0, o1, lo, hi) in plan:
            if hi == lo:
                outs.append(np.zeros((48, o1 - o0), np.float32))
            else:
                outs.append(img[:, lo:hi] @ w[o0:o1, lo:hi].T)
        got = np.concatenate(outs, axis=1)
        np.testing.assert_allclose(got, want, atol=1e-6)
        macs = sum((o1 - o0) * (hi - lo) for o0, o1, lo, hi in plan)
        assert macs < 0.6 * w.shape[0] * w.shape[1]


def test_apply_separable_blockband_rotate():
    """apply_separable with blockband plans reproduces the dense product
    for the transform's reversed (rotate) and crop-scaled matrices."""
    rng = np.random.default_rng(11)
    h, w = 480, 640
    img = jnp.asarray(rng.random((h, w), dtype=np.float32))
    # rotate-180 with a crop: reversed texcoords over a cropped span
    src_u = np.linspace(0.9, 0.1, w)
    src_v = np.linspace(0.85, 0.05, h)
    wx = sample.sample_matrix(src_u, w, sample.LINEAR)
    wy = sample.sample_matrix(src_v, h, sample.LINEAR)
    for m in (wx, wy):
        plan = sample.blockband_plan(m)
        assert plan is not None
        macs = sum((o1 - o0) * (hi - lo) for o0, o1, lo, hi in plan)
        assert macs < 0.6 * m.shape[0] * m.shape[1]
    dense = sample.apply_separable(img, jnp.asarray(wy), jnp.asarray(wx))
    banded = sample.apply_separable(
        img, wy, wx,
        sample.blockband_plan(wy), sample.blockband_plan(wx))
    np.testing.assert_allclose(np.asarray(banded), np.asarray(dense),
                               atol=2e-6)


def test_banded_resample_letterbox_coords():
    """Out-of-range texcoords clamp to the edge rows exactly like the dense
    sampler with clamped weights."""
    rng = np.random.default_rng(6)
    w = 128
    img = jnp.asarray(rng.random((16, w), dtype=np.float32))
    t = sample.texcoords(24, scale=0.5)  # coords spill outside [0,1]
    tc = np.clip(t, 0.0, 1.0)
    want = np.asarray(
        sample.apply_separable(
            img, sample.sample_matrix(tc, 16, sample.LINEAR),
            np.eye(w, dtype=np.float32),
        )
    )
    got = np.asarray(presample.banded_resample_rows(img, tc, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-5)
