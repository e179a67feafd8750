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
