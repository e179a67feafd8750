"""External cross-validation of the sampler math.

The golden oracle in tests/oracle/ shares an author with the kernels; a
shared misreading of Metal's sampler semantics would pass every golden
test.  These tests compare the bilinear resampler against torch's
`F.interpolate(mode="bilinear", align_corners=False)`, an independent
implementation of the SAME convention (normalized coords, half-texel
centers, clamp-to-edge) that Metal's `sample(linear, clamp_to_edge)`
fragment path uses (metalconvertscale_shaders.h:71-148).
"""

import numpy as np
import pytest

from tpuvf.kernels import sample
from tpuvf.kernels.convert import plan_plane_sampler
from tpuvf.kernels.sample import WeightBuffers

RNG = np.random.default_rng(77)


def _ours(img_f32, out_w, out_h, filt=sample.LINEAR):
    import jax.numpy as jnp

    in_h, in_w = img_f32.shape
    bufs = WeightBuffers("xval")
    fn = plan_plane_sampler(in_w, in_h, out_w, out_h, filt, 1.0, 1.0, bufs)
    return np.asarray(fn(jnp.asarray(img_f32), dict(bufs.buffers)))


def _torch_bilinear(img_f32, out_w, out_h):
    import torch

    t = torch.from_numpy(img_f32)[None, None]
    out = torch.nn.functional.interpolate(
        t, size=(out_h, out_w), mode="bilinear", align_corners=False,
        antialias=False)
    return out[0, 0].numpy()


@pytest.mark.parametrize("in_wh,out_wh", [
    ((64, 48), (128, 96)),    # 2x upscale (fast path)
    ((64, 48), (96, 60)),     # 1.5x fractional upscale
    ((64, 48), (33, 20)),     # downscale (point-sampled, no antialias)
    ((641, 479), (640, 480)), # odd dims, near-identity
    ((16, 16), (250, 3)),     # extreme anisotropic
])
def test_bilinear_matches_torch(in_wh, out_wh):
    in_w, in_h = in_wh
    out_w, out_h = out_wh
    img = RNG.random((in_h, in_w), dtype=np.float32)
    got = _ours(img, out_w, out_h)
    want = _torch_bilinear(img, out_w, out_h)
    # float32 accumulation-order noise only; 1 uint8 LSB is 3.9e-3
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-4)


def test_bilinear_identity_is_exact():
    img = RNG.random((48, 64), dtype=np.float32)
    got = _ours(img, 64, 48)
    np.testing.assert_array_equal(got, img)


def test_nearest_matches_torch_nearest_exact():
    """Metal `nearest` picks the texel whose center is nearest the sample
    point == torch 'nearest-exact'.  Sample positions landing EXACTLY on a
    texel boundary are float-rounding-dependent ties: those pixels must
    still equal one of the two straddling texels."""
    import torch

    img = RNG.random((48, 64), dtype=np.float32)
    in_h, in_w = img.shape
    for out_w, out_h in [(128, 96), (30, 20), (97, 61)]:
        got = _ours(img, out_w, out_h, filt=sample.NEAREST)
        t = torch.from_numpy(img)[None, None]
        want = torch.nn.functional.interpolate(
            t, size=(out_h, out_w), mode="nearest-exact")[0, 0].numpy()
        mism = got != want
        if not mism.any():
            continue
        # every mismatch must sit on a boundary tie: value equals a texel
        # adjacent to torch's pick
        ys, xs = np.nonzero(mism)
        sx = ((np.arange(out_w) + 0.5) * in_w / out_w)
        sy = ((np.arange(out_h) + 0.5) * in_h / out_h)
        for y, x in zip(ys, xs):
            cands = []
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    iy = np.clip(int(np.floor(sy[y])) + dy, 0, in_h - 1)
                    ix = np.clip(int(np.floor(sx[x])) + dx, 0, in_w - 1)
                    cands.append(img[iy, ix])
            assert got[y, x] in cands, (y, x)
        # and ties must be rare
        assert mism.mean() < 0.03


def test_convertscale_uint8_parity_vs_torch():
    """Full element-boundary parity: uint8 in, quantized uint8 out must be
    within 1 LSB of torch's float path + round."""
    from tpuvf.kernels.color import dequant, quant

    img = RNG.integers(0, 256, (48, 64), dtype=np.uint8)
    f = img.astype(np.float32) / 255.0
    got = np.asarray(quant(_ours(f, 96, 60)))
    want = np.round(
        np.clip(_torch_bilinear(f, 96, 60), 0, 1) * 255).astype(np.uint8)
    diff = np.abs(got.astype(int) - want.astype(int))
    assert diff.max() <= 1
