"""FreeU: matmul-projection low-frequency filter vs. np.fft ground truth."""

import jax.numpy as jnp
import numpy as np

from instantrestore_tpu.models.freeu import FreeUParams, apply_freeu, fourier_filter, lowfreq_component


def _fft_fourier_filter(x_nchw, threshold, scale):
    """Literal re-derivation of diffusers fourier_filter via np.fft."""
    xf = np.fft.fftn(x_nchw, axes=(-2, -1))
    xf = np.fft.fftshift(xf, axes=(-2, -1))
    B, C, H, W = xf.shape
    mask = np.ones((B, C, H, W))
    crow, ccol = H // 2, W // 2
    mask[..., crow - threshold : crow + threshold, ccol - threshold : ccol + threshold] = scale
    xf = xf * mask
    xf = np.fft.ifftshift(xf, axes=(-2, -1))
    return np.fft.ifftn(xf, axes=(-2, -1)).real


def test_fourier_filter_matches_fft(rng):
    for h, w in [(8, 8), (16, 16), (8, 16)]:
        x = rng.normal(size=(2, h, w, 5)).astype(np.float32)
        out = fourier_filter(jnp.asarray(x), scale=0.9)
        ref = _fft_fourier_filter(x.transpose(0, 3, 1, 2), 1, 0.9).transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_lowfreq_component_dc_only():
    x = np.full((1, 8, 8, 1), 3.0, np.float32)
    low = np.asarray(lowfreq_component(jnp.asarray(x)))
    np.testing.assert_allclose(low, x, atol=1e-5)  # constant signal is all DC


def test_apply_freeu_stages(rng):
    fu = FreeUParams()
    hidden = rng.normal(size=(1, 8, 8, 4)).astype(np.float32)
    skip = rng.normal(size=(1, 8, 8, 4)).astype(np.float32)
    h0, s0 = apply_freeu(0, jnp.asarray(hidden), jnp.asarray(skip), fu)
    np.testing.assert_allclose(np.asarray(h0)[..., :2], hidden[..., :2] * fu.b1, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(h0)[..., 2:], hidden[..., 2:], rtol=1e-6)
    ref_skip = _fft_fourier_filter(skip.transpose(0, 3, 1, 2), 1, fu.s1).transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(s0), ref_skip, atol=1e-4)
    # stages 2 and 3 untouched
    h2, s2 = apply_freeu(2, jnp.asarray(hidden), jnp.asarray(skip), fu)
    np.testing.assert_allclose(np.asarray(h2), hidden)
    np.testing.assert_allclose(np.asarray(s2), skip)
    # disabled
    h3, s3 = apply_freeu(0, jnp.asarray(hidden), jnp.asarray(skip), None)
    np.testing.assert_allclose(np.asarray(h3), hidden)
