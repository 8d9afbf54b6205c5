"""FreeU (arXiv 2309.11497) for the up blocks, always enabled in the
reference with s1=0.9, s2=0.2, b1=1.4, b2=1.6 on BOTH UNets
(/root/reference/face_replace/models/pix2pix_turbo.py:62-68).

Semantics mirror the vendored diffusers code (/root/reference/face_replace/
models/unet_2d_condition/block.py:3495-3520 and diffusers
``fourier_filter``): at up-block resolution index 0 (resp. 1) the first half
of the backbone channels is scaled by b1 (resp. b2) and the skip features are
low-frequency-attenuated by s1 (resp. s2) with a threshold-1 Fourier mask.

TPU note: with threshold=1 the mask touches only the 4 lowest-frequency bins
(f in {0, -1} per axis), so instead of a full FFT/IFFT round trip we project
onto those 4 complex Fourier basis vectors with two small matmuls — exact,
MXU-friendly, and free of complex-FFT lowering. The projection is done in
float32 like the reference (which upcasts before fftn).
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class FreeUParams:
    s1: float = 0.9
    s2: float = 0.2
    b1: float = 1.4
    b2: float = 1.6


@lru_cache(maxsize=None)
def _dft_basis(n: int) -> Tuple[np.ndarray, np.ndarray]:
    """Real/imag parts of the [n, 2] basis exp(-2*pi*i*f*x/n), f in {0, -1}."""
    x = np.arange(n)
    freqs = np.array([0.0, -1.0])
    ang = -2.0 * np.pi * np.outer(x, freqs) / n
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def lowfreq_component(x: jnp.ndarray) -> jnp.ndarray:
    """Real part of the inverse DFT restricted to freqs {0,-1}x{0,-1}.

    x: [B, H, W, C] (NHWC). Equivalent to
    Re(ifftn(fftn(x) * onehot_mask(center 2x2 after fftshift))) for even H, W,
    i.e. exactly the bins diffusers' fourier_filter(threshold=1) rescales.
    """
    _, h, w, _ = x.shape
    ch_r, ch_i = (jnp.asarray(a) for a in _dft_basis(h))
    cw_r, cw_i = (jnp.asarray(a) for a in _dft_basis(w))
    xf = x.astype(jnp.float32)

    # Forward coefficients C[f_h, f_w] = sum_{h,w} x * e^{-i...}: [B, 2, 2, C]
    # complex arithmetic via separate real/imag matmuls.
    xr_h = jnp.einsum("bhwc,hf->bfwc", xf, ch_r)
    xi_h = jnp.einsum("bhwc,hf->bfwc", xf, ch_i)
    cr = jnp.einsum("bfwc,wg->bfgc", xr_h, cw_r) - jnp.einsum("bfwc,wg->bfgc", xi_h, cw_i)
    ci = jnp.einsum("bfwc,wg->bfgc", xr_h, cw_i) + jnp.einsum("bfwc,wg->bfgc", xi_h, cw_r)

    # Inverse: e^{+i...} = conj(basis); real part of (1/(H*W)) * conj(B_h) C conj(B_w)^T
    # Re( (br - i bi)(cr + i ci)(bw_r - i bw_i)^T ) worked out in real ops:
    t_rr = jnp.einsum("hf,bfgc->bhgc", ch_r, cr) + jnp.einsum("hf,bfgc->bhgc", ch_i, ci)
    t_ri = jnp.einsum("hf,bfgc->bhgc", ch_r, ci) - jnp.einsum("hf,bfgc->bhgc", ch_i, cr)
    low = jnp.einsum("bhgc,wg->bhwc", t_rr, cw_r) + jnp.einsum("bhgc,wg->bhwc", t_ri, cw_i)
    return low / (h * w)


def fourier_filter(x: jnp.ndarray, scale: float) -> jnp.ndarray:
    """diffusers fourier_filter(threshold=1, scale): rescale 4 lowest bins.

    out = x + (scale - 1) * lowfreq_component(x); computed fp32, cast back.
    """
    low = lowfreq_component(x)
    out = x.astype(jnp.float32) + (scale - 1.0) * low
    return out.astype(x.dtype)


def apply_freeu(
    resolution_idx: int,
    hidden: jnp.ndarray,
    skip: jnp.ndarray,
    freeu: Optional[FreeUParams],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scale backbone half-channels and filter skip features (NHWC).

    Only resolution indices 0 and 1 are touched (block.py:3511-3518).
    """
    if freeu is None or resolution_idx not in (0, 1):
        return hidden, skip
    b = freeu.b1 if resolution_idx == 0 else freeu.b2
    s = freeu.s1 if resolution_idx == 0 else freeu.s2
    half = hidden.shape[-1] // 2
    scaled = hidden[..., :half] * jnp.asarray(b, hidden.dtype)
    hidden = jnp.concatenate([scaled, hidden[..., half:]], axis=-1)
    skip = fourier_filter(skip, s)
    return hidden, skip
