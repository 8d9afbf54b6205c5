"""On-device (jittable) image preprocessing and degradation ops.

TPU-side equivalents of the host preprocessing so batched serving is ONE
compiled program (BASELINE.json "fused preprocessing + VAE + UNet"):

* ``preprocess``: resize shorter side -> center crop -> [-1, 1] normalize
  (the Predictor transform, inference/test.py:54-59; LANCZOS is approximated
  by XLA's antialiased cubic resize — documented divergence, sub-1/255 on
  natural images).
* a differentiable degradation chain (Gaussian blur / bilinear down-up /
  noise / DCT-quantization JPEG from ops/dct_jpeg.py) mirroring the training
  pipeline for the demo slider and the cycle loss (the reference keeps a
  vendored DiffJPEG for the same purpose, restore_dataset.py:152-158).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def resize_shorter_side(images: jnp.ndarray, size: int, method: str = "cubic") -> jnp.ndarray:
    """[B, H, W, C] -> shorter side == size (aspect preserved, static shapes
    require H == W or a fixed input geometry under jit)."""
    b, h, w, c = images.shape
    if h <= w:
        nh, nw = size, max(1, int(round(w * size / h)))
    else:
        nh, nw = max(1, int(round(h * size / w))), size
    return jax.image.resize(images, (b, nh, nw, c), method=method, antialias=True)


def center_crop(images: jnp.ndarray, size: int) -> jnp.ndarray:
    b, h, w, c = images.shape
    top = (h - size) // 2
    left = (w - size) // 2
    return jax.lax.dynamic_slice(images, (0, top, left, 0), (b, size, size, c))


def preprocess(images_01: jnp.ndarray, resolution: int = 512) -> jnp.ndarray:
    """[0,1] float images -> [-1,1], resized+cropped to resolution.

    Cubic resampling can overshoot; clip like PIL's uint8 clamp does.
    """
    x = resize_shorter_side(images_01, resolution)
    x = jnp.clip(center_crop(x, resolution), 0.0, 1.0)
    return x * 2.0 - 1.0


def gaussian_blur(images: jnp.ndarray, sigma_x: float, sigma_y: float,
                  rotation: float = 0.0, kernel_size: int = 41) -> jnp.ndarray:
    """Anisotropic Gaussian blur (depthwise conv; on-device twin of
    data/degradations.anisotropic_gaussian_kernel)."""
    d = np.array([[sigma_x**2, 0.0], [0.0, sigma_y**2]])
    u = np.array([[np.cos(rotation), -np.sin(rotation)],
                  [np.sin(rotation), np.cos(rotation)]])
    sigma = u @ d @ u.T
    ax = np.arange(-kernel_size // 2 + 1.0, kernel_size // 2 + 1.0)
    xx, yy = np.meshgrid(ax, ax)
    grid = np.stack([xx, yy], -1)
    inv = np.linalg.inv(sigma)
    k = np.exp(-0.5 * np.einsum("hwi,ij,hwj->hw", grid, inv, grid))
    k = (k / k.sum()).astype(np.float32)
    c = images.shape[-1]
    kern = jnp.asarray(k)[:, :, None, None] * jnp.ones((1, 1, 1, c), images.dtype)
    pad = kernel_size // 2
    return jax.lax.conv_general_dilated(
        images, kern.astype(images.dtype), (1, 1),
        [(pad, pad), (pad, pad)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def degrade_on_device(
    images_01: jnp.ndarray,
    rng: jax.Array,
    *,
    severity: Optional[float] = None,
    resolution: int = 512,
) -> jnp.ndarray:
    """Deterministic jittable degradation at a given severity (demo slider /
    cycle loss). Differs from the host pipeline only in the JPEG stage
    (DCT quantization vs libjpeg — documented approximation)."""
    from instantrestore_tpu.ops.dct_jpeg import jpeg_compress_dct

    s = 0.5 if severity is None else float(np.clip(severity, 0.0, 1.0))
    sigma = 0.1 + s * 11.9
    factor = max(1, int(round(1 + s * 11)))
    noise_sigma = (10.0 + s * 10.0) / 255.0
    quality = int(round(19 - s * 9))

    x = gaussian_blur(images_01, sigma, sigma)
    b, h, w, c = x.shape
    # snap the downsampled size to a multiple of 16 so the 8x8 DCT blocks and
    # the 4:2:0 chroma subsampling tile exactly (libjpeg pads internally; on
    # device we keep static shapes instead)
    nh = max(16, (h // factor) // 16 * 16)
    nw = max(16, (w // factor) // 16 * 16)
    x = jax.image.resize(x, (b, nh, nw, c), "linear", antialias=True)
    x = x + jax.random.normal(rng, x.shape, x.dtype) * noise_sigma
    x = jnp.clip(x, 0.0, 1.0)
    x = jpeg_compress_dct(x, quality)
    x = jax.image.resize(x, (b, resolution, resolution, c), "linear")
    return jnp.clip(x, 0.0, 1.0)
