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
    if (nh, nw) == (h, w):
        # identity resize: PIL would be a no-op too, and XLA does NOT fold
        # the antialiased gather chain away (measured ~33 ms/batch16 on TPU)
        return images
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


def _aniso_kernels_traced(
    sigma_x: jnp.ndarray, sigma_y: jnp.ndarray, rotation: jnp.ndarray,
    kernel_size: int = 41,
) -> jnp.ndarray:
    """Per-sample rotated 2-D Gaussian kernels [B, k, k] from TRACED params
    (jnp twin of data/degradations.anisotropic_gaussian_kernel)."""
    sx2 = jnp.square(sigma_x.astype(jnp.float32))
    sy2 = jnp.square(sigma_y.astype(jnp.float32))
    c, s = jnp.cos(rotation), jnp.sin(rotation)
    # sigma = U diag(sx2, sy2) U^T; closed-form 2x2 inverse
    a = c * c * sx2 + s * s * sy2
    b_ = c * s * (sx2 - sy2)
    d = s * s * sx2 + c * c * sy2
    det = a * d - b_ * b_
    ia, ib, id_ = d / det, -b_ / det, a / det  # [B]
    ax = jnp.arange(-(kernel_size // 2) + 0.0, kernel_size // 2 + 1.0)
    xx, yy = jnp.meshgrid(ax, ax)  # matches np.meshgrid(ax, ax) in degradations.py
    quad = (
        ia[:, None, None] * xx[None] ** 2
        + 2.0 * ib[:, None, None] * xx[None] * yy[None]
        + id_[:, None, None] * yy[None] ** 2
    )
    k = jnp.exp(-0.5 * quad)
    return k / k.sum(axis=(1, 2), keepdims=True)


def gaussian_blur_per_sample(
    images: jnp.ndarray, sigma_x: jnp.ndarray, sigma_y: jnp.ndarray,
    rotation: jnp.ndarray, kernel_size: int = 41,
) -> jnp.ndarray:
    """Anisotropic blur with a DIFFERENT kernel per batch item (traced
    [B] params). One grouped conv: batch folded into channels, per-channel
    filters (feature_group_count = B*C keeps it a depthwise conv on the VPU/
    MXU rather than B separate convs)."""
    b, h, w, c = images.shape
    k = _aniso_kernels_traced(sigma_x, sigma_y, rotation, kernel_size)  # [B,k,k]
    x = images.transpose(1, 2, 0, 3).reshape(1, h, w, b * c)
    kern = jnp.repeat(k.transpose(1, 2, 0), c, axis=2)[:, :, None, :]  # [k,k,1,B*C]
    pad = kernel_size // 2
    y = jax.lax.conv_general_dilated(
        x, kern.astype(x.dtype), (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=b * c,
    )
    return y.reshape(h, w, b, c).transpose(2, 0, 1, 3)


# the 12 possible downsample factors of the training degradation
# (restore_dataset.py:148: np.random.randint(1, 13)); sizes snapped to
# multiples of 16 so the 8x8 DCT blocks + 4:2:0 subsampling tile exactly
_CYCLE_FACTORS = tuple(range(1, 13))


def degrade_with_params(
    images_01: jnp.ndarray,
    params: dict,
    rng: jax.Array,
    *,
    resolution: int = 512,
) -> jnp.ndarray:
    """Jittable re-degradation with the EXACT per-item parameters the host
    data pipeline used — the cycle loss (reference coach.py:619-629 applies
    batch['degrade_transforms'] to the prediction).

    ``params`` is the collated dict of [B] arrays from
    data/degradations.DegradationParams: blur_sigma_x/y, blur_rotation,
    downsample_factor (int), noise_sigma (0-255 units), jpeg_quality (int).

    The per-item downsample factor is data-dependent; static shapes are kept
    by evaluating all 12 factor branches batch-wide and selecting per item
    (cheap next to the UNet; only runs when lambda_cycle > 0). Divergences
    from the host chain (documented): DCT-quantization JPEG instead of
    libjpeg, and intermediate sizes snapped to multiples of 16.
    """
    x = gaussian_blur_per_sample(
        images_01, params["blur_sigma_x"], params["blur_sigma_y"],
        params["blur_rotation"],
    )
    b, h, w, c = x.shape
    factor = params["downsample_factor"].astype(jnp.int32)  # [B]
    sigma = params["noise_sigma"].astype(jnp.float32) / 255.0
    quality = params["jpeg_quality"]

    out = jnp.zeros_like(x)
    for f in _CYCLE_FACTORS:
        nh = max(16, (h // f) // 16 * 16)
        nw = max(16, (w // f) // 16 * 16)
        y = jax.image.resize(x, (b, nh, nw, c), "linear", antialias=True)
        noise = jax.random.normal(jax.random.fold_in(rng, f), y.shape, y.dtype)
        y = jnp.clip(y + noise * sigma[:, None, None, None], 0.0, 1.0)
        from instantrestore_tpu.ops.dct_jpeg import jpeg_compress_dct_traced

        y = jpeg_compress_dct_traced(y, quality)
        y = jax.image.resize(y, (b, resolution, resolution, c), "linear")
        sel = (factor == f)[:, None, None, None]
        out = jnp.where(sel, jnp.clip(y, 0.0, 1.0), out)
    return out


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
