"""SSIM / MS-SSIM in JAX (pytorch_msssim-equivalent semantics).

The reference adds ``1 - ms_ssim((pred+1)/2, (gt+1)/2, data_range=1)`` with
lambda_ssim=1.0 (coach.py:586-591, config_files/train_base.yaml). This module
reproduces the standard implementation: separable 11-tap Gaussian window
(sigma 1.5), K1=0.01/K2=0.03, valid padding, per-channel then averaged;
MS-SSIM with the canonical 5 weights, 2x average-pool between scales, and
ReLU on intermediate contrast-structure terms.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

MS_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    coords = np.arange(size) - size // 2
    g = np.exp(-(coords ** 2) / (2 * sigma ** 2))
    return jnp.asarray((g / g.sum()).astype(np.float32))


def _filter2d_separable(x: jnp.ndarray, win: jnp.ndarray) -> jnp.ndarray:
    """Depthwise separable valid-padding blur over NHWC."""
    c = x.shape[-1]
    kh = win.reshape(-1, 1, 1, 1) * jnp.ones((1, 1, 1, c), x.dtype)
    kw = win.reshape(1, -1, 1, 1) * jnp.ones((1, 1, 1, c), x.dtype)
    dn = ("NHWC", "HWIO", "NHWC")
    x = jax.lax.conv_general_dilated(
        x, kh.astype(x.dtype), (1, 1), "VALID", dimension_numbers=dn,
        feature_group_count=c,
    )
    x = jax.lax.conv_general_dilated(
        x, kw.astype(x.dtype), (1, 1), "VALID", dimension_numbers=dn,
        feature_group_count=c,
    )
    return x


def _ssim_terms(x, y, win, data_range, k1=0.01, k2=0.03):
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    mu_x = _filter2d_separable(x, win)
    mu_y = _filter2d_separable(y, win)
    mu_xx = mu_x * mu_x
    mu_yy = mu_y * mu_y
    mu_xy = mu_x * mu_y
    sigma_x = _filter2d_separable(x * x, win) - mu_xx
    sigma_y = _filter2d_separable(y * y, win) - mu_yy
    sigma_xy = _filter2d_separable(x * y, win) - mu_xy
    cs = (2 * sigma_xy + c2) / (sigma_x + sigma_y + c2)
    ssim_map = ((2 * mu_xy + c1) / (mu_xx + mu_yy + c1)) * cs
    return ssim_map, cs


def ssim(x: jnp.ndarray, y: jnp.ndarray, *, data_range: float = 1.0,
         win_size: int = 11, win_sigma: float = 1.5,
         reduce: bool = True) -> jnp.ndarray:
    """SSIM over NHWC images: batch-mean scalar, or per-sample [B] with
    ``reduce=False`` (evaluation reports per-image rows)."""
    win = _gaussian_window(win_size, win_sigma)
    s, _ = _ssim_terms(x.astype(jnp.float32), y.astype(jnp.float32), win, data_range)
    if reduce:
        return s.mean()
    return s.mean(axis=tuple(range(1, s.ndim)))


def ms_ssim(x: jnp.ndarray, y: jnp.ndarray, *, data_range: float = 1.0,
            weights: Sequence[float] = MS_WEIGHTS,
            win_size: int = 11, win_sigma: float = 1.5) -> jnp.ndarray:
    """Multi-scale SSIM (scalar, batch mean), matching pytorch_msssim."""
    win = _gaussian_window(win_size, win_sigma)
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    levels = len(weights)
    min_side = min(x.shape[1], x.shape[2])
    if min_side <= (win_size - 1) * 2 ** (levels - 1):
        raise ValueError(
            f"image side {min_side} too small for {levels}-level MS-SSIM with "
            f"window {win_size} (needs > {(win_size - 1) * 2 ** (levels - 1)})"
        )
    mcs = []
    for i in range(levels):
        s, cs = _ssim_terms(x, y, win, data_range)
        if i < levels - 1:
            mcs.append(jax.nn.relu(cs.mean(axis=(1, 2, 3))))
            pad_h = x.shape[1] % 2
            pad_w = x.shape[2] % 2
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
            y = jnp.pad(y, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
            x = jax.lax.reduce_window(
                x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            ) / 4.0
            y = jax.lax.reduce_window(
                y, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            ) / 4.0
    ssim_last = jax.nn.relu(s.mean(axis=(1, 2, 3)))
    w = jnp.asarray(weights)
    vals = jnp.stack(mcs + [ssim_last], axis=0)  # [levels, B]
    return jnp.prod(vals ** w[:, None], axis=0).mean()
