"""Differentiable JPEG via 8x8 DCT quantization (DiffJPEG capability twin).

The reference vendors a differentiable JPEG (face_replace/data/transforms/
DiffJPEG/, ~813 LoC) for the cycle-loss / differentiable-degradation variant
(restore_dataset.py:152-158). TPU-native version: the full pipeline is a few
batched matmuls — RGB->YCbCr, 4:2:0 chroma subsampling (2x2 mean), blockwise
orthonormal DCT-II, quantization by the standard tables scaled to the JPEG
quality with a differentiable rounding (round(x) + (x - round(x))^3, the
DiffJPEG trick), then the exact inverse chain.

Not bit-exact with libjpeg (no entropy coding, different chroma filters) —
documented divergence; the host pipeline (data/degradations.py) uses real
libjpeg for training data.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

# standard Annex-K quantization tables
_LUMA_TABLE = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], np.float32)

_CHROMA_TABLE = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], np.float32)


def _quality_scale(quality: int) -> float:
    quality = max(1, min(100, int(quality)))
    return 5000.0 / quality if quality < 50 else 200.0 - 2.0 * quality


def _scaled_table(table: np.ndarray, quality: int) -> np.ndarray:
    s = _quality_scale(quality)
    return np.clip(np.floor((table * s + 50.0) / 100.0), 1.0, 255.0).astype(np.float32)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II matrix."""
    n = 8
    m = np.zeros((n, n), np.float64)
    for k in range(n):
        for i in range(n):
            m[k, i] = np.cos(np.pi * k * (2 * i + 1) / (2 * n))
        m[k] *= np.sqrt(2.0 / n) * (np.sqrt(0.5) if k == 0 else 1.0)
    return m.astype(np.float32)


def _diff_round(x: jnp.ndarray) -> jnp.ndarray:
    r = jnp.round(x)
    return r + (x - r) ** 3


def _blockify(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W] -> [B, H/8, W/8, 8, 8]"""
    b, h, w = x.shape
    return x.reshape(b, h // 8, 8, w // 8, 8).transpose(0, 1, 3, 2, 4)


def _unblockify(x: jnp.ndarray) -> jnp.ndarray:
    b, nh, nw, _, _ = x.shape
    return x.transpose(0, 1, 3, 2, 4).reshape(b, nh * 8, nw * 8)


def _channel_jpeg(x: jnp.ndarray, table: np.ndarray) -> jnp.ndarray:
    """x: [B, H, W] values centered at 0 (i.e. pixel-128)."""
    d = jnp.asarray(_dct_matrix())
    blocks = _blockify(x)
    coeffs = jnp.einsum("ki,bnmij,lj->bnmkl", d, blocks, d)
    q = jnp.asarray(table)
    coeffs = _diff_round(coeffs / q) * q
    blocks = jnp.einsum("ik,bnmkl,jl->bnmij", d, coeffs, d)
    return _unblockify(blocks)


def _scaled_table_traced(table: np.ndarray, quality: jnp.ndarray) -> jnp.ndarray:
    """Per-sample quantization tables from a TRACED quality array [B].

    Same Annex-K scaling as ``_scaled_table`` but in jnp so the JPEG quality
    can be a batch operand (cycle loss re-degrades predictions with the exact
    per-item qualities the data pipeline sampled)."""
    q = jnp.clip(quality.astype(jnp.float32), 1.0, 100.0)
    s = jnp.where(q < 50.0, 5000.0 / q, 200.0 - 2.0 * q)  # [B]
    t = jnp.asarray(table)[None] * s[:, None, None]
    return jnp.clip(jnp.floor((t + 50.0) / 100.0), 1.0, 255.0)


def _channel_jpeg_traced(x: jnp.ndarray, tables: jnp.ndarray) -> jnp.ndarray:
    """x: [B, H, W] centered at 0; tables: [B, 8, 8] per-sample."""
    d = jnp.asarray(_dct_matrix())
    blocks = _blockify(x)
    coeffs = jnp.einsum("ki,bnmij,lj->bnmkl", d, blocks, d)
    q = tables[:, None, None]  # [B, 1, 1, 8, 8]
    coeffs = _diff_round(coeffs / q) * q
    blocks = jnp.einsum("ik,bnmkl,jl->bnmij", d, coeffs, d)
    return _unblockify(blocks)


def jpeg_compress_dct_traced(images_01: jnp.ndarray, quality: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, 3] in [0,1], quality [B] traced -> differentiable JPEG."""
    x = images_01.astype(jnp.float32) * 255.0
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

    def down(c):
        bsz, h, w = c.shape
        return c.reshape(bsz, h // 2, 2, w // 2, 2).mean(axis=(2, 4))

    def up(c, h, w):
        return jnp.repeat(jnp.repeat(c, 2, axis=1), 2, axis=2)[:, :h, :w]

    h, w = y.shape[1:]
    lt = _scaled_table_traced(_LUMA_TABLE, quality)
    ct = _scaled_table_traced(_CHROMA_TABLE, quality)
    y2 = _channel_jpeg_traced(y - 128.0, lt) + 128.0
    cb2 = up(_channel_jpeg_traced(down(cb) - 128.0, ct) + 128.0, h, w)
    cr2 = up(_channel_jpeg_traced(down(cr) - 128.0, ct) + 128.0, h, w)

    r2 = y2 + 1.402 * (cr2 - 128.0)
    g2 = y2 - 0.344136 * (cb2 - 128.0) - 0.714136 * (cr2 - 128.0)
    b2 = y2 + 1.772 * (cb2 - 128.0)
    out = jnp.stack([r2, g2, b2], axis=-1) / 255.0
    return jnp.clip(out, 0.0, 1.0)


def jpeg_compress_dct(images_01: jnp.ndarray, quality: int) -> jnp.ndarray:
    """[B, H, W, 3] in [0,1] -> differentiable JPEG round trip (4:2:0)."""
    x = images_01.astype(jnp.float32) * 255.0
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

    # 4:2:0 subsample via 2x2 mean
    def down(c):
        bsz, h, w = c.shape
        return c.reshape(bsz, h // 2, 2, w // 2, 2).mean(axis=(2, 4))

    def up(c, h, w):
        return jnp.repeat(jnp.repeat(c, 2, axis=1), 2, axis=2)[:, :h, :w]

    h, w = y.shape[1:]
    lt = _scaled_table(_LUMA_TABLE, quality)
    ct = _scaled_table(_CHROMA_TABLE, quality)
    y2 = _channel_jpeg(y - 128.0, lt) + 128.0
    cb2 = up(_channel_jpeg(down(cb) - 128.0, ct) + 128.0, h, w)
    cr2 = up(_channel_jpeg(down(cr) - 128.0, ct) + 128.0, h, w)

    r2 = y2 + 1.402 * (cr2 - 128.0)
    g2 = y2 - 0.344136 * (cb2 - 128.0) - 0.714136 * (cr2 - 128.0)
    b2 = y2 + 1.772 * (cb2 - 128.0)
    out = jnp.stack([r2, g2, b2], axis=-1) / 255.0
    return jnp.clip(out, 0.0, 1.0)
