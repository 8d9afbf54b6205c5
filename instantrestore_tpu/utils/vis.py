"""Visualization helpers — twins of the reference's vis_utils
(/root/reference/face_replace/training/utils/vis_utils.py:38-143):
``vis_data`` side-by-side batch grids and ``vis_attn_probs`` attention-mass
overlays of the 9 shared layers onto the reference images.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np
from PIL import Image


def to_uint8(img_pm1: np.ndarray) -> np.ndarray:
    return ((np.clip(img_pm1, -1, 1) + 1) / 2 * 255).astype(np.uint8)


def vis_data(
    input_img: np.ndarray,   # [B, H, W, 3] degraded
    pred: np.ndarray,        # [B, H, W, 3]
    gt: np.ndarray,          # [B, H, W, 3]
    cond_images: Optional[np.ndarray] = None,  # [B, N, H, W, 3]
    max_rows: int = 4,
) -> Image.Image:
    """Row per sample: degraded | pred | gt | refs..."""
    rows = []
    b = min(max_rows, input_img.shape[0])
    for i in range(b):
        cells = [to_uint8(input_img[i]), to_uint8(pred[i]), to_uint8(gt[i])]
        if cond_images is not None:
            cells.extend(to_uint8(cond_images[i, j]) for j in range(cond_images.shape[1]))
        rows.append(np.concatenate(cells, axis=1))
    return Image.fromarray(np.concatenate(rows, axis=0))


def attention_heatmap(
    attn_probs: np.ndarray,  # [B, heads, q, K] one shared layer
    segment: int,
    out_size: int = 512,
) -> np.ndarray:
    """Mean attention mass received by each key position of one segment,
    upsampled to image size: [B, out, out] in [0, 1]."""
    b, h, q, k = attn_probs.shape
    size = int(np.sqrt(q))
    seg = attn_probs[:, :, :, segment * q : (segment + 1) * q]
    mass = seg.mean(axis=(1, 2)).reshape(b, size, size)
    mass = mass / (mass.max(axis=(1, 2), keepdims=True) + 1e-12)
    img = np.asarray(
        [np.asarray(Image.fromarray((m * 255).astype(np.uint8)).resize((out_size, out_size)))
         for m in mass]
    )
    return img.astype(np.float32) / 255.0


def vis_attn_probs(
    attn_probs: Sequence[np.ndarray],  # 9 shared layers
    cond_images: np.ndarray,           # [B, N, H, W, 3]
    train_input: bool = False,
    layer: int = -1,
    alpha: float = 0.6,
) -> Image.Image:
    """Overlay per-reference received-attention heatmaps on the reference
    images (vis_utils.vis_attn_probs equivalent)."""
    probs = np.asarray(attn_probs[layer], np.float32)
    b, n = cond_images.shape[:2]
    offset = 1 if train_input else 0
    rows = []
    for i in range(b):
        cells = []
        for j in range(n):
            heat = attention_heatmap(probs[i : i + 1], j + offset,
                                     out_size=cond_images.shape[2])[0]
            base = to_uint8(cond_images[i, j]).astype(np.float32)
            red = np.zeros_like(base)
            red[..., 0] = 255.0
            blended = base * (1 - alpha * heat[..., None]) + red * (alpha * heat[..., None])
            cells.append(blended.astype(np.uint8))
        rows.append(np.concatenate(cells, axis=1))
    return Image.fromarray(np.concatenate(rows, axis=0))
