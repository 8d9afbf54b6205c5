"""Host-side image transforms (PIL/numpy), reference-equivalent pipelines.

Mirrors the behavior of /root/reference/face_replace/data/transforms/
paired_transforms.py and data_setups.py pipelines without torchvision:

* train joined transforms: Resize(512, LANCZOS) -> CenterCrop(512) ->
  10% Grayscale -> paired ColorJitter(brightness/contrast/saturation 0.3)
* test joined transforms: Resize -> CenterCrop only
* inference transform: Resize(512, LANCZOS) -> CenterCrop -> [0,1] float
* final normalize: (x - 0.5) / 0.5  ->  [-1, 1]

All outputs are float32 numpy HWC.
"""

from __future__ import annotations

import random
from typing import List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image, ImageEnhance, ImageFilter


def resize_shorter_side(img: Image.Image, size: int,
                        resample=Image.LANCZOS) -> Image.Image:
    """torchvision Resize(size) semantics: shorter side -> size."""
    w, h = img.size
    if w <= h:
        nw, nh = size, max(1, int(round(h * size / w)))
    else:
        nw, nh = max(1, int(round(w * size / h))), size
    return img.resize((nw, nh), resample)


def center_crop(img: Image.Image, size: int) -> Image.Image:
    w, h = img.size
    left = (w - size) // 2
    top = (h - size) // 2
    return img.crop((left, top, left + size, top + size))


def to_float01(img: Image.Image) -> np.ndarray:
    return np.asarray(img.convert("RGB"), np.float32) / 255.0


def normalize_pm1(x: np.ndarray) -> np.ndarray:
    """Normalize(0.5, 0.5): [0,1] -> [-1,1]."""
    return x * 2.0 - 1.0


def denormalize_pm1(x: np.ndarray) -> np.ndarray:
    return np.clip((x + 1.0) / 2.0, 0.0, 1.0)


def infer_transform(img: Image.Image, resolution: int = 512) -> np.ndarray:
    """Predictor preprocessing (inference/test.py:54-59): LANCZOS resize,
    center crop, [0,1], normalize to [-1,1]. Returns HWC float32."""
    img = center_crop(resize_shorter_side(img, resolution), resolution)
    return normalize_pm1(to_float01(img))


class PairedColorJitter:
    """torchvision ColorJitter semantics applied identically to a pair:
    random order of brightness/contrast/saturation with factors in
    [max(0, 1-v), 1+v]."""

    def __init__(self, brightness=0.3, contrast=0.3, saturation=0.3):
        self.ranges = {
            0: (max(0.0, 1 - brightness), 1 + brightness),
            1: (max(0.0, 1 - contrast), 1 + contrast),
            2: (max(0.0, 1 - saturation), 1 + saturation),
        }

    def __call__(self, img1, img2, rng: random.Random):
        order = [0, 1, 2]
        rng.shuffle(order)
        enhancers = {
            0: ImageEnhance.Brightness,
            1: ImageEnhance.Contrast,
            2: ImageEnhance.Color,
        }
        for fn_id in order:
            lo, hi = self.ranges[fn_id]
            f = rng.uniform(lo, hi)
            img1 = enhancers[fn_id](img1).enhance(f)
            img2 = enhancers[fn_id](img2).enhance(f)
        return img1, img2


class PairedRandomBlur:
    def __init__(self, p: float = 0.4):
        self.p = p

    def __call__(self, img1, img2, rng: random.Random):
        if rng.random() < self.p:
            radius = rng.randint(1, 5)
            filt = (
                ImageFilter.GaussianBlur(radius)
                if rng.random() < 0.5
                else ImageFilter.BoxBlur(radius)
            )
            img1, img2 = img1.filter(filt), img2.filter(filt)
        return img1, img2


class PairedTrainTransform:
    """The face_restore joined pipeline (data_setups.py:64-77): resize+crop
    always, grayscale with p=0.1, paired color jitter always."""

    def __init__(self, resolution: int = 512, grayscale_p: float = 0.1,
                 color_jitter: bool = True):
        self.resolution = resolution
        self.grayscale_p = grayscale_p
        self.jitter = PairedColorJitter() if color_jitter else None

    def __call__(self, img1: Image.Image, img2: Image.Image, rng: random.Random):
        img1 = center_crop(resize_shorter_side(img1, self.resolution), self.resolution)
        img2 = center_crop(resize_shorter_side(img2, self.resolution), self.resolution)
        if rng.random() < self.grayscale_p:
            img1 = img1.convert("L").convert("RGB")
            img2 = img2.convert("L").convert("RGB")
        if self.jitter is not None:
            img1, img2 = self.jitter(img1, img2, rng)
        return img1, img2


class PairedTestTransform:
    def __init__(self, resolution: int = 512):
        self.resolution = resolution

    def __call__(self, img1, img2, rng=None):
        img1 = center_crop(resize_shorter_side(img1, self.resolution), self.resolution)
        img2 = center_crop(resize_shorter_side(img2, self.resolution), self.resolution)
        return img1, img2


def resize_large_axis(img: Image.Image, max_scale: float,
                      resample=Image.BICUBIC) -> Image.Image:
    """preprocessing.py ResizeLargeAxis: scale so the LARGER side == max_scale."""
    import math

    larger = max(img.size)
    factor = float(max_scale) / larger
    w = int(math.floor(img.size[0] * factor))
    h = int(math.floor(img.size[1] * factor))
    return img.resize((w, h), resample)
