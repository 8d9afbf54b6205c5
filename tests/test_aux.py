"""Aux subsystems: vis, profiling, canonical face, PairedDataset, DCT JPEG,
on-device image ops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from instantrestore_tpu.data.canonical_face import (
    CanonicalFaceProcess,
    FaceDetection,
    expand_bbox,
    square_crop,
)
from instantrestore_tpu.data.datasets import PairedDataset
from instantrestore_tpu.ops.dct_jpeg import jpeg_compress_dct
from instantrestore_tpu.ops.image_ops import center_crop, degrade_on_device, preprocess
from instantrestore_tpu.utils.profiling import nameit, stage, stage_report
from instantrestore_tpu.utils.vis import vis_attn_probs, vis_data


def test_dct_jpeg_roundtrip_quality(rng):
    x = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
    hi = jpeg_compress_dct(x, 95)
    lo = jpeg_compress_dct(x, 10)
    assert hi.shape == x.shape
    e_hi = float(jnp.abs(hi - x).mean())
    e_lo = float(jnp.abs(lo - x).mean())
    assert e_hi < e_lo  # lower quality = more distortion
    # differentiable
    g = jax.grad(lambda im: jpeg_compress_dct(im, 50).sum())(x)
    assert np.isfinite(np.asarray(g)).all()


def test_dct_jpeg_close_to_libjpeg(rng):
    """DCT round-trip should be in the same ballpark as real libjpeg."""
    import cv2

    from instantrestore_tpu.data.degradations import jpeg_compress

    x = (rng.random((64, 64, 3)) * 0.5 + 0.25).astype(np.float32)
    ours = np.asarray(jpeg_compress_dct(jnp.asarray(x)[None], 20))[0]
    theirs = jpeg_compress(x, 20)
    # both heavily quantized; mean behavior should correlate
    assert abs(float(np.abs(ours - x).mean()) - float(np.abs(theirs - x).mean())) < 0.05


def test_preprocess_on_device(rng):
    x = jnp.asarray(rng.random((2, 600, 800, 3)), jnp.float32)
    out = preprocess(x, 512)
    assert out.shape == (2, 512, 512, 3)
    assert float(out.min()) >= -1.0 and float(out.max()) <= 1.0


def test_degrade_on_device(rng):
    x = jnp.asarray(rng.random((1, 512, 512, 3)), jnp.float32)
    out = degrade_on_device(x, jax.random.PRNGKey(0), severity=0.8)
    assert out.shape == (1, 512, 512, 3)
    assert not np.allclose(np.asarray(out), np.asarray(x), atol=0.02)


def test_vis_data_and_attn(rng):
    b, n = 2, 4
    img = rng.uniform(-1, 1, (b, 64, 64, 3)).astype(np.float32)
    cond = rng.uniform(-1, 1, (b, n, 64, 64, 3)).astype(np.float32)
    grid = vis_data(img, img, img, cond)
    assert grid.size == (64 * (3 + n), 64 * b)
    probs = [rng.random((b, 5, 256, 256 * 4)).astype(np.float32)]
    overlay = vis_attn_probs(probs, cond, train_input=False, layer=0)
    assert overlay.size == (64 * n, 64 * b)


def test_profiling_helpers():
    @nameit
    def f(x):
        return x + 1

    assert f(1) == 2
    with stage("unit"):
        pass
    assert "unit" in stage_report()


def test_canonical_face_geometry():
    bbox = expand_bbox(np.array([100, 100, 200, 200]), 1.5, 512, 512)
    assert bbox[0] == 75 and bbox[2] == 225
    img = np.arange(512 * 512 * 3, dtype=np.uint8).reshape(512, 512, 3)
    crop, off = square_crop(img, bbox)
    assert crop.shape[0] == crop.shape[1] == 150

    # no detector: center square crop
    proc = CanonicalFaceProcess(output_size=128)
    out = proc(Image.fromarray(np.zeros((300, 400, 3), np.uint8)))
    assert out["image"].size == (128, 128)
    assert out["landmarks"] is None

    # with a detector: landmarks remapped into crop frame
    def det(arr):
        return FaceDetection(
            bbox=np.array([100, 100, 228, 228]),
            landmarks=np.array([[164.0, 164.0]]),
        )

    proc = CanonicalFaceProcess(detector=det, bbox_scale=1.0, output_size=128)
    out = proc(Image.fromarray(np.zeros((300, 400, 3), np.uint8)))
    np.testing.assert_allclose(out["landmarks"][0], [64, 64], atol=1.0)


def test_paired_dataset(tmp_path):
    d = tmp_path / "idA" / "canonical_images"
    d.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(3):
        Image.fromarray(rng.integers(0, 255, (560, 560, 3), np.uint8)).save(d / f"{i}.png")
    ds = PairedDataset(tmp_path, resolution=512)
    assert len(ds) == 3
    item = ds[0]
    assert item["image"].shape == (512, 512, 3)
    assert item["conditioning_images"].shape == (4, 512, 512, 3)
    np.testing.assert_allclose(item["image"], item["gt"])  # no degradation
