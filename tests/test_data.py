import numpy as np
import pytest
from PIL import Image

from instantrestore_tpu.data import degradations as deg
from instantrestore_tpu.data.datasets import (
    RestoreDataset,
    RestoreDatasetTest,
    collate,
)
from instantrestore_tpu.data.loader import DataLoader
from instantrestore_tpu.data.transforms import (
    PairedTrainTransform,
    infer_transform,
    normalize_pm1,
)


def _make_identity(root, name, n_images, size=560):
    d = root / name / "cropped_images"
    d.mkdir(parents=True)
    rng = np.random.default_rng(hash(name) & 0xFFFF)
    for i in range(n_images):
        arr = rng.integers(0, 255, (size, size, 3), np.uint8)
        Image.fromarray(arr).save(d / f"{i:03d}.png")
    return root / name


@pytest.fixture(scope="module")
def train_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("train_data")
    _make_identity(root, "id_a", 5)
    _make_identity(root, "id_b", 2)
    _make_identity(root, "id_single", 1)  # excluded: needs >1 image
    return root


@pytest.fixture(scope="module")
def test_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("test_data")
    ident = root / "celeb1"
    (ident / "conditioning").mkdir(parents=True)
    rng = np.random.default_rng(0)
    for name in ["degraded.png", "gt.png"]:
        Image.fromarray(rng.integers(0, 255, (512, 512, 3), np.uint8)).save(ident / name)
    for i in range(2):  # fewer than max -> padding with flips
        Image.fromarray(rng.integers(0, 255, (512, 512, 3), np.uint8)).save(
            ident / "conditioning" / f"c{i}.png"
        )
    return root


def test_degradation_chain_shapes(rng):
    img = rng.random((512, 512, 3)).astype(np.float32)
    params = deg.sample_degradation_params(np.random.default_rng(0))
    out = deg.degrade(img, params)
    assert out.shape == (512, 512, 3)
    assert out.min() >= 0.0 and out.max() <= 1.0
    # degradation actually degrades
    assert not np.allclose(out, img, atol=1e-2)


def test_anisotropic_kernel_normalized():
    k = deg.anisotropic_gaussian_kernel(41, 3.0, 8.0, 0.7)
    assert k.shape == (41, 41)
    np.testing.assert_allclose(k.sum(), 1.0, atol=1e-6)
    assert k.min() >= 0


def test_jpeg_roundtrip_reasonable(rng):
    img = rng.random((64, 64, 3)).astype(np.float32)
    out = deg.jpeg_compress(img, 95)
    assert out.shape == img.shape
    assert np.abs(out - img).mean() < 0.2


def test_degrade_at_severity_monotone(rng):
    img = np.tile(np.linspace(0, 1, 512, dtype=np.float32)[None, :, None], (512, 1, 3))
    mild = deg.degrade_at_severity(img, 0.05)
    harsh = deg.degrade_at_severity(img, 0.95)
    assert np.abs(mild - img).mean() < np.abs(harsh - img).mean()


def test_restore_dataset_item(train_root):
    ds = RestoreDataset(train_root, max_conditioning_images=4, resolution=512)
    assert len(ds) == 7  # 5 + 2 (single-image identity excluded)
    item = ds[0]
    assert item["image"].shape == (512, 512, 3)
    assert item["gt"].shape == (512, 512, 3)
    assert item["conditioning_images"].shape == (4, 512, 512, 3)
    assert 1 <= int(item["valid_indices"]) <= 4
    assert item["image"].min() >= -1.0 and item["image"].max() <= 1.0
    # id_b has only 1 other image -> padding duplicates
    idx_b = next(i for i, p in enumerate(ds.paths) if "id_b" in str(p))
    item_b = ds[idx_b]
    assert int(item_b["valid_indices"]) == 1


def test_restore_dataset_deterministic_per_index(train_root):
    ds = RestoreDataset(train_root)
    a, b = ds[0], ds[0]
    np.testing.assert_allclose(a["image"], b["image"])


def test_collate_and_loader(train_root):
    ds = RestoreDataset(train_root)
    dl = DataLoader(ds, batch_size=2, num_workers=3, seed=1)
    batches = list(dl)
    assert len(batches) == len(ds) // 2
    b = batches[0]
    assert b["image"].shape == (2, 512, 512, 3)
    assert b["conditioning_images"].shape == (2, 4, 512, 512, 3)
    assert b["valid_indices"].shape == (2,)


def test_restore_dataset_test_layout(test_root):
    ds = RestoreDatasetTest(test_root)
    assert len(ds) == 1
    item = ds[0]
    assert item["conditioning_images"].shape == (4, 512, 512, 3)
    assert int(item["valid_indices"]) == 2
    assert item["identity"] == "celeb1"
    # padded ref 2 is the horizontal flip of ref 0
    np.testing.assert_allclose(
        item["conditioning_images"][2], item["conditioning_images"][0][:, ::-1], atol=1e-6
    )


def test_infer_transform_range():
    img = Image.fromarray(np.full((600, 800, 3), 255, np.uint8))
    out = infer_transform(img)
    assert out.shape == (512, 512, 3)
    np.testing.assert_allclose(out, 1.0, atol=1e-6)


def test_landmark_attn_targets(train_root, tmp_path):
    ident = _make_identity(tmp_path, "lm_id", 3)
    lm_dir = ident / "new_landmarks"
    lm_dir.mkdir()
    lm = np.random.default_rng(0).uniform(0, 511, (700, 2)).astype(np.float32)
    for i in range(3):
        np.save(lm_dir / f"{i:03d}.npy", lm)
    ds = RestoreDataset(tmp_path, get_gt_attn_probs=True, get_facial_comps=True)
    item = ds[0]
    probs = item["gt_attn_probs"]
    assert probs is not None
    attn, mask, layer, cond, gt_lm, cond_lm = probs
    stats = [(20, 16)] * 3 + [(10, 32)] * 3 + [(5, 64)] * 3
    heads, size = stats[layer]
    assert attn.shape == (heads, size * size, size * size)
    assert mask.shape == (size * size,)
    assert mask.any()
    comps = item["facial_comps"]
    assert comps is not None and len(comps) == 3
    assert comps[0].shape == (512, 512)
