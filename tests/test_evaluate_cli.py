"""Drive scripts/evaluate.py end to end: directory pairs -> metric report."""

import importlib.util
import json
import sys
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

REPO = Path(__file__).resolve().parent.parent


def _evaluate_module():
    spec = importlib.util.spec_from_file_location(
        "evaluate_cli", REPO / "scripts" / "evaluate.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture()
def dirs(tmp_path):
    rng = np.random.default_rng(3)
    pred, gt = tmp_path / "pred", tmp_path / "gt"
    pred.mkdir()
    gt.mkdir()
    for i in range(3):
        img = rng.integers(0, 255, (64, 64, 3), np.uint8)
        Image.fromarray(img).save(gt / f"im{i}.png")
        if i == 0:  # exact copy -> near-perfect scores
            Image.fromarray(img).save(pred / f"im{i}.png")
        else:
            noisy = np.clip(
                img.astype(np.int32) + rng.integers(-40, 40, img.shape), 0, 255
            ).astype(np.uint8)
            Image.fromarray(noisy).save(pred / f"im{i}.png")
    # an unmatched prediction must be ignored, not crash
    Image.fromarray(rng.integers(0, 255, (64, 64, 3), np.uint8)).save(
        pred / "orphan.png"
    )
    return pred, gt


def test_evaluate_psnr_ssim(dirs, tmp_path):
    pred, gt = dirs
    out = tmp_path / "eval.json"
    rc = _evaluate_module().main([
        "--pred_dir", str(pred), "--gt_dir", str(gt),
        "--resolution", "64", "--batch", "2", "--out", str(out),
    ])
    assert rc == 0
    report = json.loads(out.read_text())
    assert report["n_images"] == 3
    rows = {r["image"]: r for r in report["per_image"]}
    assert rows["im0.png"]["psnr"] > 50  # identical pair
    assert rows["im0.png"]["ssim"] > 0.99
    assert rows["im1.png"]["psnr"] < rows["im0.png"]["psnr"]
    assert "lpips" not in rows["im0.png"]  # no weights -> no fake numbers
    assert "id_cosine" not in rows["im0.png"]
    assert report["weights"] == {"lpips": "absent", "arcface": "absent"}


def test_evaluate_with_lpips_weights(dirs, tmp_path):
    torch = pytest.importorskip("torch")
    from instantrestore_tpu.training.losses import lpips as lp

    rng = np.random.default_rng(0)
    vgg_sd, in_ch = {}, 3
    for (out_ch, n), ids in zip(lp.VGG_STAGES, lp._TV_CONV_IDX):
        for ci in ids:
            vgg_sd[f"features.{ci}.weight"] = torch.from_numpy(
                rng.normal(size=(out_ch, in_ch, 3, 3)).astype(np.float32) * 0.05
            )
            vgg_sd[f"features.{ci}.bias"] = torch.zeros(out_ch)
            in_ch = out_ch
    lin_sd = {
        f"lin{i}.model.1.weight": torch.from_numpy(
            np.abs(rng.normal(size=(1, c, 1, 1))).astype(np.float32)
        )
        for i, c in enumerate(lp.LIN_CHANNELS)
    }
    vgg_p, lin_p = tmp_path / "vgg16.pth", tmp_path / "lin.pth"
    torch.save(vgg_sd, str(vgg_p))
    torch.save(lin_sd, str(lin_p))

    pred, gt = dirs
    out = tmp_path / "eval.json"
    rc = _evaluate_module().main([
        "--pred_dir", str(pred), "--gt_dir", str(gt),
        "--resolution", "64", "--batch", "2", "--out", str(out),
        "--lpips_vgg", str(vgg_p), "--lpips_lin", str(lin_p),
    ])
    assert rc == 0
    report = json.loads(out.read_text())
    rows = {r["image"]: r for r in report["per_image"]}
    assert rows["im0.png"]["lpips"] < 1e-6  # identical pair
    assert rows["im1.png"]["lpips"] > 0
    assert report["weights"]["lpips"] == "converted"


def test_evaluate_empty(tmp_path):
    (tmp_path / "a").mkdir()
    (tmp_path / "b").mkdir()
    rc = _evaluate_module().main(
        ["--pred_dir", str(tmp_path / "a"), "--gt_dir", str(tmp_path / "b")]
    )
    assert rc == 1
