"""Loss-stack tests, incl. golden comparisons against the reference's own
torch modules loaded standalone from /root/reference (read-only; imported,
never copied) with RANDOM weights — this checks our math, not their data."""

import importlib.util
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from instantrestore_tpu.training.losses import id_loss as idl
from instantrestore_tpu.training.losses import lpips as lp
from instantrestore_tpu.training.losses.ssim import ms_ssim, ssim

REF = "/root/reference/face_replace/training/criteria"


def _load_ref_module(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


# ---------------------------------------------------------------------------
# similarity transform vs matlab_cp2tform
# ---------------------------------------------------------------------------


def test_similarity_transform_matches_cp2tform(rng):
    cp2 = _load_ref_module("ref_cp2tform", f"{REF}/matlab_cp2tform.py")
    ref_pts = idl.ARCFACE_REFERENCE_POINTS
    for trial in range(5):
        src = (ref_pts + rng.normal(scale=15.0, size=(5, 2)) + rng.uniform(0, 300)).astype(
            np.float32
        )
        ours = idl.similarity_transform(src, ref_pts)
        theirs = cp2.get_similarity_transform_for_cv2(src.copy(), ref_pts.copy())
        np.testing.assert_allclose(ours, theirs, atol=1e-3, err_msg=f"trial {trial}")


# ---------------------------------------------------------------------------
# warp_affine vs torch grid_sample-based reference behavior
# ---------------------------------------------------------------------------


def test_warp_affine_identity(rng):
    img = rng.random((1, 8, 8, 3)).astype(np.float32)
    mats = np.eye(2, 3, dtype=np.float32)[None]
    out = idl.warp_affine(jnp.asarray(img), jnp.asarray(mats), 8)
    np.testing.assert_allclose(np.asarray(out), img, atol=1e-5)


def test_warp_affine_translation(rng):
    img = rng.random((1, 8, 8, 3)).astype(np.float32)
    mats = np.array([[[1, 0, 2], [0, 1, 0]]], np.float32)  # shift right by 2
    out = np.asarray(idl.warp_affine(jnp.asarray(img), jnp.asarray(mats), 8))
    np.testing.assert_allclose(out[0, :, 2:], img[0, :, :6], atol=1e-5)
    np.testing.assert_allclose(out[0, :, :2], 0.0, atol=1e-6)  # zero padding


def test_warp_affine_scale_grad():
    img = jnp.ones((1, 16, 16, 3))
    mats = jnp.asarray([[[0.5, 0.0, 0.0], [0.0, 0.5, 0.0]]])
    g = jax.grad(lambda im: idl.warp_affine(im, mats, 8).sum())(img)
    assert float(jnp.abs(g).sum()) > 0


# ---------------------------------------------------------------------------
# ArcFace IR-SE-50 vs the reference torch Backbone (random weights)
# ---------------------------------------------------------------------------


def test_arcface_matches_reference_backbone(rng):
    arc = _load_ref_module("ref_arcface", f"{REF}/arcface.py")
    torch.manual_seed(0)
    net = arc.Backbone(input_size=112, num_layers=50, drop_ratio=0.6, mode="ir_se").eval()
    sd = net.state_dict()
    params = idl.convert_arcface_params(sd)
    x = rng.normal(size=(2, 112, 112, 3)).astype(np.float32) * 0.5
    with torch.no_grad():
        ref = net(torch.from_numpy(x.transpose(0, 3, 1, 2).copy())).numpy()
    out = np.asarray(idl.arcface_apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=3e-4)


def test_id_loss_valid_masking(rng):
    params = idl.init_arcface_params(jax.random.PRNGKey(0))
    pred = jnp.asarray(rng.normal(size=(2, 112, 112, 3)), jnp.float32)
    target = pred + 0.01
    mats = jnp.tile(jnp.eye(2, 3)[None], (2, 1, 1))
    loss, sim = idl.id_loss(params, pred, target, mats, mats, jnp.asarray([True, False]))
    assert np.isfinite(float(loss))
    # all invalid -> exactly 0 (reference returns 0.0)
    loss0, sim0 = idl.id_loss(params, pred, target, mats, mats, jnp.asarray([False, False]))
    assert float(loss0) == 0.0 and float(sim0) == 0.0


# ---------------------------------------------------------------------------
# LPIPS
# ---------------------------------------------------------------------------


def test_lpips_zero_for_identical(rng):
    params = lp.init_lpips_params(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).clip(-1, 1), jnp.float32)
    d = lp.lpips(params, x, x)
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-6)
    y = jnp.clip(x + 0.3, -1, 1)
    d2 = lp.lpips(params, x, y)
    assert (np.asarray(d2) > 0).all()


def test_lpips_conversion_from_torch_layout(rng):
    # synthetic torchvision-style vgg16 + lpips-lin state dicts
    vgg_sd = {}
    in_ch = 3
    for (out_ch, n), ids in zip(lp.VGG_STAGES, lp._TV_CONV_IDX):
        for ci in ids:
            vgg_sd[f"features.{ci}.weight"] = rng.normal(size=(out_ch, in_ch, 3, 3)).astype(np.float32) * 0.05
            vgg_sd[f"features.{ci}.bias"] = np.zeros(out_ch, np.float32)
            in_ch = out_ch
    lin_sd = {
        f"lin{i}.model.1.weight": np.abs(rng.normal(size=(1, c, 1, 1))).astype(np.float32)
        for i, c in enumerate(lp.LIN_CHANNELS)
    }
    params = lp.convert_lpips_params(vgg_sd, lin_sd)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).clip(-1, 1), jnp.float32)
    y = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).clip(-1, 1), jnp.float32)
    d = lp.lpips(params, x, y)
    assert np.isfinite(np.asarray(d)).all() and float(d[0]) > 0


def test_lpips_real_linear_weights_load():
    """The reference vendors the public LPIPS v0.1 linear weights; verify our
    converter reads that exact file schema."""
    import os

    path = "/root/reference/face_replace/training/criteria/lpips/weights/v0.1/vgg.pth"
    if not os.path.exists(path):
        pytest.skip("reference lpips weights not present")
    lin_sd = torch.load(path, map_location="cpu")
    vgg_sd = {}
    rng = np.random.default_rng(0)
    in_ch = 3
    for (out_ch, n), ids in zip(lp.VGG_STAGES, lp._TV_CONV_IDX):
        for ci in ids:
            vgg_sd[f"features.{ci}.weight"] = rng.normal(size=(out_ch, in_ch, 3, 3)).astype(np.float32) * 0.05
            vgg_sd[f"features.{ci}.bias"] = np.zeros(out_ch, np.float32)
            in_ch = out_ch
    params = lp.convert_lpips_params(vgg_sd, lin_sd)
    assert params["lins"][0]["kernel"].shape == (1, 1, 64, 1)
    assert params["lins"][4]["kernel"].shape == (1, 1, 512, 1)


# ---------------------------------------------------------------------------
# SSIM / MS-SSIM
# ---------------------------------------------------------------------------


def test_ssim_identical_is_one(rng):
    x = jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32)
    np.testing.assert_allclose(float(ssim(x, x)), 1.0, atol=1e-5)
    assert float(ssim(x, jnp.clip(x + 0.2, 0, 1))) < 0.95


def test_ms_ssim_identical_is_one(rng):
    x = jnp.asarray(rng.random((1, 256, 256, 3)), jnp.float32)
    np.testing.assert_allclose(float(ms_ssim(x, x)), 1.0, atol=1e-4)
    noisy = jnp.clip(x + jnp.asarray(rng.normal(size=x.shape) * 0.1, jnp.float32), 0, 1)
    v = float(ms_ssim(x, noisy))
    assert 0.0 < v < 1.0


def test_ssim_ordering(rng):
    x = jnp.asarray(rng.random((1, 256, 256, 3)), jnp.float32)
    slight = jnp.clip(x + 0.01, 0, 1)
    heavy = jnp.clip(x + jnp.asarray(rng.normal(size=x.shape) * 0.3, jnp.float32), 0, 1)
    assert float(ms_ssim(x, slight)) > float(ms_ssim(x, heavy))
