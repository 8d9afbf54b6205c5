"""Golden tests for NHWC primitives against torch (CPU) reference ops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from instantrestore_tpu.ops import primitives as P


def test_dense_matches_torch(rng):
    x = rng.normal(size=(2, 5, 16)).astype(np.float32)
    w = rng.normal(size=(16, 8)).astype(np.float32)
    b = rng.normal(size=(8,)).astype(np.float32)
    out = P.dense({"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}, jnp.asarray(x))
    ref = torch.from_numpy(x) @ torch.from_numpy(w) + torch.from_numpy(b)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-5)


def test_dense_lora_delta(rng):
    x = rng.normal(size=(3, 16)).astype(np.float32)
    w = rng.normal(size=(16, 8)).astype(np.float32)
    a = rng.normal(size=(16, 4)).astype(np.float32)
    bmat = rng.normal(size=(4, 8)).astype(np.float32)
    p = {"kernel": jnp.asarray(w), "lora_A": jnp.asarray(a), "lora_B": jnp.asarray(bmat)}
    out = P.dense(p, jnp.asarray(x), lora_scaling=0.5)
    ref = x @ w + 0.5 * (x @ a @ bmat)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_conv2d_matches_torch(rng):
    x = rng.normal(size=(2, 9, 9, 3)).astype(np.float32)
    w = rng.normal(size=(3, 3, 3, 6)).astype(np.float32)  # HWIO
    b = rng.normal(size=(6,)).astype(np.float32)
    for stride, padding in [(1, 1), (2, 1), (1, 0)]:
        if padding == 0 and stride == 1:
            pass
        out = P.conv2d(
            {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)},
            jnp.asarray(x),
            stride=stride,
            padding=padding,
        )
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        wt = torch.from_numpy(w).permute(3, 2, 0, 1)  # OIHW
        ref = F.conv2d(xt, wt, torch.from_numpy(b), stride=stride, padding=padding)
        np.testing.assert_allclose(
            np.asarray(out), ref.permute(0, 2, 3, 1).numpy(), atol=1e-4
        )


def test_conv_lora_matches_torch_peft_semantics(rng):
    # peft Conv2d LoRA: delta = scaling * conv1x1_B(conv_A(x))
    x = rng.normal(size=(1, 8, 8, 4)).astype(np.float32)
    w = rng.normal(size=(3, 3, 4, 6)).astype(np.float32)
    a = rng.normal(size=(3, 3, 4, 2)).astype(np.float32)
    bm = rng.normal(size=(1, 1, 2, 6)).astype(np.float32)
    p = {"kernel": jnp.asarray(w), "lora_A": jnp.asarray(a), "lora_B": jnp.asarray(bm)}
    out = P.conv2d(p, jnp.asarray(x), stride=1, padding=1, lora_scaling=0.25)
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    base = F.conv2d(xt, torch.from_numpy(w).permute(3, 2, 0, 1), padding=1)
    at = F.conv2d(xt, torch.from_numpy(a).permute(3, 2, 0, 1), padding=1)
    delta = F.conv2d(at, torch.from_numpy(bm).permute(3, 2, 0, 1))
    ref = base + 0.25 * delta
    np.testing.assert_allclose(np.asarray(out), ref.permute(0, 2, 3, 1).numpy(), atol=1e-4)


def test_group_norm_matches_torch(rng):
    x = rng.normal(size=(2, 6, 6, 32)).astype(np.float32)
    scale = rng.normal(size=(32,)).astype(np.float32)
    bias = rng.normal(size=(32,)).astype(np.float32)
    out = P.group_norm(
        {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)},
        jnp.asarray(x),
        num_groups=8,
        eps=1e-6,
    )
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    ref = F.group_norm(xt, 8, torch.from_numpy(scale), torch.from_numpy(bias), eps=1e-6)
    np.testing.assert_allclose(np.asarray(out), ref.permute(0, 2, 3, 1).numpy(), atol=1e-4)


def test_layer_norm_matches_torch(rng):
    x = rng.normal(size=(2, 7, 24)).astype(np.float32)
    scale = rng.normal(size=(24,)).astype(np.float32)
    bias = rng.normal(size=(24,)).astype(np.float32)
    out = P.layer_norm({"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}, jnp.asarray(x))
    ref = F.layer_norm(
        torch.from_numpy(x), (24,), torch.from_numpy(scale), torch.from_numpy(bias), eps=1e-5
    )
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-4)


def test_geglu_matches_torch(rng):
    x = rng.normal(size=(2, 3, 8)).astype(np.float32)
    w = rng.normal(size=(8, 16)).astype(np.float32)
    b = rng.normal(size=(16,)).astype(np.float32)
    out = P.geglu({"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}, jnp.asarray(x))
    proj = torch.from_numpy(x) @ torch.from_numpy(w) + torch.from_numpy(b)
    h, gate = proj.chunk(2, dim=-1)
    ref = h * F.gelu(gate)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-5)


def test_timestep_embedding_matches_diffusers_formula():
    # diffusers get_timestep_embedding with flip_sin_to_cos=True, shift=0
    t = np.array([0, 249, 999], dtype=np.int32)
    dim = 320
    half = dim // 2
    freqs = np.exp(-np.log(10000) * np.arange(half) / half)
    args = t[:, None].astype(np.float64) * freqs[None]
    ref = np.concatenate([np.cos(args), np.sin(args)], axis=-1)  # flipped
    out = P.timestep_embedding(jnp.asarray(t), dim)
    # fp32 arg rounding bounds accuracy to ~1e-4 at t=999
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-4)


@pytest.mark.parametrize("mode", ["1", "2", "3"])
def test_upsample2x_conv_matches_materialized(rng, monkeypatch, mode):
    """Every subpixel upsample+conv mode == nearest_upsample_2x then conv2d
    (identical math, fp32-exact), including borders and bias: "1" phase convs
    + transpose interleave, "2" phase convs + pairwise stack-reshape, "3" one
    lhs-dilated 4x4 conv (the default since round 4 — measured +8.5%
    faces/sec). The test forces each mode on explicitly."""
    monkeypatch.setattr(P, "_SUBPIXEL_UP", mode)
    x = jnp.asarray(rng.normal(size=(2, 7, 5, 4)), jnp.float32)
    p = {
        "kernel": jnp.asarray(rng.normal(size=(3, 3, 4, 6)), jnp.float32),
        "bias": jnp.asarray(rng.normal(size=(6,)), jnp.float32),
    }
    want = P.conv2d(p, P.nearest_upsample_2x(x))
    got = P.upsample2x_conv(p, x)
    assert got.shape == (2, 14, 10, 6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    # LoRA kernels take the exact factored fallback path
    pl = dict(p)
    pl["lora_A"] = jnp.asarray(rng.normal(size=(3, 3, 4, 2)), jnp.float32)
    pl["lora_B"] = jnp.asarray(rng.normal(size=(1, 1, 2, 6)), jnp.float32)
    want = P.conv2d(pl, P.nearest_upsample_2x(x), lora_scaling=0.5)
    got = P.upsample2x_conv(pl, x, lora_scaling=0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_upsample2x_conv_int8_folded(rng, monkeypatch):
    """quantize_conv_int8(fold_upsample=True) stores the 4x4 subpixel kernel;
    upsample2x_conv then runs ONE lhs-dilated int8 conv. Checks: (a) close to
    the fp mode-3 output within int8 quantization error, (b) at batch 1 the
    folded path's dynamic a_scale equals a baked static one (exact match),
    (c) the calibration side-channel records the upsampler conv."""
    monkeypatch.setattr(P, "_SUBPIXEL_UP", "3")
    x = jnp.asarray(rng.normal(size=(1, 6, 5, 8)), jnp.float32)
    p = {
        "kernel": jnp.asarray(rng.normal(size=(3, 3, 8, 8)) * 0.1, jnp.float32),
        "bias": jnp.asarray(rng.normal(size=(8,)) * 0.01, jnp.float32),
    }
    want_fp = P.upsample2x_conv(p, x)

    q = P.quantize_conv_int8(p, fold_upsample=True)
    assert q["kernel_int8"].shape == (4, 4, 8, 8)
    got = P.upsample2x_conv(q, x)
    assert got.shape == want_fp.shape == (1, 12, 10, 8)
    # int8 grid error bound: |dy| <= sum|taps| * (a_step + w_step) roughly;
    # relative tolerance on the output scale is the practical check
    err = np.abs(np.asarray(got) - np.asarray(want_fp))
    assert np.median(err) < 0.02 * float(jnp.std(want_fp))
    assert np.max(err) < 0.2 * float(jnp.max(jnp.abs(want_fp)))

    # calibration flows through the folded branch
    q_slot = P.assign_calib_slots(q)
    (_, (slots, scales)) = P.with_int8_records(
        lambda: P.upsample2x_conv(q_slot, x)
    )()
    assert slots.shape == (1,)
    q_cal = P.apply_int8_calibration(q_slot, slots, scales, margin=1.0)
    assert "a_scale" in q_cal
    got_static = P.upsample2x_conv(q_cal, x)
    np.testing.assert_allclose(
        np.asarray(got_static), np.asarray(got), rtol=1e-6, atol=1e-7
    )

    # unfolded int8 quantization still takes the materialized fallback
    q3 = P.quantize_conv_int8(p)
    got_fallback = P.upsample2x_conv(q3, x)
    assert got_fallback.shape == want_fp.shape
    err_fb = np.abs(np.asarray(got_fallback) - np.asarray(want_fp))
    assert np.median(err_fb) < 0.02 * float(jnp.std(want_fp))


def test_conv_im2col_matches_native(rng, monkeypatch):
    """Opt-in im2col 3x3 conv (tiny C_in) == native conv_general_dilated,
    including bias and borders."""
    x = jnp.asarray(rng.normal(size=(2, 9, 7, 3)), jnp.float32)
    p = {
        "kernel": jnp.asarray(rng.normal(size=(3, 3, 3, 8)), jnp.float32),
        "bias": jnp.asarray(rng.normal(size=(8,)), jnp.float32),
    }
    want = P.conv2d(p, x)
    monkeypatch.setattr(P, "_CONV_IM2COL", True)
    got = P.conv2d(p, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_conv_s2d_matches_native(rng, monkeypatch):
    """Opt-in space-to-depth 3x3 conv (tiny C_in, even H/W) == native conv,
    including bias and borders."""
    x = jnp.asarray(rng.normal(size=(2, 10, 8, 3)), jnp.float32)
    p = {
        "kernel": jnp.asarray(rng.normal(size=(3, 3, 3, 8)), jnp.float32),
        "bias": jnp.asarray(rng.normal(size=(8,)), jnp.float32),
    }
    want = P.conv2d(p, x)
    monkeypatch.setattr(P, "_CONV_S2D", True)
    got = P.conv2d(p, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    # odd spatial dims fall back to the native path (no crash, same result)
    x_odd = jnp.asarray(rng.normal(size=(1, 9, 8, 3)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(P.conv2d(p, x_odd)),
        np.asarray(
            jax.lax.conv_general_dilated(
                x_odd, p["kernel"], (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            + p["bias"]
        ),
        atol=1e-5,
    )


def test_conv_tap_matmul_matches_native(rng, monkeypatch):
    """Opt-in tap-matmul 3x3 conv (tiny C_out) == native conv, including
    bias and borders."""
    x = jnp.asarray(rng.normal(size=(2, 9, 7, 32)), jnp.float32)
    p = {
        "kernel": jnp.asarray(rng.normal(size=(3, 3, 32, 3)), jnp.float32),
        "bias": jnp.asarray(rng.normal(size=(3,)), jnp.float32),
    }
    want = P.conv2d(p, x)
    monkeypatch.setattr(P, "_CONV_TAPMM", True)
    got = P.conv2d(p, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_silu_fp32():
    x = jnp.asarray([-1.0, 0.0, 2.0])
    ref = torch.nn.functional.silu(torch.tensor([-1.0, 0.0, 2.0])).numpy()
    np.testing.assert_allclose(np.asarray(P.silu(x)), ref, atol=1e-6)
