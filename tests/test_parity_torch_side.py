"""Unit tests for the torch-side parity consumer's numpy core
(scripts/parity_torch_side.py) — the half that runs in THIS env.

The torch/diffusers capture half runs only in the reference environment;
these tests pin down the comparison logic, the layout converters, and the
noise-derivation algebra against our own scheduler so first contact with the
released checkpoints is turnkey (VERDICT r3 item 2)."""

import importlib.util
import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

_spec = importlib.util.spec_from_file_location(
    "parity_torch_side",
    Path(__file__).resolve().parent.parent / "scripts" / "parity_torch_side.py",
)
pts = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(pts)


def test_stage_sort_key_pipeline_order():
    names = [
        "output_image", "unet.down_block_1", "latent", "unet.conv_in",
        "ref_kv.0.k", "unet.up_block_0", "unet.shared_attn_8", "x0",
        "vae_enc_mean", "unet.down_block_0", "cond_latent",
    ]
    got = sorted(names, key=pts.stage_sort_key)
    assert got == [
        "cond_latent", "ref_kv.0.k", "vae_enc_mean", "latent",
        "unet.conv_in", "unet.down_block_0", "unet.down_block_1",
        "unet.shared_attn_8", "unet.up_block_0", "x0", "output_image",
    ]


def test_torch_kv_to_ours_matches_split_heads():
    """The converter must agree with models/attention.py::_split_heads on the
    pre-split [B*N, S, C] capture layout (attn_processors.py:74)."""
    from instantrestore_tpu.models.attention import _split_heads

    rng = np.random.default_rng(0)
    b, n, s, heads, d = 2, 3, 5, 4, 6
    flat = rng.normal(size=(b * n, s, heads * d)).astype(np.float32)
    want = np.asarray(_split_heads(jnp.asarray(flat), heads)).reshape(
        b, n, heads, s, d
    )
    got = pts.torch_kv_to_ours(flat, b, n, heads)
    np.testing.assert_array_equal(got, want)


def test_derive_noise_inverts_our_add_noise():
    """derive_noise applied to (z, add_noise(z, n, t)) recovers n for both the
    main timestep (249) and the conditioning timestep (1)."""
    from instantrestore_tpu.models import scheduler as sched

    abar = np.asarray(sched.make_alphas_cumprod(), np.float64)
    rng = np.random.default_rng(1)
    z = rng.normal(size=(1, 8, 8, 4)).astype(np.float32)
    noise = rng.normal(size=z.shape).astype(np.float32)
    for t in (249, 1):
        zt = np.asarray(
            sched.add_noise(
                jnp.asarray(abar, jnp.float32), jnp.asarray(z),
                jnp.asarray(noise), jnp.full((1,), t, jnp.int32),
            )
        )
        got = pts.derive_noise(z, zt, abar[t])
        np.testing.assert_allclose(got, noise, atol=1e-5)


def test_compare_stage_dicts_all_ok():
    rng = np.random.default_rng(2)
    ours = {
        "latent": rng.normal(size=(1, 4, 4, 4)).astype(np.float32),
        "unet_eps": rng.normal(size=(1, 4, 4, 4)).astype(np.float32),
    }
    theirs = {k: v + 1e-4 for k, v in ours.items()}
    rep = pts.compare_stage_dicts(ours, theirs, atol=1e-2)
    assert rep["ok"] and rep["first_divergent"] is None
    assert [r["stage"] for r in rep["stages"]] == ["latent", "unet_eps"]
    assert all(r["maxabs"] <= 1e-2 for r in rep["stages"])


def test_compare_stage_dicts_attributes_first_divergence():
    """A planted divergence at mid_block must be named first-divergent even
    though later stages also diverge, and earlier stages stay ok."""
    rng = np.random.default_rng(3)
    shapes = {
        "latent": (1, 4, 4, 4),
        "unet.conv_in": (1, 4, 4, 8),
        "unet.mid_block": (1, 2, 2, 8),
        "unet.up_block_2": (1, 4, 4, 8),
        "output_image": (1, 16, 16, 3),
    }
    ours = {k: rng.normal(size=s).astype(np.float32) for k, s in shapes.items()}
    theirs = {k: v.copy() for k, v in ours.items()}
    for k in ("unet.mid_block", "unet.up_block_2", "output_image"):
        theirs[k] += 0.5
    rep = pts.compare_stage_dicts(ours, theirs, atol=1e-2)
    assert not rep["ok"]
    assert rep["first_divergent"] == "unet.mid_block"
    by_stage = {r["stage"]: r for r in rep["stages"]}
    assert by_stage["latent"]["ok"] and by_stage["unet.conv_in"]["ok"]
    assert not by_stage["output_image"]["ok"]


def test_compare_stage_dicts_shape_mismatch_and_extras():
    ours = {"latent": np.zeros((1, 4, 4, 4), np.float32),
            "only_here": np.zeros((2,), np.float32)}
    theirs = {"latent": np.zeros((1, 4, 4, 8), np.float32),
              "only_there": np.zeros((2,), np.float32)}
    rep = pts.compare_stage_dicts(ours, theirs)
    assert rep["first_divergent"] == "latent"
    assert rep["stages"][0]["error"] == "shape mismatch"
    assert rep["only_ours"] == ["only_here"]
    assert rep["only_theirs"] == ["only_there"]


def test_to_nhwc():
    a = np.arange(2 * 3 * 4 * 5).reshape(2, 3, 4, 5)
    np.testing.assert_array_equal(pts.to_nhwc(a), a.transpose(0, 2, 3, 1))
    b = np.arange(6).reshape(2, 3)
    np.testing.assert_array_equal(pts.to_nhwc(b), b)


@pytest.mark.slow  # >20 s on the 1-CPU CI box (measured round 5)
def test_dump_activations_carries_cond_taps():
    """restore_forward(debug_taps=True) with conditioning images must emit the
    cond_latent/cond_latent_noised taps the torch side derives its cond noise
    from (tiny shapes; full-size dump is scripts/parity.py)."""
    import jax

    from instantrestore_tpu.models.restorer import (
        RestorerStatics,
        init_restorer_params,
        restore_forward,
    )
    from instantrestore_tpu.models.unet import UNetConfig
    from instantrestore_tpu.models.vae import VAEConfig

    statics = RestorerStatics(
        unet_cfg=UNetConfig(
            sample_size=8,
            block_out_channels=(32, 64, 64, 64),
            attention_heads=(1, 2, 2, 2),
            cross_attention_dim=16,
            norm_num_groups=8,
        ),
        vae_cfg=VAEConfig(block_out_channels=(8, 16, 16, 16), norm_num_groups=4),
        use_adain=True,
        train_input=True,
        compute_dtype=jnp.float32,
    )
    params = init_restorer_params(
        jax.random.PRNGKey(0), statics, lora_rank_unet=4, lora_rank_vae=4
    )
    params["caption_enc"] = jax.random.normal(jax.random.PRNGKey(9), (1, 7, 16))
    res = 64
    img = jnp.zeros((1, res, res, 3), jnp.float32)
    conds = jnp.zeros((1, 2, res, res, 3), jnp.float32)
    out = restore_forward(
        params, img, conds, jnp.full((1,), 2, jnp.int32),
        rng=jax.random.PRNGKey(0), statics=statics, timestep=249,
        sample_posterior=False, debug_taps=True,
    )
    taps = out["taps"]
    assert "cond_latent" in taps and "cond_latent_noised" in taps
    lat = res // 8
    assert taps["cond_latent"].shape == (2, lat, lat, 4)
    # the pair inverts back to the exact drawn noise via derive_noise
    from instantrestore_tpu.models import scheduler as sched

    abar = np.asarray(sched.make_alphas_cumprod(), np.float64)
    n = pts.derive_noise(
        np.asarray(taps["cond_latent"], np.float32),
        np.asarray(taps["cond_latent_noised"], np.float32),
        abar[1],
    )
    # unit-gaussian draw: finite, zero-ish mean, std near 1
    assert np.isfinite(n).all()
    assert abs(float(n.mean())) < 0.2 and 0.7 < float(n.std()) < 1.3
