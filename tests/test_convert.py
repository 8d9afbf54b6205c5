"""Checkpoint converter tests: diffusers/peft-style torch dicts <-> trees."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instantrestore_tpu.models.unet import UNetConfig, init_unet_params
from instantrestore_tpu.models.vae import VAEConfig, init_vae_params
from instantrestore_tpu.utils import torch_convert as tc

TINY = UNetConfig(
    sample_size=16,
    block_out_channels=(32, 64, 64, 64),
    attention_heads=(1, 2, 2, 2),
    cross_attention_dim=16,
    norm_num_groups=8,
)


def _trees_equal(a, b, path=""):
    if isinstance(a, dict):
        assert set(a) == set(b), f"{path}: {set(a) ^ set(b)}"
        for k in a:
            _trees_equal(a[k], b[k], f"{path}.{k}")
    elif isinstance(a, list):
        assert len(a) == len(b), path
        for i, (x, y) in enumerate(zip(a, b)):
            _trees_equal(x, y, f"{path}[{i}]")
    else:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6, err_msg=path)


@pytest.mark.slow  # >17 s on the 1-CPU CI box (measured round 5)
def test_unet_tree_roundtrip():
    params = init_unet_params(jax.random.PRNGKey(0), TINY)
    sd = tc.tree_to_torch_state_dict(params)
    # spot-check canonical diffusers names exist
    assert "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.weight" in sd
    assert "down_blocks.0.attentions.0.transformer_blocks.0.ff.net.0.proj.weight" in sd
    assert "mid_block.resnets.1.time_emb_proj.weight" in sd
    assert "up_blocks.1.attentions.2.transformer_blocks.0.attn1.to_out.0.bias" in sd
    assert "conv_norm_out.weight" in sd
    back = tc.convert_state_dict(sd)
    _trees_equal(params, back)


@pytest.mark.slow  # >17 s on the 1-CPU CI box (measured round 5)
def test_vae_tree_roundtrip():
    cfg = VAEConfig(block_out_channels=(8, 16, 16, 16), norm_num_groups=4)
    params = init_vae_params(jax.random.PRNGKey(0), cfg)
    sd = tc.tree_to_torch_state_dict(params)
    assert "encoder.down_blocks.0.resnets.0.norm1.weight" in sd
    assert "encoder.mid_block.attentions.0.to_out.0.weight" in sd
    assert "decoder.up_blocks.3.upsamplers" not in " ".join(sd)  # last block: no upsampler
    assert "quant_conv.weight" in sd
    back = tc.convert_state_dict(sd)
    _trees_equal(params, back)


def test_linear_and_conv_layout_conversion(rng):
    w_lin = rng.normal(size=(6, 4)).astype(np.float32)  # torch [out, in]
    w_conv = rng.normal(size=(6, 4, 3, 3)).astype(np.float32)  # OIHW
    tree = tc.convert_state_dict(
        {"foo.weight": w_lin, "foo.bias": np.zeros(6, np.float32), "bar.weight": w_conv}
    )
    assert tree["foo"]["kernel"].shape == (4, 6)
    np.testing.assert_allclose(np.asarray(tree["foo"]["kernel"]), w_lin.T)
    assert tree["bar"]["kernel"].shape == (3, 3, 4, 6)
    np.testing.assert_allclose(
        np.asarray(tree["bar"]["kernel"]), w_conv.transpose(2, 3, 1, 0)
    )


def test_peft_base_layer_and_lora_keys(rng):
    w = rng.normal(size=(8, 4)).astype(np.float32)
    a = rng.normal(size=(2, 4)).astype(np.float32)  # peft lora_A [r, in]
    b = rng.normal(size=(8, 2)).astype(np.float32)  # peft lora_B [out, r]
    sd = {
        "blocks.0.attn.to_q.base_layer.weight": w,
        "blocks.0.attn.to_q.lora_A.default.weight": a,
        "blocks.0.attn.to_q.lora_B.default.weight": b,
    }
    tree = tc.convert_state_dict(sd)
    q = tree["blocks"][0]["attn"]["to_q"]
    np.testing.assert_allclose(np.asarray(q["kernel"]), w.T)
    np.testing.assert_allclose(np.asarray(q["lora_A"]), a.T)
    np.testing.assert_allclose(np.asarray(q["lora_B"]), b.T)


def test_peft_conv_lora_layout(rng):
    a = rng.normal(size=(2, 4, 3, 3)).astype(np.float32)  # [r, in, kh, kw]
    b = rng.normal(size=(8, 2, 1, 1)).astype(np.float32)  # [out, r, 1, 1]
    sd = {
        "resnets.0.conv1.lora_A.vae_skip.weight": a,
        "resnets.0.conv1.lora_B.vae_skip.weight": b,
        "resnets.0.conv1.base_layer.weight": rng.normal(size=(8, 4, 3, 3)).astype(np.float32),
    }
    tree = tc.convert_state_dict(sd)
    c = tree["resnets"][0]["conv1"]
    assert c["lora_A"].shape == (3, 3, 4, 2)
    assert c["lora_B"].shape == (1, 1, 2, 8)
    assert c["kernel"].shape == (3, 3, 4, 8)


def test_split_full_checkpoint_prefixes(rng):
    w = rng.normal(size=(4, 4)).astype(np.float32)
    sd = {
        "net.unet.conv_in.weight": w,
        "net.module.vae.encoder.conv_in.bias": np.zeros(4, np.float32),
        "net.original_unet.conv_in.weight": w,
        "net.text_encoder.text_model.final_layer_norm.weight": np.ones(4, np.float32),
    }
    groups = tc.split_full_checkpoint(sd)
    assert set(groups) == {"unet", "vae", "original_unet", "text_encoder"}
    assert "conv_in.weight" in groups["unet"]
    assert "encoder.conv_in.bias" in groups["vae"]


def test_lora_only_overlay():
    base = {"conv_in": {"kernel": jnp.zeros((3, 3, 4, 8)), "bias": jnp.zeros(8)}}
    overlay_sd = {"conv_in.weight": np.ones((8, 4, 3, 3), np.float32)}
    merged = tc.apply_lora_only_checkpoint(base, overlay_sd)
    np.testing.assert_allclose(np.asarray(merged["conv_in"]["kernel"]), 1.0)
    np.testing.assert_allclose(np.asarray(merged["conv_in"]["bias"]), 0.0)


def test_lora_scaling_reference_quirk():
    # peft default alpha=8 at load time -> 8/32 = 0.25 for shipped rank-32
    assert tc.lora_scaling_for_loaded(32) == 0.25
    assert tc.lora_scaling_for_loaded(32, alpha=16) == 0.5


def test_lora_only_export_import_roundtrip(tmp_path):
    """Our export writes the reference save_model schema; our importer reads
    it back bit-exactly."""
    import jax
    from instantrestore_tpu.models.lora import UNET_LORA_TARGETS, attach_lora
    from instantrestore_tpu.models.vae import VAEConfig as VC, init_vae_params

    unet = init_unet_params(jax.random.PRNGKey(0), TINY)
    unet = attach_lora(unet, jax.random.PRNGKey(1), 4, UNET_LORA_TARGETS)
    # make lora_B nonzero so the roundtrip is meaningful
    unet["conv_out"]["lora_B"] = jnp.ones_like(unet["conv_out"]["lora_B"])
    vae = init_vae_params(jax.random.PRNGKey(2), VC(block_out_channels=(8, 16, 16, 16), norm_num_groups=4))
    params = {"unet": unet, "vae": vae}
    path = str(tmp_path / "export.pt")
    tc.export_lora_only_checkpoint(params, path, rank_unet=4, rank_vae=4)

    loaded = tc.load_torch_checkpoint(path)
    assert loaded["format"] == "lora_only"
    assert loaded["meta"]["rank_unet"] == 4
    overlay = loaded["params"]["unet_overlay"]
    np.testing.assert_allclose(
        np.asarray(overlay["conv_out"]["lora_B"]),
        np.asarray(unet["conv_out"]["lora_B"]),
        atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(overlay["conv_in"]["kernel"]),
        np.asarray(unet["conv_in"]["kernel"]),
        atol=1e-7,
    )
