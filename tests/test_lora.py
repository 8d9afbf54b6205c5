import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instantrestore_tpu.models.lora import (
    UNET_LORA_TARGETS,
    VAE_LORA_TARGETS,
    attach_lora,
    count_lora_params,
    strip_lora,
    trainable_mask,
)
from instantrestore_tpu.models.unet import UNetConfig, init_unet_params, unet_apply
from instantrestore_tpu.models.vae import VAEConfig, init_vae_params

TINY = UNetConfig(
    sample_size=16,
    block_out_channels=(32, 64, 64, 64),
    attention_heads=(1, 2, 2, 2),
    cross_attention_dim=16,
    norm_num_groups=8,
)


@pytest.mark.slow  # >20 s on the 1-CPU CI box (measured round 5)
def test_attach_lora_targets_unet():
    params = init_unet_params(jax.random.PRNGKey(0), TINY)
    lp = attach_lora(params, jax.random.PRNGKey(1), 4, UNET_LORA_TARGETS)
    attn = lp["down_blocks"][0]["attentions"][0]["transformer_blocks"][0]["attn1"]
    assert "lora_A" in attn["to_q"] and "lora_A" in attn["to_out"]
    # ff.net targets
    ff = lp["down_blocks"][0]["attentions"][0]["transformer_blocks"][0]["ff"]
    assert "lora_A" in ff["net_0_proj"] and "lora_A" in ff["net_2"]
    # conv targets: resnet conv1/conv2, down/upsampler conv, conv_out
    assert "lora_A" in lp["down_blocks"][0]["resnets"][0]["conv1"]
    assert "lora_A" in lp["down_blocks"][0]["downsamplers"][0]["conv"]
    assert "lora_A" in lp["conv_out"]
    # NOT targeted: conv_in (fully finetuned instead), norms, time_emb_proj
    assert "lora_A" not in lp["conv_in"]
    assert "lora_A" not in lp["down_blocks"][0]["resnets"][0]["time_emb_proj"]
    assert "lora_A" not in lp["time_embedding"]["linear_1"]
    # lora_B zero-init -> forward unchanged at init
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 16, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(3), (1, 7, 16))
    t = jnp.asarray([249])
    base_out, _ = unet_apply(params, x, t, ctx, cfg=TINY, compute_dtype=jnp.float32)
    lora_out, _ = unet_apply(
        lp, x, t, ctx, cfg=TINY, lora_scaling=0.5, compute_dtype=jnp.float32
    )
    np.testing.assert_allclose(np.asarray(base_out), np.asarray(lora_out), atol=1e-6)


def test_attach_lora_vae_conv_in():
    cfg = VAEConfig(block_out_channels=(8, 16, 16, 16), norm_num_groups=4)
    params = init_vae_params(jax.random.PRNGKey(0), cfg)
    lp = attach_lora(params, jax.random.PRNGKey(1), 4, VAE_LORA_TARGETS)
    assert "lora_A" in lp["encoder"]["conv_in"]  # conv_in IS a VAE target
    assert "lora_A" in lp["decoder"]["up_blocks"][0]["resnets"][0]["conv1"]
    assert "lora_A" in lp["encoder"]["mid_block"]["attentions"][0]["to_q"]
    assert "lora_A" not in lp["encoder"]["mid_block"]["attentions"][0]["group_norm"]
    assert count_lora_params(lp) > 0


def test_strip_lora_shares_arrays():
    params = init_unet_params(jax.random.PRNGKey(0), TINY)
    lp = attach_lora(params, jax.random.PRNGKey(1), 4, UNET_LORA_TARGETS)
    stripped = strip_lora(lp)
    q = stripped["down_blocks"][0]["attentions"][0]["transformer_blocks"][0]["attn1"]["to_q"]
    assert "lora_A" not in q
    # same underlying array object (no copy)
    assert q["kernel"] is lp["down_blocks"][0]["attentions"][0]["transformer_blocks"][0]["attn1"]["to_q"]["kernel"]


def test_trainable_mask():
    params = init_unet_params(jax.random.PRNGKey(0), TINY)
    lp = attach_lora(params, jax.random.PRNGKey(1), 4, UNET_LORA_TARGETS)
    mask = trainable_mask(lp, extra_trainable=("conv_in",))
    assert mask["conv_in"]["kernel"] is True
    assert mask["conv_in"]["bias"] is True
    attn = mask["down_blocks"][0]["attentions"][0]["transformer_blocks"][0]["attn1"]
    assert attn["to_q"]["lora_A"] is True
    assert attn["to_q"]["kernel"] is False
    assert mask["conv_norm_out"]["scale"] is False
    # mask tree structure matches param tree
    jax.tree_util.tree_structure(mask) == jax.tree_util.tree_structure(lp)


def test_merge_lora_exactness(rng=None):
    import numpy as np
    from instantrestore_tpu.models.lora import merge_lora
    from instantrestore_tpu.ops.primitives import conv2d, dense

    rng = np.random.default_rng(3)
    # dense
    p = {
        "kernel": jnp.asarray(rng.normal(size=(8, 6)).astype(np.float32)),
        "bias": jnp.asarray(rng.normal(size=6).astype(np.float32)),
        "lora_A": jnp.asarray(rng.normal(size=(8, 2)).astype(np.float32)),
        "lora_B": jnp.asarray(rng.normal(size=(2, 6)).astype(np.float32)),
    }
    x = jnp.asarray(rng.normal(size=(3, 8)).astype(np.float32))
    merged = merge_lora({"layer": p}, 0.5)["layer"]
    assert "lora_A" not in merged
    np.testing.assert_allclose(
        np.asarray(dense(merged, x)), np.asarray(dense(p, x, lora_scaling=0.5)), atol=1e-5
    )
    # conv
    pc = {
        "kernel": jnp.asarray(rng.normal(size=(3, 3, 4, 6)).astype(np.float32)),
        "lora_A": jnp.asarray(rng.normal(size=(3, 3, 4, 2)).astype(np.float32)),
        "lora_B": jnp.asarray(rng.normal(size=(1, 1, 2, 6)).astype(np.float32)),
    }
    xi = jnp.asarray(rng.normal(size=(1, 8, 8, 4)).astype(np.float32))
    mc = merge_lora({"c": pc}, 0.25)["c"]
    np.testing.assert_allclose(
        np.asarray(conv2d(mc, xi)), np.asarray(conv2d(pc, xi, lora_scaling=0.25)), atol=1e-4
    )
