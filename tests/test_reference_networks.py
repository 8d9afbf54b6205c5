"""train_reference_networks: rank-16 LoRA on the frozen K/V-capture nets
(reference pix2pix_turbo.py:163-168,183-188,224-231; VERDICT.md #8) — the
originals become explicit trainable trees instead of zero-cost views."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import optax

from instantrestore_tpu.models.lora import trainable_mask
from instantrestore_tpu.models.restorer import (
    RestorerStatics,
    init_restorer_params,
    original_unet_view,
    restore_forward,
)
from instantrestore_tpu.models.unet import UNetConfig
from instantrestore_tpu.models.vae import VAEConfig
from instantrestore_tpu.training.optim import freeze_non_trainable

STATICS = RestorerStatics(
    unet_cfg=UNetConfig(
        sample_size=8,
        block_out_channels=(32, 64, 64, 64),
        attention_heads=(1, 2, 2, 2),
        cross_attention_dim=16,
        norm_num_groups=8,
    ),
    vae_cfg=VAEConfig(block_out_channels=(8, 16, 16, 16), norm_num_groups=4),
    train_reference_networks=True,
    compute_dtype=jnp.float32,
)


@pytest.mark.slow  # >20 s on the 1-CPU CI box (measured round 5)
def test_reference_lora_trains_and_base_frozen():
    params = init_restorer_params(
        jax.random.PRNGKey(0), STATICS, lora_rank_unet=4, lora_rank_vae=4
    )
    params["caption_enc"] = jax.random.normal(jax.random.PRNGKey(9), (1, 7, 16))
    assert "original_unet" in params and "original_vae" in params
    # explicit originals take precedence over the stripped view
    assert original_unet_view(params) is params["original_unet"]
    # rank-16 lora on the original attention projections
    oa = params["original_unet"]["up_blocks"][1]["attentions"][0][
        "transformer_blocks"
    ][0]["attn1"]["to_q"]
    assert oa["lora_A"].shape[-1] == 16

    mask = {
        "unet": trainable_mask(params["unet"], extra_trainable=("conv_in",)),
        "unet_orig_conv_in": trainable_mask(params["unet_orig_conv_in"]),
        "vae": trainable_mask(params["vae"]),
        "caption_enc": False,
        "original_unet": trainable_mask(
            params["original_unet"], extra_trainable=("conv_in",)
        ),
        "original_vae": trainable_mask(params["original_vae"]),
    }

    rng = np.random.default_rng(0)
    batch_img = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)), jnp.float32)
    conds = jnp.asarray(rng.uniform(-1, 1, (1, 2, 64, 64, 3)), jnp.float32)
    gt = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)), jnp.float32)

    opt = optax.adam(1e-3)
    opt = optax.masked(opt, mask)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            p = freeze_non_trainable(p, mask)
            out = restore_forward(
                p, batch_img, conds, jnp.asarray([2]),
                rng=jax.random.PRNGKey(1), statics=STATICS, timestep=249,
                sample_posterior=False,
            )
            return jnp.mean((out["output_image"] - gt) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def leaf(p, net):
        return np.asarray(
            p[net]["up_blocks"][1]["attentions"][0]["transformer_blocks"][0][
                "attn1"
            ]["to_q"]["lora_B"]
        )

    before_orig = leaf(params, "original_unet").copy()
    before_base = np.asarray(
        params["original_unet"]["up_blocks"][1]["attentions"][0][
            "transformer_blocks"
        ][0]["attn1"]["to_q"]["kernel"]
    ).copy()
    new_params, opt_state, loss = step(params, opt_state)
    assert np.isfinite(float(loss))
    # the reference-net LoRA moved (gradient flows through the capture pass)
    assert not np.allclose(before_orig, leaf(new_params, "original_unet"))
    # its base kernel did not
    after_base = np.asarray(
        new_params["original_unet"]["up_blocks"][1]["attentions"][0][
            "transformer_blocks"
        ][0]["attn1"]["to_q"]["kernel"]
    )
    np.testing.assert_array_equal(before_base, after_base)


def test_view_mode_unchanged_without_flag():
    statics = dataclasses.replace(STATICS, train_reference_networks=False)
    params = init_restorer_params(
        jax.random.PRNGKey(0), statics, lora_rank_unet=4, lora_rank_vae=4
    )
    assert "original_unet" not in params
    view = original_unet_view(params)
    assert "lora_A" not in view["conv_in"]
