"""End-to-end restorer pipeline on tiny configs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instantrestore_tpu.models.restorer import (
    RestorerStatics,
    init_restorer_params,
    original_unet_view,
    original_vae_view,
    restore_forward,
)
from instantrestore_tpu.models.unet import UNetConfig
from instantrestore_tpu.models.vae import VAEConfig

STATICS = RestorerStatics(
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


@pytest.fixture(scope="module")
def setup():
    params = init_restorer_params(
        jax.random.PRNGKey(0), STATICS, lora_rank_unet=4, lora_rank_vae=4
    )
    # tiny caption: [1, 7, 16] instead of [1, 77, 1024]
    params["caption_enc"] = jax.random.normal(jax.random.PRNGKey(9), (1, 7, 16))
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    refs = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 64, 64, 3))
    return params, img, refs


def test_full_restore_forward(setup):
    params, img, refs = setup
    out = restore_forward(
        params,
        img,
        refs,
        valid_indices=jnp.asarray([4, 2]),
        rng=jax.random.PRNGKey(3),
        statics=STATICS,
        timestep=249,
        decode_conditions=True,
    )
    assert out["output_image"].shape == (2, 64, 64, 3)
    assert np.isfinite(np.asarray(out["output_image"])).all()
    assert float(jnp.abs(out["output_image"]).max()) <= 1.0
    assert out["output_image_conditions"].shape == (2, 4, 64, 64, 3)
    assert int(out["timestep"]) == 249


def test_valid_indices_mask_changes_output(setup):
    params, img, refs = setup
    o4 = restore_forward(
        params, img, refs, valid_indices=jnp.asarray([4, 4]),
        rng=jax.random.PRNGKey(3), statics=STATICS, timestep=249,
    )["output_image"]
    o1 = restore_forward(
        params, img, refs, valid_indices=jnp.asarray([1, 1]),
        rng=jax.random.PRNGKey(3), statics=STATICS, timestep=249,
    )["output_image"]
    assert not np.allclose(np.asarray(o4), np.asarray(o1))


def test_train_timestep_sampling(setup):
    params, img, refs = setup
    seen = set()
    for i in range(8):
        out = restore_forward(
            params, img[:1], None, rng=jax.random.PRNGKey(i), statics=STATICS,
        )
        seen.add(int(out["timestep"]))
    assert seen <= {249, 499, 749}
    assert len(seen) > 1


def test_original_views_share_base_weights(setup):
    params, _, _ = setup
    ounet = original_unet_view(params)
    q = ounet["down_blocks"][0]["attentions"][0]["transformer_blocks"][0]["attn1"]["to_q"]
    assert "lora_A" not in q
    assert (
        q["kernel"]
        is params["unet"]["down_blocks"][0]["attentions"][0]["transformer_blocks"][0][
            "attn1"
        ]["to_q"]["kernel"]
    )
    assert ounet["conv_in"] is not params["unet"]["conv_in"]
    ovae = original_vae_view(params)
    assert "lora_A" not in ovae["encoder"]["conv_in"]


def test_no_shared_attention_path(setup):
    params, img, _ = setup
    statics = RestorerStatics(
        unet_cfg=STATICS.unet_cfg, vae_cfg=STATICS.vae_cfg,
        use_shared_attention=False, compute_dtype=jnp.float32,
    )
    out = restore_forward(
        params, img, None, rng=jax.random.PRNGKey(3), statics=statics, timestep=249
    )
    assert out["output_image"].shape == (2, 64, 64, 3)


def test_jit_forward(setup):
    params, img, refs = setup

    @jax.jit
    def f(p, x, r, rng):
        return restore_forward(
            p, x, r, rng=rng, statics=STATICS, timestep=249
        )["output_image"]

    out = f(params, img, refs, jax.random.PRNGKey(0))
    assert out.shape == (2, 64, 64, 3)


def test_multistep_restore(setup):
    from instantrestore_tpu.models.restorer import restore_forward_multistep

    params, img, refs = setup
    out = restore_forward_multistep(
        params, img[:1], refs[:1], rng=jax.random.PRNGKey(5), statics=STATICS,
        timesteps=(749, 499, 249),
    )
    assert out["output_image"].shape == (1, 64, 64, 3)
    assert np.isfinite(np.asarray(out["output_image"])).all()
    # single-step multistep == schedule of one step
    one = restore_forward_multistep(
        params, img[:1], refs[:1], rng=jax.random.PRNGKey(5), statics=STATICS,
        timesteps=(249,),
    )
    assert one["output_image"].shape == (1, 64, 64, 3)


def test_remat_grad_parity():
    """remat=True must not change gradients (jax.checkpoint is semantically
    transparent) — it only trades memory for recompute in backward."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from instantrestore_tpu.models.restorer import (
        RestorerStatics, init_restorer_params, restore_forward,
    )
    from instantrestore_tpu.models.unet import UNetConfig
    from instantrestore_tpu.models.vae import VAEConfig

    statics = RestorerStatics(
        unet_cfg=UNetConfig(sample_size=8, block_out_channels=(32, 64, 64, 64),
                            attention_heads=(1, 2, 2, 2), cross_attention_dim=16,
                            norm_num_groups=8),
        vae_cfg=VAEConfig(block_out_channels=(8, 16, 16, 16), norm_num_groups=4),
        use_adain=True, train_input=False, compute_dtype=jnp.float32,
    )
    params = init_restorer_params(jax.random.PRNGKey(0), statics,
                                  lora_rank_unet=2, lora_rank_vae=2)
    params["caption_enc"] = jax.random.normal(jax.random.PRNGKey(7), (1, 7, 16))
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3), minval=-1, maxval=1)
    refs = jax.random.uniform(jax.random.PRNGKey(2), (1, 2, 64, 64, 3), minval=-1, maxval=1)

    def loss(p, remat):
        out = restore_forward(
            p, img, refs, jnp.full((1,), 2, jnp.int32), rng=jax.random.PRNGKey(3),
            statics=statics, timestep=249, sample_posterior=False, remat=remat,
        )
        return jnp.mean(out["output_image"] ** 2)

    g0 = jax.jit(jax.grad(loss), static_argnums=1)(params, False)
    g1 = jax.jit(jax.grad(loss), static_argnums=1)(params, True)
    f0, _ = jax.tree_util.tree_flatten(g0)
    f1, _ = jax.tree_util.tree_flatten(g1)
    for a, b in zip(f0, f1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
