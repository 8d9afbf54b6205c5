import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from instantrestore_tpu.models.vit import (
    ViTConfig,
    convert_vit_params,
    init_vit_params,
    vit_intermediate_layers,
)
from instantrestore_tpu.training.losses import gan

TINY_VIT = ViTConfig(patch_size=14, embed_dim=64, depth=4, num_heads=4,
                     mlp_ratio=2.0, pos_grid=16, layerscale=True)


def test_vit_intermediate_layers_shapes():
    params = init_vit_params(jax.random.PRNGKey(0), TINY_VIT)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 224, 224, 3))
    outs = vit_intermediate_layers(params, x, n=3, cfg=TINY_VIT)
    assert len(outs) == 3
    patches, cls = outs[0]
    assert patches.shape == (2, 16 * 16, 64)
    assert cls.shape == (2, 64)


def test_sn_power_iteration_normalizes():
    w = jnp.asarray(np.random.default_rng(0).normal(size=(16, 8)), jnp.float32) * 5.0
    u = gan._sn_init(jax.random.PRNGKey(0), w.shape)
    k = w
    for _ in range(30):
        k_n, u = gan._sn_apply(w, u, update=True)
    # spectral norm of normalized kernel ~ 1
    s = np.linalg.svd(np.asarray(k_n), compute_uv=False)[0]
    np.testing.assert_allclose(s, 1.0, atol=1e-3)


def test_diff_augment_shapes_and_grad(rng):
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    out = gan.diff_augment(x, jax.random.PRNGKey(0))
    assert out.shape == x.shape
    g = jax.grad(lambda im: gan.diff_augment(im, jax.random.PRNGKey(0)).sum())(x)
    assert np.isfinite(np.asarray(g)).all()
    # cutout zeroed a square
    assert (np.asarray(out) == 0).mean() > 0.1


def test_multilevel_sigmoid_loss_targets():
    logits = [jnp.zeros((2, 4, 4)), jnp.zeros((2, 1))]
    # at logit 0: BCE(0, t) = log(2) - 0*t... => -(t*log(.5)+(1-t)*log(.5)) = log 2
    real = gan.multilevel_sigmoid_loss(logits, for_real=True)
    fake = gan.multilevel_sigmoid_loss(logits, for_real=False)
    assert real.shape == (2, 1)
    np.testing.assert_allclose(np.asarray(real), 2 * np.log(2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(fake), 2 * np.log(2), atol=1e-5)
    # positive logits: real (target .8) loss < fake (target 0) loss
    logits = [jnp.full((2, 4, 4), 3.0), jnp.full((2, 1), 3.0)]
    real = gan.multilevel_sigmoid_loss(logits, for_real=True)
    fake = gan.multilevel_sigmoid_loss(logits, for_real=False)
    assert (np.asarray(real) < np.asarray(fake)).all()


def test_discriminator_end_to_end(rng):
    backbone = init_vit_params(jax.random.PRNGKey(0), TINY_VIT)
    # heads expect 1024-dim features; build a matching tiny head set
    import instantrestore_tpu.ops.primitives as P

    keys = iter(jax.random.split(jax.random.PRNGKey(1), 12))

    def sn(p, k):
        p = dict(p)
        p["u"] = gan._sn_init(k, p["kernel"].shape)
        return p

    heads = {
        "spatial": [
            {"conv1": sn(P.init_conv2d(next(keys), 64, 32, 3), next(keys)),
             "conv2": sn(P.init_conv2d(next(keys), 32, 1, 1), next(keys))}
            for _ in range(2)
        ],
        "token_fc": sn(P.init_dense(next(keys), 64, 32), next(keys)),
        "token_out": sn(P.init_dense(next(keys), 32, 1), next(keys)),
    }
    imgs = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).clip(-1, 1), jnp.float32)
    loss, new_heads = gan.discriminate(
        backbone, heads, imgs, jax.random.PRNGKey(2), for_real=True, vit_cfg=TINY_VIT
    )
    assert loss.shape == (2, 1)
    assert np.isfinite(np.asarray(loss)).all()
    # sn u vectors updated
    assert not np.allclose(
        np.asarray(new_heads["token_fc"]["u"]), np.asarray(heads["token_fc"]["u"])
    )
    # G gradient flows into images
    g = jax.grad(
        lambda im: gan.discriminate(
            backbone, heads, im, jax.random.PRNGKey(2), for_g=True, vit_cfg=TINY_VIT
        )[0].mean()
    )(imgs)
    assert float(jnp.abs(g).sum()) > 0


def test_vit_conversion_from_torch_layout(rng):
    d, depth = 32, 2
    sd = {
        "patch_embed.proj.weight": rng.normal(size=(d, 3, 14, 14)).astype(np.float32),
        "patch_embed.proj.bias": np.zeros(d, np.float32),
        "cls_token": rng.normal(size=(1, 1, d)).astype(np.float32),
        "pos_embed": rng.normal(size=(1, 257, d)).astype(np.float32),
        "norm.weight": np.ones(d, np.float32),
        "norm.bias": np.zeros(d, np.float32),
    }
    for i in range(depth):
        sd.update({
            f"blocks.{i}.norm1.weight": np.ones(d, np.float32),
            f"blocks.{i}.norm1.bias": np.zeros(d, np.float32),
            f"blocks.{i}.attn.qkv.weight": rng.normal(size=(3 * d, d)).astype(np.float32),
            f"blocks.{i}.attn.qkv.bias": np.zeros(3 * d, np.float32),
            f"blocks.{i}.attn.proj.weight": rng.normal(size=(d, d)).astype(np.float32),
            f"blocks.{i}.attn.proj.bias": np.zeros(d, np.float32),
            f"blocks.{i}.norm2.weight": np.ones(d, np.float32),
            f"blocks.{i}.norm2.bias": np.zeros(d, np.float32),
            f"blocks.{i}.mlp.fc1.weight": rng.normal(size=(2 * d, d)).astype(np.float32),
            f"blocks.{i}.mlp.fc1.bias": np.zeros(2 * d, np.float32),
            f"blocks.{i}.mlp.fc2.weight": rng.normal(size=(d, 2 * d)).astype(np.float32),
            f"blocks.{i}.mlp.fc2.bias": np.zeros(d, np.float32),
            f"blocks.{i}.ls1.gamma": np.full(d, 1e-5, np.float32),
            f"blocks.{i}.ls2.gamma": np.full(d, 1e-5, np.float32),
        })
    params = convert_vit_params(sd)
    assert len(params["blocks"]) == depth
    assert params["patch_embed"]["kernel"].shape == (14, 14, 3, d)
    cfg = ViTConfig(patch_size=14, embed_dim=d, depth=depth, num_heads=4,
                    mlp_ratio=2.0, pos_grid=16)
    outs = vit_intermediate_layers(params, jnp.zeros((1, 224, 224, 3)), n=2, cfg=cfg)
    assert outs[0][0].shape == (1, 256, d)


def test_vgg_discriminator_backbone():
    """Second gan_disc_type ('vgg', cv_discriminator.py:137-138): VGG16
    features + SimpleD spectral-norm head, full D pass both directions."""
    import jax
    from instantrestore_tpu.training.losses import gan as gan_mod

    key = jax.random.PRNGKey(0)
    backbone = gan_mod.init_vgg_backbone(key)
    heads = gan_mod.init_simple_head(jax.random.fold_in(key, 1))

    x = jax.random.normal(jax.random.fold_in(key, 2), (2, 64, 64, 3), jnp.float32)
    fmap = gan_mod.vgg_backbone_features(backbone, x)
    assert fmap.shape == (2, 7, 7, 512)

    loss_r, heads1 = gan_mod.discriminate(
        backbone, heads, x, jax.random.fold_in(key, 3),
        for_real=True, disc_type="vgg",
    )
    assert loss_r.shape == (2, 1)
    assert np.isfinite(np.asarray(loss_r)).all()
    # SN power-iteration state advanced
    assert not np.allclose(
        np.asarray(heads["conv1"]["u"]), np.asarray(heads1["conv1"]["u"])
    )
    # G-side gradient flows back to the image
    g = jax.grad(
        lambda img: gan_mod.discriminate(
            backbone, heads, img, jax.random.fold_in(key, 4),
            for_g=True, update_sn=False, disc_type="vgg", diffaug=False,
        )[0].sum()
    )(x)
    assert float(jnp.abs(g).sum()) > 0
