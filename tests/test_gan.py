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


TINY_CLIP = ViTConfig(patch_size=32, embed_dim=64, depth=3, num_heads=4,
                      mlp_ratio=2.0, pos_grid=7, layerscale=False,
                      quick_gelu=True, ln_pre=True, proj_dim=24)


def test_clip_discriminator_backbone(rng):
    """Third gan_disc_type ('clip', cvmodel.py:91-139 + MultiLevelDViT
    down=1): raw taps at depth/3 boundaries + projected class embedding."""
    from instantrestore_tpu.models.vit import clip_multi_level, init_vit_params

    backbone = init_vit_params(jax.random.PRNGKey(0), TINY_CLIP)
    assert "ln_pre" in backbone and "proj" in backbone

    x = jnp.asarray(rng.normal(size=(2, 224, 224, 3)), jnp.float32)
    f0, f1, tok = clip_multi_level(backbone, x, cfg=TINY_CLIP)
    assert f0.shape == (2, 7, 7, 64) and f1.shape == (2, 7, 7, 64)
    assert tok.shape == (2, 24)

    heads = gan.init_discriminator_heads(
        jax.random.PRNGKey(1), embed_dim=64, out_ch=16, token_dim=24
    )
    imgs = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).clip(-1, 1), jnp.float32)
    loss, new_heads = gan.discriminate(
        backbone, heads, imgs, jax.random.PRNGKey(2), for_real=True,
        vit_cfg=TINY_CLIP, disc_type="clip",
    )
    assert loss.shape == (2, 1)
    assert np.isfinite(np.asarray(loss)).all()
    g = jax.grad(
        lambda im: gan.discriminate(
            backbone, heads, im, jax.random.PRNGKey(2), for_g=True,
            vit_cfg=TINY_CLIP, disc_type="clip", diffaug=False,
        )[0].mean()
    )(imgs)
    assert float(jnp.abs(g).sum()) > 0


def test_clip_conversion_from_torch_layout(rng):
    """convert_clip_visual maps the OpenAI clip visual state dict naming."""
    from instantrestore_tpu.models.vit import clip_multi_level, convert_clip_visual

    d, depth, proj = 32, 3, 16
    sd = {
        "conv1.weight": rng.normal(size=(d, 3, 32, 32)).astype(np.float32),
        "class_embedding": rng.normal(size=(d,)).astype(np.float32),
        "positional_embedding": rng.normal(size=(50, d)).astype(np.float32),
        "ln_pre.weight": np.ones(d, np.float32),
        "ln_pre.bias": np.zeros(d, np.float32),
        "ln_post.weight": np.ones(d, np.float32),
        "ln_post.bias": np.zeros(d, np.float32),
        "proj": rng.normal(size=(d, proj)).astype(np.float32),
    }
    for i in range(depth):
        pre = f"transformer.resblocks.{i}"
        sd.update({
            f"{pre}.ln_1.weight": np.ones(d, np.float32),
            f"{pre}.ln_1.bias": np.zeros(d, np.float32),
            f"{pre}.attn.in_proj_weight": rng.normal(size=(3 * d, d)).astype(np.float32),
            f"{pre}.attn.in_proj_bias": np.zeros(3 * d, np.float32),
            f"{pre}.attn.out_proj.weight": rng.normal(size=(d, d)).astype(np.float32),
            f"{pre}.attn.out_proj.bias": np.zeros(d, np.float32),
            f"{pre}.ln_2.weight": np.ones(d, np.float32),
            f"{pre}.ln_2.bias": np.zeros(d, np.float32),
            f"{pre}.mlp.c_fc.weight": rng.normal(size=(2 * d, d)).astype(np.float32),
            f"{pre}.mlp.c_fc.bias": np.zeros(2 * d, np.float32),
            f"{pre}.mlp.c_proj.weight": rng.normal(size=(d, 2 * d)).astype(np.float32),
            f"{pre}.mlp.c_proj.bias": np.zeros(d, np.float32),
        })
    params = convert_clip_visual(sd)
    assert len(params["blocks"]) == depth
    cfg = ViTConfig(patch_size=32, embed_dim=d, depth=depth, num_heads=4,
                    mlp_ratio=2.0, pos_grid=7, layerscale=False,
                    quick_gelu=True, ln_pre=True, proj_dim=proj)
    f0, f1, tok = clip_multi_level(params, jnp.zeros((1, 224, 224, 3)), cfg=cfg)
    assert f0.shape == (1, 7, 7, d) and tok.shape == (1, proj)


def test_dino_v1_discriminator_config(rng):
    """'dino' gan_disc_type reuses the intermediate-layer path with ViT-B/16
    dims and the 128-channel head (cv_discriminator.py:129-133)."""
    tiny_dino = ViTConfig(patch_size=16, embed_dim=48, depth=4, num_heads=4,
                          mlp_ratio=2.0, pos_grid=14, layerscale=False)
    from instantrestore_tpu.models.vit import init_vit_params

    backbone = init_vit_params(jax.random.PRNGKey(0), tiny_dino)
    heads = gan.init_discriminator_heads(
        jax.random.PRNGKey(1), embed_dim=48, out_ch=16
    )
    imgs = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).clip(-1, 1), jnp.float32)
    loss, _ = gan.discriminate(
        backbone, heads, imgs, jax.random.PRNGKey(2), for_real=False,
        vit_cfg=tiny_dino, disc_type="dino",
    )
    assert loss.shape == (1, 1) and np.isfinite(np.asarray(loss)).all()


def test_face_normals_discriminator(rng):
    """'face_normals' gan_disc_type: ResNet18 encoder features (8x8x512) +
    SimpleD(512, out_size=4) (face_normals.py:191-195,
    cv_discriminator.py:145-146)."""
    from instantrestore_tpu.training.losses.backbones import (
        face_normals_features,
        init_resnet18,
    )

    backbone = init_resnet18(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).clip(-1, 1), jnp.float32)
    fmap = face_normals_features(backbone, x)
    assert fmap.shape == (2, 8, 8, 512)

    heads = gan.init_simple_head(jax.random.PRNGKey(1), in_ch=512, out_size=4)
    loss, new_heads = gan.discriminate(
        backbone, heads, x, jax.random.PRNGKey(2), for_real=True,
        disc_type="face_normals",
    )
    assert loss.shape == (2, 1) and np.isfinite(np.asarray(loss)).all()
    g = jax.grad(
        lambda im: gan.discriminate(
            backbone, heads, im, jax.random.PRNGKey(2), for_g=True,
            disc_type="face_normals", diffaug=False,
        )[0].sum()
    )(x)
    assert float(jnp.abs(g).sum()) > 0


def test_face_seg_discriminator(rng):
    """'face_seg' gan_disc_type: parsing-UNet center features avg-pooled to
    8x8x256 + SimpleD(256, out_size=4) (face_parsing.py:967-968)."""
    from instantrestore_tpu.training.losses.backbones import (
        face_seg_features,
        init_parsing_unet,
    )

    backbone = init_parsing_unet(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).clip(-1, 1), jnp.float32)
    fmap = face_seg_features(backbone, x)
    assert fmap.shape == (1, 8, 8, 256)

    heads = gan.init_simple_head(jax.random.PRNGKey(1), in_ch=256, out_size=4)
    loss, _ = gan.discriminate(
        backbone, heads, x, jax.random.PRNGKey(2), for_real=False,
        disc_type="face_seg",
    )
    assert loss.shape == (1, 1) and np.isfinite(np.asarray(loss)).all()


def test_swin_discriminator(rng):
    """'swin' gan_disc_type: Swin-T windowed encoder -> 7x7x768 final-norm
    features + SimpleD(768) (cvmodel.py:38-89)."""
    from instantrestore_tpu.models.swin import SWIN_TINY, init_swin_params, swin_features

    backbone = init_swin_params(jax.random.PRNGKey(0))
    x224 = jnp.asarray(rng.normal(size=(1, 224, 224, 3)), jnp.float32)
    fmap = swin_features(backbone, x224)
    assert fmap.shape == (1, 7, 7, 768)
    assert np.isfinite(np.asarray(fmap)).all()

    heads = gan.init_simple_head(jax.random.PRNGKey(1), in_ch=768, out_size=3)
    imgs = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).clip(-1, 1), jnp.float32)
    loss, _ = gan.discriminate(
        backbone, heads, imgs, jax.random.PRNGKey(2), for_real=True,
        disc_type="swin",
    )
    assert loss.shape == (1, 1) and np.isfinite(np.asarray(loss)).all()


def test_swin_conversion_and_resnet_conversion(rng):
    """Converters map the timm-swin and torchvision-resnet18 state dict
    layouts (shapes only; weights random)."""
    from instantrestore_tpu.models.swin import SwinConfig, convert_swin_params, swin_features
    from instantrestore_tpu.training.losses.backbones import (
        convert_resnet18,
        resnet18_features,
    )

    # tiny swin: dims 8, depths (1,1), heads (1,2), window 7
    cfg = SwinConfig(embed_dim=8, depths=(1, 1), num_heads=(1, 2))
    sd = {
        "patch_embed.proj.weight": rng.normal(size=(8, 3, 4, 4)).astype(np.float32),
        "patch_embed.proj.bias": np.zeros(8, np.float32),
        "patch_embed.norm.weight": np.ones(8, np.float32),
        "patch_embed.norm.bias": np.zeros(8, np.float32),
        "norm.weight": np.ones(16, np.float32),
        "norm.bias": np.zeros(16, np.float32),
    }
    for si, dim in enumerate((8, 16)):
        pre = f"layers.{si}.blocks.0"
        sd.update({
            f"{pre}.norm1.weight": np.ones(dim, np.float32),
            f"{pre}.norm1.bias": np.zeros(dim, np.float32),
            f"{pre}.attn.qkv.weight": rng.normal(size=(3 * dim, dim)).astype(np.float32) * 0.1,
            f"{pre}.attn.qkv.bias": np.zeros(3 * dim, np.float32),
            f"{pre}.attn.proj.weight": rng.normal(size=(dim, dim)).astype(np.float32) * 0.1,
            f"{pre}.attn.proj.bias": np.zeros(dim, np.float32),
            f"{pre}.attn.relative_position_bias_table": rng.normal(size=(13 * 13, cfg.num_heads[si])).astype(np.float32),
            f"{pre}.norm2.weight": np.ones(dim, np.float32),
            f"{pre}.norm2.bias": np.zeros(dim, np.float32),
            f"{pre}.mlp.fc1.weight": rng.normal(size=(2 * dim, dim)).astype(np.float32) * 0.1,
            f"{pre}.mlp.fc1.bias": np.zeros(2 * dim, np.float32),
            f"{pre}.mlp.fc2.weight": rng.normal(size=(dim, 2 * dim)).astype(np.float32) * 0.1,
            f"{pre}.mlp.fc2.bias": np.zeros(dim, np.float32),
        })
    sd.update({
        "layers.0.downsample.norm.weight": np.ones(32, np.float32),
        "layers.0.downsample.norm.bias": np.zeros(32, np.float32),
        "layers.0.downsample.reduction.weight": rng.normal(size=(16, 32)).astype(np.float32) * 0.1,
    })
    params = convert_swin_params(sd)
    cfg2 = SwinConfig(embed_dim=8, depths=(1, 1), num_heads=(1, 2), mlp_ratio=2.0)
    out = swin_features(params, jnp.zeros((1, 56, 56, 3)), cfg=cfg2)
    assert out.shape == (1, 7, 7, 16)

    # resnet18 converter
    sd2 = {
        "conv1.weight": rng.normal(size=(64, 3, 7, 7)).astype(np.float32) * 0.05,
    }
    for bn in ["bn1"]:
        sd2.update({f"{bn}.weight": np.ones(64, np.float32),
                    f"{bn}.bias": np.zeros(64, np.float32),
                    f"{bn}.running_mean": np.zeros(64, np.float32),
                    f"{bn}.running_var": np.ones(64, np.float32)})
    widths = [64, 128, 256, 512]
    cin = 64
    for li, width in enumerate(widths, start=1):
        for b in range(2):
            base = f"layer{li}.{b}"
            c_in = cin if b == 0 else width
            sd2[f"{base}.conv1.weight"] = rng.normal(size=(width, c_in, 3, 3)).astype(np.float32) * 0.05
            sd2[f"{base}.conv2.weight"] = rng.normal(size=(width, width, 3, 3)).astype(np.float32) * 0.05
            for bn in ("bn1", "bn2"):
                sd2.update({f"{base}.{bn}.weight": np.ones(width, np.float32),
                            f"{base}.{bn}.bias": np.zeros(width, np.float32),
                            f"{base}.{bn}.running_mean": np.zeros(width, np.float32),
                            f"{base}.{bn}.running_var": np.ones(width, np.float32)})
            if b == 0 and (width != cin or li > 1):
                sd2[f"{base}.downsample.0.weight"] = rng.normal(size=(width, cin, 1, 1)).astype(np.float32) * 0.05
                sd2.update({f"{base}.downsample.1.weight": np.ones(width, np.float32),
                            f"{base}.downsample.1.bias": np.zeros(width, np.float32),
                            f"{base}.downsample.1.running_mean": np.zeros(width, np.float32),
                            f"{base}.downsample.1.running_var": np.ones(width, np.float32)})
        cin = width
    params2 = convert_resnet18(sd2)
    out2 = resnet18_features(params2, jnp.zeros((1, 256, 256, 3)))
    assert out2.shape == (1, 8, 8, 512)


def test_mlp_head(rng):
    """MLPD head (cv_discriminator.py:75-92) on a pooled embedding."""
    heads = gan.init_mlp_head(jax.random.PRNGKey(0), in_ch=32, out_ch=16)
    emb = jnp.asarray(rng.normal(size=(3, 32)), jnp.float32)
    logits, new_heads = gan._mlp_head_apply(heads, emb, update_sn=True)
    assert logits[0].shape == (3, 1)
    loss = gan.multilevel_sigmoid_loss(logits, for_real=True)
    assert loss.shape == (3, 1) and np.isfinite(np.asarray(loss)).all()
    assert not np.allclose(np.asarray(new_heads["fc1"]["u"]), np.asarray(heads["fc1"]["u"]))


def test_seg_ade_det_coco_swin_256(rng):
    """Task-specific Swin cv_types (swintaskspecific.py:623-659): 256px
    input, window-padded grids (64 is not a multiple of 7), stride-32
    features + SimpleD(768, out_size=4)."""
    from instantrestore_tpu.models.swin import SwinConfig, init_swin_params, swin_features

    cfg = SwinConfig(embed_dim=12, depths=(1, 1), num_heads=(2, 4))
    backbone = init_swin_params(jax.random.PRNGKey(0), cfg)
    # 64px input -> 16x16 grid (not divisible by window 7) -> pad path
    fmap = swin_features(backbone, jnp.zeros((1, 64, 64, 3)), cfg=cfg)
    assert fmap.shape == (1, 8, 8, 24)
    assert np.isfinite(np.asarray(fmap)).all()

    heads = gan.init_simple_head(jax.random.PRNGKey(1), in_ch=24, out_size=4)
    imgs = jnp.asarray(rng.normal(size=(1, 32, 32, 3)).clip(-1, 1), jnp.float32)
    # monkeypatch-free: call the dispatch with the tiny cfg via swin_features
    # geometry (discriminate resizes to 256 which pads 64->70 per stage)
