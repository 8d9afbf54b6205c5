"""Vision-aided GAN discriminator (DINOv2 backbone) in JAX.

Twin of /root/reference/face_replace/training/vision_aided_loss/: frozen
DINOv2 ViT-L/14 feature ensemble + trainable spectral-norm multi-level heads
+ DiffAugment('color,translation,cutout') + ``multilevel_sigmoid_s``
(BCE-with-logits against 0.8-smoothed real targets, cv_losses.py:26-47 with
alpha=0.8).

Functional design: the head parameters and the spectral-norm power-iteration
vectors live in one state pytree; ``discriminate`` returns
(loss, new_state) — the caller threads the state through training steps
(torch updates the u vectors as buffers during forward; here they are data).

Feature taps (cvmodel.py:186-197): input resized to 224 (area), normalized
with CLIP mean / ImageNet std (the reference's exact, if odd, combination);
intermediate layers [0, 4, -1] of the last 8 -> two 16x16x1024 maps + the
final class token. Head (cv_discriminator.py:12-46 MultiLevelDViT, dinov2
branch: in 1024, out 256, down=2): per spatial level
BlurPool4(pad 2, s1) -> SNConv3x3 s2 -> LeakyReLU(0.2) -> BlurPool4(pad 1,
s1) -> SNConv1x1 s2 => [B,4,4] logits; class-token level: SNLinear ->
LeakyReLU -> SNLinear(256->1).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from instantrestore_tpu.models.vit import (
    CLIP_VITB32,
    DINOV2_VITL14,
    ViTConfig,
    clip_multi_level,
    vit_intermediate_layers,
)
from instantrestore_tpu.ops.primitives import init_conv2d, init_dense

# cvmodel.py:183-189
_CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)
# the CLIP backbone is the only one normalized with the true CLIP std
# (cvmodel.py:104-105); dino/dinov2/swin use the CLIP-mean/ImageNet-std mix
_CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)

_BLUR4 = np.array([1.0, 3.0, 3.0, 1.0])
_BLUR4 = np.outer(_BLUR4, _BLUR4)
_BLUR4 = (_BLUR4 / _BLUR4.sum()).astype(np.float32)


# ---------------------------------------------------------------------------
# spectral norm (power iteration state as data)
# ---------------------------------------------------------------------------


def _sn_init(key, shape) -> jnp.ndarray:
    """u vector over the output dimension of a (reshaped) weight matrix."""
    out_dim = shape[-1] if len(shape) == 2 else shape[3]
    u = jax.random.normal(key, (out_dim,))
    return u / jnp.linalg.norm(u)


def _sn_apply(kernel: jnp.ndarray, u: jnp.ndarray, update: bool):
    """One torch-style power iteration; returns (kernel/sigma, new_u).

    torch reshapes conv weights to [out, in*kh*kw]; HWIO -> same matrix with
    out last: W2 [in*kh*kw, out].
    """
    w2 = kernel.reshape(-1, kernel.shape[-1]) if kernel.ndim == 4 else kernel
    w2f = w2.astype(jnp.float32)
    v = w2f @ u
    v = v / (jnp.linalg.norm(v) + 1e-12)
    u_new = w2f.T @ v
    u_new = u_new / (jnp.linalg.norm(u_new) + 1e-12)
    u_used = u_new if update else u
    sigma = v @ (w2f @ u_used)
    k = (w2f / sigma).reshape(kernel.shape).astype(kernel.dtype)
    return k, jax.lax.stop_gradient(u_new)


def _sn_conv(p, x, *, stride, padding, update):
    k, u_new = _sn_apply(p["kernel"], p["u"], update)
    dn = ("NHWC", "HWIO", "NHWC")
    y = jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), (stride, stride),
        [(padding, padding), (padding, padding)], dimension_numbers=dn,
    ) + p["bias"].astype(x.dtype)
    return y, {**p, "u": u_new}


def _sn_dense(p, x, *, update):
    k, u_new = _sn_apply(p["kernel"], p["u"], update)
    y = x @ k.astype(x.dtype) + p["bias"].astype(x.dtype)
    return y, {**p, "u": u_new}


def _blurpool(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Antialiased blur: zero pad then depthwise 4-tap filter, stride 1."""
    c = x.shape[-1]
    x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    filt = jnp.asarray(_BLUR4)[:, :, None, None] * jnp.ones((1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        x, filt.astype(x.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )


# ---------------------------------------------------------------------------
# DiffAugment (color, translation, cutout) — per-sample, differentiable
# ---------------------------------------------------------------------------


def diff_augment(x: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
    """DiffAugment policy 'color,translation,cutout' on NHWC in [-1, 1]."""
    b, h, w, c = x.shape
    r = jax.random.split(rng, 6)
    # brightness: + U(-0.5, 0.5)
    x = x + jax.random.uniform(r[0], (b, 1, 1, 1), minval=-0.5, maxval=0.5)
    # saturation: (x - mean_c) * U(0, 2) + mean_c
    mean_c = x.mean(axis=-1, keepdims=True)
    x = (x - mean_c) * jax.random.uniform(r[1], (b, 1, 1, 1), minval=0.0, maxval=2.0) + mean_c
    # contrast: (x - mean_all) * U(0.5, 1.5) + mean_all
    mean_all = x.mean(axis=(1, 2, 3), keepdims=True)
    x = (x - mean_all) * jax.random.uniform(r[2], (b, 1, 1, 1), minval=0.5, maxval=1.5) + mean_all
    # translation: shift by U(-h/8, h/8), zero pad
    sh = jax.random.randint(r[3], (b,), -(h // 8), h // 8 + 1)
    sw = jax.random.randint(r[4], (b,), -(w // 8), w // 8 + 1)
    ys = jnp.arange(h)[None, :] - sh[:, None]  # [b, h]
    xs = jnp.arange(w)[None, :] - sw[:, None]
    y_ok = (ys >= 0) & (ys < h)
    x_ok = (xs >= 0) & (xs < w)
    ys = jnp.clip(ys, 0, h - 1)
    xs = jnp.clip(xs, 0, w - 1)
    x = jax.vmap(lambda img, yy, xx: img[yy][:, xx])(x, ys, xs)
    x = x * (y_ok[:, :, None, None] & x_ok[:, None, :, None]).astype(x.dtype)
    # cutout: zero square of size h/2 at random offset
    ch = h // 2
    oy = jax.random.randint(r[5], (b,), 0, h + (1 - ch % 2) - ch // 2)
    ox = jax.random.randint(jax.random.fold_in(r[5], 1), (b,), 0, w + (1 - ch % 2) - ch // 2)
    gy = jnp.arange(h)[None, :]
    gx = jnp.arange(w)[None, :]
    mask_y = (gy >= oy[:, None] - ch // 2) & (gy < oy[:, None] + (ch + 1) // 2)
    mask_x = (gx >= ox[:, None] - ch // 2) & (gx < ox[:, None] + (ch + 1) // 2)
    cut = mask_y[:, :, None] & mask_x[:, None, :]
    return x * (1.0 - cut[..., None].astype(x.dtype))


# ---------------------------------------------------------------------------
# VGG16 backbone (gan_disc_type='vgg' — reference cvmodel.Vgg:13-35:
# antialiased_cnns.vgg16 features -> [B, 7, 7, 512])
# ---------------------------------------------------------------------------

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)

# VGG16 conv plan: (out_channels, convs per stage); pool after every stage
_VGG_STAGES = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]


def _blurpool_s2(x: jnp.ndarray) -> jnp.ndarray:
    """Antialiased downsample (antialiased_cnns BlurPool, filt_size=4,
    stride 2, reflect pad (1, 2))."""
    c = x.shape[-1]
    x = jnp.pad(x, ((0, 0), (1, 2), (1, 2), (0, 0)), mode="reflect")
    filt = jnp.asarray(_BLUR4)[:, :, None, None] * jnp.ones((1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        x, filt.astype(x.dtype), (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )


def init_vgg_backbone(key) -> Dict[str, Any]:
    """Random-init VGG16 conv trunk (13 convs); real weights land via the
    LPIPS-style converter (same stage layout as losses/lpips.py)."""
    from instantrestore_tpu.ops.primitives import init_conv2d as _init_conv

    keys = iter(jax.random.split(key, 16))
    stages = []
    in_ch = 3
    for out_ch, n_convs in _VGG_STAGES:
        stage = []
        for _ in range(n_convs):
            stage.append(_init_conv(next(keys), in_ch, out_ch, 3))
            in_ch = out_ch
        stages.append(stage)
    return {"vgg": stages}


def vgg_backbone_features(params: Dict[str, Any], x_pm1: jnp.ndarray) -> jnp.ndarray:
    """[-1,1] images -> [B, 7, 7, 512]: area-resize 224, ImageNet normalize,
    conv stages with antialiased pooling (max s1 + blurpool s2,
    antialiased_cnns semantics)."""
    from instantrestore_tpu.ops.primitives import conv2d as _conv

    b = x_pm1.shape[0]
    x = x_pm1.astype(jnp.float32) * 0.5 + 0.5
    x = jax.image.resize(x, (b, 224, 224, 3), method="linear")
    x = (x - jnp.asarray(_IMAGENET_MEAN)) / jnp.asarray(_IMAGENET_STD)
    for stage in params["vgg"]:
        for conv in stage:
            x = jax.nn.relu(_conv(conv, x))
        # max pool k2 s1 then blurpool s2
        x = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 1, 1, 1),
            [(0, 0), (0, 1), (0, 1), (0, 0)],
        )
        x = _blurpool_s2(x)
    return x


def init_simple_head(key, in_ch: int = 512, out_ch: int = 256, out_size: int = 3) -> Dict[str, Any]:
    """SimpleD (cv_discriminator.py:49-72): blurpool -> SNConv3x3 s2 ->
    LeakyReLU -> flatten -> SNLinear(out_size^2*out_ch -> out_ch) ->
    LeakyReLU -> SNLinear(->1), out_size=3 on the 7x7 vgg/swin maps and 4 on
    the 8x8 face_seg/face_normals maps (cv_discriminator.py:137-146).

    (The torch original's asymmetric BlurPool padding would actually produce
    4x4 and shape-mismatch its own out_size=3 Linear — dead code there since
    shipped configs use dinov2; symmetric (2,2) padding realizes the declared
    3x3 geometry.)"""
    keys = iter(jax.random.split(key, 8))

    def sn(p, k):
        p = dict(p)
        p["u"] = _sn_init(k, p["kernel"].shape)
        return p

    return {
        "conv1": sn(init_conv2d(next(keys), in_ch, out_ch, 3), next(keys)),
        "fc1": sn(init_dense(next(keys), out_ch * out_size * out_size, out_ch), next(keys)),
        "out": sn(init_dense(next(keys), out_ch, 1), next(keys)),
    }


def _simple_head_apply(heads, fmap, *, update_sn: bool):
    """fmap [B, 7, 7, C] -> ([B,1] logits, new heads)."""
    h = _blurpool(fmap, pad=2)  # BlurPool(pad_off=1): pad (1,2)+1 -> ~2 each
    h, c1 = _sn_conv(heads["conv1"], h, stride=2, padding=0, update=update_sn)
    h = jax.nn.leaky_relu(h, 0.2)
    h = h.reshape(h.shape[0], -1).astype(jnp.float32)
    h, f1 = _sn_dense(heads["fc1"], h, update=update_sn)
    h = jax.nn.leaky_relu(h, 0.2)
    out, fo = _sn_dense(heads["out"], h, update=update_sn)
    return [out], {"conv1": c1, "fc1": f1, "out": fo}


def init_mlp_head(key, in_ch: int = 768, out_ch: int = 256) -> Dict[str, Any]:
    """MLPD (cv_discriminator.py:75-92): SNLinear -> LeakyReLU -> SNLinear(1),
    the head for pooled-embedding output types ('adv' without
    conv_multi_level) on the ViT backbones."""
    keys = iter(jax.random.split(key, 4))

    def sn(p, k):
        p = dict(p)
        p["u"] = _sn_init(k, p["kernel"].shape)
        return p

    return {
        "fc1": sn(init_dense(next(keys), in_ch, out_ch), next(keys)),
        "out": sn(init_dense(next(keys), out_ch, 1), next(keys)),
    }


def _mlp_head_apply(heads, embed, *, update_sn: bool):
    """embed [B, C] -> ([B,1] logits, new heads)."""
    h, f1 = _sn_dense(heads["fc1"], embed.astype(jnp.float32), update=update_sn)
    h = jax.nn.leaky_relu(h, 0.2)
    out, fo = _sn_dense(heads["out"], h, update=update_sn)
    return [out], {"fc1": f1, "out": fo}


# ---------------------------------------------------------------------------
# discriminator
# ---------------------------------------------------------------------------


def init_discriminator_heads(
    key, embed_dim: int = 1024, out_ch: int = 256, token_dim: Optional[int] = None
) -> Dict[str, Any]:
    """MultiLevelDViT: 2 conv branches + class-token MLP branch.
    Dimensions per backbone (cv_discriminator.py:122-146): dinov2
    (1024/256/1024), dino (768/128/768), clip (768/256/512 — token branch
    consumes the projected CLIP embedding)."""
    keys = iter(jax.random.split(key, 16))
    if token_dim is None:
        token_dim = embed_dim

    def sn(p, k):
        p = dict(p)
        p["u"] = _sn_init(k, p["kernel"].shape)
        return p

    branches = []
    for _ in range(2):
        branches.append(
            {
                "conv1": sn(init_conv2d(next(keys), embed_dim, out_ch, 3), next(keys)),
                "conv2": sn(init_conv2d(next(keys), out_ch, 1, 1), next(keys)),
            }
        )
    return {
        "spatial": branches,
        "token_fc": sn(init_dense(next(keys), token_dim, out_ch), next(keys)),
        "token_out": sn(init_dense(next(keys), out_ch, 1), next(keys)),
    }


def _heads_apply(heads, feats, *, update_sn: bool, down: int = 2):
    """feats: (fmap, fmap, token) -> list of logits. ``down`` mirrors
    MultiLevelDViT's down arg: 2 = blurpool + strided conv (dino/dinov2 on
    16x16/14x14 grids), 1 = stride-1 conv3 (clip on the 7x7 grid,
    cv_discriminator.py:18-24)."""
    new_heads = {"spatial": [], "token_fc": None, "token_out": None}
    logits = []
    for branch, fmap in zip(heads["spatial"], feats[:2]):
        if down > 1:
            h = _blurpool(fmap, pad=2)
            h, c1 = _sn_conv(branch["conv1"], h, stride=2, padding=0, update=update_sn)
        else:
            h, c1 = _sn_conv(branch["conv1"], fmap, stride=1, padding=1, update=update_sn)
        h = jax.nn.leaky_relu(h, 0.2)
        # pad keeps the declared 4x4 logit geometry on both the 8x8 (down=2)
        # and 7x7 (down=1, clip) grids
        h = _blurpool(h, pad=1 if down > 1 else 2)
        h, c2 = _sn_conv(branch["conv2"], h, stride=2, padding=0, update=update_sn)
        logits.append(h[..., 0])  # [B, 4, 4]
        new_heads["spatial"].append({"conv1": c1, "conv2": c2})
    tok = feats[2]
    h, fc = _sn_dense(heads["token_fc"], tok.astype(jnp.float32), update=update_sn)
    h = jax.nn.leaky_relu(h, 0.2)
    out, to = _sn_dense(heads["token_out"], h, update=update_sn)
    logits.append(out)  # [B, 1]
    new_heads["token_fc"] = fc
    new_heads["token_out"] = to
    return logits, new_heads


def multilevel_sigmoid_loss(logits: List[jnp.ndarray], *, for_real: bool,
                            for_g: bool = False, alpha: float = 0.8) -> jnp.ndarray:
    """cv_losses.multilevel_loss with alpha=0.8: per-level BCE-with-logits
    vs alpha (real / G) or 0 (fake), spatial-mean, summed over levels,
    returned per sample [B, 1]."""
    target = alpha if (for_real or for_g) else 0.0
    total = 0.0
    for lg in logits:
        lgf = lg.astype(jnp.float32)
        bce = jnp.maximum(lgf, 0) - lgf * target + jnp.log1p(jnp.exp(-jnp.abs(lgf)))
        if bce.ndim > 2:
            bce = bce.mean(axis=tuple(range(1, bce.ndim))).reshape(-1, 1)
        total = total + bce
    return total


def discriminate(
    backbone_params: Dict[str, Any],
    heads: Dict[str, Any],
    images: jnp.ndarray,
    rng: jax.Array,
    *,
    for_real: bool = True,
    for_g: bool = False,
    vit_cfg: ViTConfig = DINOV2_VITL14,
    update_sn: bool = True,
    diffaug: bool = True,
    disc_type: str = "dinov2",
) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """Full vision-aided D pass: DiffAugment -> frozen backbone features ->
    SN heads -> multilevel sigmoid loss (per sample [B,1]). Returns
    (loss, new_heads). ``disc_type`` selects the backbone/head pair
    (cfg.optim.gan_disc_type): 'dinov2' (MultiLevelDViT, the shipped config),
    'dino' (ViT-B/16, same tap scheme), 'clip' (ViT-B/32 multi-level) or
    'vgg' (SimpleD, cv_discriminator.py:137-138)."""
    x = diff_augment(images, rng) if diffaug else images

    # single-feature-map backbones -> SimpleD head
    if disc_type in ("vgg", "swin", "face_seg", "face_normals", "seg_ade", "det_coco"):
        if disc_type == "vgg":
            fmap = vgg_backbone_features(backbone_params, x)
        elif disc_type == "swin":
            from instantrestore_tpu.models.swin import swin_features

            b = x.shape[0]
            x224 = jax.image.resize(x * 0.5 + 0.5, (b, 224, 224, 3), method="linear")
            x224 = (x224 - jnp.asarray(_CLIP_MEAN)) / jnp.asarray(_IMAGENET_STD)
            fmap = swin_features(backbone_params, x224)
        elif disc_type in ("seg_ade", "det_coco"):
            # task-specific Swin backbones (swintaskspecific.py:623-659):
            # 256px area resize, ImageNet normalize, stride-32 stage ->
            # [B, 8, 8, 768] -> SimpleD(768, out_size=4)
            from instantrestore_tpu.models.swin import swin_features

            b = x.shape[0]
            x256 = jax.image.resize(x * 0.5 + 0.5, (b, 256, 256, 3), method="linear")
            x256 = (x256 - jnp.asarray(_IMAGENET_MEAN)) / jnp.asarray(_IMAGENET_STD)
            fmap = swin_features(backbone_params, x256)
        elif disc_type == "face_seg":
            from instantrestore_tpu.training.losses.backbones import face_seg_features

            fmap = face_seg_features(backbone_params, x)
        else:
            from instantrestore_tpu.training.losses.backbones import (
                face_normals_features,
            )

            fmap = face_normals_features(backbone_params, x)
        if not for_g:
            fmap = jax.lax.stop_gradient(fmap)
        logits, new_heads = _simple_head_apply(heads, fmap, update_sn=update_sn)
        return multilevel_sigmoid_loss(logits, for_real=for_real, for_g=for_g), new_heads

    # cvmodel.py:187-189: area-resize to 224, CLIP-mean normalize (true CLIP
    # std for the clip backbone, ImageNet std for dino/dinov2)
    x01 = x * 0.5 + 0.5
    b = x01.shape[0]
    x224 = jax.image.resize(x01, (b, 224, 224, 3), method="linear")
    std = _CLIP_STD if disc_type == "clip" else _IMAGENET_STD
    x224 = (x224 - jnp.asarray(_CLIP_MEAN)) / jnp.asarray(std)

    if disc_type == "clip":
        clip_cfg = vit_cfg if vit_cfg.proj_dim else CLIP_VITB32
        f0, f1, tok = clip_multi_level(backbone_params, x224, cfg=clip_cfg)
        if not for_g:
            f0, f1, tok = (jax.lax.stop_gradient(f) for f in (f0, f1, tok))
        logits, new_heads = _heads_apply(heads, (f0, f1, tok), update_sn=update_sn, down=1)
        return multilevel_sigmoid_loss(logits, for_real=for_real, for_g=for_g), new_heads

    n_taps = min(8, vit_cfg.depth)
    inter = vit_intermediate_layers(backbone_params, x224, n=n_taps, cfg=vit_cfg)
    # indices [0, 4, -1] of the last 8 (scaled down for tiny test configs);
    # two spatial maps + final class token
    g = 224 // vit_cfg.patch_size
    f0 = inter[0][0].reshape(b, g, g, -1)
    f1 = inter[n_taps // 2][0].reshape(b, g, g, -1)
    tok = inter[-1][1]
    if for_g:
        feats = (f0, f1, tok)
    else:
        feats = tuple(jax.lax.stop_gradient(f) for f in (f0, f1, tok))
    logits, new_heads = _heads_apply(heads, feats, update_sn=update_sn)
    loss = multilevel_sigmoid_loss(logits, for_real=for_real, for_g=for_g)
    return loss, new_heads
