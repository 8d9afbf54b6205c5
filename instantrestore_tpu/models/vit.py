"""DINOv2-style ViT (ViT-L/14 default) in JAX — the frozen backbone of the
vision-aided GAN discriminator (reference gan_disc_type: dinov2,
config_files/train_base.yaml; /root/reference/face_replace/training/
vision_aided_loss/cvmodel.py:176-201).

Implements exactly what the discriminator consumes:
``intermediate_layers(x, n=8)`` — the final-norm-applied outputs of the last
8 blocks with class tokens — from which the caller picks indices [0, 4, -1]
(cvmodel.py:192-197). Architecture: patch 14 conv embed, cls token, learned
position embedding (bicubically resized from the 37x37 training grid when
needed), pre-norm blocks with LayerScale, GELU MLP.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from instantrestore_tpu.ops.primitives import dense, init_dense, init_norm, layer_norm


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    patch_size: int = 14
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    pos_grid: int = 37  # DINOv2 518px training grid
    layerscale: bool = True
    norm_eps: float = 1e-6
    # CLIP-visual variants (gan_disc_type='clip'; reference
    # vision_aided_loss/cvmodel.py CLIP:91-139)
    quick_gelu: bool = False     # x * sigmoid(1.702 x) instead of exact GELU
    ln_pre: bool = False         # LayerNorm after pos-embed add
    proj_dim: int = 0            # >0: ln_post(cls) @ proj output head


DINOV2_VITL14 = ViTConfig()

# DINO v1 ViT-B/16 (gan_disc_type='dino', cvmodel.py:142-171): plain pre-norm
# ViT, no LayerScale, 224px training grid
DINO_VITB16 = ViTConfig(
    patch_size=16, embed_dim=768, depth=12, num_heads=12, pos_grid=14,
    layerscale=False,
)

# CLIP ViT-B/32 visual tower (cvmodel.py:91-139): ln_pre, QuickGELU, 512-d
# projected embedding; taps at resblocks [0:4], [0:8], [0:12]
CLIP_VITB32 = ViTConfig(
    patch_size=32, embed_dim=768, depth=12, num_heads=12, pos_grid=7,
    layerscale=False, norm_eps=1e-5, quick_gelu=True, ln_pre=True,
    proj_dim=512,
)


def init_vit_params(key, cfg: ViTConfig = DINOV2_VITL14) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 8 + 8 * cfg.depth))
    d = cfg.embed_dim
    hidden = int(d * cfg.mlp_ratio)
    params: Dict[str, Any] = {
        "patch_embed": {
            "kernel": jax.random.normal(next(keys), (cfg.patch_size, cfg.patch_size, 3, d))
            * 0.02,
            "bias": jnp.zeros((d,)),
        },
        "cls_token": jnp.zeros((1, 1, d)),
        "pos_embed": jax.random.normal(next(keys), (1, cfg.pos_grid**2 + 1, d)) * 0.02,
        "blocks": [],
        "norm": init_norm(d),
    }
    for _ in range(cfg.depth):
        block = {
            "norm1": init_norm(d),
            "attn": {
                "qkv": init_dense(next(keys), d, 3 * d),
                "proj": init_dense(next(keys), d, d),
            },
            "norm2": init_norm(d),
            "mlp": {
                "fc1": init_dense(next(keys), d, hidden),
                "fc2": init_dense(next(keys), hidden, d),
            },
        }
        if cfg.layerscale:
            block["ls1"] = {"gamma": jnp.full((d,), 1e-5)}
            block["ls2"] = {"gamma": jnp.full((d,), 1e-5)}
        params["blocks"].append(block)
    if cfg.ln_pre:
        params["ln_pre"] = init_norm(d)
    if cfg.proj_dim:
        params["proj"] = jax.random.normal(next(keys), (d, cfg.proj_dim)) * d ** -0.5
    return params


def _interp_pos_embed(pos: jnp.ndarray, grid: int, target: int) -> jnp.ndarray:
    """Bicubic-resize the patch position grid (DINOv2 interpolate_pos_encoding)."""
    if grid == target:
        return pos
    cls_pos, patch_pos = pos[:, :1], pos[:, 1:]
    d = pos.shape[-1]
    patch_pos = patch_pos.reshape(1, grid, grid, d)
    patch_pos = jax.image.resize(patch_pos, (1, target, target, d), method="cubic")
    return jnp.concatenate([cls_pos, patch_pos.reshape(1, target * target, d)], axis=1)


def vit_intermediate_layers(
    params: Dict[str, Any],
    images: jnp.ndarray,
    n: int = 8,
    *,
    cfg: ViTConfig = DINOV2_VITL14,
    compute_dtype=jnp.float32,
) -> List[Tuple[jnp.ndarray, jnp.ndarray]]:
    """images [B, H, W, 3] (already backbone-normalized) -> list of n
    (patch_tokens [B, hw, D], class_token [B, D]) for the last n blocks,
    each passed through the final LayerNorm (DINOv2 norm=True default)."""
    b, h, w, _ = images.shape
    gh, gw = h // cfg.patch_size, w // cfg.patch_size
    x = jax.lax.conv_general_dilated(
        images.astype(compute_dtype),
        params["patch_embed"]["kernel"].astype(compute_dtype),
        (cfg.patch_size, cfg.patch_size),
        "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + params["patch_embed"]["bias"].astype(compute_dtype)
    x = x.reshape(b, gh * gw, cfg.embed_dim)
    cls = jnp.broadcast_to(params["cls_token"].astype(compute_dtype), (b, 1, cfg.embed_dim))
    x = jnp.concatenate([cls, x], axis=1)
    pos = _interp_pos_embed(params["pos_embed"], cfg.pos_grid, gh)
    x = x + pos.astype(compute_dtype)

    outputs: List[jnp.ndarray] = []
    depth = len(params["blocks"])
    for li, bp in enumerate(params["blocks"]):
        x = _vit_block(bp, x, cfg)
        if li >= depth - n:
            outputs.append(x)

    normed = [layer_norm(params["norm"], o, eps=cfg.norm_eps) for o in outputs]
    return [(o[:, 1:], o[:, 0]) for o in normed]


def _vit_block(bp, x: jnp.ndarray, cfg: ViTConfig) -> jnp.ndarray:
    """One pre-norm transformer block (attn + MLP, optional LayerScale,
    optional QuickGELU for the CLIP tower)."""
    b, _, d = x.shape
    heads = cfg.num_heads
    hd = d // heads
    hx = layer_norm(bp["norm1"], x, eps=cfg.norm_eps)
    qkv = dense(bp["attn"]["qkv"], hx)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, -1, heads, hd).transpose(0, 2, 1, 3)
    k = k.reshape(b, -1, heads, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, -1, heads, hd).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits * (hd ** -0.5), axis=-1).astype(v.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", probs, v).transpose(0, 2, 1, 3).reshape(b, -1, d)
    o = dense(bp["attn"]["proj"], o)
    if "ls1" in bp:
        o = o * bp["ls1"]["gamma"].astype(o.dtype)
    x = x + o
    hx = layer_norm(bp["norm2"], x, eps=cfg.norm_eps)
    hx = dense(bp["mlp"]["fc1"], hx)
    if cfg.quick_gelu:
        hx = hx * jax.nn.sigmoid(1.702 * hx)
    else:
        hx = jax.nn.gelu(hx, approximate=False)
    hx = dense(bp["mlp"]["fc2"], hx)
    if "ls2" in bp:
        hx = hx * bp["ls2"]["gamma"].astype(hx.dtype)
    return x + hx


def clip_multi_level(
    params: Dict[str, Any],
    images: jnp.ndarray,
    *,
    cfg: ViTConfig = CLIP_VITB32,
    compute_dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """CLIP visual tower, conv_multi_level taps (cvmodel.py CLIP.forward_custom
    :105-124): raw hidden states after resblocks [0:depth/3] and [0:2depth/3]
    (class token dropped, reshaped to the patch grid) plus the final projected
    class embedding ln_post(cls) @ proj. Unlike DINO, the intermediate taps
    are NOT final-norm-applied."""
    b, h, w, _ = images.shape
    gh = h // cfg.patch_size
    x = jax.lax.conv_general_dilated(
        images.astype(compute_dtype),
        params["patch_embed"]["kernel"].astype(compute_dtype),
        (cfg.patch_size, cfg.patch_size),
        "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + params["patch_embed"]["bias"].astype(compute_dtype)
    x = x.reshape(b, gh * gh, cfg.embed_dim)
    cls = jnp.broadcast_to(params["cls_token"].astype(compute_dtype), (b, 1, cfg.embed_dim))
    x = jnp.concatenate([cls, x], axis=1)
    pos = _interp_pos_embed(params["pos_embed"], cfg.pos_grid, gh)
    x = x + pos.astype(compute_dtype)
    if "ln_pre" in params:
        x = layer_norm(params["ln_pre"], x, eps=cfg.norm_eps)

    depth = len(params["blocks"])
    taps = {depth // 3 - 1, 2 * depth // 3 - 1}
    spatial: List[jnp.ndarray] = []
    for li, bp in enumerate(params["blocks"]):
        x = _vit_block(bp, x, cfg)
        if li in taps:
            # [B, gh*gh, D] tokens are row-major over the patch grid -> NHWC
            spatial.append(x[:, 1:].reshape(b, gh, gh, -1))
    cls_out = layer_norm(params["norm"], x[:, 0], eps=cfg.norm_eps)
    embed = cls_out @ params["proj"].astype(cls_out.dtype)
    return spatial[0], spatial[1], embed


def convert_clip_visual(sd: Dict[str, Any]) -> Dict[str, Any]:
    """CLIP ``model.visual`` state dict (OpenAI clip / open_clip naming:
    conv1 / class_embedding / positional_embedding / ln_pre /
    transformer.resblocks.N.{ln_1,attn.in_proj,attn.out_proj,mlp.c_fc,
    mlp.c_proj,ln_2} / ln_post / proj) -> param tree for clip_multi_level."""

    def np_(t):
        return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)

    d = np_(sd["class_embedding"]).shape[-1]
    params: Dict[str, Any] = {
        "patch_embed": {
            "kernel": jnp.asarray(np_(sd["conv1.weight"]).transpose(2, 3, 1, 0)),
            "bias": jnp.zeros((d,)),  # CLIP conv1 has no bias
        },
        "cls_token": jnp.asarray(np_(sd["class_embedding"])).reshape(1, 1, d),
        "pos_embed": jnp.asarray(np_(sd["positional_embedding"]))[None],
        "ln_pre": {"scale": jnp.asarray(np_(sd["ln_pre.weight"])),
                   "bias": jnp.asarray(np_(sd["ln_pre.bias"]))},
        "blocks": [],
        "norm": {"scale": jnp.asarray(np_(sd["ln_post.weight"])),
                 "bias": jnp.asarray(np_(sd["ln_post.bias"]))},
        "proj": jnp.asarray(np_(sd["proj"])),
    }
    i = 0
    while f"transformer.resblocks.{i}.ln_1.weight" in sd:
        pre = f"transformer.resblocks.{i}"
        params["blocks"].append({
            "norm1": {"scale": jnp.asarray(np_(sd[f"{pre}.ln_1.weight"])),
                      "bias": jnp.asarray(np_(sd[f"{pre}.ln_1.bias"]))},
            "attn": {
                "qkv": {"kernel": jnp.asarray(np_(sd[f"{pre}.attn.in_proj_weight"]).T),
                        "bias": jnp.asarray(np_(sd[f"{pre}.attn.in_proj_bias"]))},
                "proj": {"kernel": jnp.asarray(np_(sd[f"{pre}.attn.out_proj.weight"]).T),
                         "bias": jnp.asarray(np_(sd[f"{pre}.attn.out_proj.bias"]))},
            },
            "norm2": {"scale": jnp.asarray(np_(sd[f"{pre}.ln_2.weight"])),
                      "bias": jnp.asarray(np_(sd[f"{pre}.ln_2.bias"]))},
            "mlp": {
                "fc1": {"kernel": jnp.asarray(np_(sd[f"{pre}.mlp.c_fc.weight"]).T),
                        "bias": jnp.asarray(np_(sd[f"{pre}.mlp.c_fc.bias"]))},
                "fc2": {"kernel": jnp.asarray(np_(sd[f"{pre}.mlp.c_proj.weight"]).T),
                        "bias": jnp.asarray(np_(sd[f"{pre}.mlp.c_proj.bias"]))},
            },
        })
        i += 1
    return params


def convert_vit_params(sd: Dict[str, Any]) -> Dict[str, Any]:
    """DINOv2 torch-hub state dict -> param tree."""

    def np_(t):
        return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)

    params = {
        "patch_embed": {
            "kernel": jnp.asarray(np_(sd["patch_embed.proj.weight"]).transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(np_(sd["patch_embed.proj.bias"])),
        },
        "cls_token": jnp.asarray(np_(sd["cls_token"])),
        "pos_embed": jnp.asarray(np_(sd["pos_embed"])),
        "blocks": [],
        "norm": {"scale": jnp.asarray(np_(sd["norm.weight"])),
                 "bias": jnp.asarray(np_(sd["norm.bias"]))},
    }
    i = 0
    while f"blocks.{i}.norm1.weight" in sd:
        blk = {
            "norm1": {"scale": jnp.asarray(np_(sd[f"blocks.{i}.norm1.weight"])),
                      "bias": jnp.asarray(np_(sd[f"blocks.{i}.norm1.bias"]))},
            "attn": {
                "qkv": {"kernel": jnp.asarray(np_(sd[f"blocks.{i}.attn.qkv.weight"]).T),
                        "bias": jnp.asarray(np_(sd[f"blocks.{i}.attn.qkv.bias"]))},
                "proj": {"kernel": jnp.asarray(np_(sd[f"blocks.{i}.attn.proj.weight"]).T),
                         "bias": jnp.asarray(np_(sd[f"blocks.{i}.attn.proj.bias"]))},
            },
            "norm2": {"scale": jnp.asarray(np_(sd[f"blocks.{i}.norm2.weight"])),
                      "bias": jnp.asarray(np_(sd[f"blocks.{i}.norm2.bias"]))},
            "mlp": {
                "fc1": {"kernel": jnp.asarray(np_(sd[f"blocks.{i}.mlp.fc1.weight"]).T),
                        "bias": jnp.asarray(np_(sd[f"blocks.{i}.mlp.fc1.bias"]))},
                "fc2": {"kernel": jnp.asarray(np_(sd[f"blocks.{i}.mlp.fc2.weight"]).T),
                        "bias": jnp.asarray(np_(sd[f"blocks.{i}.mlp.fc2.bias"]))},
            },
        }
        if f"blocks.{i}.ls1.gamma" in sd:
            blk["ls1"] = {"gamma": jnp.asarray(np_(sd[f"blocks.{i}.ls1.gamma"]))}
            blk["ls2"] = {"gamma": jnp.asarray(np_(sd[f"blocks.{i}.ls2.gamma"]))}
        params["blocks"].append(blk)
        i += 1
    return params
