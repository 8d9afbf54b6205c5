"""Swin-Transformer-Tiny encoder in JAX — the 'swin' discriminator backbone.

Twin of the reference's timm ``swin_tiny_patch4_window7_224`` loaded with
MoBY self-supervised weights (/root/reference/face_replace/training/
vision_aided_loss/cvmodel.py:38-89): the D consumes
``forward_custom(x, return_intermediate=True)`` = patch embed -> 4 stages of
(shifted-)window attention blocks with patch merging -> final LayerNorm ->
a [B, 7, 7, 768] feature map fed to SimpleD(768). The same encoder (with
task-specific weights) backs the reference's seg_ade / det_coco cv_types
(swintaskspecific.py).

Windowing uses static shapes: the relative-position index and the
shifted-window attention masks are precomputed with numpy at trace time.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from instantrestore_tpu.ops.primitives import dense, init_dense, init_norm, layer_norm


@dataclasses.dataclass(frozen=True)
class SwinConfig:
    patch_size: int = 4
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window: int = 7
    mlp_ratio: float = 4.0
    norm_eps: float = 1e-5


SWIN_TINY = SwinConfig()


def init_swin_params(key, cfg: SwinConfig = SWIN_TINY) -> Dict[str, Any]:
    n_blocks = sum(cfg.depths)
    keys = iter(jax.random.split(key, 8 + 6 * n_blocks + 2 * len(cfg.depths)))
    d = cfg.embed_dim
    w2 = cfg.window * cfg.window
    params: Dict[str, Any] = {
        "patch_embed": {
            "kernel": jax.random.normal(
                next(keys), (cfg.patch_size, cfg.patch_size, 3, d)
            ) * 0.02,
            "bias": jnp.zeros((d,)),
        },
        "patch_norm": init_norm(d),
        "stages": [],
        "norm": init_norm(d * 2 ** (len(cfg.depths) - 1)),
    }
    dim = d
    for si, (depth, heads) in enumerate(zip(cfg.depths, cfg.num_heads)):
        hidden = int(dim * cfg.mlp_ratio)
        blocks = []
        for _ in range(depth):
            blocks.append({
                "norm1": init_norm(dim),
                "attn": {
                    "qkv": init_dense(next(keys), dim, 3 * dim),
                    "proj": init_dense(next(keys), dim, dim),
                    "rel_bias": jax.random.normal(
                        next(keys), ((2 * cfg.window - 1) ** 2, heads)
                    ) * 0.02,
                },
                "norm2": init_norm(dim),
                "mlp": {
                    "fc1": init_dense(next(keys), dim, hidden),
                    "fc2": init_dense(next(keys), hidden, dim),
                },
            })
        stage = {"blocks": blocks}
        if si < len(cfg.depths) - 1:
            stage["downsample"] = {
                "norm": init_norm(4 * dim),
                "reduction": {"kernel": jax.random.normal(next(keys), (4 * dim, 2 * dim)) * 0.02},
            }
            dim *= 2
        params["stages"].append(stage)
    return params


@functools.lru_cache(maxsize=8)
def _rel_position_index(w: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = (flat[:, :, None] - flat[:, None, :]).transpose(1, 2, 0)
    rel[:, :, 0] += w - 1
    rel[:, :, 1] += w - 1
    rel[:, :, 0] *= 2 * w - 1
    return rel.sum(-1)  # [w*w, w*w]


@functools.lru_cache(maxsize=32)
def _shift_attn_mask(h: int, w_img: int, w: int, shift: int) -> np.ndarray:
    """Per-window additive mask for shifted-window attention [nW, w2, w2]."""
    img = np.zeros((h, w_img))
    cnt = 0
    for hs in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
        for ws in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    wins = img.reshape(h // w, w, w_img // w, w).transpose(0, 2, 1, 3).reshape(-1, w * w)
    diff = wins[:, None, :] - wins[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def _window_partition(x: jnp.ndarray, w: int) -> jnp.ndarray:
    b, h, w_img, c = x.shape
    x = x.reshape(b, h // w, w, w_img // w, w, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, w * w, c)


def _window_reverse(wins: jnp.ndarray, w: int, h: int, w_img: int) -> jnp.ndarray:
    c = wins.shape[-1]
    x = wins.reshape(-1, h // w, w_img // w, w, w, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, h, w_img, c)


def _swin_block(bp, x, h, w_img, heads, window, shift, cfg: SwinConfig):
    b, _, c = x.shape
    hd = c // heads
    shortcut = x
    hx = layer_norm(bp["norm1"], x, eps=cfg.norm_eps).reshape(b, h, w_img, c)
    # dense-prediction inputs (e.g. 256px seg_ade/det_coco backbones) give
    # grids that aren't window multiples: zero-pad bottom/right like the
    # mmdet SwinTransformer (swintaskspecific.py:154-260), un-pad after
    pad_h = (-h) % window
    pad_w = (-w_img) % window
    hp, wp = h + pad_h, w_img + pad_w
    if pad_h or pad_w:
        hx = jnp.pad(hx, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    if shift:
        hx = jnp.roll(hx, (-shift, -shift), (1, 2))
    wins = _window_partition(hx, window)  # [b*nW, w2, c]
    nw = wins.shape[0] // b
    w2 = window * window

    qkv = dense(bp["attn"]["qkv"], wins)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(-1, w2, heads, hd).transpose(0, 2, 1, 3)
    k = k.reshape(-1, w2, heads, hd).transpose(0, 2, 1, 3)
    v = v.reshape(-1, w2, heads, hd).transpose(0, 2, 1, 3)
    logits = jnp.einsum("nhqd,nhkd->nhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * (hd ** -0.5)
    bias = bp["attn"]["rel_bias"][jnp.asarray(_rel_position_index(window))]
    logits = logits + bias.transpose(2, 0, 1)[None].astype(logits.dtype)
    if shift:
        mask = jnp.asarray(_shift_attn_mask(hp, wp, window, shift))
        logits = logits.reshape(b, nw, heads, w2, w2) + mask[None, :, None]
        logits = logits.reshape(-1, heads, w2, w2)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    o = jnp.einsum("nhqk,nhkd->nhqd", probs, v).transpose(0, 2, 1, 3).reshape(-1, w2, c)
    o = dense(bp["attn"]["proj"], o)
    o = _window_reverse(o, window, hp, wp)
    if shift:
        o = jnp.roll(o, (shift, shift), (1, 2))
    if pad_h or pad_w:
        o = o[:, :h, :w_img]
    x = shortcut + o.reshape(b, h * w_img, c)

    hx = layer_norm(bp["norm2"], x, eps=cfg.norm_eps)
    hx = dense(bp["mlp"]["fc2"], jax.nn.gelu(dense(bp["mlp"]["fc1"], hx), approximate=False))
    return x + hx


def _patch_merge(dp, x, h, w_img, cfg: SwinConfig):
    b, _, c = x.shape
    x = x.reshape(b, h, w_img, c)
    x0 = x[:, 0::2, 0::2]
    x1 = x[:, 1::2, 0::2]
    x2 = x[:, 0::2, 1::2]
    x3 = x[:, 1::2, 1::2]
    x = jnp.concatenate([x0, x1, x2, x3], axis=-1).reshape(b, (h // 2) * (w_img // 2), 4 * c)
    x = layer_norm(dp["norm"], x, eps=cfg.norm_eps)
    return x @ dp["reduction"]["kernel"].astype(x.dtype)


def swin_features(
    params: Dict[str, Any],
    images: jnp.ndarray,
    *,
    cfg: SwinConfig = SWIN_TINY,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """images [B, H, W, 3] (backbone-normalized) -> final-norm features
    [B, H/32, W/32, 8*embed_dim] (cvmodel.py Swin.forward_custom:64-76,
    return_intermediate reshaping to the NCHW grid; NHWC here)."""
    b, hh, ww, _ = images.shape
    x = jax.lax.conv_general_dilated(
        images.astype(compute_dtype),
        params["patch_embed"]["kernel"].astype(compute_dtype),
        (cfg.patch_size, cfg.patch_size),
        "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + params["patch_embed"]["bias"].astype(compute_dtype)
    h, w_img = hh // cfg.patch_size, ww // cfg.patch_size
    x = x.reshape(b, h * w_img, cfg.embed_dim)
    x = layer_norm(params["patch_norm"], x, eps=cfg.norm_eps)

    for si, stage in enumerate(params["stages"]):
        heads = cfg.num_heads[si]
        window = min(cfg.window, h)
        for bi, bp in enumerate(stage["blocks"]):
            shift = 0 if bi % 2 == 0 or window >= h else window // 2
            x = _swin_block(bp, x, h, w_img, heads, window, shift, cfg)
        if "downsample" in stage:
            x = _patch_merge(stage["downsample"], x, h, w_img, cfg)
            h, w_img = h // 2, w_img // 2
    x = layer_norm(params["norm"], x, eps=cfg.norm_eps)
    return x.reshape(b, h, w_img, -1)


def convert_swin_params(sd: Dict[str, Any]) -> Dict[str, Any]:
    """timm swin state dict (MoBY ckpt after the reference's 'encoder.'
    strip, cvmodel.py:50-55) -> param tree."""

    def np_(t):
        return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)

    def norm(name):
        return {"scale": jnp.asarray(np_(sd[f"{name}.weight"])),
                "bias": jnp.asarray(np_(sd[f"{name}.bias"]))}

    def lin(name):
        p = {"kernel": jnp.asarray(np_(sd[f"{name}.weight"]).T)}
        if f"{name}.bias" in sd:
            p["bias"] = jnp.asarray(np_(sd[f"{name}.bias"]))
        return p

    # the MoBY/timm layout calls the final LayerNorm 'norm'; the mmdet
    # dense-prediction layout (seg_ade/det_coco ckpts after the 'backbone.'
    # strip) has per-stage norms 'norm0..norm3' — the stride-32 output the
    # discriminator consumes is norm3
    final_norm = "norm" if "norm.weight" in sd else "norm3"
    params: Dict[str, Any] = {
        "patch_embed": {
            "kernel": jnp.asarray(np_(sd["patch_embed.proj.weight"]).transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(np_(sd["patch_embed.proj.bias"])),
        },
        "patch_norm": norm("patch_embed.norm"),
        "stages": [],
        "norm": norm(final_norm),
    }
    si = 0
    while f"layers.{si}.blocks.0.norm1.weight" in sd:
        blocks = []
        bi = 0
        while f"layers.{si}.blocks.{bi}.norm1.weight" in sd:
            pre = f"layers.{si}.blocks.{bi}"
            blocks.append({
                "norm1": norm(f"{pre}.norm1"),
                "attn": {
                    "qkv": lin(f"{pre}.attn.qkv"),
                    "proj": lin(f"{pre}.attn.proj"),
                    "rel_bias": jnp.asarray(np_(sd[f"{pre}.attn.relative_position_bias_table"])),
                },
                "norm2": norm(f"{pre}.norm2"),
                "mlp": {"fc1": lin(f"{pre}.mlp.fc1"), "fc2": lin(f"{pre}.mlp.fc2")},
            })
            bi += 1
        stage: Dict[str, Any] = {"blocks": blocks}
        if f"layers.{si}.downsample.reduction.weight" in sd:
            stage["downsample"] = {
                "norm": norm(f"layers.{si}.downsample.norm"),
                "reduction": {"kernel": jnp.asarray(np_(sd[f"layers.{si}.downsample.reduction.weight"]).T)},
            }
        params["stages"].append(stage)
        si += 1
    return params
