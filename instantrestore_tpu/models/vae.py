"""SD VAE (stabilityai/sd-vae-ft-mse, AutoencoderKL) — functional, NHWC.

Capability twin of the diffusers AutoencoderKL as used by the reference
(/root/reference/face_replace/models/pix2pix_turbo.py:42-58) including the
two monkey-patched behaviors from /root/reference/face_replace/models/
model.py:15-63, re-expressed as data flow:

* ``vae_encode`` returns the down-block input activations alongside the
  moments (the patched encoder's ``current_down_blocks``);
* ``vae_decode`` optionally consumes those activations through four 1x1
  skip convolutions gated by ``gamma`` (the patched decoder's
  ``skip_conv_1..4`` / ``ignore_skip`` / ``gamma``, present when the model
  was trained with ``use_shortcuts: true``).

Architecture: block_out_channels (128, 256, 512, 512), 2 layers/block in the
encoder, 3 in the decoder, mid block with a single-head full-width attention,
GroupNorm(32, eps=1e-6), latent_channels 4, scaling_factor 0.18215.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from instantrestore_tpu.ops.primitives import (
    conv2d,
    dense,
    group_norm,
    init_conv2d,
    init_dense,
    init_norm,
    silu,
    upsample2x_conv,
)

SD_VAE_SCALING_FACTOR = 0.18215


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    norm_eps: float = 1e-6
    scaling_factor: float = SD_VAE_SCALING_FACTOR
    use_shortcuts: bool = False  # reference cfg.model.use_shortcuts


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _init_resnet(key, in_ch: int, out_ch: int) -> Dict[str, Any]:
    ks = jax.random.split(key, 3)
    p = {
        "norm1": init_norm(in_ch),
        "conv1": init_conv2d(ks[0], in_ch, out_ch, 3),
        "norm2": init_norm(out_ch),
        "conv2": init_conv2d(ks[1], out_ch, out_ch, 3),
    }
    if in_ch != out_ch:
        p["conv_shortcut"] = init_conv2d(ks[2], in_ch, out_ch, 1)
    return p


def _init_attn(key, ch: int) -> Dict[str, Any]:
    ks = jax.random.split(key, 4)
    return {
        "group_norm": init_norm(ch),
        "to_q": init_dense(ks[0], ch, ch, bias=True),
        "to_k": init_dense(ks[1], ch, ch, bias=True),
        "to_v": init_dense(ks[2], ch, ch, bias=True),
        "to_out": init_dense(ks[3], ch, ch, bias=True),
    }


def _init_mid(key, ch: int) -> Dict[str, Any]:
    ks = jax.random.split(key, 3)
    return {
        "resnets": [_init_resnet(ks[0], ch, ch), _init_resnet(ks[1], ch, ch)],
        "attentions": [_init_attn(ks[2], ch)],
    }


def init_vae_params(key, cfg: VAEConfig = VAEConfig()) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 128))
    chs = cfg.block_out_channels

    encoder: Dict[str, Any] = {
        "conv_in": init_conv2d(next(keys), cfg.in_channels, chs[0], 3),
        "down_blocks": [],
        "mid_block": _init_mid(next(keys), chs[-1]),
        "conv_norm_out": init_norm(chs[-1]),
        "conv_out": init_conv2d(next(keys), chs[-1], 2 * cfg.latent_channels, 3),
    }
    in_ch = chs[0]
    for i, out_ch in enumerate(chs):
        block: Dict[str, Any] = {"resnets": []}
        for j in range(cfg.layers_per_block):
            block["resnets"].append(_init_resnet(next(keys), in_ch if j == 0 else out_ch, out_ch))
        if i != len(chs) - 1:
            block["downsamplers"] = [{"conv": init_conv2d(next(keys), out_ch, out_ch, 3)}]
        encoder["down_blocks"].append(block)
        in_ch = out_ch

    rev = list(reversed(chs))
    decoder: Dict[str, Any] = {
        "conv_in": init_conv2d(next(keys), cfg.latent_channels, rev[0], 3),
        "mid_block": _init_mid(next(keys), rev[0]),
        "up_blocks": [],
        "conv_norm_out": init_norm(rev[-1]),
        "conv_out": init_conv2d(next(keys), rev[-1], cfg.out_channels, 3),
    }
    in_ch = rev[0]
    for i, out_ch in enumerate(rev):
        block = {"resnets": []}
        for j in range(cfg.layers_per_block + 1):
            block["resnets"].append(_init_resnet(next(keys), in_ch if j == 0 else out_ch, out_ch))
        if i != len(rev) - 1:
            block["upsamplers"] = [{"conv": init_conv2d(next(keys), out_ch, out_ch, 3)}]
        decoder["up_blocks"].append(block)
        in_ch = out_ch

    params = {
        "encoder": encoder,
        "decoder": decoder,
        "quant_conv": init_conv2d(next(keys), 2 * cfg.latent_channels, 2 * cfg.latent_channels, 1),
        "post_quant_conv": init_conv2d(next(keys), cfg.latent_channels, cfg.latent_channels, 1),
    }
    if cfg.use_shortcuts:
        # pix2pix_turbo.py:48-51: 1x1 bias-free convs, init 1e-5 (:145-148)
        shapes = [(chs[3], 512), (chs[1], 512), (chs[0], 512), (chs[0], 256)]
        for idx, (cin, cout) in enumerate(shapes, start=1):
            params["decoder"][f"skip_conv_{idx}"] = {
                "kernel": jnp.full((1, 1, cin, cout), 1e-5, jnp.float32)
            }
    return params


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------


def _resnet(p, x, *, cfg: VAEConfig, lora_scaling: float):
    h = group_norm(p["norm1"], x, num_groups=cfg.norm_num_groups, eps=cfg.norm_eps)
    h = silu(h)
    h = conv2d(p["conv1"], h, lora_scaling=lora_scaling)
    h = group_norm(p["norm2"], h, num_groups=cfg.norm_num_groups, eps=cfg.norm_eps)
    h = silu(h)
    h = conv2d(p["conv2"], h, lora_scaling=lora_scaling)
    if "conv_shortcut" in p:
        x = conv2d(p["conv_shortcut"], x, padding=0, lora_scaling=lora_scaling)
    return x + h


def _attn(p, x, *, cfg: VAEConfig, lora_scaling: float, use_fused: bool = False):
    """Single-head full-width attention of the VAE mid block.

    diffusers Attention(heads=1, dim_head=C, residual_connection=True,
    bias=True, upcast_softmax=True); softmax in fp32. At 512px the 64x64
    latent gives [B, 4096, 4096] logits — the fused flash kernel keeps them
    in VMEM on TPU.
    """
    b, h_, w_, c = x.shape
    residual = x
    h = group_norm(p["group_norm"], x, num_groups=cfg.norm_num_groups, eps=cfg.norm_eps)
    tokens = h.reshape(b, h_ * w_, c)
    q = dense(p["to_q"], tokens, lora_scaling=lora_scaling)
    k = dense(p["to_k"], tokens, lora_scaling=lora_scaling)
    v = dense(p["to_v"], tokens, lora_scaling=lora_scaling)
    scale = c ** -0.5
    if use_fused:
        # differentiable wrapper (custom VJP) so the VAE attention can stay
        # fused in training too
        from instantrestore_tpu.ops.flash_vjp import flash_attention

        out = flash_attention(q[:, None], k[:, None], v[:, None], scale=scale)[:, 0]
    else:
        logits = jnp.einsum("bqd,bkd->bqk", q, k, preferred_element_type=jnp.float32) * scale
        probs = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bqk,bkd->bqd", probs.astype(v.dtype), v,
                         preferred_element_type=jnp.float32).astype(x.dtype)
    out = dense(p["to_out"], out, lora_scaling=lora_scaling)
    return out.reshape(b, h_, w_, c) + residual


def _mid(p, x, *, cfg: VAEConfig, lora_scaling: float, use_fused: bool = False):
    x = _resnet(p["resnets"][0], x, cfg=cfg, lora_scaling=lora_scaling)
    x = _attn(p["attentions"][0], x, cfg=cfg, lora_scaling=lora_scaling, use_fused=use_fused)
    x = _resnet(p["resnets"][1], x, cfg=cfg, lora_scaling=lora_scaling)
    return x


@jax.named_scope("vae_encode")
def vae_encode(
    params: Dict[str, Any],
    images: jnp.ndarray,
    *,
    cfg: VAEConfig = VAEConfig(),
    lora_scaling: float = 1.0,
    compute_dtype=jnp.bfloat16,
    use_fused_attention: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, List[jnp.ndarray]]:
    """images [B, H, W, 3] in [-1, 1] -> (mean, logvar, down_block_acts).

    ``down_block_acts`` are the PRE-down-block activations the patched
    encoder stashes (model.py:15-31), consumed by the skip-conv decoder.
    """
    p = params["encoder"]
    x = images.astype(compute_dtype)
    x = conv2d(p["conv_in"], x, lora_scaling=lora_scaling)

    acts: List[jnp.ndarray] = []
    for block in p["down_blocks"]:
        acts.append(x)
        for rp in block["resnets"]:
            x = _resnet(rp, x, cfg=cfg, lora_scaling=lora_scaling)
        if "downsamplers" in block:
            # diffusers VAE Downsample2D: stride-2 conv with manual (0,1,0,1)
            # edge padding (pad right/bottom only).
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            x = conv2d(block["downsamplers"][0]["conv"], x, stride=2, padding=0,
                       lora_scaling=lora_scaling)

    x = _mid(p["mid_block"], x, cfg=cfg, lora_scaling=lora_scaling,
             use_fused=use_fused_attention)
    x = group_norm(p["conv_norm_out"], x, num_groups=cfg.norm_num_groups, eps=cfg.norm_eps)
    x = silu(x)
    x = conv2d(p["conv_out"], x, lora_scaling=lora_scaling)
    moments = conv2d(params["quant_conv"], x, padding=0, lora_scaling=lora_scaling)

    mean, logvar = jnp.split(moments.astype(jnp.float32), 2, axis=-1)
    logvar = jnp.clip(logvar, -30.0, 20.0)
    return mean, logvar, acts


def is_key_batch(rng) -> bool:
    """True when ``rng`` is a [B]-batch of per-sample PRNG keys rather than a
    single key: legacy uint32 keys are [2] (single) vs [B, 2] (batch); typed
    keys are scalar (single) vs [B] (batch).

    Per-sample keys exist for mesh-size-invariant serving: a data-parallel
    shard derives each sample's key from its GLOBAL batch row
    (inference/serving.py), so the same (inputs, seed) produce bit-equal
    noise on 1 chip and on any mesh."""
    if rng is None:
        return False
    try:
        if jax.dtypes.issubdtype(rng.dtype, jax.dtypes.prng_key):
            return rng.ndim == 1
    except (AttributeError, TypeError):
        pass
    return getattr(rng, "ndim", 0) == 2


def sample_latent(mean: jnp.ndarray, logvar: jnp.ndarray, rng: Optional[jax.Array]) -> jnp.ndarray:
    """DiagonalGaussianDistribution.sample(); rng=None -> mode() (the mean).

    The reference samples at both train and inference time
    (pix2pix_turbo.py:245,291); deterministic mode is provided for parity
    testing and reproducible serving. ``rng`` may be a [B]-batch of keys
    (``is_key_batch``): sample i's noise then depends only on key i, not on
    the batch's size or layout."""
    if rng is None:
        return mean
    std = jnp.exp(0.5 * logvar)
    if is_key_batch(rng):
        noise = jax.vmap(lambda k, m: jax.random.normal(k, m.shape, m.dtype))(
            rng, mean
        )
    else:
        noise = jax.random.normal(rng, mean.shape, mean.dtype)
    return mean + std * noise


@jax.named_scope("vae_decode")
def vae_decode(
    params: Dict[str, Any],
    latents: jnp.ndarray,
    *,
    cfg: VAEConfig = VAEConfig(),
    skip_acts: Optional[List[jnp.ndarray]] = None,
    gamma: float = 1.0,
    lora_scaling: float = 1.0,
    compute_dtype=jnp.bfloat16,
    use_fused_attention: bool = False,
) -> jnp.ndarray:
    """latents [B, h, w, 4] (already divided by scaling_factor) -> images.

    When the params carry skip convs and ``skip_acts`` is given (the encoder's
    down-block activations), adds ``skip_conv_i(act[::-1][i] * gamma)`` before
    each up block (model.py:42-50).
    """
    p = params["decoder"]
    x = latents.astype(compute_dtype)
    x = conv2d(params["post_quant_conv"], x, padding=0, lora_scaling=lora_scaling)
    x = conv2d(p["conv_in"], x, lora_scaling=lora_scaling)
    x = _mid(p["mid_block"], x, cfg=cfg, lora_scaling=lora_scaling,
             use_fused=use_fused_attention)

    use_skips = skip_acts is not None and "skip_conv_1" in p
    for i, block in enumerate(p["up_blocks"]):
        if use_skips:
            act = skip_acts[::-1][i].astype(x.dtype) * jnp.asarray(gamma, x.dtype)
            x = x + conv2d(p[f"skip_conv_{i + 1}"], act, padding=0, lora_scaling=lora_scaling)
        for rp in block["resnets"]:
            x = _resnet(rp, x, cfg=cfg, lora_scaling=lora_scaling)
        if "upsamplers" in block:
            # subpixel-decomposed upsample+conv: 2.25x fewer MACs, exact math
            x = upsample2x_conv(
                block["upsamplers"][0]["conv"], x, lora_scaling=lora_scaling
            )

    x = group_norm(p["conv_norm_out"], x, num_groups=cfg.norm_num_groups, eps=cfg.norm_eps)
    x = silu(x)
    x = conv2d(p["conv_out"], x, lora_scaling=lora_scaling)
    return x


def quantize_decoder_int8(vae_params: Dict[str, Any]) -> Dict[str, Any]:
    """Opt-in serving optimization: int8-quantize the decoder's resnet and
    upsampler convolutions (the 512px/256px conv mass that runs at the bf16
    MXU roofline; int8 doubles the peak on v5e). conv_in/conv_out and the
    mid-block attention stay bf16. NOT parity-exact with the reference —
    breaks the <1e-2 gate by design, so it is never applied by default
    (ServingEngine(int8_decoder=True) / BENCH_INT8_DECODER=1)."""
    from instantrestore_tpu.ops.primitives import quantize_block_convs_int8

    out = dict(vae_params)
    dec = dict(out["decoder"])
    dec["mid_block"] = quantize_block_convs_int8(dec["mid_block"])
    dec["up_blocks"] = [quantize_block_convs_int8(b) for b in dec["up_blocks"]]
    out["decoder"] = dec
    return out
