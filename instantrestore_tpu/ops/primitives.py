"""TPU-first NN primitives: NHWC convs, dense, norms, activations, LoRA.

Design notes
------------
* Everything is a pure function over a parameter dict. Parameter trees mirror
  the diffusers state-dict structure so the torch->JAX checkpoint converter
  (utils/torch_convert.py) is a near-identity mapping — but layouts are
  TPU-native: NHWC activations, HWIO conv kernels, [in, out] dense kernels.
* Matmuls/convs run in the compute dtype (bfloat16 by default at inference);
  normalization statistics and softmax always accumulate in float32.
* LoRA is data, not module surgery: a layer's param dict may carry
  ``lora_A``/``lora_B`` factors (peft semantics,
  /root/reference/face_replace/models/pix2pix_turbo.py:171-188). The delta is
  applied as ``scaling * B(A(x))`` where ``scaling`` is a static float passed
  by the caller (peft: lora_alpha / r). Keeping the factors separate (rather
  than merging) preserves trainability and lets one base-parameter tree serve
  both the LoRA-restoration UNet and the frozen K/V-capture UNet.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# dense / conv with optional LoRA
# ---------------------------------------------------------------------------


def dense(p: dict, x: jnp.ndarray, *, lora_scaling: float = 1.0) -> jnp.ndarray:
    """y = x @ kernel + bias, with optional factored LoRA delta.

    kernel: [in, out]; lora_A: [in, r]; lora_B: [r, out].
    """
    dtype = x.dtype
    y = x @ p["kernel"].astype(dtype)
    if "lora_A" in p:
        y = y + (x @ p["lora_A"].astype(dtype) @ p["lora_B"].astype(dtype)) * jnp.asarray(
            lora_scaling, dtype
        )
    if "bias" in p:
        y = y + p["bias"].astype(dtype)
    return y


def conv2d(
    p: dict,
    x: jnp.ndarray,
    *,
    stride: int = 1,
    padding: int = 1,
    lora_scaling: float = 1.0,
) -> jnp.ndarray:
    """NHWC conv with HWIO kernel and optional conv-LoRA.

    peft Conv2d LoRA (used for conv/conv1/conv2/conv_shortcut/... targets,
    pix2pix_turbo.py:151-156,171-174): lora_A is a conv with the SAME spatial
    kernel/stride/padding mapping in->r channels; lora_B is a 1x1 conv r->out.
    """
    dtype = x.dtype
    dn = ("NHWC", "HWIO", "NHWC")
    pad = [(padding, padding), (padding, padding)]
    if "kernel_int8" in p:
        # opt-in int8 x int8 conv (quantize_conv_int8): dynamic per-tensor
        # activation scale + static per-out-channel weight scale; hits the
        # MXU's 2x int8 rate on v5e. NOT parity-exact — serving-only, off by
        # default (breaks the <1e-2 reference-parity gate by design).
        xf = x.astype(jnp.float32)
        # per-SAMPLE activation scale: co-batched images must not affect each
        # other's quantization grid (reproducibility across batch makeup)
        a_scale = jnp.maximum(
            jnp.max(jnp.abs(xf), axis=(1, 2, 3), keepdims=True) / 127.0, 1e-12
        )
        x8 = jnp.clip(jnp.round(xf / a_scale), -127, 127).astype(jnp.int8)
        y = jax.lax.conv_general_dilated(
            x8,
            p["kernel_int8"],
            window_strides=(stride, stride),
            padding=pad,
            dimension_numbers=dn,
            preferred_element_type=jnp.int32,
        )
        y = (y.astype(jnp.float32) * (a_scale * p["kernel_scale"])).astype(dtype)
        if "bias" in p:
            y = y + p["bias"].astype(dtype)
        return y
    y = jax.lax.conv_general_dilated(
        x,
        p["kernel"].astype(dtype),
        window_strides=(stride, stride),
        padding=pad,
        dimension_numbers=dn,
    )
    if "lora_A" in p:
        a = jax.lax.conv_general_dilated(
            x,
            p["lora_A"].astype(dtype),
            window_strides=(stride, stride),
            padding=pad,
            dimension_numbers=dn,
        )
        b = jax.lax.conv_general_dilated(
            a,
            p["lora_B"].astype(dtype),
            window_strides=(1, 1),
            padding=[(0, 0), (0, 0)],
            dimension_numbers=dn,
        )
        y = y + b * jnp.asarray(lora_scaling, dtype)
    if "bias" in p:
        y = y + p["bias"].astype(dtype)
    return y


def quantize_conv_int8(p: dict) -> dict:
    """Conv param dict -> int8 weight layout consumed by conv2d's int8
    branch: symmetric per-out-channel weight quantization. LoRA must be
    merged first (models/lora.py::merge_lora)."""
    assert "lora_A" not in p, "merge LoRA before int8 quantization"
    k = p["kernel"].astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(k), axis=(0, 1, 2)) / 127.0, 1e-12)
    k8 = jnp.clip(jnp.round(k / scale), -127, 127).astype(jnp.int8)
    q = {kk: v for kk, v in p.items() if kk != "kernel"}
    q["kernel_int8"] = k8
    q["kernel_scale"] = scale
    return q


def quantize_block_convs_int8(bp: dict) -> dict:
    """int8-quantize the conv mass of one resnet-style block dict: resnet
    conv1/conv2/conv_shortcut plus down/upsampler convs; every other leaf
    (norms, attentions, time_emb_proj, ...) is left untouched. Shared by
    models/vae.py::quantize_decoder_int8 and models/unet.py::
    quantize_unet_int8 so the quantization scheme stays in one place."""

    def q_res(rp):
        rp = dict(rp)
        for name in ("conv1", "conv2", "conv_shortcut"):
            if name in rp:
                rp[name] = quantize_conv_int8(rp[name])
        return rp

    nb = dict(bp)
    if "resnets" in nb:
        nb["resnets"] = [q_res(r) for r in nb["resnets"]]
    for samplers in ("downsamplers", "upsamplers"):
        if samplers in nb:
            nb[samplers] = [
                {**s, "conv": quantize_conv_int8(s["conv"])} for s in nb[samplers]
            ]
    return nb


# ---------------------------------------------------------------------------
# normalization (always fp32 statistics)
# ---------------------------------------------------------------------------


def group_norm(p: dict, x: jnp.ndarray, *, num_groups: int = 32, eps: float = 1e-5) -> jnp.ndarray:
    """GroupNorm over NHWC (or [..., C]) input; statistics in fp32.

    fp32 inputs use the exact two-pass formula. For reduced-precision inputs
    (bf16 serving) the normalization is refactored to ``x * a + b`` with
    per-(batch, channel) fp32 coefficients so no fp32 copy of the activation
    is ever materialized — at 512x512x128 x batch 64 that copy alone is
    8.6 GB, more than half the chip's HBM.
    """
    orig_dtype = x.dtype
    c = x.shape[-1]
    g = num_groups
    b = x.shape[0]
    xg = x.reshape(b, -1, g, c // g)  # [B, spatial, G, C/G]

    if orig_dtype == jnp.float32:
        mean = xg.mean(axis=(1, 3), keepdims=True)
        var = xg.var(axis=(1, 3), keepdims=True)
        out = ((xg - mean) * jax.lax.rsqrt(var + eps)).reshape(x.shape)
        return out * p["scale"] + p["bias"]

    # memory-light path: fused fp32-accumulating reductions (the cast fuses
    # into the reduce, no temp), then one low-precision elementwise pass.
    xf32 = xg.astype(jnp.float32)
    mean = jnp.mean(xf32, axis=(1, 3))  # [B, G]
    m2 = jnp.mean(jnp.square(xf32), axis=(1, 3))
    var = jnp.maximum(m2 - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)  # [B, G]
    # per-channel coefficients: out = x * a + bcoef
    inv_c = jnp.repeat(inv, c // g, axis=1)  # [B, C]
    mean_c = jnp.repeat(mean, c // g, axis=1)
    a = inv_c * p["scale"].astype(jnp.float32)[None, :]
    bcoef = p["bias"].astype(jnp.float32)[None, :] - mean_c * a
    shape = (b,) + (1,) * (x.ndim - 2) + (c,)
    return x * a.astype(orig_dtype).reshape(shape) + bcoef.astype(orig_dtype).reshape(shape)


def layer_norm(p: dict, x: jnp.ndarray, *, eps: float = 1e-5) -> jnp.ndarray:
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = xf.var(axis=-1, keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return xf.astype(orig_dtype)


# ---------------------------------------------------------------------------
# activations
# ---------------------------------------------------------------------------


def silu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.silu(x)


def nearest_upsample_2x(x: jnp.ndarray) -> jnp.ndarray:
    """2x nearest-neighbor upsample [B, H, W, C] as broadcast + reshape.

    Bit-identical to jax.image.resize(method='nearest') at exactly 2x, but
    XLA lowers resize to gather while-loops on TPU (measured ~33 ms across
    the decoder upsamples at batch 16) whereas this compiles to a cheap
    fused broadcast."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    # diffusers GEGLU uses exact (erf) gelu, matching torch F.gelu default.
    return jax.nn.gelu(x, approximate=False)


def geglu(p: dict, x: jnp.ndarray, *, lora_scaling: float = 1.0) -> jnp.ndarray:
    """diffusers GEGLU: project to 2*d_ff, gate with exact gelu."""
    h = dense(p, x, lora_scaling=lora_scaling)
    h, gate = jnp.split(h, 2, axis=-1)
    return h * gelu(gate)


# ---------------------------------------------------------------------------
# timestep embedding (diffusers get_timestep_embedding semantics)
# ---------------------------------------------------------------------------


def timestep_embedding(
    timesteps: jnp.ndarray,
    dim: int,
    *,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: int = 10000,
) -> jnp.ndarray:
    """Sinusoidal timestep embedding, [B] -> [B, dim], fp32.

    Mirrors diffusers.models.embeddings.get_timestep_embedding as invoked by
    the SD-Turbo UNet (flip_sin_to_cos=True, freq_shift=0).
    """
    half = dim // 2
    # static table, computed in float64 host-side for accuracy
    freqs = jnp.asarray(
        np.exp(
            -np.log(max_period) * np.arange(half) / (half - downscale_freq_shift)
        ).astype(np.float32)
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    # Explicit range reduction: XLA's sin/cos lose precision for args >> 2*pi
    # (timestep 999 * freq 1.0); reduce mod 2*pi first.
    two_pi = 2.0 * math.pi
    args = args - two_pi * jnp.floor(args / two_pi)
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[:, half:], emb[:, :half]], axis=-1)
    return emb


# ---------------------------------------------------------------------------
# parameter initializers (random init for tests / from-scratch training;
# real weights come from the checkpoint converter)
# ---------------------------------------------------------------------------


def init_dense(key, in_dim: int, out_dim: int, *, bias: bool = True, dtype=jnp.float32) -> dict:
    k1, _ = jax.random.split(key)
    scale = 1.0 / math.sqrt(in_dim)
    p = {"kernel": jax.random.uniform(k1, (in_dim, out_dim), dtype, -scale, scale)}
    if bias:
        p["bias"] = jnp.zeros((out_dim,), dtype)
    return p


def init_conv2d(
    key, in_ch: int, out_ch: int, kernel_size: int = 3, *, bias: bool = True, dtype=jnp.float32
) -> dict:
    k1, _ = jax.random.split(key)
    fan_in = in_ch * kernel_size * kernel_size
    scale = 1.0 / math.sqrt(fan_in)
    p = {
        "kernel": jax.random.uniform(
            k1, (kernel_size, kernel_size, in_ch, out_ch), dtype, -scale, scale
        )
    }
    if bias:
        p["bias"] = jnp.zeros((out_ch,), dtype)
    return p


def init_norm(dim: int, dtype=jnp.float32) -> dict:
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def add_lora_dense(p: dict, key, rank: int, *, init_std: Optional[float] = None) -> dict:
    """Attach peft-style gaussian-init LoRA factors to a dense param dict."""
    in_dim, out_dim = p["kernel"].shape
    std = init_std if init_std is not None else 1.0 / rank
    p = dict(p)
    p["lora_A"] = jax.random.normal(key, (in_dim, rank), jnp.float32) * std
    p["lora_B"] = jnp.zeros((rank, out_dim), jnp.float32)
    return p


def add_lora_conv(p: dict, key, rank: int, *, init_std: Optional[float] = None) -> dict:
    kh, kw, in_ch, out_ch = p["kernel"].shape
    std = init_std if init_std is not None else 1.0 / rank
    p = dict(p)
    p["lora_A"] = jax.random.normal(key, (kh, kw, in_ch, rank), jnp.float32) * std
    p["lora_B"] = jnp.zeros((1, 1, rank, out_ch), jnp.float32)
    return p
