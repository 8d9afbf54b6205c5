"""SD-Turbo (SD2.1-base) conditional UNet, functional and TPU-native.

Capability twin of the vendored diffusers-0.24 UNet2DConditionModel the
reference ships (/root/reference/face_replace/models/unet_2d_condition/
unet.py:77,804-1179 and block.py) — re-designed, not translated:

* one pure function over an NHWC parameter pytree whose nesting mirrors the
  diffusers state-dict names (so checkpoint conversion is mechanical);
* the reference's two stateful attention-processor registrations
  (attn_processors.py:282-331) become two flags on the same function:
  ``capture_kv=True`` returns the 9 up-block self-attention K/V pytrees
  (frozen reference branch), ``ref_kv=[...]`` injects them (restoration
  branch);
* FreeU is always-on data (models/freeu.py), LoRA is extra leaves in the
  param tree applied with a static scaling (ops/primitives.py).

Architecture (sd-turbo unet config): sample 64x64x4, block_out_channels
(320, 640, 1280, 1280), 2 layers/block, heads (5, 10, 20, 20) with head_dim
64, cross_attention_dim 1024, linear transformer projections, GN32. The nine
shared self-attention layers live in up_blocks 1..3 (3 transformer blocks
each at 16^2/20h, 32^2/10h, 64^2/5h — restore_dataset.py:71-75).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from instantrestore_tpu.models.attention import attention
from instantrestore_tpu.models.freeu import FreeUParams, apply_freeu
from instantrestore_tpu.ops.primitives import (
    conv2d,
    dense,
    group_norm,
    init_conv2d,
    init_dense,
    init_norm,
    layer_norm,
    silu,
    geglu,
    timestep_embedding,
    upsample2x_conv,
)

DEFAULT_FREEU = FreeUParams(s1=0.9, s2=0.2, b1=1.4, b2=1.6)  # pix2pix_turbo.py:62-68


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    sample_size: int = 64
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    down_block_types: Tuple[str, ...] = (
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "DownBlock2D",
    )
    up_block_types: Tuple[str, ...] = (
        "UpBlock2D",
        "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
    )
    layers_per_block: int = 2
    # diffusers SD2 quirk: "attention_head_dim" actually holds the head COUNT
    attention_heads: Tuple[int, ...] = (5, 10, 20, 20)
    cross_attention_dim: int = 1024
    norm_num_groups: int = 32
    norm_eps: float = 1e-5
    transformer_norm_eps: float = 1e-6
    flip_sin_to_cos: bool = True
    freq_shift: float = 0.0

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4

    @property
    def num_shared_attn_layers(self) -> int:
        """Self-attention layers in cross-attn up blocks (9 for SD2)."""
        n = 0
        for i, t in enumerate(self.up_block_types):
            if t == "CrossAttnUpBlock2D":
                n += self.layers_per_block + 1
        return n


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _init_resnet(key, in_ch: int, out_ch: int, temb_dim: int) -> Dict[str, Any]:
    ks = jax.random.split(key, 4)
    p = {
        "norm1": init_norm(in_ch),
        "conv1": init_conv2d(ks[0], in_ch, out_ch, 3),
        "time_emb_proj": init_dense(ks[1], temb_dim, out_ch),
        "norm2": init_norm(out_ch),
        "conv2": init_conv2d(ks[2], out_ch, out_ch, 3),
    }
    if in_ch != out_ch:
        p["conv_shortcut"] = init_conv2d(ks[3], in_ch, out_ch, 1)
    return p


def _init_attention(key, query_dim: int, context_dim: Optional[int], heads: int) -> Dict[str, Any]:
    inner = query_dim
    ctx = context_dim if context_dim is not None else query_dim
    ks = jax.random.split(key, 4)
    return {
        "to_q": init_dense(ks[0], query_dim, inner, bias=False),
        "to_k": init_dense(ks[1], ctx, inner, bias=False),
        "to_v": init_dense(ks[2], ctx, inner, bias=False),
        "to_out": init_dense(ks[3], inner, query_dim, bias=True),
    }


def _init_transformer(key, ch: int, heads: int, ctx_dim: int) -> Dict[str, Any]:
    ks = jax.random.split(key, 6)
    block = {
        "norm1": init_norm(ch),
        "attn1": _init_attention(ks[0], ch, None, heads),
        "norm2": init_norm(ch),
        "attn2": _init_attention(ks[1], ch, ctx_dim, heads),
        "norm3": init_norm(ch),
        "ff": {
            "net_0_proj": init_dense(ks[2], ch, ch * 8),  # GEGLU: 2 * 4*ch
            "net_2": init_dense(ks[3], ch * 4, ch),
        },
    }
    return {
        "norm": init_norm(ch),
        "proj_in": init_dense(ks[4], ch, ch),
        "transformer_blocks": [block],
        "proj_out": init_dense(ks[5], ch, ch),
    }


def init_unet_params(key, cfg: UNetConfig = UNetConfig()) -> Dict[str, Any]:
    """Random-init parameter tree (real weights come from the converter)."""
    keys = iter(jax.random.split(key, 256))
    ch0 = cfg.block_out_channels[0]
    temb_dim = cfg.time_embed_dim
    params: Dict[str, Any] = {
        "conv_in": init_conv2d(next(keys), cfg.in_channels, ch0, 3),
        "time_embedding": {
            "linear_1": init_dense(next(keys), ch0, temb_dim),
            "linear_2": init_dense(next(keys), temb_dim, temb_dim),
        },
        "conv_norm_out": init_norm(ch0),
        "conv_out": init_conv2d(next(keys), ch0, cfg.out_channels, 3),
    }

    down_blocks = []
    out_ch = ch0
    for i, btype in enumerate(cfg.down_block_types):
        in_ch = out_ch
        out_ch = cfg.block_out_channels[i]
        is_final = i == len(cfg.down_block_types) - 1
        block: Dict[str, Any] = {"resnets": [], "attentions": []}
        for j in range(cfg.layers_per_block):
            rin = in_ch if j == 0 else out_ch
            block["resnets"].append(_init_resnet(next(keys), rin, out_ch, temb_dim))
            if btype == "CrossAttnDownBlock2D":
                block["attentions"].append(
                    _init_transformer(
                        next(keys), out_ch, cfg.attention_heads[i], cfg.cross_attention_dim
                    )
                )
        if not block["attentions"]:
            del block["attentions"]
        if not is_final:
            block["downsamplers"] = [{"conv": init_conv2d(next(keys), out_ch, out_ch, 3)}]
        down_blocks.append(block)
    params["down_blocks"] = down_blocks

    mid_ch = cfg.block_out_channels[-1]
    params["mid_block"] = {
        "resnets": [
            _init_resnet(next(keys), mid_ch, mid_ch, temb_dim),
            _init_resnet(next(keys), mid_ch, mid_ch, temb_dim),
        ],
        "attentions": [
            _init_transformer(next(keys), mid_ch, cfg.attention_heads[-1], cfg.cross_attention_dim)
        ],
    }

    up_blocks = []
    rev_channels = list(reversed(cfg.block_out_channels))
    for i, btype in enumerate(cfg.up_block_types):
        prev_ch = rev_channels[max(i - 1, 0)] if i > 0 else mid_ch
        out_ch = rev_channels[i]
        # skip-connection channels popped by this block (reverse of down path)
        in_skips = _up_block_skip_channels(cfg, i)
        is_final = i == len(cfg.up_block_types) - 1
        block = {"resnets": [], "attentions": []}
        hidden_ch = prev_ch
        for j in range(cfg.layers_per_block + 1):
            rin = hidden_ch + in_skips[j]
            block["resnets"].append(_init_resnet(next(keys), rin, out_ch, temb_dim))
            hidden_ch = out_ch
            if btype == "CrossAttnUpBlock2D":
                heads = cfg.attention_heads[len(cfg.block_out_channels) - 1 - i]
                block["attentions"].append(
                    _init_transformer(next(keys), out_ch, heads, cfg.cross_attention_dim)
                )
        if not block["attentions"]:
            del block["attentions"]
        if not is_final:
            block["upsamplers"] = [{"conv": init_conv2d(next(keys), out_ch, out_ch, 3)}]
        up_blocks.append(block)
    params["up_blocks"] = up_blocks
    return params


def _up_block_skip_channels(cfg: UNetConfig, up_idx: int) -> List[int]:
    """Channel widths of the skips popped by up block ``up_idx``.

    Reconstructs the down-path skip stack: conv_in, then per down block each
    resnet output plus (if present) the downsampler output.
    """
    stack = [cfg.block_out_channels[0]]  # conv_in
    for i in range(len(cfg.down_block_types)):
        ch = cfg.block_out_channels[i]
        stack.extend([ch] * cfg.layers_per_block)
        if i != len(cfg.down_block_types) - 1:
            stack.append(ch)
    per_block = cfg.layers_per_block + 1
    popped = []
    for j in range(per_block):
        popped.append(stack[-(up_idx * per_block + j + 1)])
    return popped


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------


def _resnet(p, x, temb, *, cfg: UNetConfig, lora_scaling: float):
    h = group_norm(p["norm1"], x, num_groups=cfg.norm_num_groups, eps=cfg.norm_eps)
    h = silu(h)
    h = conv2d(p["conv1"], h, lora_scaling=lora_scaling)
    t = dense(p["time_emb_proj"], silu(temb), lora_scaling=lora_scaling)
    h = h + t[:, None, None, :]
    h = group_norm(p["norm2"], h, num_groups=cfg.norm_num_groups, eps=cfg.norm_eps)
    h = silu(h)
    h = conv2d(p["conv2"], h, lora_scaling=lora_scaling)
    if "conv_shortcut" in p:
        x = conv2d(p["conv_shortcut"], x, padding=0, lora_scaling=lora_scaling)
    return x + h


def _transformer(
    p,
    x,
    temb_unused,
    ctx,
    *,
    cfg: UNetConfig,
    heads: int,
    lora_scaling: float,
    shared: Optional[dict] = None,
):
    """Transformer2DModel with linear projections (SD2 use_linear_projection).

    ``shared`` carries the shared-attention state for attn1 when this is one
    of the 9 up-block layers: {ref_kv, use_adain, train_input, capture_kv,
    save_probs, use_fused}. Returns (out, aux).
    """
    b, hgt, wdt, c = x.shape
    residual = x
    h = group_norm(p["norm"], x, num_groups=cfg.norm_num_groups, eps=cfg.transformer_norm_eps)
    # NOTE (round-5 measured dead end): these five 64^2 proj_in dots profile
    # at 1569 us / 4.3% MXU each (sequence-in-lanes conv-emitter layout;
    # same-shape siblings run 122 us), but eliminating them does NOT move
    # end-to-end time. Three A/Bs, ~0.1% run noise each: flatten every
    # dense to 2-D (35.49 — net regression), flatten proj_in only (35.70 —
    # XLA's simplifier reconstitutes the 3-D dot, verified by re-profile),
    # flatten + optimization_barriers (35.74 — 2-D dot forced, still
    # neutral) vs 35.79 baseline. The serving graph is roofline-bound
    # elsewhere; the 'slow' dots overlap work the schedule would otherwise
    # expose. Keeping the simple 3-D form.
    h = h.reshape(b, hgt * wdt, c)
    h = dense(p["proj_in"], h, lora_scaling=lora_scaling)

    aux_out = {}
    for bp in p["transformer_blocks"]:
        # self-attention (possibly shared-image attention)
        norm_h = layer_norm(bp["norm1"], h)
        sh = shared or {}
        attn_out, aux = attention(
            bp["attn1"],
            norm_h,
            heads=heads,
            ref_kv=sh.get("ref_kv"),
            use_adain=sh.get("use_adain", False),
            train_input=sh.get("train_input", True),
            capture_kv=sh.get("capture_kv", False),
            save_probs=sh.get("save_probs", False),
            save_seg_sums=sh.get("save_seg_sums", False),
            use_fused=sh.get("use_fused", False),
            lora_scaling=lora_scaling,
        )
        aux_out.update(aux)
        h = h + attn_out
        # cross-attention over the text/context embedding (or ArcFace face
        # embeddings when the FaceID variant is enabled)
        norm_h = layer_norm(bp["norm2"], h)
        attn_out, _ = attention(bp["attn2"], norm_h, heads=heads, encoder_hidden=ctx,
                                lora_scaling=lora_scaling,
                                use_faceid=sh.get("use_faceid", False))
        h = h + attn_out
        # feed-forward (GEGLU)
        norm_h = layer_norm(bp["norm3"], h)
        ff = geglu(bp["ff"]["net_0_proj"], norm_h, lora_scaling=lora_scaling)
        ff = dense(bp["ff"]["net_2"], ff, lora_scaling=lora_scaling)
        h = h + ff

    h = dense(p["proj_out"], h, lora_scaling=lora_scaling)
    return h.reshape(b, hgt, wdt, c) + residual, aux_out


@jax.named_scope("unet")
def unet_apply(
    params: Dict[str, Any],
    sample: jnp.ndarray,
    timesteps: jnp.ndarray,
    encoder_hidden_states: jnp.ndarray,
    *,
    cfg: UNetConfig = UNetConfig(),
    ref_kv: Optional[Sequence[Tuple[jnp.ndarray, jnp.ndarray]]] = None,
    capture_kv: bool = False,
    save_attn_probs: bool = False,
    probs_layers: Optional[Tuple[int, ...]] = None,
    save_seg_sums: bool = False,
    use_adain: bool = False,
    train_input: bool = True,
    freeu: Optional[FreeUParams] = DEFAULT_FREEU,
    lora_scaling: float = 1.0,
    use_fused_attention: bool = False,
    use_faceid: bool = False,
    capture_taps: bool = False,
    compute_dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """Run the UNet. ``sample``: [B, H, W, 4] NHWC latents; ``timesteps``:
    scalar or [B] int; ``encoder_hidden_states``: [B, 77, 1024].

    Returns (epsilon prediction [B, H, W, 4],
             aux = {'kv': [(k, v) x 9]        when capture_kv,
                    'attn_probs': [p x 9]     when save_attn_probs
                                              (None at layers outside
                                               probs_layers when set),
                    'seg_sums': [s x 9]       when save_seg_sums
                                              ([B,h,Sq,n_seg] streamed
                                               per-segment softmax mass),
                    'taps': {stage: act}      when capture_taps}).

    The 9-entry lists are ordered by traversal of up-block self-attentions,
    matching the reference's self_attn_idx 0..8 (attn_processors.py:304-311).
    ``taps`` carries per-stage activations (conv_in, each down/mid/up block,
    each shared attention output) for golden-activation diffing against a
    torch-side run (SURVEY §7; BASELINE <1e-2 gate localization).
    """
    if timesteps.ndim == 0:
        timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))

    x = sample.astype(compute_dtype)
    ctx = encoder_hidden_states.astype(compute_dtype)

    t_emb = timestep_embedding(
        timesteps,
        cfg.block_out_channels[0],
        flip_sin_to_cos=cfg.flip_sin_to_cos,
        downscale_freq_shift=cfg.freq_shift,
    ).astype(compute_dtype)
    temb = dense(params["time_embedding"]["linear_1"], t_emb)
    temb = dense(params["time_embedding"]["linear_2"], silu(temb))

    x = conv2d(params["conv_in"], x, lora_scaling=lora_scaling)
    taps: Dict[str, jnp.ndarray] = {}
    if capture_taps:
        taps["conv_in"] = x

    # plain (non-shared) self-attentions still want the fused kernel — the
    # 64x64 down-block attention would otherwise materialize [B,5,4096,4096]
    # probabilities in HBM
    plain = {"use_fused": use_fused_attention, "use_faceid": use_faceid}

    # ---- down path ----
    skips = [x]
    for i, (btype, bp) in enumerate(zip(cfg.down_block_types, params["down_blocks"])):
        heads = cfg.attention_heads[i]
        for j, rp in enumerate(bp["resnets"]):
            x = _resnet(rp, x, temb, cfg=cfg, lora_scaling=lora_scaling)
            if btype == "CrossAttnDownBlock2D":
                x, _ = _transformer(
                    bp["attentions"][j], x, temb, ctx, cfg=cfg, heads=heads,
                    lora_scaling=lora_scaling, shared=plain,
                )
            skips.append(x)
        if "downsamplers" in bp:
            x = conv2d(bp["downsamplers"][0]["conv"], x, stride=2, lora_scaling=lora_scaling)
            skips.append(x)
        if capture_taps:
            taps[f"down_block_{i}"] = x

    # ---- mid ----
    mp = params["mid_block"]
    x = _resnet(mp["resnets"][0], x, temb, cfg=cfg, lora_scaling=lora_scaling)
    x, _ = _transformer(
        mp["attentions"][0], x, temb, ctx, cfg=cfg, heads=cfg.attention_heads[-1],
        lora_scaling=lora_scaling, shared=plain,
    )
    x = _resnet(mp["resnets"][1], x, temb, cfg=cfg, lora_scaling=lora_scaling)
    if capture_taps:
        taps["mid_block"] = x

    # ---- up path ----
    kv_list: List[Tuple[jnp.ndarray, jnp.ndarray]] = []
    probs_list: List[Optional[jnp.ndarray]] = []
    seg_sums_list: List[jnp.ndarray] = []
    shared_idx = 0
    for i, (btype, bp) in enumerate(zip(cfg.up_block_types, params["up_blocks"])):
        heads = cfg.attention_heads[len(cfg.block_out_channels) - 1 - i]
        for j, rp in enumerate(bp["resnets"]):
            skip = skips.pop()
            x, skip = apply_freeu(i, x, skip, freeu)
            x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
            x = _resnet(rp, x, temb, cfg=cfg, lora_scaling=lora_scaling)
            if btype == "CrossAttnUpBlock2D":
                save_probs_here = save_attn_probs and (
                    probs_layers is None or shared_idx in probs_layers
                )
                shared = {
                    "ref_kv": ref_kv[shared_idx] if ref_kv is not None else None,
                    "use_adain": use_adain,
                    "train_input": train_input,
                    "capture_kv": capture_kv,
                    "save_probs": save_probs_here,
                    "save_seg_sums": save_seg_sums,
                    "use_fused": use_fused_attention,
                    "use_faceid": use_faceid,
                }
                x, aux = _transformer(
                    bp["attentions"][j], x, temb, ctx, cfg=cfg, heads=heads,
                    lora_scaling=lora_scaling, shared=shared,
                )
                if capture_kv:
                    kv_list.append(aux["kv"])
                if save_attn_probs:
                    probs_list.append(aux.get("probs"))
                if save_seg_sums and "seg_sums" in aux:
                    seg_sums_list.append(aux["seg_sums"])
                if capture_taps:
                    taps[f"shared_attn_{shared_idx}"] = x
                shared_idx += 1
        if "upsamplers" in bp:
            # subpixel-decomposed upsample+conv: 2.25x fewer MACs, exact math
            x = upsample2x_conv(
                bp["upsamplers"][0]["conv"], x, lora_scaling=lora_scaling
            )
        if capture_taps:
            taps[f"up_block_{i}"] = x

    x = group_norm(params["conv_norm_out"], x, num_groups=cfg.norm_num_groups, eps=cfg.norm_eps)
    x = silu(x)
    x = conv2d(params["conv_out"], x, lora_scaling=lora_scaling)

    aux_out: Dict[str, Any] = {}
    if capture_kv:
        aux_out["kv"] = kv_list
    if save_attn_probs:
        aux_out["attn_probs"] = probs_list
    if save_seg_sums:
        aux_out["seg_sums"] = seg_sums_list
    if capture_taps:
        aux_out["taps"] = taps
    return x.astype(sample.dtype), aux_out


def quantize_unet_int8(unet_params: Dict[str, Any]) -> Dict[str, Any]:
    """Opt-in serving quantization of the UNet's conv mass (resnet conv1/
    conv2/conv_shortcut + down/upsampler convs) to int8 — same scheme and
    caveats as models/vae.py::quantize_decoder_int8. conv_in/conv_out (4-ch
    I/O), time-embedding and attention/transformer denses stay bf16. Apply
    to the RESTORE UNet only; the frozen capture UNet runs once per identity
    at onboarding and keeps full precision."""
    from instantrestore_tpu.ops.primitives import quantize_block_convs_int8

    out = dict(unet_params)
    out["down_blocks"] = [quantize_block_convs_int8(b) for b in unet_params["down_blocks"]]
    out["mid_block"] = quantize_block_convs_int8(unet_params["mid_block"])
    out["up_blocks"] = [quantize_block_convs_int8(b) for b in unet_params["up_blocks"]]
    return out
