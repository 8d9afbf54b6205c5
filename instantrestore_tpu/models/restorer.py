"""The InstantRestore model: single-step personalized face restoration.

Functional twin of the reference's Pix2Pix_Turbo module
(/root/reference/face_replace/models/pix2pix_turbo.py) with TPU-native
structure: ONE parameter bundle where the "frozen original UNet/VAE"
(pix2pix_turbo.py:56-76) are not second copies but zero-cost *views* of the
same base weights — LoRA leaves stripped and the finetuned conv_in swapped
back to the pretrained one. That halves HBM for weights versus the
reference's four live networks.

Forward pass (pix2pix_turbo.py:281-343):
  1. VAE-encode the degraded input (trainable VAE, LoRA applied)
  2. reference branch (:242-279): VAE-encode the N conditioning images with
     the original VAE, noise to t=1, run the original UNet in K/V-capture
     mode, zero K/V beyond valid_indices, optionally 1-step-decode the refs
  3. noise the input latent to t in {249, 499, 749} (training; fixed 249 at
     inference, inference/test.py:62)
  4. UNet forward with shared-image attention over the captured K/V
  5. DDPM pred_original_sample -> VAE-decode (optional encoder-skip convs)
     -> clamp(-1, 1)

The fixed prompt embedding ("A high-quality photo of a person; professional,
8k", :100-106) is precomputed once and stored in the bundle as
``caption_enc`` [1, 77, 1024].
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from instantrestore_tpu.configs.config import ModelConfig
from instantrestore_tpu.models import scheduler as sched
from instantrestore_tpu.models.lora import (
    UNET_LORA_TARGETS,
    VAE_LORA_TARGETS,
    VAE_SHORTCUT_TARGETS,
    attach_lora,
    strip_lora,
)
from instantrestore_tpu.models.unet import UNetConfig, init_unet_params, unet_apply
from instantrestore_tpu.models.vae import (
    VAEConfig,
    init_vae_params,
    is_key_batch,
    sample_latent,
    vae_decode,
    vae_encode,
)

NOISE_TIMESTEPS = (249, 499, 749)  # pix2pix_turbo.py:107
COND_TIMESTEP = 1  # conditioning branch noise level (:247)
PROMPT = "A high-quality photo of a person; professional, 8k"


def _split_rng(rng: jax.Array, n: int):
    """jax.random.split that also accepts a [B]-batch of per-sample keys
    (``is_key_batch``), returning n key-batches of the same [B] shape.

    Per-sample key batches exist for mesh-size-invariant serving
    (inference/serving.py): every sample's noise is a function of its OWN
    key, so sharding the batch over a mesh cannot change the draw."""
    if is_key_batch(rng):
        ks = jax.vmap(lambda k: jax.random.split(k, n))(rng)  # [B, n, ...]
        return tuple(ks[:, i] for i in range(n))
    return tuple(jax.random.split(rng, n))


def _batched_normal(rng: jax.Array, shape, dtype) -> jnp.ndarray:
    """jax.random.normal that also accepts a [B]-key batch: sample i's slice
    ``out[i*m:(i+1)*m]`` (m = shape[0] // B) is drawn from key i alone, so
    the draw is independent of batch size/placement (mesh-size-invariant
    serving). With a single key, identical to jax.random.normal."""
    if is_key_batch(rng):
        b = rng.shape[0]
        assert shape[0] % b == 0, (shape, b)
        m = shape[0] // b
        per = jax.vmap(
            lambda k: jax.random.normal(k, (m, *shape[1:]), dtype)
        )(rng)
        return per.reshape(shape)
    return jax.random.normal(rng, shape, dtype)


@dataclasses.dataclass(frozen=True)
class RestorerStatics:
    """Static (trace-time) knobs of the restore forward."""

    unet_cfg: UNetConfig = UNetConfig()
    vae_cfg: VAEConfig = VAEConfig()
    use_shared_attention: bool = True
    use_adain: bool = False
    train_input: bool = True
    use_shortcuts: bool = False
    unet_lora_scaling: float = 0.5  # alpha=r//2 at training (pix2pix_turbo.py:175-178)
    vae_lora_scaling: float = 0.5
    noise_timesteps: Tuple[int, ...] = NOISE_TIMESTEPS
    condition_on_face_embeds: bool = False
    # rank-16/alpha-8 LoRA on the frozen K/V-capture nets
    # (pix2pix_turbo.py:163-168,183-188; off in all shipped configs)
    train_reference_networks: bool = False
    reference_lora_scaling: float = 0.5  # alpha=8 / rank=16
    compute_dtype: Any = jnp.bfloat16

    @classmethod
    def from_model_config(cls, mcfg: ModelConfig, **overrides) -> "RestorerStatics":
        kw = dict(
            use_shared_attention=mcfg.use_shared_attention,
            use_adain=mcfg.use_adain,
            train_input=mcfg.train_input,
            use_shortcuts=mcfg.use_shortcuts,
            unet_lora_scaling=(mcfg.lora_rank_unet // 2) / mcfg.lora_rank_unet,
            vae_lora_scaling=(mcfg.lora_rank_vae // 2) / mcfg.lora_rank_vae,
        )
        kw.update(overrides)
        kw.setdefault("condition_on_face_embeds", mcfg.condition_on_face_embeds)
        kw.setdefault("train_reference_networks", mcfg.train_reference_networks)
        return cls(**kw)


def init_restorer_params(
    key: jax.Array,
    statics: RestorerStatics,
    *,
    lora_rank_unet: int = 32,
    lora_rank_vae: int = 32,
    train_vae: bool = True,
) -> Dict[str, Any]:
    """Random-init bundle (tests / from-scratch; real weights via converter).

    Bundle layout:
      unet:             param tree WITH lora leaves; conv_in is the trainable
                        (initially pretrained) copy
      unet_orig_conv_in: pretrained conv_in for the frozen capture view
      vae:              param tree with lora leaves (+ skip convs if enabled)
      caption_enc:      [1, 77, cross_attention_dim] fp32 prompt embedding
    """
    k1, k2, k3, k4 = jax.random.split(key, 4)
    vae_cfg = dataclasses.replace(statics.vae_cfg, use_shortcuts=statics.use_shortcuts)
    base_unet = init_unet_params(k1, statics.unet_cfg)
    unet = attach_lora(base_unet, k2, lora_rank_unet, UNET_LORA_TARGETS)
    if statics.condition_on_face_embeds:
        from instantrestore_tpu.models.lora import attach_faceid

        unet = attach_faceid(
            unet, jax.random.fold_in(key, 11),
            cross_dim=statics.unet_cfg.cross_attention_dim,
        )
    base_vae = init_vae_params(k3, vae_cfg)
    vae = base_vae
    if train_vae:
        targets = VAE_SHORTCUT_TARGETS if statics.use_shortcuts else VAE_LORA_TARGETS
        vae = attach_lora(base_vae, k4, lora_rank_vae, targets)
    caption = jax.random.normal(
        jax.random.fold_in(key, 7),
        (1, 77, statics.unet_cfg.cross_attention_dim),
        jnp.float32,
    )
    bundle = {
        "unet": unet,
        "unet_orig_conv_in": dict(unet["conv_in"]),
        "vae": vae,
        "caption_enc": caption,
    }
    if statics.train_reference_networks:
        # explicit original trees (no longer zero-cost views) with their own
        # rank-16/alpha-8 gaussian LoRA (pix2pix_turbo.py:163-168,183-188)
        bundle["original_unet"] = attach_lora(
            base_unet, jax.random.fold_in(key, 21), 16, UNET_LORA_TARGETS
        )
        bundle["original_vae"] = attach_lora(
            base_vae, jax.random.fold_in(key, 22), 16,
            VAE_SHORTCUT_TARGETS if statics.use_shortcuts else VAE_LORA_TARGETS,
        )
    return bundle


def original_unet_view(params: Dict[str, Any]) -> Dict[str, Any]:
    """The frozen K/V-capture UNet: base weights, pretrained conv_in.

    Pure dict re-nesting over the same arrays — free inside jit. If the
    bundle carries an explicit ``original_unet`` (converted from a FULL
    checkpoint where it diverged), that takes precedence.
    """
    if "original_unet" in params:
        return params["original_unet"]
    view = strip_lora(params["unet"])
    view["conv_in"] = params["unet_orig_conv_in"]
    return view


def original_vae_view(params: Dict[str, Any]) -> Dict[str, Any]:
    if "original_vae" in params:
        return params["original_vae"]
    return strip_lora(params["vae"])


def mask_ref_kv(kv, valid_indices: jnp.ndarray, batch: int, n_refs: int):
    """Reshape captured head-split [B*N, H, S, d] K/V to [B, N, H, S, d] and
    zero entries at or beyond each sample's valid count
    (pix2pix_turbo.py:265-273)."""
    masked = []
    valid = valid_indices.astype(jnp.int32)
    mask = (jnp.arange(n_refs)[None, :] < valid[:, None]).astype(jnp.float32)
    for k, v in kv:
        k = k.reshape(batch, n_refs, *k.shape[1:])
        v = v.reshape(batch, n_refs, *v.shape[1:])
        m = mask[:, :, None, None, None].astype(k.dtype)
        masked.append((k * m, v * m))
    return masked


def get_conditioning_kv(
    params: Dict[str, Any],
    cond_images: jnp.ndarray,
    valid_indices: jnp.ndarray,
    rng: jax.Array,
    *,
    statics: RestorerStatics,
    alphas_cumprod: jnp.ndarray,
    sample_posterior: bool = True,
    decode_conditions: bool = False,
    use_fused_attention: bool = False,
    debug_taps: bool = False,
):
    """Reference branch: extract shared-attention K/V from the N conditioning
    images (pix2pix_turbo.py:242-279).

    ``debug_taps=True`` returns a third element with the conditioning-branch
    latents {cond_latent, cond_latent_noised} ([B*N, h, w, 4]) so a torch-side
    parity run (scripts/parity_torch_side.py) can derive and inject the exact
    conditioning noise."""
    b, n = cond_images.shape[:2]
    flat = cond_images.reshape(b * n, *cond_images.shape[2:])
    if is_key_batch(rng):
        # [B] per-sample keys -> one key per (sample, ref) row of `flat`:
        # sample i's conditioning noise depends only on key i, never on the
        # batch's size or mesh placement (serving determinism). Legacy
        # uint32 keys carry a trailing [2] dim; typed keys are scalar.
        ks = jax.vmap(lambda k: jax.random.split(k, n))(rng)  # [B, n, ...]
        rng = ks.reshape((b * n,) + ks.shape[2:])
    r_lat, r_noise = _split_rng(rng, 2)

    ovae = original_vae_view(params)
    ounet = original_unet_view(params)
    sf = statics.vae_cfg.scaling_factor

    # the rank-16 reference LoRA applies only when the explicit trainable
    # originals exist (scaling is ignored on trees without lora leaves)
    ref_scaling = statics.reference_lora_scaling
    mean, logvar, _ = vae_encode(
        ovae, flat, cfg=statics.vae_cfg, compute_dtype=statics.compute_dtype,
        lora_scaling=ref_scaling,
        use_fused_attention=use_fused_attention,
    )
    z = sample_latent(mean, logvar, r_lat if sample_posterior else None) * sf
    t1 = jnp.full((b * n,), COND_TIMESTEP, jnp.int32)
    noise = _batched_normal(r_noise, z.shape, z.dtype)
    zt = sched.add_noise(alphas_cumprod, z, noise, t1)

    caption = jnp.tile(params["caption_enc"], (b * n, 1, 1))
    eps, aux = unet_apply(
        ounet,
        zt,
        t1,
        caption,
        cfg=statics.unet_cfg,
        capture_kv=True,
        lora_scaling=ref_scaling,
        use_fused_attention=use_fused_attention,
        compute_dtype=statics.compute_dtype,
    )
    ref_kv = mask_ref_kv(aux["kv"], valid_indices, b, n)

    decoded = None
    if decode_conditions:
        x0 = sched.pred_original_sample(alphas_cumprod, eps, zt, t1)
        decoded = jnp.clip(
            vae_decode(ovae, x0 / sf, cfg=statics.vae_cfg, compute_dtype=statics.compute_dtype,
                       lora_scaling=ref_scaling,
                       use_fused_attention=use_fused_attention),
            -1.0,
            1.0,
        ).reshape(b, n, *cond_images.shape[2:])
    if debug_taps:
        return ref_kv, decoded, {"cond_latent": z, "cond_latent_noised": zt}
    return ref_kv, decoded


def restore_forward(
    params: Dict[str, Any],
    image: jnp.ndarray,
    cond_images: Optional[jnp.ndarray] = None,
    valid_indices: Optional[jnp.ndarray] = None,
    rng: Optional[jax.Array] = None,
    face_embeds: Optional[jnp.ndarray] = None,
    *,
    statics: RestorerStatics,
    timestep: Optional[int] = None,
    sample_posterior: bool = True,
    decode_conditions: bool = False,
    save_attn_probs: bool = False,
    probs_layers: Optional[Tuple[int, ...]] = None,
    save_seg_sums: bool = False,
    use_fused_attention: bool = False,
    precomputed_ref_kv=None,
    remat: bool = False,
    debug_taps: bool = False,
) -> Dict[str, Any]:
    """Full restoration forward.

    ``debug_taps=True`` additionally returns per-stage activations under
    result['taps'] (VAE-enc moments, latents pre/post noise, each UNet
    down/mid/up block, each of the 9 shared attentions, eps, x0, decode) for
    block-by-block golden diffing against a torch reference run
    (scripts/parity.py dump-activations; SURVEY §7 / BASELINE <1e-2 gate).

    Args:
      image: degraded input [B, H, W, 3] in [-1, 1].
      cond_images: [B, N, H, W, 3] same-identity references (already padded
        to N; padding rows are masked via valid_indices).
      valid_indices: [B] int count of valid references per sample.
      rng: PRNG key driving latent sampling + forward-diffusion noise (+
        train-time timestep choice). Required. May be a [B]-batch of
        per-sample keys (one per input image): then every sample's noise is
        a function of its own key alone — batch-size- and mesh-placement-
        invariant (serving determinism; inference/serving.py derives the
        batch from global row indices). With a key batch and timestep=None,
        the (batch-shared) timestep draw uses sample 0's key.
      timestep: fixed noise timestep (249 at inference); None samples
        uniformly from statics.noise_timesteps (training,
        pix2pix_turbo.py:306).
      remat: jax.checkpoint each pipeline stage (VAE encode / KV capture /
        UNet / VAE decode). Required for full-size training on one v5e chip:
        the 512px VAE activation footprint otherwise OOMs the backward pass
        (the reference trains on 80 GB A100s; v5e has 16 GB).

    Returns dict: output_image [B,H,W,3] in [-1,1]; output_image_conditions
    (when decode_conditions); attn_probs (when save_attn_probs); timestep.
    """
    b = image.shape[0]
    abar = sched.make_alphas_cumprod()
    sf = statics.vae_cfg.scaling_factor
    r_cond, r_lat, r_noise, r_t = _split_rng(rng, 4)
    ckpt = jax.checkpoint if remat else (lambda f: f)

    # 1. encode the degraded input with the trainable VAE
    @ckpt
    def _encode(p, img):
        return vae_encode(
            p, img, cfg=statics.vae_cfg,
            lora_scaling=statics.vae_lora_scaling,
            compute_dtype=statics.compute_dtype,
            use_fused_attention=use_fused_attention,
        )

    mean, logvar, skip_acts = _encode(params["vae"], image)
    z = sample_latent(mean, logvar, r_lat if sample_posterior else None) * sf

    # 2. shared-attention K/V from the reference images (or a warm identity
    #    KV cache in batched serving — see inference/serving.py)
    ref_kv, decoded_conds, cond_taps = None, None, {}
    if precomputed_ref_kv is not None:
        ref_kv = precomputed_ref_kv
    elif cond_images is not None and statics.use_shared_attention:
        if valid_indices is None:
            valid_indices = jnp.full((b,), cond_images.shape[1], jnp.int32)

        @ckpt
        def _capture(p, conds, valid, r):
            return get_conditioning_kv(
                p, conds, valid, r,
                statics=statics,
                alphas_cumprod=abar,
                sample_posterior=sample_posterior,
                decode_conditions=decode_conditions,
                use_fused_attention=use_fused_attention,
                debug_taps=debug_taps,
            )

        if debug_taps:
            ref_kv, decoded_conds, cond_taps = _capture(
                params, cond_images, valid_indices, r_cond
            )
        else:
            ref_kv, decoded_conds = _capture(params, cond_images, valid_indices, r_cond)

    # 3. forward-diffuse the input latent
    if timestep is None:
        # one t per batch, as the reference (pix2pix_turbo.py:306)
        r_t1 = r_t[0] if is_key_batch(r_t) else r_t
        idx = jax.random.randint(r_t1, (), 0, len(statics.noise_timesteps))
        t = jnp.asarray(statics.noise_timesteps, jnp.int32)[idx]
    else:
        t = jnp.asarray(timestep, jnp.int32)
    tb = jnp.broadcast_to(t, (b,))
    noise = _batched_normal(r_noise, z.shape, z.dtype)
    zt = sched.add_noise(abar, z, noise, tb)

    # 4. restoration UNet with shared-image attention; FaceID conditioning
    #    replaces the text embedding when enabled (pix2pix_turbo.py:316-320)
    use_faceid = statics.condition_on_face_embeds and face_embeds is not None
    if use_faceid:
        caption = face_embeds
    else:
        caption = jnp.tile(params["caption_enc"], (b, 1, 1))
    @ckpt
    def _unet(p, zt_, tb_, caption_, ref_kv_):
        return unet_apply(
            p, zt_, tb_, caption_,
            cfg=statics.unet_cfg,
            ref_kv=ref_kv_,
            use_adain=statics.use_adain,
            train_input=statics.train_input,
            save_attn_probs=save_attn_probs,
            probs_layers=probs_layers,
            save_seg_sums=save_seg_sums,
            use_fused_attention=use_fused_attention,
            use_faceid=use_faceid,
            capture_taps=debug_taps,
            lora_scaling=statics.unet_lora_scaling,
            compute_dtype=statics.compute_dtype,
        )

    eps, aux = _unet(params["unet"], zt, tb, caption, ref_kv)

    # 5. x0 estimate and decode (with encoder skips when trained with them)
    x0 = sched.pred_original_sample(abar, eps, zt, tb)

    @ckpt
    def _decode(p, z_, skips_):
        return vae_decode(
            p, z_, cfg=statics.vae_cfg,
            skip_acts=skips_,
            gamma=1.0,
            lora_scaling=statics.vae_lora_scaling,
            compute_dtype=statics.compute_dtype,
            use_fused_attention=use_fused_attention,
        )

    out = _decode(
        params["vae"], x0 / sf, skip_acts if statics.use_shortcuts else None
    )
    result = {
        "output_image": jnp.clip(out, -1.0, 1.0),
        "timestep": t,
        "latent_pred": x0,
    }
    if decoded_conds is not None:
        result["output_image_conditions"] = decoded_conds
    if save_attn_probs:
        result["attn_probs"] = aux.get("attn_probs")
    if save_seg_sums:
        result["attn_seg_sums"] = aux.get("seg_sums")
    if debug_taps:
        taps = {
            "vae_enc_mean": mean,
            "vae_enc_logvar": logvar,
            "latent": z,
            "latent_noised": zt,
            "unet_eps": eps,
            "x0": x0,
            "decoded": out,
        }
        taps.update(cond_taps)
        for k, v in aux.get("taps", {}).items():
            taps[f"unet.{k}"] = v
        if ref_kv is not None:
            for i, (k_arr, v_arr) in enumerate(ref_kv):
                taps[f"ref_kv.{i}.k"] = k_arr
                taps[f"ref_kv.{i}.v"] = v_arr
        result["taps"] = taps
    return result


def serving_bundle(params: Dict[str, Any], statics: RestorerStatics) -> Dict[str, Any]:
    """Inference-optimized bundle: LoRA merged into the trainable nets'
    kernels (eliminating the factored-path conv overhead), frozen originals
    materialized explicitly so the capture branch still sees base weights.
    Costs one extra copy of the base weights in HBM (~1.9 GB bf16)."""
    from instantrestore_tpu.models.lora import merge_lora

    out = {
        "unet": merge_lora(params["unet"], statics.unet_lora_scaling),
        "vae": merge_lora(params["vae"], statics.vae_lora_scaling),
        "original_unet": original_unet_view(params),
        "original_vae": original_vae_view(params),
        "caption_enc": params["caption_enc"],
    }
    if "text_encoder" in params:
        out["text_encoder"] = params["text_encoder"]
    return out


def restore_forward_multistep(
    params: Dict[str, Any],
    image: jnp.ndarray,
    cond_images: Optional[jnp.ndarray] = None,
    valid_indices: Optional[jnp.ndarray] = None,
    rng: Optional[jax.Array] = None,
    *,
    statics: RestorerStatics,
    timesteps: Tuple[int, ...] = (749, 499, 249),
    sample_posterior: bool = True,
    use_fused_attention: bool = False,
) -> Dict[str, Any]:
    """Multi-step restoration: noise the input latent to timesteps[0], then
    DDIM-denoise through the list with the SAME shared-attention K/V at every
    step (captured once), finishing with the x0 estimate and VAE decode.

    Extension beyond the reference (whose multi-step branch is unreachable
    dead code, inference/test.py:84-90); single-step == timesteps=(249,).
    """
    b = image.shape[0]
    abar = sched.make_alphas_cumprod()
    sf = statics.vae_cfg.scaling_factor
    r_cond, r_lat, r_noise = jax.random.split(rng, 3)

    mean, logvar, skip_acts = vae_encode(
        params["vae"], image, cfg=statics.vae_cfg,
        lora_scaling=statics.vae_lora_scaling, compute_dtype=statics.compute_dtype,
        use_fused_attention=use_fused_attention,
    )
    z = sample_latent(mean, logvar, r_lat if sample_posterior else None) * sf

    ref_kv = None
    if cond_images is not None and statics.use_shared_attention:
        if valid_indices is None:
            valid_indices = jnp.full((b,), cond_images.shape[1], jnp.int32)
        ref_kv, _ = get_conditioning_kv(
            params, cond_images, valid_indices, r_cond, statics=statics,
            alphas_cumprod=abar, sample_posterior=sample_posterior,
            use_fused_attention=use_fused_attention,
        )

    caption = jnp.tile(params["caption_enc"], (b, 1, 1))
    t0 = jnp.full((b,), timesteps[0], jnp.int32)
    noise = jax.random.normal(r_noise, z.shape, z.dtype)
    x = sched.add_noise(abar, z, noise, t0)

    for i, t in enumerate(timesteps):
        tb = jnp.full((b,), t, jnp.int32)
        eps, _ = unet_apply(
            params["unet"], x, tb, caption, cfg=statics.unet_cfg, ref_kv=ref_kv,
            use_adain=statics.use_adain, train_input=statics.train_input,
            use_fused_attention=use_fused_attention,
            lora_scaling=statics.unet_lora_scaling,
            compute_dtype=statics.compute_dtype,
        )
        t_next = timesteps[i + 1] if i + 1 < len(timesteps) else -1
        x = sched.ddim_step(abar, eps, x, tb, jnp.full((b,), t_next, jnp.int32))

    out = vae_decode(
        params["vae"], x / sf, cfg=statics.vae_cfg,
        skip_acts=skip_acts if statics.use_shortcuts else None, gamma=1.0,
        lora_scaling=statics.vae_lora_scaling, compute_dtype=statics.compute_dtype,
        use_fused_attention=use_fused_attention,
    )
    return {"output_image": jnp.clip(out, -1.0, 1.0)}
