"""Composite generator loss — functional twin of Coach.calc_loss
(/root/reference/face_replace/training/coach.py:562-700) plus the G-side
adversarial term (coach.py:239).

Terms (weights = OptimConfig lambda_*):
  rec (l1 OR l2, :574-581) | LPIPS (:582-584, always) | MS-SSIM (:586-591)
  | ArcFace ID (:593-597) | attention-entropy reg (:599-617) | cycle
  (re-degrade prediction, :619-629) | landmark attention (:631-640,531-560)
  | pos/neg reference-attention regularizers (:642-680) | facial-component
  l2+LPIPS (:682-697) | vision-aided GAN G term.

All terms are pure functions usable inside the jitted train step. Losses
whose auxiliary networks are absent (no LPIPS/ArcFace/D params supplied) are
skipped even if their lambda is positive — callers decide what to load.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from instantrestore_tpu.configs.config import OptimConfig
from instantrestore_tpu.training.losses import gan as gan_mod
from instantrestore_tpu.training.losses import id_loss as id_mod
from instantrestore_tpu.training.losses.lpips import lpips as lpips_fn
from instantrestore_tpu.training.losses.ssim import ms_ssim


def landmark_attention_loss(
    pred_probs: jnp.ndarray,  # [B, heads, q, K] (widened)
    gt_probs: jnp.ndarray,    # [1|B, heads, q, q] gaussian-splatted targets
    mask: jnp.ndarray,        # [1|B, q] bool landmark positions
    chosen_cond: jnp.ndarray, # [] or [B] int: KV segment index (traced)
) -> jnp.ndarray:
    """coach.py:531-560: min-max-normalize both maps, slice the chosen
    conditioning segment, masked MSE over landmark query rows. The mean is
    over the selected elements (masked rows x heads x key-pixels x batch),
    matching the reference's boolean-index mean.

    Batch>1 extension (the reference only works for batch 1, coach.py:633):
    targets/masks/segment indices are PER-SAMPLE, normalization is per-sample
    min-max (identical to the reference's whole-tensor normalize at B=1), and
    the conditioning segment is gathered per sample."""
    b, h, q, K = pred_probs.shape
    pf = pred_probs.astype(jnp.float32)
    pmin = pf.min(axis=(1, 2, 3), keepdims=True)
    pmax = pf.max(axis=(1, 2, 3), keepdims=True)
    pf = (pf - pmin) / (pmax - pmin + 1e-12)
    gf = jnp.broadcast_to(gt_probs.astype(jnp.float32), (b, h, q, q))
    gmin = gf.min(axis=(1, 2, 3), keepdims=True)
    gmax = gf.max(axis=(1, 2, 3), keepdims=True)
    gf = (gf - gmin) / (gmax - gmin + 1e-12)
    cond = jnp.broadcast_to(jnp.asarray(chosen_cond, jnp.int32), (b,))
    segs = pf.reshape(b, h, q, K // q, q)
    seg = jnp.take_along_axis(
        segs, cond[:, None, None, None, None], axis=3
    )[:, :, :, 0]
    w = jnp.broadcast_to(mask, (b, q))[:, None, :, None].astype(jnp.float32)
    num = (jnp.square(seg - gf) * w).sum()
    den = w.sum() * h * q
    return num / jnp.maximum(den, 1.0)


def attention_entropy_reg(
    attn_probs: List[jnp.ndarray], n_segments: int = 5, train_input: bool = True
) -> jnp.ndarray:
    """coach.py:599-617: encourage uniform usage of the reference segments
    (cross-entropy between the per-query argmax-segment histogram and the
    uniform distribution), averaged over layers.

    Like the reference this uses the HARD one_hot(argmax) histogram — the
    term has zero gradient through the argmax and acts as a logged statistic
    plus a constant penalty; we keep it bit-compatible rather than relaxing
    it. Reference quirks preserved in train_input mode: segment 0 (the input
    image, :605) is dropped but one_hot keeps num_classes=n_segments (:607),
    so the never-selected input column contributes a constant -0.2*log(1e-8)
    per head. In refs-only mode (train_input=False) the reference's hardcoded
    5-segment view would simply crash (coach.py:603); our semantic: segment 0
    is a reference like any other, so nothing is dropped and the histogram is
    over all n_segments references."""
    regs = []
    for probs in attn_probs:
        b, h, q, k = probs.shape
        seg = probs.reshape(b, h, q, n_segments, k // n_segments)
        if train_input:
            seg = seg[:, :, :, 1:, :]  # drop the input-image segment (:605)
        mean_act = seg.mean(axis=-1)  # [B, h, q, n_seg or n_seg-1]
        regs.append(_entropy_from_mean_act(mean_act, n_segments))
    return sum(regs) / len(regs)


def _entropy_from_mean_act(mean_act: jnp.ndarray, n_segments: int) -> jnp.ndarray:
    b = mean_act.shape[0]
    one_hot = jax.nn.one_hot(jnp.argmax(mean_act, axis=-1), n_segments)
    avg = one_hot.mean(axis=2)  # [B, h, n]
    log_probs = jnp.log(avg + 1e-8)
    return -(log_probs * (1.0 / n_segments)).sum() / b


def attention_entropy_reg_from_sums(
    seg_sums: List[jnp.ndarray], n_segments: int = 5, train_input: bool = True
) -> jnp.ndarray:
    """attention_entropy_reg from streamed per-segment masses
    ([B, h, q, n_seg] rows summing to 1, models/attention.py::
    segment_softmax_sums) instead of full probabilities. The histogram's
    argmax over per-segment MEANS equals the argmax over per-segment MASSES
    (equal segment lengths), so the two paths are loss-identical while this
    one never materializes [B, h, q, K] — the memory plan that unlocks
    batch>=2 at 512px (ROADMAP 'attention-loss memory')."""
    regs = []
    for sums in seg_sums:
        s = sums[:, :, :, 1:] if train_input else sums
        regs.append(_entropy_from_mean_act(s, n_segments))
    return sum(regs) / len(regs)


def reference_usage_means(attn_probs: List[jnp.ndarray], layer_idx: jnp.ndarray,
                          q_sizes: List[int]) -> jnp.ndarray:
    """Per-segment total attention mass of one (traced) layer: [n_segments].

    coach.py:647-655: segment sums over the whole batch/heads/queries of the
    chosen layer. Computed for all layers then gathered (shapes differ per
    layer, so selection happens on the reduced values)."""
    per_layer = []
    for probs, q in zip(attn_probs, q_sizes):
        k = probs.shape[-1]
        seg = probs.reshape(*probs.shape[:-1], k // q, q)
        per_layer.append(seg.sum(axis=(0, 1, 2, 4)).astype(jnp.float32))
    stacked = jnp.stack(per_layer)  # [layers, n_segments]
    return stacked[layer_idx]


def pos_neg_reg_loss(means: jnp.ndarray, target_idx: jnp.ndarray, *, negative: bool):
    """coach.py:656-680: normalize by max, softmax over segments, NLL toward
    (pos) or away from (neg) the target segment."""
    means = means / jnp.maximum(means.max(), 1e-12)
    probs = jax.nn.softmax(means[None], axis=1)
    if negative:
        log_p = jnp.log(jnp.clip(1.0 - probs, 1e-12, None))
    else:
        log_p = jnp.log(jnp.clip(probs, 1e-12, None))
    return -log_p[0, target_idx]


def pos_neg_reg_loss_per_sample(
    means: jnp.ndarray, target_idx: jnp.ndarray, *, negative: bool
) -> jnp.ndarray:
    """Per-sample pos/neg regularizer — the batch>1 fix over the reference's
    'TODO: This only works for 1 batch' (coach.py:649,665), same treatment
    the landmark loss already received.

    means [B, n_segments]: per-SAMPLE segment masses of the chosen layer.
    target_idx [B] int32: each sample's own swapped-reference segment; -1
    marks 'no swap for this sample' and is masked out of the mean. At B=1
    with a valid index this is bit-identical to pos_neg_reg_loss on the
    whole-batch means (per-sample mass == batch mass, per-row max-normalize
    == global max-normalize)."""
    m = means / jnp.maximum(means.max(axis=1, keepdims=True), 1e-12)
    probs = jax.nn.softmax(m, axis=1)
    if negative:
        log_p = jnp.log(jnp.clip(1.0 - probs, 1e-12, None))
    else:
        log_p = jnp.log(jnp.clip(probs, 1e-12, None))
    idx = jnp.maximum(target_idx, 0).astype(jnp.int32)
    nll = -jnp.take_along_axis(log_p, idx[:, None], axis=1)[:, 0]
    valid = (target_idx >= 0).astype(jnp.float32)
    return (nll * valid).sum() / jnp.maximum(valid.sum(), 1.0)


def reference_usage_means_per_sample(
    attn_probs: List[jnp.ndarray], layer_idx: jnp.ndarray, q_sizes: List[int]
) -> jnp.ndarray:
    """Per-SAMPLE per-segment attention mass of one (traced) layer:
    [B, n_segments]. Summing over the batch axis recovers
    reference_usage_means (coach.py:647-655)."""
    per_layer = []
    for probs, q in zip(attn_probs, q_sizes):
        k = probs.shape[-1]
        seg = probs.reshape(*probs.shape[:-1], k // q, q)
        per_layer.append(seg.sum(axis=(1, 2, 4)).astype(jnp.float32))
    stacked = jnp.stack(per_layer)  # [layers, B, n_segments]
    return stacked[layer_idx]


def crop_with_boxes(images: jnp.ndarray, origins: jnp.ndarray, h: int, w: int):
    """Fixed-size per-sample crops: images [B,H,W,C], origins [B,2] (y0,x0)
    -> [B,h,w,C]. Static-shape twin of the reference's mask-bbox crop
    (coach.py:207-218)."""

    def one(img, o):
        return jax.lax.dynamic_slice(img, (o[0], o[1], 0), (h, w, img.shape[-1]))

    return jax.vmap(one)(images, origins.astype(jnp.int32))


def compute_generator_loss(
    out: Dict[str, Any],
    batch: Dict[str, Any],
    cfg: OptimConfig,
    *,
    rng: jax.Array,
    lpips_params: Optional[Dict] = None,
    arcface_params: Optional[Dict] = None,
    disc_backbone: Optional[Dict] = None,
    disc_heads: Optional[Dict] = None,
    vit_cfg=None,
    disc_type: str = "dinov2",
    train_input: bool = True,
    degrade_fn=None,
    landmark_layer: Optional[int] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    pred = out["output_image"].astype(jnp.float32)
    gts = batch["gt"].astype(jnp.float32)
    losses: Dict[str, jnp.ndarray] = {}
    total = jnp.asarray(0.0, jnp.float32)

    # reconstruction: l1 takes precedence over l2 (coach.py:574-581)
    if cfg.lambda_l1 > 0:
        losses["loss_l1"] = jnp.abs(pred - gts).mean()
        total += losses["loss_l1"] * cfg.lambda_l1
    else:
        losses["loss_l2"] = jnp.square(pred - gts).mean()
        total += losses["loss_l2"] * cfg.lambda_l2

    if lpips_params is not None:
        losses["loss_lpips"] = lpips_fn(lpips_params, pred, gts).mean()
        total += losses["loss_lpips"] * cfg.lambda_lpips

    if cfg.lambda_ssim > 0:
        losses["loss_ssim"] = 1.0 - ms_ssim((pred + 1) / 2, (gts + 1) / 2, data_range=1.0)
        total += losses["loss_ssim"] * cfg.lambda_ssim

    if cfg.lambda_id_loss > 0 and arcface_params is not None:
        if "id_mats_pred" in batch:
            lid, sim = id_mod.id_loss(
                arcface_params, pred, gts,
                batch["id_mats_pred"], batch["id_mats_target"], batch["id_valid"],
            )
        else:  # detection-free fallback (pre-cropped faces)
            lid, sim = id_mod.id_loss_whole_image(arcface_params, pred, gts)
        losses["loss_id"] = lid
        losses["sim_id"] = sim
        total += lid * cfg.lambda_id_loss

    attn_probs = out.get("attn_probs")
    seg_sums = out.get("attn_seg_sums")
    n_segments = 5 if train_input else 4

    if cfg.lambda_attn_reg > 0 and (seg_sums or attn_probs):
        if seg_sums:
            losses["loss_attn_reg"] = attention_entropy_reg_from_sums(
                seg_sums, n_segments, train_input=train_input
            )
        else:
            losses["loss_attn_reg"] = attention_entropy_reg(
                attn_probs, n_segments, train_input=train_input
            )
        total += losses["loss_attn_reg"] * cfg.lambda_attn_reg

    if cfg.lambda_cycle > 0 and degrade_fn is not None:
        degraded_pred = degrade_fn(pred)
        losses["loss_cycle"] = jnp.square(
            degraded_pred - jax.lax.stop_gradient(batch["image"].astype(jnp.float32))
        ).mean()
        total += losses["loss_cycle"] * cfg.lambda_cycle

    if (
        cfg.lambda_landmark > 0
        and attn_probs
        and landmark_layer is not None
        and batch.get("gt_attn_probs") is not None
    ):
        # The chosen layer arrives as a STATIC python int (jit specializes on
        # it — shapes differ per layer anyway: 9 variants max). The target
        # map / mask / segment index are traced operands, PER-SAMPLE (the
        # batch>1 fix over the reference's 'works for 1 batch' TODO,
        # coach.py:631-640).
        losses["loss_landmark"] = landmark_attention_loss(
            attn_probs[landmark_layer],
            batch["gt_attn_probs"],
            batch["gt_attn_mask"],
            batch["gt_attn_cond"],
        )
        total += losses["loss_landmark"] * cfg.lambda_landmark

    if (cfg.lambda_pos_reg > 0 or cfg.lambda_neg_reg > 0) and (seg_sums or attn_probs):
        # PER-SAMPLE segment masses [B, n_segments] — each sample is scored
        # against its OWN swap index (the batch>1 fix over the reference's
        # batch-1-only indexing, coach.py:649,665; bit-parity at B=1).
        if seg_sums:
            # streamed per-segment sums (identical to the full-probs path)
            layer_idx = jax.random.randint(rng, (), 0, len(seg_sums))
            per_layer = jnp.stack(
                [s.astype(jnp.float32).sum(axis=(1, 2)) for s in seg_sums]
            )  # [layers, B, n_segments]
            means = per_layer[layer_idx]
        else:
            q_sizes = [p.shape[2] for p in attn_probs]
            layer_idx = jax.random.randint(rng, (), 0, len(attn_probs))
            means = reference_usage_means_per_sample(attn_probs, layer_idx, q_sizes)
        if cfg.lambda_pos_reg > 0 and "pos_reg_idx" in batch:
            idx = jnp.broadcast_to(
                jnp.asarray(batch["pos_reg_idx"], jnp.int32), (means.shape[0],)
            )
            losses["loss_attn_pos_reg"] = pos_neg_reg_loss_per_sample(
                means, idx, negative=False
            )
            total += losses["loss_attn_pos_reg"] * cfg.lambda_pos_reg
        if cfg.lambda_neg_reg > 0 and "neg_reg_idx" in batch:
            idx = jnp.broadcast_to(
                jnp.asarray(batch["neg_reg_idx"], jnp.int32), (means.shape[0],)
            )
            losses["loss_attn_neg_reg"] = pos_neg_reg_loss_per_sample(
                means, idx, negative=True
            )
            total += losses["loss_attn_neg_reg"] * cfg.lambda_neg_reg

    if cfg.lambda_facial_comp > 0 and batch.get("facial_comps") is not None:
        fc_total = jnp.asarray(0.0)
        fc_lpips = jnp.asarray(0.0)
        for m in batch["facial_comps"]:
            mask = m[..., None].astype(jnp.float32)
            fc_total += jnp.square(pred * mask - gts * mask).mean()
            if lpips_params is not None:
                fc_lpips += lpips_fn(lpips_params, pred * mask, gts * mask).mean()
        losses["loss_facial_comp_l2"] = fc_total
        losses["loss_facial_comp_lpips"] = fc_lpips
        total += cfg.lambda_facial_comp * (
            fc_total * cfg.lambda_l2 + fc_lpips * cfg.lambda_lpips
        )

    if cfg.lambda_gan > 0 and disc_backbone is not None and disc_heads is not None:
        from instantrestore_tpu.data.datasets import facial_comp_sizes
        from instantrestore_tpu.models.vit import DINOV2_VITL14

        g_loss, _ = gan_mod.discriminate(
            disc_backbone, disc_heads, out["output_image"], rng,
            for_g=True, update_sn=False, vit_cfg=vit_cfg or DINOV2_VITL14,
            disc_type=disc_type,
        )
        losses["loss_g"] = g_loss.mean()
        total += losses["loss_g"] * cfg.lambda_gan

        # facial-component adversarial G terms on eye/mouth crops
        # (coach.py:243-254: D(crop, for_G) per component, weighted by
        # lambda_gan * lambda_facial_comp)
        if cfg.lambda_facial_comp > 0 and batch.get("facial_comp_boxes") is not None:
            fc_g = jnp.asarray(0.0, jnp.float32)
            for i, (hh, ww) in enumerate(facial_comp_sizes(pred.shape[1])):
                crop = crop_with_boxes(
                    out["output_image"], batch["facial_comp_boxes"][:, i], hh, ww
                )
                gi, _ = gan_mod.discriminate(
                    disc_backbone, disc_heads, crop, jax.random.fold_in(rng, i + 1),
                    for_g=True, update_sn=False, vit_cfg=vit_cfg or DINOV2_VITL14,
                    disc_type=disc_type,
                )
                fc_g += gi.mean()
            losses["fc_loss_g"] = fc_g
            total += fc_g * cfg.lambda_gan * cfg.lambda_facial_comp

    losses["loss"] = total
    return total, losses
