"""The pjit-able training step (generator side).

One SPMD function replacing the reference's accelerate/DDP G-step
(coach.py:222-261): forward the restorer, compose the weighted losses
(coach.py:562-700), backprop into the trainable subset (LoRA leaves +
unet.conv_in + VAE skip convs), AdamW update with global-norm clip.
Data parallelism comes from sharding the batch dim over the mesh's ``data``
axis — XLA inserts the gradient all-reduce.

The full 10-loss composite (LPIPS / ID / GAN / landmark / regularizers)
plugs in through the ``loss_fn`` argument; reconstruction terms live here.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from instantrestore_tpu.configs.config import OptimConfig
from instantrestore_tpu.models.restorer import RestorerStatics, restore_forward
from instantrestore_tpu.training.optim import freeze_non_trainable


def reconstruction_losses(pred: jnp.ndarray, target: jnp.ndarray, cfg: OptimConfig):
    """l2/l1 reconstruction terms (coach.py calc_loss rec terms)."""
    losses = {}
    pf = pred.astype(jnp.float32)
    tf = target.astype(jnp.float32)
    if cfg.lambda_l2 > 0:
        losses["l2"] = jnp.mean((pf - tf) ** 2) * cfg.lambda_l2
    if cfg.lambda_l1 > 0:
        losses["l1"] = jnp.mean(jnp.abs(pf - tf)) * cfg.lambda_l1
    return losses


def default_loss_fn(
    out: Dict[str, Any], batch: Dict[str, Any], cfg: OptimConfig
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    losses = reconstruction_losses(out["output_image"], batch["gt"], cfg)
    total = sum(losses.values()) if losses else jnp.asarray(0.0)
    return total, losses


def make_train_step(
    statics: RestorerStatics,
    optim_cfg: OptimConfig,
    optimizer: optax.GradientTransformation,
    trainable_mask: Any,
    loss_fn: Callable = default_loss_fn,
    save_attn_probs: bool = False,
    use_fused_attention: bool = False,
):
    """Build the jittable G train step.

    batch: {"image": degraded [B,H,W,3], "gt": clean [B,H,W,3],
            "conditioning_images": [B,N,H,W,3], "valid_indices": [B]}.
    """

    def train_step(params, opt_state, batch, rng):
        def compute_loss(p):
            p = freeze_non_trainable(p, trainable_mask)
            out = restore_forward(
                p,
                batch["image"],
                batch.get("conditioning_images"),
                batch.get("valid_indices"),
                rng=rng,
                statics=statics,
                save_attn_probs=save_attn_probs,
                use_fused_attention=use_fused_attention,
            )
            total, losses = loss_fn(out, batch, optim_cfg)
            return total, (losses, out)

        (total, (losses, out)), grads = jax.value_and_grad(compute_loss, has_aux=True)(
            params
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = dict(losses)
        metrics["loss"] = total
        return params, opt_state, metrics, out

    return train_step
