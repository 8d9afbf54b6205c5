"""Optimizers and LR schedules (optax), mirroring the reference's setup:
two AdamW optimizers (generator: LoRA params + unet.conv_in + optional skip
convs; discriminator: head params) with diffusers-style LR schedules and
global-norm clipping 1.0 (/root/reference/face_replace/training/
coach.py:444-489, configs/train_config.py:39-91).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax

from instantrestore_tpu.configs.config import OptimConfig, SchedulerType


def make_lr_schedule(cfg: OptimConfig, max_steps: int) -> optax.Schedule:
    """diffusers get_scheduler equivalents for the types the reference uses."""
    warmup = cfg.lr_warmup_steps
    base = cfg.learning_rate
    st = cfg.scheduler_type

    if st == SchedulerType.CONSTANT:
        return optax.constant_schedule(base)
    if st == SchedulerType.CONSTANT_WITH_WARMUP:
        return optax.join_schedules(
            [optax.linear_schedule(0.0, base, warmup), optax.constant_schedule(base)],
            [warmup],
        )
    if st == SchedulerType.LINEAR:
        return optax.join_schedules(
            [
                optax.linear_schedule(0.0, base, warmup),
                optax.linear_schedule(base, 0.0, max(max_steps - warmup, 1)),
            ],
            [warmup],
        )
    if st == SchedulerType.COSINE:
        def cosine(step):
            s = jnp.clip((step - warmup) / max(max_steps - warmup, 1), 0.0, 1.0)
            return base * 0.5 * (1.0 + jnp.cos(jnp.pi * s * cfg.lr_num_cycles * 2 * 0.5))

        return optax.join_schedules(
            [optax.linear_schedule(0.0, base, warmup), cosine], [warmup]
        )
    if st == SchedulerType.COSINE_WITH_RESTARTS:
        def cosine_restarts(step):
            s = jnp.clip((step - warmup) / max(max_steps - warmup, 1), 0.0, 1.0)
            return base * 0.5 * (1.0 + jnp.cos(jnp.pi * ((cfg.lr_num_cycles * s) % 1.0)))

        return optax.join_schedules(
            [optax.linear_schedule(0.0, base, warmup), cosine_restarts], [warmup]
        )
    if st == SchedulerType.POLYNOMIAL:
        def poly(step):
            s = jnp.clip((step - warmup) / max(max_steps - warmup, 1), 0.0, 1.0)
            return base * (1.0 - s) ** cfg.lr_power

        return optax.join_schedules([optax.linear_schedule(0.0, base, warmup), poly], [warmup])
    raise ValueError(f"unsupported scheduler type {st}")


def make_optimizer(
    cfg: OptimConfig,
    max_steps: int,
    trainable_mask: Any,
) -> optax.GradientTransformation:
    """AdamW over the masked (trainable) leaves with grad clipping.

    Frozen leaves receive zero updates and hold no optimizer state
    (optax.masked keeps moments only for the trainable subset).
    """
    schedule = make_lr_schedule(cfg, max_steps)
    chain = []
    if cfg.use_clip_grad:
        chain.append(optax.clip_by_global_norm(cfg.clip_grad_max_norm))
    chain.append(
        optax.adamw(
            learning_rate=schedule,
            b1=cfg.adam_beta1,
            b2=cfg.adam_beta2,
            eps=cfg.adam_epsilon,
            weight_decay=cfg.adam_weight_decay,
        )
    )
    return optax.masked(optax.chain(*chain), trainable_mask)


def freeze_non_trainable(params: Any, mask: Any) -> Any:
    """stop_gradient on frozen leaves so the backward pass skips them."""
    return jax.tree_util.tree_map(
        lambda p, m: p if m else jax.lax.stop_gradient(p), params, mask
    )
