"""Single-step DDPM scheduler math for the SD-Turbo restoration pass.

The reference builds a DDPMScheduler from the sd-turbo config with
``set_timesteps(1)`` and only ever uses three pieces of it
(see /root/reference/face_replace/models/model.py:4-12 and
/root/reference/face_replace/models/pix2pix_turbo.py:247-251,306-311,331):

  * ``add_noise(x0, noise, t)``      -> forward diffusion at t
  * ``scale_model_input(x, t)``      -> identity for DDPM
  * ``step(eps, t, x_t).pred_original_sample`` -> closed-form x0 estimate

so on TPU we keep just the closed-form math over a precomputed
``alphas_cumprod`` table instead of porting a stateful scheduler object.

sd-turbo scheduler config: 1000 train timesteps, scaled_linear betas in
[0.00085, 0.012], epsilon prediction.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class DDPMConfig:
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"
    prediction_type: str = "epsilon"


def make_alphas_cumprod(cfg: DDPMConfig = DDPMConfig()) -> jnp.ndarray:
    """Precompute the cumulative alpha-bar table, float32, shape [T]."""
    if cfg.beta_schedule == "scaled_linear":
        betas = (
            np.linspace(
                cfg.beta_start ** 0.5,
                cfg.beta_end ** 0.5,
                cfg.num_train_timesteps,
                dtype=np.float64,
            )
            ** 2
        )
    elif cfg.beta_schedule == "linear":
        betas = np.linspace(
            cfg.beta_start, cfg.beta_end, cfg.num_train_timesteps, dtype=np.float64
        )
    else:
        raise ValueError(f"unsupported beta schedule: {cfg.beta_schedule}")
    alphas = 1.0 - betas
    return jnp.asarray(np.cumprod(alphas), dtype=jnp.float32)


def add_noise(
    alphas_cumprod: jnp.ndarray,
    sample: jnp.ndarray,
    noise: jnp.ndarray,
    timesteps: jnp.ndarray,
) -> jnp.ndarray:
    """x_t = sqrt(abar_t) * x0 + sqrt(1 - abar_t) * noise.

    ``timesteps`` is int32 of shape [B] (one per batch element); broadcasting
    matches diffusers' DDPMScheduler.add_noise.
    """
    abar = alphas_cumprod[timesteps].astype(sample.dtype)
    ndim_pad = (1,) * (sample.ndim - 1)
    sqrt_abar = jnp.sqrt(abar).reshape(abar.shape[0], *ndim_pad)
    sqrt_one_minus = jnp.sqrt(1.0 - abar).reshape(abar.shape[0], *ndim_pad)
    return sqrt_abar * sample + sqrt_one_minus * noise


def pred_original_sample(
    alphas_cumprod: jnp.ndarray,
    model_output: jnp.ndarray,
    sample: jnp.ndarray,
    timesteps: jnp.ndarray,
) -> jnp.ndarray:
    """Closed-form x0 estimate for epsilon prediction:

        x0 = (x_t - sqrt(1 - abar_t) * eps) / sqrt(abar_t)

    This is DDPMScheduler.step(...).pred_original_sample, the only output the
    reference consumes (pix2pix_turbo.py:277,331). Computed in float32 for
    stability regardless of input dtype, cast back to the sample dtype.
    """
    abar = alphas_cumprod[timesteps].astype(jnp.float32)
    ndim_pad = (1,) * (sample.ndim - 1)
    abar = abar.reshape(abar.shape[0], *ndim_pad)
    x = sample.astype(jnp.float32)
    eps = model_output.astype(jnp.float32)
    x0 = (x - jnp.sqrt(1.0 - abar) * eps) / jnp.sqrt(abar)
    return x0.astype(sample.dtype)


def scale_model_input(sample: jnp.ndarray, timesteps=None) -> jnp.ndarray:
    """DDPM does not rescale the model input (identity)."""
    del timesteps
    return sample


def ddim_step(
    alphas_cumprod: jnp.ndarray,
    model_output: jnp.ndarray,
    sample: jnp.ndarray,
    timestep: jnp.ndarray,
    prev_timestep: jnp.ndarray,
) -> jnp.ndarray:
    """Deterministic DDIM update x_t -> x_{t'} (eta=0) for epsilon prediction.

    Used by the multi-step restoration extension (the reference's Predictor
    contains an unreachable multi-step branch, inference/test.py:84-90; this
    is the working equivalent). prev_timestep < 0 means 'to x0'.
    """
    x0 = pred_original_sample(alphas_cumprod, model_output, sample, timestep)
    abar_prev = jnp.where(
        prev_timestep >= 0, alphas_cumprod[jnp.maximum(prev_timestep, 0)], 1.0
    ).astype(jnp.float32)
    ndim_pad = (1,) * (sample.ndim - 1)
    abar_prev = abar_prev.reshape(-1, *ndim_pad)
    eps = model_output.astype(jnp.float32)
    out = jnp.sqrt(abar_prev) * x0.astype(jnp.float32) + jnp.sqrt(1.0 - abar_prev) * eps
    return out.astype(sample.dtype)
