import jax.numpy as jnp
import numpy as np

from instantrestore_tpu.models import scheduler as sched


def test_alphas_cumprod_table():
    abar = np.asarray(sched.make_alphas_cumprod())
    assert abar.shape == (1000,)
    # matches the scaled_linear closed form at both ends
    betas = np.linspace(0.00085 ** 0.5, 0.012 ** 0.5, 1000) ** 2
    ref = np.cumprod(1.0 - betas)
    np.testing.assert_allclose(abar, ref, rtol=1e-5)
    assert np.all(np.diff(abar) < 0)


def test_add_noise_and_pred_x0_roundtrip():
    abar = sched.make_alphas_cumprod()
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.normal(size=(2, 8, 8, 4)), jnp.float32)
    noise = jnp.asarray(rng.normal(size=(2, 8, 8, 4)), jnp.float32)
    for t in [1, 249, 499, 749, 999]:  # reference timesteps incl. cond t=1
        ts = jnp.full((2,), t, jnp.int32)
        xt = sched.add_noise(abar, x0, noise, ts)
        # if the model predicted the true noise, x0 is recovered exactly
        x0_hat = sched.pred_original_sample(abar, noise, xt, ts)
        np.testing.assert_allclose(np.asarray(x0_hat), np.asarray(x0), atol=1e-4)


def test_add_noise_per_sample_timesteps():
    abar = sched.make_alphas_cumprod()
    x0 = jnp.ones((3, 2, 2, 1), jnp.float32)
    noise = jnp.zeros_like(x0)
    ts = jnp.asarray([0, 500, 999], jnp.int32)
    xt = np.asarray(sched.add_noise(abar, x0, noise, ts))
    expect = np.sqrt(np.asarray(abar)[[0, 500, 999]])
    np.testing.assert_allclose(xt[:, 0, 0, 0], expect, rtol=1e-6)


def test_scale_model_input_identity():
    x = jnp.ones((2, 2))
    assert sched.scale_model_input(x, 5) is x
