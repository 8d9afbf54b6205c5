import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from instantrestore_tpu.models.vae import (
    VAEConfig,
    init_vae_params,
    sample_latent,
    vae_decode,
    vae_encode,
)

TINY = VAEConfig(block_out_channels=(8, 16, 16, 16), norm_num_groups=4)


@pytest.fixture(scope="module")
def tiny_vae():
    return init_vae_params(jax.random.PRNGKey(0), TINY)


def test_encode_decode_shapes(tiny_vae):
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3), jnp.float32)
    mean, logvar, acts = vae_encode(tiny_vae, x, cfg=TINY, compute_dtype=jnp.float32)
    assert mean.shape == (2, 8, 8, 4)
    assert logvar.shape == (2, 8, 8, 4)
    assert len(acts) == 4
    assert [a.shape[1] for a in acts] == [64, 32, 16, 8]
    z = sample_latent(mean, logvar, jax.random.PRNGKey(2))
    out = vae_decode(tiny_vae, z, cfg=TINY, compute_dtype=jnp.float32)
    assert out.shape == (2, 64, 64, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_sample_latent_mode_and_sample():
    mean = jnp.ones((1, 2, 2, 4))
    logvar = jnp.zeros((1, 2, 2, 4))
    assert sample_latent(mean, logvar, None) is mean
    s = sample_latent(mean, logvar, jax.random.PRNGKey(0))
    assert not np.allclose(np.asarray(s), np.asarray(mean))


def test_encoder_downsample_asymmetric_padding(rng):
    """diffusers VAE Downsample2D pads (0,1,0,1) then stride-2 valid conv."""
    x = rng.normal(size=(1, 6, 6, 4)).astype(np.float32)
    w = rng.normal(size=(3, 3, 4, 4)).astype(np.float32)
    from instantrestore_tpu.ops.primitives import conv2d

    xp = jnp.pad(jnp.asarray(x), ((0, 0), (0, 1), (0, 1), (0, 0)))
    out = conv2d({"kernel": jnp.asarray(w)}, xp, stride=2, padding=0)
    xt = F.pad(torch.from_numpy(x).permute(0, 3, 1, 2), (0, 1, 0, 1))
    ref = F.conv2d(xt, torch.from_numpy(w).permute(3, 2, 0, 1), stride=2)
    np.testing.assert_allclose(np.asarray(out), ref.permute(0, 2, 3, 1).numpy(), atol=1e-4)


def test_skip_shortcut_decoder():
    cfg = VAEConfig(block_out_channels=(8, 16, 16, 16), norm_num_groups=4, use_shortcuts=True)
    params = init_vae_params(jax.random.PRNGKey(0), cfg)
    assert "skip_conv_1" in params["decoder"]
    # skip conv shapes mirror pix2pix_turbo.py:48-51 channel mapping
    assert params["decoder"]["skip_conv_1"]["kernel"].shape == (1, 1, 16, 512)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3), jnp.float32)
    mean, logvar, acts = vae_encode(params, x, cfg=cfg, compute_dtype=jnp.float32)
    # 512-wide skip convs don't match the tiny decoder widths; check the
    # full-size geometry statically instead of running it.
    full = VAEConfig(use_shortcuts=True)
    fp = init_vae_params(jax.random.PRNGKey(2), full)
    shapes = [fp["decoder"][f"skip_conv_{i}"]["kernel"].shape for i in (1, 2, 3, 4)]
    assert shapes == [(1, 1, 512, 512), (1, 1, 256, 512), (1, 1, 128, 512), (1, 1, 128, 256)]


def test_decode_with_skips_runs():
    # tiny config with matching skip widths built by hand
    cfg = VAEConfig(block_out_channels=(8, 16, 16, 16), norm_num_groups=4)
    params = init_vae_params(jax.random.PRNGKey(0), cfg)
    # attach tiny skip convs: decoder up widths are [16,16,16,8] at 8,16,32,64
    # reversed encoder acts: [16@8, 16@16, 8@32, 8@64]
    import instantrestore_tpu.ops.primitives as P

    key = jax.random.PRNGKey(5)
    for i, (cin, cout) in enumerate([(16, 16), (16, 16), (8, 16), (8, 16)], start=1):
        params["decoder"][f"skip_conv_{i}"] = {
            "kernel": jnp.full((1, 1, cin, cout), 1e-5, jnp.float32)
        }
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3), jnp.float32)
    mean, logvar, acts = vae_encode(params, x, cfg=cfg, compute_dtype=jnp.float32)
    out = vae_decode(params, mean, cfg=cfg, skip_acts=acts, gamma=1.0,
                     compute_dtype=jnp.float32)
    assert out.shape == (1, 64, 64, 3)
    # gamma=0 equals near-zero-skip result given 1e-5 kernels
    out0 = vae_decode(params, mean, cfg=cfg, skip_acts=acts, gamma=0.0,
                      compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out0), atol=1e-2)


def test_int8_decoder_quantization(rng):
    """Opt-in int8 decoder: close-but-not-exact output, correct layout."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from instantrestore_tpu.models.vae import (
        VAEConfig, init_vae_params, quantize_decoder_int8, vae_decode,
    )
    from instantrestore_tpu.ops.primitives import quantize_conv_int8

    # single conv roundtrip: ~1% relative error budget
    p = {"kernel": jnp.asarray(rng.normal(size=(3, 3, 8, 16)), jnp.float32),
         "bias": jnp.zeros((16,), jnp.float32)}
    q = quantize_conv_int8(p)
    assert q["kernel_int8"].dtype == jnp.int8 and q["kernel_scale"].shape == (16,)
    from instantrestore_tpu.ops.primitives import conv2d
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 8)), jnp.float32)
    y_fp = conv2d(p, x)
    y_q = conv2d(q, x)
    rel = float(jnp.abs(y_q - y_fp).max() / (jnp.abs(y_fp).max() + 1e-9))
    assert rel < 0.05, rel

    cfg = VAEConfig(block_out_channels=(8, 16, 16, 16), norm_num_groups=4)
    params = init_vae_params(jax.random.PRNGKey(0), cfg)
    qparams = quantize_decoder_int8(params)
    z = jnp.asarray(rng.normal(size=(1, 8, 8, 4)), jnp.float32)
    out_fp = vae_decode(params, z, cfg=cfg, compute_dtype=jnp.float32)
    out_q = vae_decode(qparams, z, cfg=cfg, compute_dtype=jnp.float32)
    assert out_q.shape == out_fp.shape
    assert np.isfinite(np.asarray(out_q)).all()
    d = float(jnp.abs(out_q - out_fp).max())
    assert 0 < d < 0.5, d  # quantized differs, but not wildly
