"""UNet wiring tests on a tiny config (full-size parity is exercised by the
converter/pipeline tests; CPU can't compile the 0.9B-param UNet quickly)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instantrestore_tpu.models.unet import (
    UNetConfig,
    init_unet_params,
    unet_apply,
)

TINY = UNetConfig(
    sample_size=16,
    block_out_channels=(32, 64, 64, 64),
    attention_heads=(1, 2, 2, 2),
    cross_attention_dim=16,
    norm_num_groups=8,
)


@pytest.fixture(scope="module")
def tiny_setup():
    key = jax.random.PRNGKey(0)
    params = init_unet_params(key, TINY)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 4), jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 7, 16), jnp.float32)
    t = jnp.asarray([249, 499], jnp.int32)
    return params, x, ctx, t


def test_forward_shape_and_finite(tiny_setup):
    params, x, ctx, t = tiny_setup
    out, aux = unet_apply(params, x, t, ctx, cfg=TINY, compute_dtype=jnp.float32)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
    assert aux == {}


def test_capture_kv_shapes(tiny_setup):
    params, x, ctx, t = tiny_setup
    _, aux = unet_apply(
        params, x, t, ctx, cfg=TINY, capture_kv=True, compute_dtype=jnp.float32
    )
    kvs = aux["kv"]
    assert len(kvs) == TINY.num_shared_attn_layers == 9
    # traversal order: up block 1 (4x4 @ 64ch, 2 heads), up 2 (8x8 @ 64),
    # up 3 (16x16 @ 32ch, 1 head); head-split layout [B, H, S, d]
    expected = [(2, 16, 32)] * 3 + [(2, 64, 32)] * 3 + [(1, 256, 32)] * 3
    for (k, v), (h, seq, d) in zip(kvs, expected):
        assert k.shape == (2, h, seq, d)
        assert v.shape == (2, h, seq, d)


def test_ref_kv_injection_changes_output(tiny_setup):
    params, x, ctx, t = tiny_setup
    out_plain, _ = unet_apply(params, x, t, ctx, cfg=TINY, compute_dtype=jnp.float32)
    _, aux = unet_apply(
        params, x, t, ctx, cfg=TINY, capture_kv=True, compute_dtype=jnp.float32
    )
    # fake 2 references from the captured kv (duplicated)
    ref_kv = [
        (
            jnp.stack([k, k * 0.5], axis=1),
            jnp.stack([v, v * 0.5], axis=1),
        )
        for k, v in aux["kv"]
    ]
    out_shared, aux2 = unet_apply(
        params, x, t, ctx, cfg=TINY, ref_kv=ref_kv, save_attn_probs=True,
        compute_dtype=jnp.float32,
    )
    assert out_shared.shape == out_plain.shape
    assert not np.allclose(np.asarray(out_shared), np.asarray(out_plain))
    probs = aux2["attn_probs"]
    assert len(probs) == 9
    # widened KV: input seq + 2 refs * seq
    assert probs[0].shape == (2, 2, 16, 16 * 3)
    # probabilities sum to 1 over widened axis
    np.testing.assert_allclose(np.asarray(probs[0].sum(-1)), 1.0, atol=1e-5)


def test_refs_only_mode_kv_width(tiny_setup):
    params, x, ctx, t = tiny_setup
    _, aux = unet_apply(
        params, x, t, ctx, cfg=TINY, capture_kv=True, compute_dtype=jnp.float32
    )
    ref_kv = [
        (jnp.stack([k, k], axis=1), jnp.stack([v, v], axis=1)) for k, v in aux["kv"]
    ]
    _, aux2 = unet_apply(
        params, x, t, ctx, cfg=TINY, ref_kv=ref_kv, train_input=False,
        save_attn_probs=True, compute_dtype=jnp.float32,
    )
    assert aux2["attn_probs"][0].shape == (2, 2, 16, 16 * 2)  # refs only


def test_freeu_changes_output(tiny_setup):
    params, x, ctx, t = tiny_setup
    out_fu, _ = unet_apply(params, x, t, ctx, cfg=TINY, compute_dtype=jnp.float32)
    out_nofu, _ = unet_apply(
        params, x, t, ctx, cfg=TINY, freeu=None, compute_dtype=jnp.float32
    )
    assert not np.allclose(np.asarray(out_fu), np.asarray(out_nofu))


@pytest.mark.slow  # >20 s on the 1-CPU CI box (measured round 5)
def test_jit_and_grad(tiny_setup):
    params, x, ctx, t = tiny_setup

    @jax.jit
    def loss_fn(p):
        out, _ = unet_apply(p, x, t, ctx, cfg=TINY, compute_dtype=jnp.float32)
        return jnp.mean(out ** 2)

    g = jax.grad(loss_fn)(params)
    gnorm = jax.tree_util.tree_reduce(
        lambda a, b: a + jnp.sum(b ** 2), g, jnp.asarray(0.0)
    )
    assert np.isfinite(float(gnorm)) and float(gnorm) > 0
