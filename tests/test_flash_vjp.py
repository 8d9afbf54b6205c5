"""Gradient parity: Pallas flash backward vs XLA autodiff (interpret mode).

The custom-VJP wrappers (ops/flash_vjp.py) must produce the same gradients as
differentiating the XLA attention path — the reference's torch autograd
through the materialized softmax (attn_processors.py:183-279) is numerically
the same computation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instantrestore_tpu.models.attention import widen_kv
from instantrestore_tpu.ops import flash_vjp
from instantrestore_tpu.ops.shared_attention import adain_affine


def _xla_attention(q, k, v, scale):
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)


def test_flash_forward_lse(rng):
    """The residual forward must match the plain kernel output and emit the
    correct log2-domain LSE."""
    b, h, sq, skv, d = 1, 2, 64, 128, 8
    q = jnp.asarray(rng.normal(size=(b, h, sq, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, skv, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, skv, d)), jnp.float32)
    scale = d ** -0.5
    o, lse = flash_vjp._flash_forward_lse(q, k, v, scale, 32, 32, True)
    ref = _xla_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(o), np.asarray(ref), atol=2e-5)
    logits2 = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale * flash_vjp.LOG2E
    expected_lse = jnp.log2(jnp.sum(jnp.exp2(logits2 - logits2.max(-1, keepdims=True)), -1)) + logits2.max(-1)
    np.testing.assert_allclose(np.asarray(lse[..., 0]), np.asarray(expected_lse), atol=2e-4)
    # all 128 lanes carry the same value
    np.testing.assert_allclose(np.asarray(lse[..., 0]), np.asarray(lse[..., 63]))


@pytest.mark.parametrize("d", [8, 256])
def test_flash_vjp_matches_xla_grads(rng, d):
    """d=8 exercises the MXU row-sum accumulator path, d=256 the separate-l
    path of the forward kernel."""
    b, h, sq, skv = 1, 2, 64, 128
    q = jnp.asarray(rng.normal(size=(b, h, sq, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, skv, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, skv, d)), jnp.float32)
    ct = jnp.asarray(rng.normal(size=(b, h, sq, d)), jnp.float32)
    scale = d ** -0.5

    def loss_fused(q, k, v):
        o = flash_vjp.flash_attention(
            q, k, v, scale=scale, block_q=32, block_k=32, interpret=True
        )
        return jnp.sum(o * ct)

    def loss_xla(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, scale) * ct)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for gf, gx, name in zip(g_fused, g_xla, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gx), atol=5e-5, err_msg=f"d{name}"
        )


def test_flash_primal_unchanged(rng):
    """Outside differentiation the wrapper must hit the round-1 kernel path
    (identical output)."""
    from instantrestore_tpu.ops import shared_attention as sa

    b, h, sq, skv, d = 1, 1, 32, 64, 8
    q = jnp.asarray(rng.normal(size=(b, h, sq, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, skv, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, skv, d)), jnp.float32)
    a = flash_vjp.flash_attention(q, k, v, scale=0.3, block_q=32, block_k=32, interpret=True)
    b_ = sa.flash_attention(q, k, v, scale=0.3, block_q=32, block_k=32, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=0)


@pytest.mark.parametrize("include_input", [True, False])
@pytest.mark.parametrize("use_adain", [True, False])
def test_shared_vjp_matches_xla_grads(rng, include_input, use_adain):
    b, h, s, d, n = 1, 2, 32, 8, 2
    q = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
    k_in = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
    v_in = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
    rk = jnp.asarray(rng.normal(size=(b, n, h, s, d)), jnp.float32)
    rv = jnp.asarray(rng.normal(size=(b, n, h, s, d)), jnp.float32)
    skv = (n + int(include_input)) * s
    ct = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
    scale = d ** -0.5

    def loss_fused(q, k_in, v_in, rk, rv):
        affine = adain_affine(v_in, rv) if use_adain else None
        o = flash_vjp.shared_flash_attention(
            q, k_in, v_in, rk, rv, scale=scale, v_affine=affine,
            include_input=include_input, interpret=True,
        )
        return jnp.sum(o * ct)

    def loss_xla(q, k_in, v_in, rk, rv):
        wk, wv = widen_kv(k_in, v_in, rk, rv, use_adain=use_adain, train_input=include_input)
        return jnp.sum(_xla_attention(q, wk, wv, scale) * ct)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(q, k_in, v_in, rk, rv)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2, 3, 4))(q, k_in, v_in, rk, rv)
    for gf, gx, name in zip(g_fused, g_xla, ["q", "k_in", "v_in", "rk", "rv"]):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gx), atol=1e-4, err_msg=f"d{name}"
        )


def test_shared_vjp_primal_unchanged(rng):
    from instantrestore_tpu.ops import shared_attention as sa

    b, h, s, d, n = 1, 1, 16, 8, 2
    q = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
    k_in = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
    v_in = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
    rk = jnp.asarray(rng.normal(size=(b, n, h, s, d)), jnp.float32)
    rv = jnp.asarray(rng.normal(size=(b, n, h, s, d)), jnp.float32)
    a = flash_vjp.shared_flash_attention(
        q, k_in, v_in, rk, rv, scale=0.35, block_q=16, block_k=16, interpret=True
    )
    b_ = sa.shared_flash_attention(
        q, k_in, v_in, rk, rv, scale=0.35, block_q=16, block_k=16, interpret=True
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=0)


def test_attention_module_fused_grad(rng):
    """models/attention.py attention() with use_fused=True must now be
    differentiable and match the XLA path's gradients end-to-end (through the
    qkv/out projections)."""
    from instantrestore_tpu.models.attention import attention

    b, s, c, heads = 1, 32, 16, 2
    p = {
        "to_q": {"kernel": jnp.asarray(rng.normal(size=(c, c)) * 0.2, jnp.float32)},
        "to_k": {"kernel": jnp.asarray(rng.normal(size=(c, c)) * 0.2, jnp.float32)},
        "to_v": {"kernel": jnp.asarray(rng.normal(size=(c, c)) * 0.2, jnp.float32)},
        "to_out": {
            "kernel": jnp.asarray(rng.normal(size=(c, c)) * 0.2, jnp.float32),
            "bias": jnp.zeros((c,), jnp.float32),
        },
    }
    x = jnp.asarray(rng.normal(size=(b, s, c)), jnp.float32)
    rk = jnp.asarray(rng.normal(size=(b, 2, heads, s, c // heads)), jnp.float32)
    rv = jnp.asarray(rng.normal(size=(b, 2, heads, s, c // heads)), jnp.float32)

    def loss(p, use_fused):
        out, _ = attention(
            p, x, heads=heads, ref_kv=(rk, rv), use_adain=True,
            train_input=False, use_fused=use_fused,
        )
        return jnp.sum(out ** 2)

    g_fused = jax.grad(loss)(p, True)
    g_xla = jax.grad(loss)(p, False)
    flat_f, _ = jax.tree_util.tree_flatten(g_fused)
    flat_x, _ = jax.tree_util.tree_flatten(g_xla)
    for gf, gx in zip(flat_f, flat_x):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gx), atol=1e-4)
