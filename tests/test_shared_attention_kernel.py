"""Pallas fused attention kernels vs. the XLA reference path (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instantrestore_tpu.models.attention import widen_kv, _split_heads
from instantrestore_tpu.ops.shared_attention import (
    adain_affine,
    flash_attention,
    shared_flash_attention,
)


def _xla_attention(q, k, v, scale):
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)


def test_flash_attention_matches_xla(rng):
    b, h, sq, skv, d = 2, 3, 64, 128, 8
    q = jnp.asarray(rng.normal(size=(b, h, sq, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, skv, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, skv, d)), jnp.float32)
    scale = d ** -0.5
    out = flash_attention(q, k, v, scale=scale, block_q=32, block_k=32, interpret=True)
    ref = _xla_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("algo", ["q_outer", "kv_outer", "kv_outer_bound"])
@pytest.mark.parametrize("include_input", [True, False])
@pytest.mark.parametrize("use_adain", [True, False])
def test_shared_flash_matches_widen_kv_path(rng, include_input, use_adain, algo):
    b, h, s, d, n = 2, 2, 32, 8, 3
    q = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
    k_in = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
    v_in = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
    rk = jnp.asarray(rng.normal(size=(b, n, h, s, d)), jnp.float32)
    rv = jnp.asarray(rng.normal(size=(b, n, h, s, d)), jnp.float32)
    scale = d ** -0.5

    # XLA reference: widen_kv then dense attention
    wk, wv = widen_kv(
        k_in, v_in, rk, rv, use_adain=use_adain, train_input=include_input
    )
    ref = _xla_attention(q, wk, wv, scale)

    affine = adain_affine(v_in, rv) if use_adain else None
    out = shared_flash_attention(
        q, k_in, v_in, rk, rv, scale=scale, v_affine=affine,
        include_input=include_input, block_q=16, block_k=16, interpret=True,
        algo=algo,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_adain_affine_matches_adain(rng):
    """v*scale + shift must equal adain(v, style stats)."""
    b, h, s, d, n = 1, 2, 16, 4, 2
    v_in = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
    ref_v = jnp.asarray(rng.normal(size=(b, n, h, s, d)), jnp.float32)
    scale, shift = adain_affine(v_in, ref_v)
    # reference computation (models/attention.py widen_kv internals)
    vf = v_in
    style_mean = vf.mean(axis=2, keepdims=True)
    style_std = jnp.sqrt(vf.var(axis=2, ddof=1, keepdims=True)) + 1e-5
    rv_bh = ref_v.transpose(0, 2, 1, 3, 4)  # [B, h, N, S, d]
    cm = rv_bh.mean(axis=3, keepdims=True)
    cs = jnp.sqrt(rv_bh.var(axis=3, ddof=1, keepdims=True)) + 1e-5
    expected = (rv_bh - cm) / cs * style_std[:, :, None] + style_mean[:, :, None]
    got = rv_bh * scale[:, :, :, None, :] + shift[:, :, :, None, :]
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-5)


def test_zeroed_ref_segments_preserved(rng):
    """Invalid (zeroed) reference K/V must behave identically in the fused
    path: logits 0, not masked out."""
    b, h, s, d, n = 1, 1, 16, 8, 2
    q = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
    k_in = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
    v_in = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
    rk = jnp.zeros((b, n, h, s, d), jnp.float32)
    rv = jnp.zeros((b, n, h, s, d), jnp.float32)
    out = shared_flash_attention(
        q, k_in, v_in, rk, rv, scale=d ** -0.5,
        block_q=16, block_k=16, interpret=True,
    )
    wk, wv = widen_kv(k_in, v_in, rk, rv)
    ref = _xla_attention(q, wk, wv, d ** -0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("include_input", [True, False])
@pytest.mark.parametrize("use_adain", [True, False])
def test_packed_kvouter_matches_widen_kv_path(rng, include_input, use_adain):
    """d=64 + even heads dispatches to the two-head lane-packed KV-outer
    kernel; output must match the XLA widen_kv path exactly like the
    unpacked kernels do."""
    b, h, s, d, n = 1, 4, 64, 64, 2
    q = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
    k_in = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
    v_in = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
    rk = jnp.asarray(rng.normal(size=(b, n, h, s, d)), jnp.float32)
    rv = jnp.asarray(rng.normal(size=(b, n, h, s, d)), jnp.float32)
    scale = d ** -0.5

    wk, wv = widen_kv(k_in, v_in, rk, rv, use_adain=use_adain, train_input=include_input)
    ref = _xla_attention(q, wk, wv, scale)

    affine = adain_affine(v_in, rv) if use_adain else None
    out = shared_flash_attention(
        q, k_in, v_in, rk, rv, scale=scale, v_affine=affine,
        include_input=include_input, block_q=32, block_k=32, interpret=True,
        algo="kv_outer_packed",
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)


@pytest.mark.parametrize("use_adain", [True, False])
@pytest.mark.parametrize("h", [3, 2])  # odd head count: pairing is per-SEGMENT
def test_paired_kvouter_matches_widen_kv_path(rng, use_adain, h):
    """Segment-paired bound kernel (serving default): block-diagonal packed
    pairs of reference segments — full-width MXU at d=64 — must match the
    XLA widened path exactly like the other algos (refs-only mode)."""
    b, s, d, n = 2, 32, 8, 4
    q = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
    k_in = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
    v_in = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
    rk = jnp.asarray(rng.normal(size=(b, n, h, s, d)), jnp.float32)
    rv = jnp.asarray(rng.normal(size=(b, n, h, s, d)), jnp.float32)
    scale = d ** -0.5
    wk, wv = widen_kv(k_in, v_in, rk, rv, use_adain=use_adain, train_input=False)
    ref = _xla_attention(q, wk, wv, scale)
    affine = adain_affine(v_in, rv) if use_adain else None
    out = shared_flash_attention(
        q, k_in, v_in, rk, rv, scale=scale, v_affine=affine,
        include_input=False, block_q=16, block_k=16, interpret=True,
        algo="kv_outer_bound_paired",
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_paired_kvouter_zeroed_segment(rng):
    """Asymmetric pair (one zeroed reference in a pair) keeps the reference's
    zeroed-KV semantics through the packed layout."""
    b, h, s, d, n = 1, 1, 16, 8, 4
    q = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
    k_in = jnp.zeros((b, h, s, d), jnp.float32)
    v_in = jnp.zeros((b, h, s, d), jnp.float32)
    rk = jnp.asarray(rng.normal(size=(b, n, h, s, d)), jnp.float32)
    rv = jnp.asarray(rng.normal(size=(b, n, h, s, d)), jnp.float32)
    rk = rk.at[:, 1].set(0.0)  # zero the odd member of the first pair
    rv = rv.at[:, 1].set(0.0)
    out = shared_flash_attention(
        q, k_in, v_in, rk, rv, scale=d ** -0.5, include_input=False,
        block_q=16, block_k=16, interpret=True, algo="kv_outer_bound_paired",
    )
    wk, wv = widen_kv(k_in, v_in, rk, rv, train_input=False)
    ref = _xla_attention(q, wk, wv, d ** -0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_paired_dispatcher_fallback(rng):
    """Odd reference counts / include_input fall back to kv_outer_bound."""
    b, h, s, d, n = 1, 2, 16, 8, 3  # n odd -> unpairable
    q = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
    k_in = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
    v_in = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
    rk = jnp.asarray(rng.normal(size=(b, n, h, s, d)), jnp.float32)
    rv = jnp.asarray(rng.normal(size=(b, n, h, s, d)), jnp.float32)
    for include_input in (True, False):
        out = shared_flash_attention(
            q, k_in, v_in, rk, rv, scale=d ** -0.5,
            include_input=include_input, block_q=16, block_k=16,
            interpret=True, algo="kv_outer_bound_paired",
        )
        wk, wv = widen_kv(k_in, v_in, rk, rv, train_input=include_input)
        ref = _xla_attention(q, wk, wv, d ** -0.5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("d", [8, 256])
def test_flash_bound_matches_xla(rng, d):
    """Plain flash with the precomputed softmax bound (serving default) —
    both the MXU-rowsum (d<128) and VPU-rowsum (d>=128) paths."""
    b, h, sq, skv = 2, 2, 64, 128
    q = jnp.asarray(rng.normal(size=(b, h, sq, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, skv, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, skv, d)), jnp.float32)
    scale = d ** -0.5
    out = flash_attention(q, k, v, scale=scale, block_q=32, block_k=32,
                          interpret=True, algo="bound")
    ref = _xla_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)
    # online algo unchanged
    out2 = flash_attention(q, k, v, scale=scale, block_q=32, block_k=32,
                           interpret=True, algo="online")
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref), atol=5e-5)


def test_bound_kernels_large_activation_norms(rng):
    """Cauchy-Schwarz slack grows with ||q||*||k||; the +64 exponent shift
    (BOUND_EXP_SHIFT) keeps p representable far beyond realistic activation
    scales. x3.5 inputs put the slack near ~140 log2 units at d=64 — beyond
    the unshifted bf16 window (126), inside the shifted one (190)."""
    b, h, s, d, n = 1, 2, 64, 64, 2
    big = 3.5
    q = jnp.asarray(rng.normal(size=(b, h, s, d)) * big, jnp.float32)
    k_in = jnp.asarray(rng.normal(size=(b, h, s, d)) * big, jnp.float32)
    v_in = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
    rk = jnp.asarray(rng.normal(size=(b, n, h, s, d)) * big, jnp.float32)
    rv = jnp.asarray(rng.normal(size=(b, n, h, s, d)), jnp.float32)
    scale = d ** -0.5
    wk, wv = widen_kv(k_in, v_in, rk, rv)
    ref = _xla_attention(q, wk, wv, scale)
    out = shared_flash_attention(
        q, k_in, v_in, rk, rv, scale=scale, include_input=True,
        block_q=32, block_k=32, interpret=True, algo="kv_outer_bound",
    )
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-4)
    out2 = flash_attention(q[:, :, :, :], wk, wv, scale=scale,
                           block_q=32, block_k=32, interpret=True, algo="bound")
    assert np.isfinite(np.asarray(out2)).all()
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref), atol=5e-4)


@pytest.mark.parametrize("use_adain", [True, False])
@pytest.mark.parametrize("n", [4, 3])  # even -> paired cache, odd -> unpaired
def test_identity_cache_matches_widen_kv_path(rng, use_adain, n):
    """Scalar-prefetch identity-cache kernels (serving steady state): KV
    streamed straight from the [I, ...] cache by identity id — must equal the
    XLA widened path on the gathered KV, paired and unpaired layouts."""
    from instantrestore_tpu.ops.shared_attention import (
        build_identity_kv_cache,
        shared_attention_identity,
    )

    b, i_ident, h, s, d = 3, 4, 2, 32, 8
    q = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
    k_in = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
    v_in = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
    rk_all = jnp.asarray(rng.normal(size=(i_ident, n, h, s, d)), jnp.float32)
    rv_all = jnp.asarray(rng.normal(size=(i_ident, n, h, s, d)), jnp.float32)
    ids = jnp.asarray([2, 0, 2], jnp.int32)  # repeats exercise the indexing
    scale = d ** -0.5

    (cache,) = build_identity_kv_cache([(rk_all, rv_all)], block_k=16)
    assert cache.paired == (n % 2 == 0)
    out = shared_attention_identity(
        q, k_in, v_in, cache, ids,
        scale=scale, use_adain=use_adain, block_q=16, interpret=True,
    )

    rk, rv = rk_all[ids], rv_all[ids]
    wk, wv = widen_kv(k_in, v_in, rk, rv, use_adain=use_adain, train_input=False)
    ref = _xla_attention(q, wk, wv, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_identity_cache_stats_match_adain_affine(rng):
    """Cached content stats reproduce adain_affine bit-for-bit."""
    from instantrestore_tpu.ops.shared_attention import (
        adain_affine_from_stats,
        build_identity_kv_cache,
    )

    b, i_ident, n, h, s, d = 2, 3, 3, 2, 16, 8
    v_in = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
    rk_all = jnp.asarray(rng.normal(size=(i_ident, n, h, s, d)), jnp.float32)
    rv_all = jnp.asarray(rng.normal(size=(i_ident, n, h, s, d)), jnp.float32)
    ids = jnp.asarray([1, 2], jnp.int32)
    (cache,) = build_identity_kv_cache([(rk_all, rv_all)], block_k=16)
    got_s, got_h = adain_affine_from_stats(
        v_in, cache.content_mean[ids], cache.content_std[ids]
    )
    want_s, want_h = adain_affine(v_in, rv_all[ids])
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s), atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_h), np.asarray(want_h), atol=1e-6)
