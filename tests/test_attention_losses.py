"""Unit tests for the attention-side losses and the cycle-degrade op
(VERDICT.md round-1: these had no direct coverage).

Each test checks the jitted function against a straightforward numpy
re-derivation of the reference math (coach.py:531-560 landmark,
:599-617 entropy reg, :642-680 pos/neg reg) — property tests, not imports.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instantrestore_tpu.training.losses.composite import (
    attention_entropy_reg,
    crop_with_boxes,
    landmark_attention_loss,
    pos_neg_reg_loss,
    reference_usage_means,
)


def _np_landmark_loss(pred, gt, mask, cond):
    """Reference math (coach.py:531-560) in plain numpy."""
    p = (pred - pred.min()) / (pred.max() - pred.min())
    g = (gt - gt.min()) / (gt.max() - gt.min())
    q = pred.shape[2]
    seg = p[:, :, :, cond * q:(cond + 1) * q]
    m = np.broadcast_to(mask[:, None, :, None], seg.shape)
    return np.mean((seg[m] - np.broadcast_to(g, seg.shape)[m]) ** 2)


def test_landmark_loss_matches_numpy():
    rng = np.random.default_rng(0)
    b, h, q, n_seg = 1, 2, 16, 5
    pred = rng.uniform(0, 1, (b, h, q, n_seg * q)).astype(np.float32)
    gt = rng.uniform(0, 1, (b, h, q, q)).astype(np.float32)
    mask = rng.uniform(0, 1, (b, q)) > 0.5
    mask[0, 0] = True  # at least one row
    for cond in [0, 2, 4]:
        want = _np_landmark_loss(pred, gt, mask, cond)
        got = float(
            landmark_attention_loss(
                jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(mask),
                jnp.asarray(cond),
            )
        )
        np.testing.assert_allclose(got, want, rtol=1e-5)


def test_landmark_loss_zero_on_perfect_match():
    rng = np.random.default_rng(1)
    b, h, q = 1, 2, 16
    gt = rng.uniform(0, 1, (b, h, q, q)).astype(np.float32)
    pred = np.concatenate([gt, rng.uniform(0, 1, (b, h, q, 4 * q))], axis=3)
    # force shared min/max so normalization maps both to the same range
    pred[0, 0, 0, 0] = 0.0
    pred[0, 0, 0, 1] = 1.0
    gt[0, 0, 0, 0] = 0.0
    gt[0, 0, 0, 1] = 1.0
    pred[:, :, :, :q] = gt
    mask = np.ones((b, q), bool)
    got = float(
        landmark_attention_loss(
            jnp.asarray(pred.astype(np.float32)), jnp.asarray(gt), jnp.asarray(mask),
            jnp.asarray(0),
        )
    )
    assert got < 1e-10


def test_entropy_reg_prefers_uniform_usage():
    """Uniform per-segment usage must score lower than collapsed usage."""
    b, h, q, n = 1, 2, 8, 5
    rng = np.random.default_rng(2)
    # collapsed: every query's max segment is #1
    collapsed = np.full((b, h, q, n * q), 0.1, np.float32)
    collapsed[:, :, :, q:2 * q] = 1.0
    # spread: max segment rotates uniformly over the 4 ref segments
    spread = np.full((b, h, q, n * q), 0.1, np.float32)
    for i in range(q):
        s = 1 + i % 4
        spread[:, :, i, s * q:(s + 1) * q] = 1.0
    lc = float(attention_entropy_reg([jnp.asarray(collapsed)], n))
    ls = float(attention_entropy_reg([jnp.asarray(spread)], n))
    assert ls < lc


def test_entropy_reg_refs_only_uses_all_segments():
    """train_input=False: segment 0 is a reference, not the input — nothing
    is dropped and a collapse onto segment 0 must be penalized exactly like a
    collapse onto any other segment (our documented refs-only semantic; the
    reference's hardcoded 5-segment view would crash here, coach.py:603)."""
    b, h, q, n = 1, 2, 8, 4
    collapse = []
    for s in range(n):
        p = np.full((b, h, q, n * q), 0.1, np.float32)
        p[:, :, :, s * q:(s + 1) * q] = 1.0
        collapse.append(
            float(attention_entropy_reg([jnp.asarray(p)], n, train_input=False))
        )
    # all four collapse directions score identically (segment 0 included)
    assert max(collapse) - min(collapse) < 1e-6
    # and uniform usage over the 4 refs scores strictly lower
    spread = np.full((b, h, q, n * q), 0.1, np.float32)
    for i in range(q):
        s = i % 4
        spread[:, :, i, s * q:(s + 1) * q] = 1.0
    ls = float(attention_entropy_reg([jnp.asarray(spread)], n, train_input=False))
    assert ls < min(collapse)


def test_segment_softmax_sums_match_probs_path():
    """Streamed per-segment masses == segment sums of the materialized
    softmax (values AND gradients) — the batch>=2 memory plan must be
    loss-identical to the probs path."""
    import jax
    from instantrestore_tpu.models.attention import segment_softmax_sums

    rng = np.random.default_rng(5)
    b, h, q, s, d, n_seg = 2, 2, 8, 8, 4, 4
    qv = jnp.asarray(rng.normal(size=(b, h, q, d)), jnp.float32)
    ks = jnp.asarray(rng.normal(size=(n_seg, b, h, s, d)), jnp.float32)
    scale = d ** -0.5

    def probs_sums(qv, ks):
        wide = jnp.concatenate([ks[i] for i in range(n_seg)], axis=2)
        logits = jnp.einsum("bhqd,bhkd->bhqk", qv, wide) * scale
        p = jax.nn.softmax(logits, axis=-1)
        return p.reshape(b, h, q, n_seg, s).sum(-1)

    want = probs_sums(qv, ks)
    got = segment_softmax_sums(qv, ks, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)

    # gradients through a pos/neg-style NLL agree
    def loss_stream(qv, ks):
        m = segment_softmax_sums(qv, ks, scale).sum(axis=(0, 1, 2))
        return pos_neg_reg_loss(m, jnp.asarray(1), negative=False)

    def loss_probs(qv, ks):
        m = probs_sums(qv, ks).sum(axis=(0, 1, 2))
        return pos_neg_reg_loss(m, jnp.asarray(1), negative=False)

    g1 = jax.grad(loss_stream, argnums=(0, 1))(qv, ks)
    g2 = jax.grad(loss_probs, argnums=(0, 1))(qv, ks)
    for a, bb in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=1e-6)


def test_entropy_from_sums_matches_probs_entropy():
    from instantrestore_tpu.training.losses.composite import (
        attention_entropy_reg_from_sums,
    )

    rng = np.random.default_rng(6)
    b, h, q, n = 2, 3, 8, 4
    for train_input in (True, False):
        n_seg = n + 1 if train_input else n
        logits = rng.normal(size=(b, h, q, n_seg * 16)).astype(np.float32)
        probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
        sums = probs.reshape(b, h, q, n_seg, 16).sum(-1)
        want = float(
            attention_entropy_reg([jnp.asarray(probs)], n_seg, train_input=train_input)
        )
        got = float(
            attention_entropy_reg_from_sums(
                [jnp.asarray(sums)], n_seg, train_input=train_input
            )
        )
        assert got == pytest.approx(want, abs=1e-6)


def test_pos_neg_reg_direction():
    """pos reg decreases as the target segment's mass grows; neg reg the
    opposite (coach.py:656-680 NLL semantics)."""
    means_lo = jnp.asarray([1.0, 0.2, 1.0, 1.0, 1.0])
    means_hi = jnp.asarray([1.0, 3.0, 1.0, 1.0, 1.0])
    tgt = jnp.asarray(1)
    pos_lo = float(pos_neg_reg_loss(means_lo, tgt, negative=False))
    pos_hi = float(pos_neg_reg_loss(means_hi, tgt, negative=False))
    assert pos_hi < pos_lo
    neg_lo = float(pos_neg_reg_loss(means_lo, tgt, negative=True))
    neg_hi = float(pos_neg_reg_loss(means_hi, tgt, negative=True))
    assert neg_lo < neg_hi


def test_reference_usage_means_segments():
    rng = np.random.default_rng(3)
    q0, q1 = 4, 9
    p0 = rng.uniform(0, 1, (1, 2, q0, 5 * q0)).astype(np.float32)
    p1 = rng.uniform(0, 1, (1, 1, q1, 5 * q1)).astype(np.float32)
    probs = [jnp.asarray(p0), jnp.asarray(p1)]
    got = np.asarray(reference_usage_means(probs, jnp.asarray(1), [q0, q1]))
    want = p1.reshape(1, 1, q1, 5, q1).sum(axis=(0, 1, 2, 4))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_crop_with_boxes_matches_slices():
    rng = np.random.default_rng(4)
    imgs = rng.uniform(-1, 1, (3, 32, 32, 3)).astype(np.float32)
    origins = np.array([[0, 0], [5, 7], [20, 24]], np.int32)
    out = np.asarray(crop_with_boxes(jnp.asarray(imgs), jnp.asarray(origins), 8, 6))
    for i, (y, x) in enumerate(origins):
        np.testing.assert_array_equal(out[i], imgs[i, y:y + 8, x:x + 6])


@pytest.mark.slow  # >17 s on the 1-CPU CI box (measured round 5)
def test_degrade_with_params_selects_factor_and_differentiates():
    """degrade_with_params must (a) track the host chain's factor selection,
    (b) stay in [0,1], (c) be differentiable (cycle loss backprops through)."""
    from instantrestore_tpu.ops.image_ops import degrade_with_params

    rng = np.random.default_rng(5)
    imgs = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    params = {
        "blur_sigma_x": np.array([0.5, 6.0], np.float32),
        "blur_sigma_y": np.array([0.5, 2.0], np.float32),
        "blur_rotation": np.array([0.0, 1.0], np.float32),
        "downsample_factor": np.array([1, 4], np.int32),
        "noise_sigma": np.array([10.0, 20.0], np.float32),
        "jpeg_quality": np.array([15, 10], np.int32),
    }
    key = jax.random.PRNGKey(0)
    out = np.asarray(
        degrade_with_params(jnp.asarray(imgs), params, key, resolution=64)
    )
    assert out.shape == imgs.shape
    assert (out >= 0).all() and (out <= 1).all()
    # item 1 (factor 4, heavy blur) must be more degraded than item 0
    err0 = np.abs(out[0] - imgs[0]).mean()
    err1 = np.abs(out[1] - imgs[1]).mean()
    assert err1 > err0

    def f(x):
        return degrade_with_params(x, params, key, resolution=64).sum()

    g = np.asarray(jax.grad(f)(jnp.asarray(imgs)))
    assert np.isfinite(g).all()
    assert np.abs(g).sum() > 0


def test_traced_jpeg_matches_static_tables():
    """jpeg_compress_dct_traced == jpeg_compress_dct when quality matches."""
    from instantrestore_tpu.ops.dct_jpeg import (
        jpeg_compress_dct,
        jpeg_compress_dct_traced,
    )

    rng = np.random.default_rng(6)
    x = rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
    for q in [10, 19, 50, 90]:
        a = np.asarray(jpeg_compress_dct(jnp.asarray(x), q))
        b = np.asarray(
            jpeg_compress_dct_traced(jnp.asarray(x), jnp.full((2,), q, jnp.int32))
        )
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_per_sample_blur_matches_host_kernel():
    """gaussian_blur_per_sample reproduces the host anisotropic kernel."""
    import cv2

    from instantrestore_tpu.data.degradations import anisotropic_gaussian_kernel
    from instantrestore_tpu.ops.image_ops import gaussian_blur_per_sample

    rng = np.random.default_rng(7)
    img = rng.uniform(0, 1, (48, 48, 3)).astype(np.float32)
    sx, sy, rot = 3.0, 1.0, 0.7
    want = cv2.filter2D(
        img, -1, anisotropic_gaussian_kernel(41, sx, sy, rot),
        borderType=cv2.BORDER_CONSTANT,
    )
    got = np.asarray(
        gaussian_blur_per_sample(
            jnp.asarray(img)[None],
            jnp.asarray([sx]), jnp.asarray([sy]), jnp.asarray([rot]),
        )
    )[0]
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_pos_neg_reg_per_sample_b1_parity():
    """At B=1 with a valid index, pos_neg_reg_loss_per_sample is bit-equal to
    the reference-shaped pos_neg_reg_loss on the whole-batch means."""
    from instantrestore_tpu.training.losses.composite import (
        pos_neg_reg_loss_per_sample,
    )

    rng = np.random.default_rng(11)
    means = jnp.asarray(rng.uniform(0.1, 5.0, (5,)).astype(np.float32))
    for negative in (False, True):
        for tgt in (0, 3):
            want = float(pos_neg_reg_loss(means, jnp.asarray(tgt), negative=negative))
            got = float(
                pos_neg_reg_loss_per_sample(
                    means[None], jnp.asarray([tgt], jnp.int32), negative=negative
                )
            )
            assert got == pytest.approx(want, abs=0.0), (negative, tgt)
    # invalid index masks the sample out entirely
    assert float(
        pos_neg_reg_loss_per_sample(
            means[None], jnp.asarray([-1], jnp.int32), negative=False
        )
    ) == 0.0


def test_pos_neg_reg_per_sample_batch2_distinct_indices():
    """B=2 with two DIFFERENT swap indices: each sample is scored against its
    own segment (the reference's batch-1 indexing would score both against
    sample 0's index — coach.py:649,665 TODO)."""
    from instantrestore_tpu.training.losses.composite import (
        pos_neg_reg_loss_per_sample,
    )

    rng = np.random.default_rng(12)
    means = jnp.asarray(rng.uniform(0.1, 5.0, (2, 5)).astype(np.float32))
    idx = jnp.asarray([1, 3], jnp.int32)
    got = float(pos_neg_reg_loss_per_sample(means, idx, negative=False))
    want = 0.5 * (
        float(pos_neg_reg_loss(means[0], jnp.asarray(1), negative=False))
        + float(pos_neg_reg_loss(means[1], jnp.asarray(3), negative=False))
    )
    assert got == pytest.approx(want, rel=1e-6)
    # one invalid sample: the mean is over the single valid row
    got_masked = float(
        pos_neg_reg_loss_per_sample(
            means, jnp.asarray([-1, 3], jnp.int32), negative=True
        )
    )
    want_masked = float(pos_neg_reg_loss(means[1], jnp.asarray(3), negative=True))
    assert got_masked == pytest.approx(want_masked, rel=1e-6)


def test_reference_usage_means_per_sample_sums_to_batch_means():
    from instantrestore_tpu.training.losses.composite import (
        reference_usage_means_per_sample,
    )

    rng = np.random.default_rng(13)
    q0, q1 = 4, 9
    p0 = rng.uniform(0, 1, (3, 2, q0, 5 * q0)).astype(np.float32)
    p1 = rng.uniform(0, 1, (3, 1, q1, 5 * q1)).astype(np.float32)
    probs = [jnp.asarray(p0), jnp.asarray(p1)]
    per_sample = np.asarray(
        reference_usage_means_per_sample(probs, jnp.asarray(1), [q0, q1])
    )
    assert per_sample.shape == (3, 5)
    whole = np.asarray(reference_usage_means(probs, jnp.asarray(1), [q0, q1]))
    np.testing.assert_allclose(per_sample.sum(axis=0), whole, rtol=1e-5)
    want0 = p1[0].reshape(1, q1, 5, q1).sum(axis=(0, 1, 3))
    np.testing.assert_allclose(per_sample[0], want0, rtol=1e-5)
