"""Calibrated static int8 activation scales (VERDICT r2 #9 / ROADMAP #4).

The dynamic int8 conv path pays an abs-max reduction over every conv input;
calibration observes those scales on representative batches and bakes them
into the param tree as static ``a_scale`` leaves, leaving a pure elementwise
quantize chain that XLA fuses into the GroupNorm/SiLU producer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instantrestore_tpu.ops.primitives import (
    apply_int8_calibration,
    assign_calib_slots,
    conv2d,
    quantize_conv_int8,
    with_int8_records,
)


def _conv_params(key, cin=8, cout=16):
    k1, k2 = jax.random.split(key)
    return {
        "kernel": jax.random.normal(k1, (3, 3, cin, cout)) * 0.1,
        "bias": jax.random.normal(k2, (cout,)) * 0.01,
    }


def test_records_collected_under_jit():
    p = assign_calib_slots(quantize_conv_int8(_conv_params(jax.random.PRNGKey(0))))
    assert int(p["calib_slot"]) == 0
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 8))

    fn = jax.jit(with_int8_records(lambda p, x: conv2d(p, x)))
    _, (slots, scales) = fn(p, x)
    assert slots.shape == (1,) and scales.shape == (1,)
    expected = float(jnp.max(jnp.abs(x)) / 127.0)
    assert np.isclose(float(scales[0]), expected, rtol=1e-6)


def test_no_records_without_int8_or_slots():
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 8))
    # fp conv: nothing recorded
    p_fp = _conv_params(jax.random.PRNGKey(0))
    _, (slots, _) = jax.jit(with_int8_records(lambda p, x: conv2d(p, x)))(p_fp, x)
    assert slots.shape == (0,)
    # int8 but slot-less: nothing recorded (can't be keyed back)
    p_q = quantize_conv_int8(p_fp)
    _, (slots, _) = jax.jit(with_int8_records(lambda p, x: conv2d(p, x)))(p_q, x)
    assert slots.shape == (0,)


def test_static_matches_dynamic_at_batch1():
    """With batch=1 and margin=1, the per-sample dynamic scale IS the
    calibrated static scale — outputs must match exactly."""
    p = assign_calib_slots(quantize_conv_int8(_conv_params(jax.random.PRNGKey(0))))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 8))

    y_dyn = conv2d(p, x)
    _, (slots, scales) = with_int8_records(lambda: conv2d(p, x))()
    p_cal = apply_int8_calibration(p, slots, scales, margin=1.0)
    assert "a_scale" in p_cal and "calib_slot" not in p_cal
    y_static = conv2d(p_cal, x)
    np.testing.assert_allclose(np.asarray(y_dyn), np.asarray(y_static), rtol=1e-6)


def test_max_merge_and_margin():
    p = assign_calib_slots(quantize_conv_int8(_conv_params(jax.random.PRNGKey(0))))
    slots = jnp.asarray([0, 0], jnp.int32)
    scales = jnp.asarray([0.5, 2.0], jnp.float32)
    p_cal = apply_int8_calibration(p, slots, scales, margin=1.1)
    assert np.isclose(float(p_cal["a_scale"]), 2.0 * 1.1, rtol=1e-6)
    # unknown slot: conv stays dynamic (slot kept for a later pass)
    p_other = apply_int8_calibration(
        p, jnp.asarray([5], jnp.int32), jnp.asarray([1.0], jnp.float32)
    )
    assert "a_scale" not in p_other and "calib_slot" in p_other


def test_out_of_range_activations_clip_finite():
    p = assign_calib_slots(quantize_conv_int8(_conv_params(jax.random.PRNGKey(0))))
    x_cal = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 8))
    _, (slots, scales) = with_int8_records(lambda: conv2d(p, x_cal))()
    p_cal = apply_int8_calibration(p, slots, scales)
    y = conv2d(p_cal, x_cal * 100.0)  # far beyond calibration range
    assert np.isfinite(np.asarray(y)).all()


def test_nested_slots_unique():
    tree = {
        "a": quantize_conv_int8(_conv_params(jax.random.PRNGKey(0))),
        "b": [
            {"conv": quantize_conv_int8(_conv_params(jax.random.PRNGKey(1)))},
            _conv_params(jax.random.PRNGKey(2)),  # fp conv: no slot
        ],
    }
    tagged = assign_calib_slots(tree)
    s0 = int(tagged["a"]["calib_slot"])
    s1 = int(tagged["b"][0]["conv"]["calib_slot"])
    assert {s0, s1} == {0, 1}
    assert "calib_slot" not in tagged["b"][1]


def test_serving_engine_calibration_end_to_end():
    from instantrestore_tpu.inference.serving import ServingEngine
    from instantrestore_tpu.models.restorer import RestorerStatics, init_restorer_params
    from instantrestore_tpu.models.unet import UNetConfig
    from instantrestore_tpu.models.vae import VAEConfig

    statics = RestorerStatics(
        unet_cfg=UNetConfig(sample_size=8, block_out_channels=(32, 64, 64, 64),
                            attention_heads=(1, 2, 2, 2), cross_attention_dim=16,
                            norm_num_groups=8),
        vae_cfg=VAEConfig(block_out_channels=(8, 16, 16, 16), norm_num_groups=4),
        use_adain=True, train_input=False, compute_dtype=jnp.float32,
    )
    params = init_restorer_params(jax.random.PRNGKey(0), statics,
                                  lora_rank_unet=2, lora_rank_vae=2)
    params["caption_enc"] = jax.random.normal(jax.random.PRNGKey(7), (1, 7, 16))

    eng = ServingEngine(params, statics, use_fused_attention=True,
                        int8_decoder=True, int8_unet=True)
    refs = jax.random.randint(jax.random.PRNGKey(1), (2, 4, 64, 64, 3), 0, 256, jnp.uint8)
    imgs = jax.random.randint(jax.random.PRNGKey(2), (2, 64, 64, 3), 0, 256, jnp.uint8)
    ids = jnp.asarray([0, 1], jnp.int32)
    eng.onboard(refs)

    with pytest.raises(RuntimeError):
        ServingEngine(params, statics, int8_unet=True).calibrate_int8([])

    before = np.asarray(eng.restore(imgs, ids, jax.random.PRNGKey(3)))
    n = eng.calibrate_int8([(imgs, ids, jax.random.PRNGKey(3))])
    assert n > 0
    # every int8 conv in the bundle got a static scale
    from instantrestore_tpu.ops.primitives import _map_int8_convs

    remaining = []
    _map_int8_convs(eng.params, lambda p: remaining.append("a_scale" in p) or p)
    assert remaining and all(remaining)

    after = np.asarray(eng.restore(imgs, ids, jax.random.PRNGKey(3)))
    assert np.isfinite(after).all()
    # static grid ~= per-sample dynamic grid on the calibration batch
    assert np.median(np.abs(after - before)) < 0.15
