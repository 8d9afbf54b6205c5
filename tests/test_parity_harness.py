"""Parity harness e2e: the Predictor driven over the REAL bundled identity
fixtures (/root/reference/gradio_data, the reference's manual acceptance
harness, gradio_demo.py:25-54) with tiny random weights — exercises the whole
flow the BASELINE gates will use once real weights exist (VERDICT.md #3)."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

GRADIO_DATA = Path("/root/reference/gradio_data")

pytestmark = pytest.mark.skipif(
    not GRADIO_DATA.exists(), reason="gradio_data fixtures not mounted"
)

from instantrestore_tpu.models.restorer import RestorerStatics, init_restorer_params
from instantrestore_tpu.models.unet import UNetConfig
from instantrestore_tpu.models.vae import VAEConfig

TINY_STATICS = RestorerStatics(
    unet_cfg=UNetConfig(
        sample_size=8,
        block_out_channels=(32, 64, 64, 64),
        attention_heads=(1, 2, 2, 2),
        cross_attention_dim=16,
        norm_num_groups=8,
    ),
    vae_cfg=VAEConfig(block_out_channels=(8, 16, 16, 16), norm_num_groups=4),
    use_adain=True,
    train_input=False,  # the shipped final-model mode (refs-only KV)
    compute_dtype=jnp.float32,
)
RES = 64


@pytest.fixture(scope="module")
def tiny_predictor():
    from instantrestore_tpu.inference.predictor import Predictor

    params = init_restorer_params(
        jax.random.PRNGKey(0), TINY_STATICS, lora_rank_unet=4, lora_rank_vae=4
    )
    params["caption_enc"] = jax.random.normal(jax.random.PRNGKey(9), (1, 7, 16))
    return Predictor(
        params=params, statics=TINY_STATICS, dtype=jnp.float32,
        resolution=RES, deterministic=True, use_fused_attention=False,
    )


@pytest.mark.slow  # >20 s on the 1-CPU CI box (measured round 5)
def test_gradio_report_on_real_fixtures(tiny_predictor, tmp_path):
    import sys

    sys.path.insert(0, "/root/repo/scripts")
    from parity import gradio_report

    from instantrestore_tpu.training.losses import id_loss as id_mod

    arcface = id_mod.init_arcface_params(jax.random.PRNGKey(1))
    report = gradio_report(
        tiny_predictor, GRADIO_DATA, arcface, RES, arc_src="random", limit=2
    )
    assert report["n_identities"] == 2
    for row in report["per_identity"]:
        assert np.isfinite(row["psnr_vs_gt"])
        assert -1.0 <= row["id_cosine_vs_gt"] <= 1.0
        assert -1.0 <= row["id_cosine_vs_refs"] <= 1.0
        # 4 refs-only segments: percentages sum to 100
        assert abs(sum(row["attention_pct"]) - 100.0) < 1e-2
    assert set(report["aggregate"]) == {
        "psnr_vs_gt", "id_cosine_vs_gt", "id_cosine_vs_refs"
    }


def test_strict_convert_check_passes_and_fails(tmp_path):
    """convert-diff --strict core (VERDICT r2 item 2): clean conversion of a
    peft-style dict passes; an unmappable key or a missing template leaf
    fails."""
    import sys

    sys.path.insert(0, "/root/repo/scripts")
    from parity import strict_group_check

    from instantrestore_tpu.models.lora import UNET_LORA_TARGETS, attach_lora
    from instantrestore_tpu.models.unet import init_unet_params
    from instantrestore_tpu.utils import torch_convert as tc

    unet = attach_lora(
        init_unet_params(jax.random.PRNGKey(0), TINY_STATICS.unet_cfg),
        jax.random.PRNGKey(1), 4, UNET_LORA_TARGETS,
    )
    sd = tc.tree_to_torch_state_dict(unet)
    check = strict_group_check(sd, template_tree=unet)
    assert check["ok"], check
    assert check["roundtrip_maxabs"] < 1e-6

    # peft-decorated keys (base_layer wrappers, custom adapter names) still
    # roundtrip to canonical names
    decorated = {}
    for k, v in sd.items():
        if k.endswith("conv_out.weight"):
            k = k.replace("conv_out.weight", "conv_out.base_layer.weight")
        k = k.replace("lora_A.default", "lora_A.vae_skip")
        decorated[k] = v
    check2 = strict_group_check(decorated, template_tree=unet)
    assert check2["ok"], (check2["unmapped_keys"][:3], check2["missing_template_leaves"][:3])

    # missing tensors -> missing template leaves -> FAIL
    missing = strict_group_check(
        {k: v for k, v in sd.items() if "conv_out" not in k}, template_tree=unet
    )
    assert not missing["ok"]
    assert any("conv_out" in m for m in missing["missing_template_leaves"])


@pytest.mark.slow  # >20 s on the 1-CPU CI box (measured round 5)
def test_debug_taps_stage_dump(tiny_predictor):
    """restore_forward(debug_taps=True): per-stage activations for the
    golden-diff tooling — every expected stage present and finite."""
    from instantrestore_tpu.models.restorer import restore_forward

    img = jax.random.uniform(jax.random.PRNGKey(0), (1, RES, RES, 3), jnp.float32, -1, 1)
    refs = jax.random.uniform(jax.random.PRNGKey(1), (1, 4, RES, RES, 3), jnp.float32, -1, 1)
    out = restore_forward(
        tiny_predictor.params, img, refs, jnp.full((1,), 4, jnp.int32),
        rng=jax.random.PRNGKey(2), statics=TINY_STATICS, timestep=249,
        sample_posterior=False, debug_taps=True,
    )
    taps = out["taps"]
    expected = (
        ["vae_enc_mean", "vae_enc_logvar", "latent", "latent_noised",
         "unet_eps", "x0", "decoded", "unet.conv_in", "unet.mid_block"]
        + [f"unet.down_block_{i}" for i in range(4)]
        + [f"unet.up_block_{i}" for i in range(4)]
        + [f"unet.shared_attn_{i}" for i in range(9)]
        + [f"ref_kv.{i}.k" for i in range(9)]
    )
    for k in expected:
        assert k in taps, (k, sorted(taps))
        assert np.isfinite(np.asarray(taps[k], np.float32)).all(), k


@pytest.mark.slow  # >20 s on the 1-CPU CI box (measured round 5)
def test_deterministic_predictor_repeats_exactly(tiny_predictor):
    from PIL import Image

    ident = sorted(p for p in GRADIO_DATA.glob("*") if p.is_dir())[0]
    img = Image.open(ident / "degraded.png").convert("RGB")
    refs = [
        Image.open(p).convert("RGB")
        for p in sorted((ident / "conditioning").glob("*"))
    ][:4]
    a, _ = tiny_predictor.predict(img, refs)
    b, _ = tiny_predictor.predict(img, refs)
    assert np.array_equal(np.asarray(a), np.asarray(b))
