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
