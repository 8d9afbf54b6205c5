"""Drive the demo logic (inference/demo.py): model selector, identity
fixtures, restore-with-attention, and the degradation slider — the testable
core of the reference's gradio_demo.py, no gradio required."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from helpers import make_tokenizer_files
from instantrestore_tpu.inference.demo import Demo, degrade_image
from instantrestore_tpu.models.restorer import (
    RestorerStatics,
    init_restorer_params,
    original_unet_view,
    original_vae_view,
)
from instantrestore_tpu.models.text_encoder import (
    CLIPTextConfig,
    init_text_encoder_params,
)
from instantrestore_tpu.models.unet import UNetConfig
from instantrestore_tpu.models.vae import VAEConfig
from instantrestore_tpu.utils import torch_convert as tc

torch = pytest.importorskip("torch")

STATICS = RestorerStatics(
    unet_cfg=UNetConfig(
        sample_size=8, block_out_channels=(32, 64, 64, 64),
        attention_heads=(1, 2, 2, 2), cross_attention_dim=16,
        norm_num_groups=8,
    ),
    vae_cfg=VAEConfig(block_out_channels=(8, 16, 16, 16), norm_num_groups=4),
    compute_dtype=jnp.float32,
)


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    """Two synthetic FULL checkpoints (the 'model selector' rows) + one
    identity fixture tree + tokenizer files."""
    tok = tmp_path_factory.mktemp("tok")
    vocab = make_tokenizer_files(tok)
    cfg = CLIPTextConfig(
        vocab_size=len(vocab), hidden_size=16, num_layers=2, num_heads=1,
        intermediate_size=32, max_position_embeddings=77,
        eos_token_id=len(vocab) - 1,
    )
    ckpt_dir = tmp_path_factory.mktemp("ckpt")
    models = {}
    for i, name in enumerate(["Base Model", "Final Model"]):
        params = init_restorer_params(
            jax.random.PRNGKey(i), STATICS, lora_rank_unet=4, lora_rank_vae=4
        )
        text_params = init_text_encoder_params(jax.random.PRNGKey(5 + i), cfg)
        sd = {}
        for net, tree in {
            "unet": params["unet"],
            "vae": params["vae"],
            "original_unet": original_unet_view(params),
            "original_vae": original_vae_view(params),
            "text_encoder": text_params,
        }.items():
            sd.update(tc.tree_to_torch_state_dict(tree, prefix=f"net.{net}."))
        path = ckpt_dir / f"model{i}.pt"
        torch.save(
            {
                "state_dict": {
                    k: torch.from_numpy(np.asarray(v).copy())
                    for k, v in sd.items()
                },
                "cfg": {"model": {"use_adain": False}},
            },
            str(path),
        )
        models[name] = str(path)

    rng = np.random.default_rng(11)
    root = tmp_path_factory.mktemp("data")
    d = root / "carol"
    (d / "conditioning").mkdir(parents=True)
    for i in range(3):
        Image.fromarray(rng.integers(0, 255, (64, 64, 3), np.uint8)).save(
            d / "conditioning" / f"{i}.png"
        )
    Image.fromarray(rng.integers(0, 255, (64, 64, 3), np.uint8)).save(
        d / "degraded.png"
    )
    Image.fromarray(rng.integers(0, 255, (64, 64, 3), np.uint8)).save(d / "gt.png")
    return models, str(tok), str(root)


@pytest.mark.slow  # >20 s on the 1-CPU CI box (measured round 5)
def test_demo_run_and_model_switch(env):
    models, tok, root = env
    demo = Demo(
        root,
        models=models,
        predictor_kwargs=dict(
            statics=STATICS, resolution=64, dtype=jnp.float32, tokenizer_dir=tok
        ),
    )
    assert demo.identities == ["carol"]
    pred, attn = demo.run("Base Model", "carol")
    assert pred.size == (64, 64)
    # one attention-mass row per reference slot (refs pad to 4, the
    # reference's max_conditioning_images)
    assert len(attn) == 4
    assert all(0.0 <= v <= 100.0 for v in attn)

    first_predictor = demo._predictor
    pred2, _ = demo.run("Final Model", "carol")  # selector switches weights
    assert demo._predictor is not first_predictor
    assert np.asarray(pred2).shape == (64, 64, 3)
    # different checkpoints -> different restorations
    assert np.abs(
        np.asarray(pred, np.float32) - np.asarray(pred2, np.float32)
    ).max() > 1.0

    demo.run("Final Model", "carol")  # same model -> predictor reused
    assert demo._predictor is not first_predictor


def test_degrade_image_slider_monotone():
    rng = np.random.default_rng(0)
    clean = Image.fromarray(rng.integers(0, 255, (600, 600, 3), np.uint8))

    def psnr_vs_clean(level):
        out = np.asarray(degrade_image(clean, level), np.float64)
        ref = np.asarray(
            clean.resize((512, 512), Image.LANCZOS), np.float64
        )
        # degrade_image center-crops from shorter-side resize; compare stats
        return float(out.std()), out

    std0, img0 = psnr_vs_clean(0)
    std100, img100 = psnr_vs_clean(100)
    # heavy degradation blurs + downsamples: high-frequency content collapses
    g0 = np.abs(np.diff(img0, axis=0)).mean()
    g100 = np.abs(np.diff(img100, axis=0)).mean()
    assert g100 < g0 * 0.6
    assert img0.shape == img100.shape == (512, 512, 3)
