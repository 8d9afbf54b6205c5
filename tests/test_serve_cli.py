"""End-to-end drive of scripts/serve.py: synthetic FULL reference checkpoint
+ gradio_data-layout identity tree -> batched identity-cached restores on
disk. The production counterpart of the Predictor first-contact tests."""

import importlib.util
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from helpers import make_tokenizer_files
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

REPO = Path(__file__).resolve().parent.parent

STATICS = RestorerStatics(
    unet_cfg=UNetConfig(
        sample_size=8,
        block_out_channels=(32, 64, 64, 64),
        attention_heads=(1, 2, 2, 2),
        cross_attention_dim=16,
        norm_num_groups=8,
    ),
    vae_cfg=VAEConfig(block_out_channels=(8, 16, 16, 16), norm_num_groups=4),
    compute_dtype=jnp.float32,
)


def _serve_module():
    spec = importlib.util.spec_from_file_location(
        "serve_cli", REPO / "scripts" / "serve.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    """FULL .pt checkpoint + tokenizer dir + identity tree (2 identities)."""
    tok = tmp_path_factory.mktemp("tok")
    vocab = make_tokenizer_files(tok)

    params = init_restorer_params(
        jax.random.PRNGKey(0), STATICS, lora_rank_unet=4, lora_rank_vae=4
    )
    cfg = CLIPTextConfig(
        vocab_size=len(vocab), hidden_size=16, num_layers=2, num_heads=1,
        intermediate_size=32, max_position_embeddings=77,
        eos_token_id=len(vocab) - 1,
    )
    text_params = init_text_encoder_params(jax.random.PRNGKey(5), cfg)
    sd = {}
    for name, tree in {
        "unet": params["unet"],
        "vae": params["vae"],
        "original_unet": original_unet_view(params),
        "original_vae": original_vae_view(params),
        "text_encoder": text_params,
    }.items():
        sd.update(tc.tree_to_torch_state_dict(tree, prefix=f"net.{name}."))
    ckpt = tmp_path_factory.mktemp("ckpt") / "full_model.pt"
    torch.save(
        {
            "state_dict": {
                k: torch.from_numpy(np.asarray(v).copy()) for k, v in sd.items()
            },
            "cfg": {"model": {"use_adain": False}},
        },
        str(ckpt),
    )

    rng = np.random.default_rng(7)
    root = tmp_path_factory.mktemp("data")
    for ident, n_deg in (("alice", 1), ("bob", 2)):
        d = root / ident
        (d / "conditioning").mkdir(parents=True)
        # 3 refs on purpose: serve pads to --refs by cycling
        for i in range(3):
            Image.fromarray(
                rng.integers(0, 255, (64, 64, 3), np.uint8)
            ).save(d / "conditioning" / f"ref{i}.png")
        if n_deg == 1:
            Image.fromarray(
                rng.integers(0, 255, (64, 64, 3), np.uint8)
            ).save(d / "degraded.png")
        else:
            (d / "degraded").mkdir()
            for i in range(n_deg):
                Image.fromarray(
                    rng.integers(0, 255, (64, 64, 3), np.uint8)
                ).save(d / "degraded" / f"img{i}.png")
    return str(ckpt), str(tok), str(root)


@pytest.mark.slow  # >20 s on the 1-CPU CI box (measured round 5)
def test_serve_cli_end_to_end(env, tmp_path):
    ckpt, tok, root = env
    out_dir = tmp_path / "results"
    rc = _serve_module().main([
        "--checkpoint", ckpt,
        "--data_root", root,
        "--results_dir", str(out_dir),
        "--tokenizer_dir", tok,
        "--batch", "2",
        "--refs", "4",
    ], statics=STATICS)
    assert rc == 0
    produced = sorted(p.name for p in out_dir.glob("*.png"))
    assert produced == ["alice.png", "bob_img0.png", "bob_img1.png"]
    for p in out_dir.glob("*.png"):
        arr = np.asarray(Image.open(p))
        assert arr.shape == (64, 64, 3)
        assert arr.std() > 0  # not a constant image


def test_serve_cli_no_work(env, tmp_path):
    ckpt, tok, _ = env
    empty = tmp_path / "empty"
    empty.mkdir()
    rc = _serve_module().main([
        "--checkpoint", ckpt, "--data_root", str(empty),
        "--results_dir", str(tmp_path / "r"), "--tokenizer_dir", tok,
    ], statics=STATICS)
    assert rc == 1
