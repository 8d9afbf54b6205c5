"""Real-checkpoint first contact: drive BOTH reference .pt schemas through
``Predictor(checkpoint_path=...)`` to a produced image (VERDICT r2 item 1).

Synthesizes reference-format checkpoints at tiny sizes:
  * FULL (coach.py:712-718 schema): net.-prefixed state dict over
    unet/vae/original_unet/original_vae/text_encoder — caption_enc must be
    built from the checkpoint's own text encoder + tokenizer files
    (pix2pix_turbo.py:100-106).
  * LoRA-only (pix2pix_turbo.py:345-353 schema, written by our own
    export_lora_only_checkpoint): composed onto a diffusers-layout base
    weights directory (pix2pix_turbo.py:114-140), with the peft alpha=8
    load-time scaling quirk routed into RestorerStatics.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from helpers import make_tokenizer_files
from instantrestore_tpu.inference.predictor import Predictor
from instantrestore_tpu.models.lora import (
    UNET_LORA_TARGETS,
    VAE_LORA_TARGETS,
    attach_lora,
)
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
from instantrestore_tpu.models.unet import UNetConfig, init_unet_params
from instantrestore_tpu.models.vae import VAEConfig, init_vae_params
from instantrestore_tpu.utils import torch_convert as tc

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


def _tiny_text_params(vocab_size):
    cfg = CLIPTextConfig(
        vocab_size=vocab_size,
        hidden_size=16,
        num_layers=2,
        num_heads=1,
        intermediate_size=32,
        max_position_embeddings=77,
        eos_token_id=vocab_size - 1,
    )
    return init_text_encoder_params(jax.random.PRNGKey(5), cfg), cfg


def _to_torch_sd(np_sd):
    import torch

    return {k: torch.from_numpy(np.asarray(v).copy()) for k, v in np_sd.items()}


@pytest.fixture(scope="module")
def tok_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tokenizer")
    vocab = make_tokenizer_files(d)
    return str(d), len(vocab)


@pytest.fixture(scope="module")
def images():
    rng = np.random.default_rng(3)
    mk = lambda: Image.fromarray(rng.integers(0, 255, (64, 64, 3), np.uint8))
    return mk(), [mk() for _ in range(4)]


def _predict(pred, images):
    degraded, refs = images
    out, _ = pred.predict(degraded, refs)
    arr = np.asarray(out)
    assert arr.shape == (64, 64, 3)
    assert np.isfinite(arr.astype(np.float32)).all()
    return arr


# ---------------------------------------------------------------------------
# FULL schema
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def full_pt(tmp_path_factory, tok_dir):
    """Synthetic FULL checkpoint in the reference trainer's exact schema."""
    import torch

    _, vocab_size = tok_dir
    params = init_restorer_params(
        jax.random.PRNGKey(0), STATICS, lora_rank_unet=4, lora_rank_vae=4
    )
    text_params, _ = _tiny_text_params(vocab_size)
    sd = {}
    nets = {
        "unet": params["unet"],
        "vae": params["vae"],
        "original_unet": original_unet_view(params),
        "original_vae": original_vae_view(params),
        "text_encoder": text_params,
    }
    for name, tree in nets.items():
        sd.update(tc.tree_to_torch_state_dict(tree, prefix=f"net.{name}."))
    path = tmp_path_factory.mktemp("ckpt") / "full_model.pt"
    torch.save(
        {"state_dict": _to_torch_sd(sd), "cfg": {"model": {"use_adain": False}}},
        str(path),
    )
    return str(path), params


def test_full_checkpoint_to_image(full_pt, tok_dir, images):
    path, _ = full_pt
    pred = Predictor(
        checkpoint_path=path,
        statics=STATICS,
        tokenizer_dir=tok_dir[0],
        dtype=jnp.float32,
        resolution=64,
        deterministic=True,
    )
    # caption_enc was built from the checkpoint's text encoder: right shape,
    # finite, not all-zero
    cap = np.asarray(pred.params["caption_enc"], np.float32)
    assert cap.shape == (1, 77, 16)
    assert np.isfinite(cap).all() and np.abs(cap).max() > 0
    # the text tower itself is not shipped to device
    assert "text_encoder" not in pred.params
    _predict(pred, images)


def test_full_checkpoint_without_tokenizer_raises(full_pt, monkeypatch):
    path, _ = full_pt
    monkeypatch.delenv("INSTANTRESTORE_TOKENIZER_DIR", raising=False)
    with pytest.raises(FileNotFoundError, match="INSTANTRESTORE_TOKENIZER_DIR"):
        Predictor(checkpoint_path=path, statics=STATICS, dtype=jnp.float32)


def test_full_checkpoint_with_prompt_ids(full_pt, tok_dir, images):
    """Precomputed token ids replace the tokenizer files entirely."""
    path, _ = full_pt
    _, vocab_size = tok_dir
    ids = [vocab_size - 2] + [5, 6, 7] + [vocab_size - 1] * 73
    pred = Predictor(
        checkpoint_path=path,
        statics=STATICS,
        prompt_ids=ids,
        dtype=jnp.float32,
        resolution=64,
        deterministic=True,
    )
    _predict(pred, images)


# ---------------------------------------------------------------------------
# LoRA-only schema + base weights directory
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def lora_setup(tmp_path_factory, tok_dir):
    """Base diffusers-layout dir (safetensors) + exported LoRA-only .pt."""
    from safetensors.numpy import save_file

    tok_path, vocab_size = tok_dir
    base_unet = init_unet_params(jax.random.PRNGKey(1), STATICS.unet_cfg)
    base_vae = init_vae_params(jax.random.PRNGKey(2), STATICS.vae_cfg)
    text_params, _ = _tiny_text_params(vocab_size)

    base = tmp_path_factory.mktemp("base_weights")
    for name, tree in (("unet", base_unet), ("vae", base_vae), ("text_encoder", text_params)):
        (base / name).mkdir()
        sd = {
            k: np.ascontiguousarray(np.asarray(v, np.float32))
            for k, v in tc.tree_to_torch_state_dict(tree).items()
        }
        save_file(sd, str(base / name / "model.safetensors"))
    make_tokenizer_files(base / "tokenizer")

    # the "trained" model: LoRA on both nets, conv_in finetuned
    unet = attach_lora(base_unet, jax.random.PRNGKey(3), 4, UNET_LORA_TARGETS)
    unet["conv_out"]["lora_B"] = jnp.ones_like(unet["conv_out"]["lora_B"])
    unet["conv_in"] = {
        "kernel": unet["conv_in"]["kernel"] + 0.05,
        "bias": unet["conv_in"]["bias"] - 0.05,
    }
    vae = attach_lora(base_vae, jax.random.PRNGKey(4), 4, VAE_LORA_TARGETS)
    pt = tmp_path_factory.mktemp("ckpt2") / "lora_only.pt"
    tc.export_lora_only_checkpoint(
        {"unet": unet, "vae": vae}, str(pt), rank_unet=4, rank_vae=4
    )
    return str(pt), str(base), base_unet, unet


def test_lora_only_checkpoint_to_image(lora_setup, images):
    pt, base_dir, base_unet, trained_unet = lora_setup
    pred = Predictor(
        checkpoint_path=pt,
        statics=STATICS,
        base_weights_dir=base_dir,
        dtype=jnp.float32,
        resolution=64,
        deterministic=True,
    )
    # peft load-time quirk: alpha=8 default over rank 4 -> scaling 2.0
    assert pred.statics.unet_lora_scaling == pytest.approx(8.0 / 4.0)
    assert pred.statics.vae_lora_scaling == pytest.approx(8.0 / 4.0)
    # trainable unet got the finetuned conv_in; the frozen capture view keeps
    # the BASE conv_in (reference loads the overlay only into the trainable
    # nets — original networks stay on base weights)
    np.testing.assert_allclose(
        np.asarray(pred.params["unet"]["conv_in"]["kernel"], np.float32),
        np.asarray(trained_unet["conv_in"]["kernel"], np.float32),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(pred.params["unet_orig_conv_in"]["kernel"], np.float32),
        np.asarray(base_unet["conv_in"]["kernel"], np.float32),
        atol=1e-6,
    )
    # lora leaves arrived
    np.testing.assert_allclose(
        np.asarray(pred.params["unet"]["conv_out"]["lora_B"], np.float32), 1.0
    )
    # caption_enc built from the base text encoder + base tokenizer dir
    assert np.abs(np.asarray(pred.params["caption_enc"], np.float32)).max() > 0
    _predict(pred, images)


def test_lora_only_without_base_raises(lora_setup, monkeypatch):
    pt, *_ = lora_setup
    monkeypatch.delenv("INSTANTRESTORE_BASE_WEIGHTS", raising=False)
    with pytest.raises(FileNotFoundError, match="INSTANTRESTORE_BASE_WEIGHTS"):
        Predictor(checkpoint_path=pt, statics=STATICS, dtype=jnp.float32)


def test_lora_only_env_var_base(lora_setup, images, monkeypatch):
    pt, base_dir, *_ = lora_setup
    monkeypatch.setenv("INSTANTRESTORE_BASE_WEIGHTS", base_dir)
    pred = Predictor(
        checkpoint_path=pt, statics=STATICS, dtype=jnp.float32,
        resolution=64, deterministic=True,
    )
    _predict(pred, images)


def test_native_orbax_checkpoint_decodes_statics(tmp_path):
    """Predictor's orbax branch derives model statics from the checkpoint's
    saved TrainConfig (meta.json) when the caller passes none — closing the
    train->serve loop for native checkpoints, not just reference .pt files."""
    from instantrestore_tpu.configs.config import TrainConfig
    from instantrestore_tpu.inference.predictor import load_predictor_params
    from instantrestore_tpu.training import checkpoints as ckpt_mod

    cfg = TrainConfig()
    cfg.model.use_adain = True
    cfg.model.train_input = False
    cfg.model.lora_rank_unet = 8  # alpha = rank//2 -> scaling 0.5
    params = init_restorer_params(
        jax.random.PRNGKey(0), STATICS, lora_rank_unet=4, lora_rank_vae=4
    )
    out = tmp_path / "ckpt"
    ckpt_mod.save_checkpoint(out, {"params": params}, cfg=cfg, step=7)

    loaded, statics = load_predictor_params(str(out), None)
    assert statics.use_adain is True
    assert statics.train_input is False
    assert statics.unet_lora_scaling == 0.5
    assert set(loaded) == set(params)

    # explicit statics still win (tiny-architecture serving/test flows)
    _, statics2 = load_predictor_params(str(out), STATICS)
    assert statics2 is STATICS
