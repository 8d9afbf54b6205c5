"""Checkpoint save/load (orbax) + reference-format interop.

Two native artifacts (mirroring the reference's two schemas, SURVEY.md §3.5):
  * full:    {params, disc_heads, opt_state, disc_opt_state, step, cfg}
    — the trainer's resumable state (coach.py:712-718 equivalent, plus the
    step counter the reference forgets to restore).
  * weights: {params} only — the deployable artifact.

Plus importers for the released torch ``.pt`` files via utils/torch_convert.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from instantrestore_tpu.configs.config import encode_config


def _local_checkpointer() -> ocp.StandardCheckpointer:
    """StandardCheckpointer whose barriers are scoped to THIS process.

    Coach saves are primary-only (params replicated — the accelerate
    main-process-only semantic, coach.py::save), and the payloads are
    device_get numpy trees, so no cross-process coordination is needed. But
    orbax defaults to GLOBAL sync barriers whenever jax.process_count() > 1 —
    a primary-only save then deadlocks waiting for processes that never call
    save (observed live: the 2-process integration test's worker 0 hung in
    the final-checkpoint save after worker 1 exited). Scoping
    active_processes to the caller makes save/load purely local from any
    process."""
    pid = jax.process_index()
    if jax.process_count() <= 1:
        return ocp.StandardCheckpointer()
    return ocp.StandardCheckpointer(
        multiprocessing_options=ocp.options.MultiprocessingOptions(
            primary_host=pid,
            active_processes={pid},
            barrier_sync_key_prefix=f"proc{pid}",
        )
    )


def save_checkpoint(
    path,
    payload: Dict[str, Any],
    cfg=None,
    step: Optional[int] = None,
    extra_meta: Optional[Dict[str, Any]] = None,
):
    path = Path(path).absolute()
    path.mkdir(parents=True, exist_ok=True)
    ckptr = _local_checkpointer()
    ckptr.save(path / "state", payload, force=True)
    ckptr.wait_until_finished()
    meta = {"step": step}
    if cfg is not None:
        meta["cfg"] = encode_config(cfg)
    if extra_meta:
        meta.update(extra_meta)
    (path / "meta.json").write_text(json.dumps(meta))


def load_checkpoint(path, template: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    path = Path(path).absolute()
    ckptr = _local_checkpointer()
    state = ckptr.restore(path / "state", template)
    meta = {}
    meta_file = path / "meta.json"
    if meta_file.exists():
        meta = json.loads(meta_file.read_text())
    return {"state": state, "meta": meta}


# --------------------------------------------------------------------------
# Reference .pt import: both schemas, servable on first contact.
#
# Environment fallbacks (all overridable by explicit kwargs):
#   INSTANTRESTORE_BASE_WEIGHTS  diffusers-layout dir with base sd-turbo unet/
#                                text_encoder (+ sd-vae-ft-mse as vae/) for
#                                LoRA-only checkpoints (pix2pix_turbo.py:114-140)
#   INSTANTRESTORE_TOKENIZER_DIR dir holding vocab.json + merges.txt for the
#                                fixed-prompt embedding (pix2pix_turbo.py:100-106)
# --------------------------------------------------------------------------

BASE_WEIGHTS_ENV = "INSTANTRESTORE_BASE_WEIGHTS"
TOKENIZER_DIR_ENV = "INSTANTRESTORE_TOKENIZER_DIR"


def _load_weight_file(path: Path) -> Dict[str, Any]:
    """One weights file -> flat torch-style state dict of numpy arrays."""
    if path.suffix == ".safetensors":
        try:
            from safetensors.numpy import load_file

            return load_file(str(path))
        except Exception:
            # bf16 tensors are not numpy-representable; route through torch
            from safetensors.torch import load_file as load_torch

            return {
                k: (v.float() if v.dtype not in (None,) and "bfloat" in str(v.dtype) else v)
                .cpu()
                .numpy()
                for k, v in load_torch(str(path)).items()
            }
    import torch

    raw = torch.load(str(path), map_location="cpu", weights_only=False)
    sd = raw.get("state_dict", raw) if isinstance(raw, dict) else raw
    return sd


def _find_weight_files(root: Path, subfolder: str) -> list:
    """Weight files for one network in a diffusers-layout directory: either
    ``<root>/<subfolder>/*.safetensors|*.bin`` (sharded files merge) or a flat
    ``<root>/<subfolder>.safetensors``."""
    cands = []
    sub = root / subfolder
    if sub.is_dir():
        cands = sorted(sub.glob("*.safetensors")) or sorted(sub.glob("*.bin"))
    if not cands:
        for suffix in (".safetensors", ".bin", ".pt", ".pth"):
            flat = root / f"{subfolder}{suffix}"
            if flat.is_file():
                cands = [flat]
                break
    return cands


def load_base_weights(base_dir: str) -> Dict[str, Any]:
    """Base sd-turbo / sd-vae weights directory -> converted param trees.

    The reference composes LoRA-only checkpoints onto freshly-downloaded
    ``stabilityai/sd-turbo`` (unet, text_encoder, tokenizer) and
    ``stabilityai/sd-vae-ft-mse`` (vae) weights (pix2pix_turbo.py:28-58,
    94-106,114-140). This loader expects those snapshots assembled into one
    directory in the standard diffusers layout::

        <base_dir>/unet/diffusion_pytorch_model.safetensors
        <base_dir>/vae/diffusion_pytorch_model.safetensors
        <base_dir>/text_encoder/model.safetensors
        <base_dir>/tokenizer/{vocab.json, merges.txt}

    (``.bin`` files and flat ``<base_dir>/unet.safetensors`` also accepted.)
    Returns {"unet": tree, "vae": tree, "text_encoder": tree|None,
    "tokenizer_dir": str|None}.
    """
    from instantrestore_tpu.utils.torch_convert import convert_state_dict

    root = Path(base_dir)
    if not root.is_dir():
        raise FileNotFoundError(
            f"base weights directory not found: {base_dir} — assemble the "
            "stabilityai/sd-turbo (unet/, text_encoder/, tokenizer/) and "
            "stabilityai/sd-vae-ft-mse (as vae/) snapshots there, or set "
            f"${BASE_WEIGHTS_ENV}"
        )
    out: Dict[str, Any] = {}
    for net in ("unet", "vae", "text_encoder"):
        files = _find_weight_files(root, net)
        if not files:
            if net == "text_encoder":
                out[net] = None
                continue
            raise FileNotFoundError(
                f"no {net} weights under {base_dir} (looked for "
                f"{net}/*.safetensors|*.bin and {net}.safetensors)"
            )
        sd: Dict[str, Any] = {}
        for f in files:
            sd.update(_load_weight_file(f))
        out[net] = convert_state_dict(sd)
    tok = root / "tokenizer"
    out["tokenizer_dir"] = str(tok) if (tok / "vocab.json").exists() else None
    return out


def build_caption_enc(
    text_encoder_params: Dict[str, Any],
    *,
    tokenizer_dir: Optional[str] = None,
    prompt_ids=None,
) -> "jax.Array":
    """Embed the fixed restoration prompt through a converted text encoder.

    Twin of pix2pix_turbo.py:100-106 (tokenize "A high-quality photo of a
    person; professional, 8k" padded to 77, CLIPTextModel last_hidden_state).
    Token ids come from ``prompt_ids`` when given, else from the BPE files in
    ``tokenizer_dir`` / $INSTANTRESTORE_TOKENIZER_DIR.
    """
    from instantrestore_tpu.models.restorer import PROMPT
    from instantrestore_tpu.models.text_encoder import encode_prompt, infer_text_config
    from instantrestore_tpu.models.tokenizer import load_tokenizer

    cfg = infer_text_config(text_encoder_params)
    if prompt_ids is None:
        tokenizer_dir = tokenizer_dir or os.environ.get(TOKENIZER_DIR_ENV)
        tok = load_tokenizer(tokenizer_dir)
        if tok is None:
            raise FileNotFoundError(
                "cannot build the fixed-prompt embedding (caption_enc): no "
                "tokenizer files. Point tokenizer_dir= (or "
                f"${TOKENIZER_DIR_ENV}) at a directory containing the CLIP "
                "vocab.json + merges.txt that ship with stabilityai/sd-turbo "
                "(tokenizer subfolder), or pass prompt_ids= with the 77 "
                "precomputed token ids of the fixed prompt."
            )
        prompt_ids = tok(PROMPT, max_length=cfg.max_position_embeddings)
    return encode_prompt(text_encoder_params, prompt_ids, cfg=cfg)


def import_reference_checkpoint(
    pt_path: str,
    *,
    base_weights_dir: Optional[str] = None,
    tokenizer_dir: Optional[str] = None,
    prompt_ids=None,
) -> Dict[str, Any]:
    """Released torch .pt -> servable restorer params bundle (both schemas).

    FULL format (coach.py:712-718): converts the four networks + text encoder
    and builds ``caption_enc`` from the checkpoint's own text encoder.

    LoRA-only format (pix2pix_turbo.py:345-353): composes the LoRA/conv_in/
    skip overlay onto base sd-turbo / sd-vae trees loaded from
    ``base_weights_dir`` (or $INSTANTRESTORE_BASE_WEIGHTS), mirroring
    Pix2Pix_Turbo._init_models(pretrained_path=...) (:114-140) — the frozen
    "original" networks keep pure base weights, which our bundle expresses as
    LoRA-stripped views plus the preserved base conv_in. The peft alpha=8
    load-time scaling quirk (torch_convert.py docstring) is returned in
    ``meta['unet_lora_scaling']``/``meta['vae_lora_scaling']`` and routed into
    RestorerStatics by the predictor loader.
    """
    from instantrestore_tpu.utils.torch_convert import (
        apply_lora_only_checkpoint,
        load_torch_checkpoint,
    )

    loaded = load_torch_checkpoint(pt_path)
    if loaded["format"] == "full":
        nets = loaded["params"]
        bundle = {
            "unet": nets["unet"],
            "vae": nets["vae"],
        }
        if "original_unet" in nets:
            bundle["original_unet"] = nets["original_unet"]
            bundle["unet_orig_conv_in"] = nets["original_unet"]["conv_in"]
        if "original_vae" in nets:
            bundle["original_vae"] = nets["original_vae"]
        if "text_encoder" in nets:
            bundle["text_encoder"] = nets["text_encoder"]
            bundle["caption_enc"] = build_caption_enc(
                nets["text_encoder"],
                tokenizer_dir=tokenizer_dir,
                prompt_ids=prompt_ids,
            )
        return {"bundle": bundle, "meta": loaded["meta"]}

    # lora_only
    base_weights_dir = base_weights_dir or os.environ.get(BASE_WEIGHTS_ENV)
    if base_weights_dir is None:
        raise FileNotFoundError(
            f"{pt_path} is a LoRA-only checkpoint; it must be composed onto "
            "base sd-turbo/sd-vae weights (the reference downloads these "
            "from HF at load time, pix2pix_turbo.py:28-58). Pass "
            f"base_weights_dir= or set ${BASE_WEIGHTS_ENV} to a diffusers-"
            "layout directory (see load_base_weights)."
        )
    base = load_base_weights(base_weights_dir)
    bundle = {
        "unet": apply_lora_only_checkpoint(base["unet"], None,
                                           overlay=loaded["params"]["unet_overlay"]),
        "vae": apply_lora_only_checkpoint(base["vae"], None,
                                          overlay=loaded["params"]["vae_overlay"]),
        # the frozen capture branch keeps PURE base weights: LoRA views strip
        # the overlay's lora leaves and this conv_in restores the base one
        # (the overlay's state_dict_unet includes the finetuned conv_in)
        "unet_orig_conv_in": dict(base["unet"]["conv_in"]),
    }
    if base["text_encoder"] is not None:
        bundle["text_encoder"] = base["text_encoder"]
        bundle["caption_enc"] = build_caption_enc(
            base["text_encoder"],
            tokenizer_dir=tokenizer_dir or base["tokenizer_dir"],
            prompt_ids=prompt_ids,
        )
    else:
        raise FileNotFoundError(
            f"no text_encoder weights under {base_weights_dir}; they are "
            "required to build the fixed-prompt embedding (caption_enc, "
            "pix2pix_turbo.py:100-106)"
        )
    return {"bundle": bundle, "meta": loaded["meta"]}
