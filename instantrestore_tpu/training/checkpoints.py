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


def save_checkpoint(path, payload: Dict[str, Any], cfg=None, step: Optional[int] = None):
    path = Path(path).absolute()
    path.mkdir(parents=True, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path / "state", payload, force=True)
    ckptr.wait_until_finished()
    meta = {"step": step}
    if cfg is not None:
        meta["cfg"] = encode_config(cfg)
    (path / "meta.json").write_text(json.dumps(meta))


def load_checkpoint(path, template: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    path = Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    state = ckptr.restore(path / "state", template)
    meta = {}
    meta_file = path / "meta.json"
    if meta_file.exists():
        meta = json.loads(meta_file.read_text())
    return {"state": state, "meta": meta}


def import_reference_checkpoint(pt_path: str) -> Dict[str, Any]:
    """Released torch .pt -> restorer params bundle.

    Builds the bundle layout expected by models/restorer.py: trainable
    ``unet``/``vae`` trees with LoRA leaves, plus explicit ``original_*``
    trees when the checkpoint carries diverged frozen copies (FULL format).
    """
    from instantrestore_tpu.utils.torch_convert import load_torch_checkpoint

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
        return {"bundle": bundle, "meta": loaded["meta"]}
    return loaded  # lora_only: caller overlays onto base sd-turbo weights
