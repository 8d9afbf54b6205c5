"""Checkpoint conversion: released torch ``.pt`` weights -> JAX param trees.

Handles both reference checkpoint schemas (SURVEY.md §3.5):

1. FULL format written by the trainer (coach.py:712-718):
   ``{"state_dict": <FaceReplaceModel>, "cfg": ..., "optimizer": ...}`` with
   ``net.`` / ``module.`` prefixes and the four sub-networks
   (unet / vae / original_unet / original_vae) plus text_encoder; peft-wrapped
   modules appear as ``*.base_layer.weight`` + ``*.lora_A.<adapter>.weight``.
2. LoRA-only format (pix2pix_turbo.py:345-353): ``{rank_unet, rank_vae,
   unet_lora_target_modules, vae_lora_target_modules, state_dict_unet,
   state_dict_vae}`` to be applied on top of base sd-turbo / sd-vae weights.

Layout conversion to TPU-native trees:
  torch Linear   [out, in]      -> kernel [in, out]
  torch Conv2d   [out, in, kh, kw] -> kernel [kh, kw, in, out] (HWIO)
  norm weight/bias (1-D)        -> scale / bias
  peft lora_A Linear [r, in]    -> [in, r];  lora_B [out, r] -> [r, out]
  peft lora_A Conv   [r,in,kh,kw] -> [kh,kw,in,r]; lora_B [out,r,1,1] -> [1,1,r,out]

Known reference quirk preserved for parity: when the reference loads a
LoRA-only checkpoint it rebuilds LoraConfig WITHOUT lora_alpha
(pix2pix_turbo.py:116-121), so peft's default alpha=8 applies and the
effective scaling is 8/rank (0.25 at the shipped rank 32) — NOT the
alpha=rank/2 (0.5) used during training. ``lora_scaling_for_loaded(rank)``
returns that inference-path scaling; pass ``alpha`` explicitly to override.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Mapping, Optional, Tuple

import jax.numpy as jnp
import numpy as np

LIST_KEYS = {
    "down_blocks",
    "up_blocks",
    "resnets",
    "attentions",
    "transformer_blocks",
    "downsamplers",
    "upsamplers",
    "layers",  # CLIP text encoder
}

PEFT_ADAPTER_NAMES = ("default", "vae_skip")


def lora_scaling_for_loaded(rank: int, alpha: Optional[float] = None) -> float:
    """Effective LoRA scaling when loading a reference checkpoint."""
    if alpha is None:
        alpha = 8.0  # peft LoraConfig default, see module docstring
    return float(alpha) / float(rank)


def _to_numpy(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    # torch tensor without importing torch at module scope
    return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)


def _normalize_key(key: str) -> Optional[List[str]]:
    """torch dotted name -> path in our tree. Returns None for skipped keys."""
    parts = key.split(".")
    out: List[str] = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if p == "base_layer":  # peft wrapper indirection
            i += 1
            continue
        if p == "ff" and i + 2 < len(parts) and parts[i + 1] == "net":
            # ff.net.0.proj.* / ff.net.2.*
            if parts[i + 2] == "0" and i + 3 < len(parts) and parts[i + 3] == "proj":
                out.extend(["ff", "net_0_proj"])
                i += 4
                continue
            out.extend(["ff", f"net_{parts[i + 2]}"])
            i += 3
            continue
        if p == "to_out" and i + 1 < len(parts) and parts[i + 1] == "0":
            out.append("to_out")
            i += 2
            continue
        out.append(p)
        i += 1
    return out


def _convert_leaf(path: List[str], name: str, value: np.ndarray):
    """Map one (module path, param name, tensor) to (leaf key, array)."""
    if name == "weight":
        if value.ndim == 4:  # conv OIHW -> HWIO
            return "kernel", np.transpose(value, (2, 3, 1, 0))
        if value.ndim == 2:  # linear / embedding
            if path and path[-1] in ("token_embedding", "position_embedding"):
                return "embedding", value
            return "kernel", np.transpose(value, (1, 0))
        return "scale", value  # 1-D norm weight
    if name == "bias":
        return "bias", value
    return name, value


def _convert_lora_leaf(which: str, value: np.ndarray):
    if value.ndim == 4:
        v = np.transpose(value, (2, 3, 1, 0))  # [r,in,kh,kw]->[kh,kw,in,r] etc.
    else:
        v = np.transpose(value, (1, 0))
    return which, v


def _insert(tree: Dict[str, Any], path: List[str], leaf_key: str, value: np.ndarray):
    node = tree
    for p in path:
        key = int(p) if p.isdigit() else p
        node = node.setdefault(key, {})
    node[leaf_key] = jnp.asarray(value)


def _listify(node):
    """Convert {0: ..., 1: ...} int-keyed dicts (list containers) to lists.

    Only CONTIGUOUS 0..n-1 keys become a list; a sparse int-keyed dict (a
    partial overlay touching e.g. only up_blocks.2) stays a dict so indices
    survive — apply_lora_only_checkpoint's merge handles both shapes.
    """
    if isinstance(node, dict):
        if node and all(isinstance(k, int) for k in node):
            if set(node) == set(range(len(node))):
                return [_listify(node[k]) for k in sorted(node)]
            return {k: _listify(v) for k, v in node.items()}
        return {k: _listify(v) for k, v in node.items()}
    return node


def convert_state_dict(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """Convert a flat torch state dict (single network) to a param tree."""
    tree: Dict[str, Any] = {}
    for key, tensor in sd.items():
        value = _to_numpy(tensor)
        parts = key.split(".")
        name = parts[-1]
        if name not in ("weight", "bias"):
            continue  # skip num_batches_tracked etc.
        # peft lora leaves: ...lora_A.<adapter>.weight
        if len(parts) >= 3 and parts[-3] in ("lora_A", "lora_B"):
            module_path = _normalize_key(".".join(parts[:-3]))
            which = parts[-3]
            leaf_key, v = _convert_lora_leaf(which, value)
            _insert(tree, module_path, leaf_key, v)
            continue
        if len(parts) >= 2 and parts[-2] in ("lora_A", "lora_B"):
            # adapter-name-free variant
            module_path = _normalize_key(".".join(parts[:-2]))
            leaf_key, v = _convert_lora_leaf(parts[-2], value)
            _insert(tree, module_path, leaf_key, v)
            continue
        module_path = _normalize_key(".".join(parts[:-1]))
        if module_path is None:
            continue
        leaf_key, v = _convert_leaf(module_path, name, value)
        _insert(tree, module_path, leaf_key, v)
    return _listify(tree)


def split_full_checkpoint(state_dict: Mapping[str, Any]) -> Dict[str, Dict[str, Any]]:
    """Split a FULL FaceReplaceModel state dict into per-network dicts.

    Strips ``net.`` / ``module.`` prefixes like FaceReplaceModel.set_network
    (face_replace_model.py:27-40), then groups by the four networks + text
    encoder.
    """
    groups: Dict[str, Dict[str, Any]] = {}
    for key, v in state_dict.items():
        k = key
        for prefix in ("net.", "module."):
            while k.startswith(prefix):
                k = k[len(prefix):]
        for net in ("original_unet", "original_vae", "text_encoder", "unet", "vae"):
            if k.startswith(net + "."):
                groups.setdefault(net, {})[k[len(net) + 1 :]] = v
                break
    return groups


def convert_full_checkpoint(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """FULL checkpoint state dict -> {unet, vae, original_unet, original_vae,
    text_encoder} param trees."""
    return {net: convert_state_dict(sd) for net, sd in split_full_checkpoint(state_dict).items()}


def apply_lora_only_checkpoint(
    base_tree: Dict[str, Any],
    lora_sd: Optional[Mapping[str, Any]] = None,
    *,
    overlay: Optional[Dict[str, Any]] = None,
) -> Dict[str, Any]:
    """Overlay a LoRA-only state dict (state_dict_unet/state_dict_vae entries,
    pix2pix_turbo.py:351-352: keys containing 'lora' or 'conv_in'/'skip') onto
    a base param tree converted from sd-turbo / sd-vae weights. Accepts either
    the raw torch dict (``lora_sd``) or an already-converted tree
    (``overlay=``, as returned inside load_torch_checkpoint)."""
    if overlay is None:
        overlay = convert_state_dict(lora_sd or {})

    def merge(base, over):
        if over is None:
            return base
        if isinstance(over, dict):
            if isinstance(base, list):
                # sparse int-keyed overlay onto a list container
                out = list(base)
                for k, v in over.items():
                    idx = int(k)
                    if idx < len(out):
                        out[idx] = merge(out[idx], v)
                    else:
                        out.extend([{}] * (idx + 1 - len(out)))
                        out[idx] = merge({}, v)
                return out
            out = dict(base) if isinstance(base, dict) else {}
            for k, v in over.items():
                out[k] = merge(out.get(k), v)
            return out
        if isinstance(over, list):
            base = base if isinstance(base, list) else [None] * len(over)
            return [merge(b, o) for b, o in zip(base, over)]
        return over

    return merge(base_tree, overlay)


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """torch.load a reference checkpoint file (CPU) and convert.

    Returns {"format": "full"|"lora_only", "params": {...}, "meta": {...}}.
    """
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    if "state_dict" in raw:
        params = convert_full_checkpoint(raw["state_dict"])
        return {"format": "full", "params": params, "meta": {"cfg": raw.get("cfg")}}
    if "state_dict_unet" in raw:
        return {
            "format": "lora_only",
            "params": {
                "unet_overlay": convert_state_dict(raw["state_dict_unet"]),
                "vae_overlay": convert_state_dict(raw.get("state_dict_vae") or {}),
            },
            "meta": {
                "rank_unet": raw.get("rank_unet"),
                "rank_vae": raw.get("rank_vae"),
                "unet_lora_target_modules": raw.get("unet_lora_target_modules"),
                "vae_lora_target_modules": raw.get("vae_lora_target_modules"),
                "unet_lora_scaling": lora_scaling_for_loaded(raw.get("rank_unet") or 8),
                "vae_lora_scaling": lora_scaling_for_loaded(raw.get("rank_vae") or 4),
            },
        }
    raise ValueError("unrecognized checkpoint schema")


# ---------------------------------------------------------------------------
# reverse direction (JAX tree -> torch-style flat dict); used by tests and to
# export checkpoints back to the reference format.
# ---------------------------------------------------------------------------


def tree_to_torch_state_dict(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}

    def emit(path: str, leaf_key: str, v: np.ndarray):
        name = path
        if leaf_key == "kernel":
            if v.ndim == 4:
                out[f"{name}.weight"] = np.transpose(v, (3, 2, 0, 1))
            else:
                out[f"{name}.weight"] = np.transpose(v, (1, 0))
        elif leaf_key == "scale":
            out[f"{name}.weight"] = v
        elif leaf_key == "embedding":
            out[f"{name}.weight"] = v
        elif leaf_key in ("lora_A", "lora_B"):
            if v.ndim == 4:
                out[f"{name}.{leaf_key}.default.weight"] = np.transpose(v, (3, 2, 0, 1))
            else:
                out[f"{name}.{leaf_key}.default.weight"] = np.transpose(v, (1, 0))
        else:
            out[f"{name}.{leaf_key}"] = v

    def walk(node, path: str):
        if isinstance(node, dict):
            leaves = {k for k in node if k in ("kernel", "bias", "scale", "embedding", "lora_A", "lora_B")}
            for k in node:
                tname = _torch_name(k)
                if k in leaves:
                    emit(path, k, np.asarray(node[k]))
                else:
                    walk(node[k], f"{path}.{tname}" if path else tname)
        elif isinstance(node, list):
            for i, v in enumerate(node):
                walk(v, f"{path}.{i}")

    def _torch_name(k: str) -> str:
        if k == "net_0_proj":
            return "net.0.proj"
        if k == "net_2":
            return "net.2"
        if k == "to_out":
            return "to_out.0"
        return k

    walk(tree, prefix.rstrip("."))
    return out


def export_lora_only_checkpoint(
    params: Dict[str, Any],
    path: str,
    *,
    rank_unet: int,
    rank_vae: int,
    unet_targets: Optional[List[str]] = None,
    vae_targets: Optional[List[str]] = None,
) -> None:
    """Write a reference-schema LoRA-only checkpoint
    (Pix2Pix_Turbo.save_model, pix2pix_turbo.py:345-353): LoRA leaves +
    unet conv_in + vae skip convs in peft key format, loadable by the
    reference code (and by our ``load_torch_checkpoint``)."""
    import torch

    from instantrestore_tpu.models.lora import UNET_LORA_TARGETS, VAE_LORA_TARGETS

    def filt(sd: Dict[str, np.ndarray], keep_substr) -> Dict[str, Any]:
        return {
            k: torch.from_numpy(np.asarray(v).copy())
            for k, v in sd.items()
            if any(s in k for s in keep_substr)
        }

    unet_sd = tree_to_torch_state_dict(params["unet"])
    vae_sd = tree_to_torch_state_dict(params["vae"])
    payload = {
        "unet_lora_target_modules": list(unet_targets or UNET_LORA_TARGETS),
        "vae_lora_target_modules": list(vae_targets or VAE_LORA_TARGETS),
        "rank_unet": rank_unet,
        "rank_vae": rank_vae,
        "state_dict_unet": filt(unet_sd, ("lora", "conv_in")),
        "state_dict_vae": filt(vae_sd, ("lora", "skip")),
    }
    torch.save(payload, path)
