"""LoRA attachment and trainable-parameter masking over param trees.

Replicates peft's behavior as the reference uses it
(/root/reference/face_replace/models/pix2pix_turbo.py:109-188) without any
module surgery: walking the param tree, a dense/conv param dict whose
diffusers-style dotted name matches a target module (peft rule: name equals
the target or ends with ".<target>") gains ``lora_A``/``lora_B`` leaves.

Shipped target lists (pix2pix_turbo.py:151-156,171-174):
  UNet: to_k, to_q, to_v, to_out.0, conv, conv1, conv2, conv_shortcut,
        conv_out, proj_in, proj_out, ff.net.2, ff.net.0.proj
  VAE:  conv1, conv2, conv_in, conv_shortcut, conv, conv_out,
        to_k, to_q, to_v, to_out.0 (+ skip_conv_1..4 when use_shortcuts)

Init: "gaussian" (normal std 1/r) for A, zeros for B; effective scaling
alpha/r with alpha = r // 2 at training time (:158-161,175-178) — note the
load-time quirk documented in utils/torch_convert.py.

Trainables (set_train, pix2pix_turbo.py:200-221): lora leaves everywhere,
plus the UNet's full conv_in, plus VAE skip convs.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from instantrestore_tpu.ops.primitives import add_lora_conv, add_lora_dense

UNET_LORA_TARGETS = (
    "to_k", "to_q", "to_v", "to_out.0", "conv", "conv1", "conv2",
    "conv_shortcut", "conv_out", "proj_in", "proj_out", "ff.net.2",
    "ff.net.0.proj",
)
VAE_LORA_TARGETS = (
    "conv1", "conv2", "conv_in", "conv_shortcut", "conv", "conv_out",
    "to_k", "to_q", "to_v", "to_out.0",
)
VAE_SHORTCUT_TARGETS = VAE_LORA_TARGETS + (
    "skip_conv_1", "skip_conv_2", "skip_conv_3", "skip_conv_4",
)


def _torch_name(key) -> str:
    if key == "net_0_proj":
        return "net.0.proj"
    if key == "net_2":
        return "net.2"
    if key == "to_out":
        return "to_out.0"
    return str(key)


def _matches(name: str, targets: Sequence[str]) -> bool:
    return any(name == t or name.endswith("." + t) for t in targets)


def _is_param_dict(node) -> bool:
    return isinstance(node, dict) and "kernel" in node


def attach_lora(
    params: Dict[str, Any],
    key: jax.Array,
    rank: int,
    targets: Sequence[str],
    *,
    exclude: Sequence[str] = (),
) -> Dict[str, Any]:
    """Return a copy of ``params`` with LoRA factors on matching modules.

    ``exclude`` lists dotted names to skip even if matched (e.g. the UNet's
    top-level ``conv_in`` is fully finetuned rather than LoRA'd — it is not
    in the UNet target list, but VAE target 'conv' etc. are broad).
    """
    counter = [0]

    def walk(node, name: str):
        if _is_param_dict(node):
            if _matches(name, targets) and not _matches(name, exclude) and "lora_A" not in node:
                counter[0] += 1
                sub = jax.random.fold_in(key, counter[0])
                if node["kernel"].ndim == 4:
                    return add_lora_conv(node, sub, rank)
                return add_lora_dense(node, sub, rank)
            return node
        if isinstance(node, dict):
            return {
                k: walk(v, f"{name}.{_torch_name(k)}" if name else _torch_name(k))
                for k, v in node.items()
            }
        if isinstance(node, list):
            return [walk(v, f"{name}.{i}") for i, v in enumerate(node)]
        return node

    return walk(params, "")


def merge_lora(params: Any, scaling: float) -> Any:
    """Fold LoRA factors into the base kernels (inference-time optimization).

    Dense: W += scaling * A @ B. Conv: the composition of the kxk A-conv
    (in->r) and the 1x1 B-conv (r->out) is exactly a kxk conv with kernel
    einsum('hwir,ro->hwio', A, B[0,0]) — no padding interaction because B is
    1x1. Eliminates the ~25% extra conv FLOPs the factored path costs at
    rank 32; returns a tree without lora leaves.
    """
    if isinstance(params, dict):
        if "lora_A" in params and "kernel" in params:
            a, b = params["lora_A"], params["lora_B"]
            if params["kernel"].ndim == 4:
                delta = jnp.einsum("hwir,ro->hwio", a, b[0, 0])
            else:
                delta = a @ b
            out = {
                k: v for k, v in params.items() if k not in ("lora_A", "lora_B")
            }
            out["kernel"] = params["kernel"] + scaling * delta.astype(params["kernel"].dtype)
            return out
        return {k: merge_lora(v, scaling) for k, v in params.items()}
    if isinstance(params, list):
        return [merge_lora(v, scaling) for v in params]
    return params


def strip_lora(params: Any) -> Any:
    """View of the tree without LoRA leaves (the frozen 'original' network).

    Pure dict re-nesting: shares the underlying arrays/tracers, so using it
    inside jit costs nothing.
    """
    if isinstance(params, dict):
        return {k: strip_lora(v) for k, v in params.items() if k not in ("lora_A", "lora_B")}
    if isinstance(params, list):
        return [strip_lora(v) for v in params]
    return params


def trainable_mask(
    params: Dict[str, Any],
    *,
    extra_trainable: Sequence[str] = (),
) -> Any:
    """Bool pytree: True for lora leaves and modules whose dotted name
    matches ``extra_trainable`` (e.g. ("conv_in",) for the UNet,
    ("skip_conv_1", ..., ) for the VAE decoder)."""

    def walk(node, name: str):
        if isinstance(node, dict):
            full_train = _matches(name, extra_trainable)
            return {
                k: (
                    True
                    if k in ("lora_A", "lora_B")
                    else (
                        full_train
                        if not isinstance(v, (dict, list))
                        else walk(v, f"{name}.{_torch_name(k)}" if name else _torch_name(k))
                    )
                )
                for k, v in node.items()
            }
        if isinstance(node, list):
            return [walk(v, f"{name}.{i}") for i, v in enumerate(node)]
        return _matches(name, extra_trainable)

    return walk(params, "")


def count_lora_params(params: Any) -> int:
    total = [0]

    def walk(node):
        if isinstance(node, dict):
            for k, v in node.items():
                if k in ("lora_A", "lora_B"):
                    total[0] += v.size
                else:
                    walk(v)
        elif isinstance(node, list):
            for v in node:
                walk(v)

    walk(params)
    return total[0]


def attach_faceid(params: Dict[str, Any], key: jax.Array, cross_dim: int = 1024,
                  embed_dim: int = 512) -> Dict[str, Any]:
    """Add FaceID projections to every cross-attention (attn2) module
    (FaceIDAttnProcessor, attn_processors.py:100-112: face_projection
    Linear(512 -> cross_dim) with bias, to_k/to_v_face_embed bias-free).
    These are trainable when condition_on_face_embeds is on
    (pix2pix_turbo.py:218-221)."""
    from instantrestore_tpu.ops.primitives import init_dense

    counter = [0]

    def walk(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if k == "attn2" and isinstance(v, dict) and "to_q" in v:
                    counter[0] += 1
                    sub = jax.random.fold_in(key, counter[0])
                    k1, k2, k3 = jax.random.split(sub, 3)
                    hidden = v["to_q"]["kernel"].shape[1]
                    v = dict(v)
                    v["face_projection"] = init_dense(k1, embed_dim, cross_dim)
                    v["to_k_face_embed"] = init_dense(k2, cross_dim, hidden, bias=False)
                    v["to_v_face_embed"] = init_dense(k3, cross_dim, hidden, bias=False)
                out[k] = walk(v) if k != "attn2" else v
            return out
        if isinstance(node, list):
            return [walk(v) for v in node]
        return node

    return walk(params)
