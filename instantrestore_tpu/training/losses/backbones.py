"""Frozen conv encoder backbones for the vision-aided GAN discriminator.

The reference's Discriminator supports, beyond the ViT family, three conv
backbones (/root/reference/face_replace/training/vision_aided_loss/
cv_discriminator.py:94-195 + cvmodel.py / face_normals.py / face_parsing.py).
With the shipped ``output_type='conv_multi_level'`` each one is consumed as a
pure *feature extractor* — only the encoder runs:

* ``face_normals`` — ResNet18 encoder of the boukhayma/face_normals
  ResNetUNet (face_normals.py:68-84 ``get_feat=True`` returns ``layer4``):
  area-resize 256, input mapped to [0, 1], features [B, 8, 8, 512] ->
  SimpleD(512, out_size=4).
* ``face_seg`` — encoder ("center") of the CelebA parsing UNet
  (face_parsing.py:858-918, feature_scale=4): area-resize 256, input stays
  in [-1, 1], center [B, 16, 16, 256] -> AvgPool2 -> SimpleD(256,
  out_size=4) (Parsing.__call__ 'conv' branch :967-968).

BatchNorm layers run in eval mode in the reference (frozen backbone), i.e.
they are per-channel affines using running statistics; parameters here carry
{scale, bias, mean, var} and ``_bn_eval`` applies the folded transform.
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-5


def _bn_eval(p, x):
    inv = jax.lax.rsqrt(p["var"].astype(jnp.float32) + BN_EPS)
    scale = (p["scale"] * inv).astype(x.dtype)
    bias = (p["bias"] - p["mean"] * p["scale"] * inv).astype(x.dtype)
    return x * scale + bias


def _conv(p, x, stride=1, padding=0):
    return jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), (stride, stride),
        [(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + (p["bias"].astype(x.dtype) if "bias" in p else 0.0)


def _init_conv(key, cin, cout, k, bias=True):
    fan = cin * k * k
    p = {"kernel": jax.random.normal(key, (k, k, cin, cout)) * (2.0 / fan) ** 0.5}
    if bias:
        p["bias"] = jnp.zeros((cout,))
    return p


def _init_bn(c):
    return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,)),
            "mean": jnp.zeros((c,)), "var": jnp.ones((c,))}


def _maxpool(x, k, stride, padding):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, stride, stride, 1),
        [(0, 0), (padding, padding), (padding, padding), (0, 0)],
    )


# ---------------------------------------------------------------------------
# ResNet18 encoder (face_normals backbone trunk; torchvision layout)
# ---------------------------------------------------------------------------

_RESNET18_STAGES = [(64, 1), (128, 2), (256, 2), (512, 2)]  # (width, stride)


def init_resnet18(key) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 64))
    params: Dict[str, Any] = {
        "conv1": _init_conv(next(keys), 3, 64, 7, bias=False),
        "bn1": _init_bn(64),
        "layers": [],
    }
    cin = 64
    for width, stride in _RESNET18_STAGES:
        blocks = []
        for b in range(2):
            s = stride if b == 0 else 1
            blk = {
                "conv1": _init_conv(next(keys), cin, width, 3, bias=False),
                "bn1": _init_bn(width),
                "conv2": _init_conv(next(keys), width, width, 3, bias=False),
                "bn2": _init_bn(width),
            }
            if s != 1 or cin != width:
                blk["down_conv"] = _init_conv(next(keys), cin, width, 1, bias=False)
                blk["down_bn"] = _init_bn(width)
            blocks.append(blk)
            cin = width
        params["layers"].append(blocks)
    return params


def resnet18_features(params: Dict[str, Any], x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, 3] -> layer4 features [B, H/32, W/32, 512]."""
    h = _conv(params["conv1"], x, stride=2, padding=3)
    h = jax.nn.relu(_bn_eval(params["bn1"], h))
    h = _maxpool(h, 3, 2, 1)
    for stage, (_, stride) in zip(params["layers"], _RESNET18_STAGES):
        for b, blk in enumerate(stage):
            s = stride if b == 0 else 1
            idn = h
            o = jax.nn.relu(_bn_eval(blk["bn1"], _conv(blk["conv1"], h, stride=s, padding=1)))
            o = _bn_eval(blk["bn2"], _conv(blk["conv2"], o, padding=1))
            if "down_conv" in blk:
                idn = _bn_eval(blk["down_bn"], _conv(blk["down_conv"], h, stride=s))
            h = jax.nn.relu(o + idn)
    return h


def face_normals_features(params: Dict[str, Any], x_pm1: jnp.ndarray) -> jnp.ndarray:
    """Normals.__call__ 'conv' branch (face_normals.py:191-195): area-resize
    256, [0,1] input, encoder layer4 -> [B, 8, 8, 512]."""
    b = x_pm1.shape[0]
    x = jax.image.resize(x_pm1.astype(jnp.float32), (b, 256, 256, 3), method="linear")
    return resnet18_features(params, x * 0.5 + 0.5)


def convert_resnet18(sd: Dict[str, Any], prefix: str = "") -> Dict[str, Any]:
    """torchvision resnet18 state dict (optionally nested under ``prefix``,
    e.g. the face_normals ckpt's base_model) -> param tree."""

    def np_(t):
        return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)

    def conv(name):
        return {"kernel": jnp.asarray(np_(sd[prefix + name]).transpose(2, 3, 1, 0))}

    def bn(name):
        return {
            "scale": jnp.asarray(np_(sd[f"{prefix}{name}.weight"])),
            "bias": jnp.asarray(np_(sd[f"{prefix}{name}.bias"])),
            "mean": jnp.asarray(np_(sd[f"{prefix}{name}.running_mean"])),
            "var": jnp.asarray(np_(sd[f"{prefix}{name}.running_var"])),
        }

    params = {"conv1": conv("conv1.weight"), "bn1": bn("bn1"), "layers": []}
    for li in range(1, 5):
        blocks = []
        for b in range(2):
            base = f"layer{li}.{b}"
            blk = {
                "conv1": conv(f"{base}.conv1.weight"),
                "bn1": bn(f"{base}.bn1"),
                "conv2": conv(f"{base}.conv2.weight"),
                "bn2": bn(f"{base}.bn2"),
            }
            if f"{prefix}{base}.downsample.0.weight" in sd:
                blk["down_conv"] = conv(f"{base}.downsample.0.weight")
                blk["down_bn"] = bn(f"{base}.downsample.1")
            blocks.append(blk)
        params["layers"].append(blocks)
    return params


# ---------------------------------------------------------------------------
# CelebA parsing UNet encoder (face_seg backbone trunk)
# ---------------------------------------------------------------------------

_PARSING_FILTERS = [16, 32, 64, 128, 256]  # [64,128,256,512,1024] / feature_scale 4


def init_parsing_unet(key) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 24))
    stages: List[Dict[str, Any]] = []
    cin = 3
    for width in _PARSING_FILTERS:
        stages.append({
            "conv1": _init_conv(next(keys), cin, width, 3),
            "bn1": _init_bn(width),
            "conv2": _init_conv(next(keys), width, width, 3),
            "bn2": _init_bn(width),
        })
        cin = width
    return {"stages": stages}


def parsing_unet_center(params: Dict[str, Any], x: jnp.ndarray) -> jnp.ndarray:
    """unet.forward(..., get_feat=True) (face_parsing.py:901-917): four
    conv-bn-relu x2 + maxpool stages then the center block ->
    [B, H/16, W/16, 256]."""
    h = x
    n = len(params["stages"])
    for i, st in enumerate(params["stages"]):
        h = jax.nn.relu(_bn_eval(st["bn1"], _conv(st["conv1"], h, padding=1)))
        h = jax.nn.relu(_bn_eval(st["bn2"], _conv(st["conv2"], h, padding=1)))
        if i < n - 1:
            h = _maxpool(h, 2, 2, 0)
    return h


def face_seg_features(params: Dict[str, Any], x_pm1: jnp.ndarray) -> jnp.ndarray:
    """Parsing.__call__ 'conv' branch (face_parsing.py:967-968): area-resize
    256 (input stays [-1,1]), center features, AvgPool2 -> [B, 8, 8, 256]."""
    b = x_pm1.shape[0]
    x = jax.image.resize(x_pm1.astype(jnp.float32), (b, 256, 256, 3), method="linear")
    h = parsing_unet_center(params, x)
    return jax.lax.reduce_window(
        h, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ) * 0.25


def convert_parsing_unet(sd: Dict[str, Any]) -> Dict[str, Any]:
    """CelebA parsing ckpt (face_parsing.py unet naming: convN.convM.K /
    center.convM.K with K 0=conv 1=bn inside each Sequential) -> encoder
    tree."""

    def np_(t):
        return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)

    def pair(mod):
        out = {}
        for j in (1, 2):
            out[f"conv{j}"] = {
                "kernel": jnp.asarray(np_(sd[f"{mod}.conv{j}.0.weight"]).transpose(2, 3, 1, 0)),
                "bias": jnp.asarray(np_(sd[f"{mod}.conv{j}.0.bias"])),
            }
            out[f"bn{j}"] = {
                "scale": jnp.asarray(np_(sd[f"{mod}.conv{j}.1.weight"])),
                "bias": jnp.asarray(np_(sd[f"{mod}.conv{j}.1.bias"])),
                "mean": jnp.asarray(np_(sd[f"{mod}.conv{j}.1.running_mean"])),
                "var": jnp.asarray(np_(sd[f"{mod}.conv{j}.1.running_var"])),
            }
        return out

    stages = [pair(f"conv{i}") for i in range(1, 5)] + [pair("center")]
    return {"stages": stages}
