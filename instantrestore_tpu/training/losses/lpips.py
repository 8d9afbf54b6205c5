"""LPIPS (v0.1, VGG16 trunk) in JAX.

Functional twin of the vendored LPIPS the reference trains with
(/root/reference/face_replace/training/criteria/lpips/lpips.py:25, weights
at criteria/lpips/weights/v0.1/vgg.pth; lambda_lpips=5.0 in every shipped
config): fixed input scaling, VGG16 features at relu{1_2,2_2,3_3,4_3,5_3},
channel-unit-normalization, squared difference, learned 1x1 linear heads,
spatial average, sum over layers.

Weights come from torchvision's vgg16 state dict + the LPIPS linear-head
state dict via ``convert_lpips_params`` (no torch import at runtime here).
Random-init params are provided for tests and for environments without the
pretrained files (the metric is then meaningless but the graph is identical).
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from instantrestore_tpu.ops.primitives import conv2d, init_conv2d

# VGG16 conv plan up to relu5_3: (out_channels, [convs per stage])
VGG_STAGES = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]
LIN_CHANNELS = [64, 128, 256, 512, 512]

# lpips.LPIPS ScalingLayer constants
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def init_lpips_params(key) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 32))
    vgg: List[List[dict]] = []
    in_ch = 3
    for out_ch, n_convs in VGG_STAGES:
        stage = []
        for _ in range(n_convs):
            stage.append(init_conv2d(next(keys), in_ch, out_ch, 3))
            in_ch = out_ch
        vgg.append(stage)
    lins = [
        {"kernel": jnp.abs(jax.random.normal(next(keys), (1, 1, c, 1))) * 0.01}
        for c in LIN_CHANNELS
    ]
    return {"vgg": vgg, "lins": lins}


def _vgg_features(params, x: jnp.ndarray) -> List[jnp.ndarray]:
    """Features after the last ReLU of each stage; max-pool between stages."""
    feats = []
    for si, stage in enumerate(params["vgg"]):
        for conv in stage:
            x = jax.nn.relu(conv2d(conv, x))
        feats.append(x)
        if si < len(params["vgg"]) - 1:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
    return feats


def _unit_normalize(x: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    norm = jnp.sqrt(jnp.sum(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True))
    return x / (norm + eps).astype(x.dtype)


def lpips(params, img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """img1/img2 [B, H, W, 3] in [-1, 1] -> per-sample LPIPS distance [B].

    Computation in fp32 throughout (the reference calls net_lpips on .float()
    tensors, coach.py:582).
    """
    shift = jnp.asarray(_SHIFT)
    scale = jnp.asarray(_SCALE)
    x1 = (img1.astype(jnp.float32) - shift) / scale
    x2 = (img2.astype(jnp.float32) - shift) / scale
    f1 = _vgg_features(params, x1)
    f2 = _vgg_features(params, x2)
    total = 0.0
    for a, b, lin in zip(f1, f2, params["lins"]):
        diff = (_unit_normalize(a) - _unit_normalize(b)) ** 2
        val = conv2d({"kernel": lin["kernel"]}, diff, padding=0)  # 1x1, no bias
        total = total + val.mean(axis=(1, 2, 3))
    return total


# ---------------------------------------------------------------------------
# weight conversion (host-side; takes state dicts as numpy mappings)
# ---------------------------------------------------------------------------

# torchvision vgg16 'features' indices of the conv layers per stage
_TV_CONV_IDX = [[0, 2], [5, 7], [10, 12, 14], [17, 19, 21], [24, 26, 28]]


def convert_lpips_params(vgg_sd: Dict[str, Any], lin_sd: Dict[str, Any]) -> Dict[str, Any]:
    """torchvision vgg16 state dict + LPIPS v0.1 linear state dict -> params.

    lin_sd keys look like 'lin0.model.1.weight' ([1, C, 1, 1]).
    """

    def np_(t):
        return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)

    vgg = []
    for stage_idx, conv_ids in enumerate(_TV_CONV_IDX):
        stage = []
        for ci in conv_ids:
            w = np_(vgg_sd[f"features.{ci}.weight"])  # OIHW
            b = np_(vgg_sd[f"features.{ci}.bias"])
            stage.append(
                {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0)), "bias": jnp.asarray(b)}
            )
        vgg.append(stage)
    lins = []
    for i in range(5):
        key = f"lin{i}.model.1.weight"
        if key not in lin_sd:
            key = f"lins.{i}.model.1.weight"
        w = np_(lin_sd[key])  # [1, C, 1, 1]
        lins.append({"kernel": jnp.asarray(w.transpose(2, 3, 1, 0))})
    return {"vgg": vgg, "lins": lins}
