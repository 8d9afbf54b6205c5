"""MTCNN face detection (Zhang et al. 2016) — pure numpy/JAX re-implementation.

The reference depends on facenet_pytorch's MTCNN in two places:
  * ID loss landmark extraction per training step
    (/root/reference/face_replace/training/criteria/utils.py:35-63 —
    ``mtcnn.detect(images, landmarks=True)`` then a 5-point similarity warp)
  * the missing-source ``CanonicalFaceProcess`` preprocessing
    (inference/canonical_face_handler.py, insightface detector).

This module provides the standard three-stage cascade: an image pyramid over
PNet (fully-convolutional 12x12 proposal net), RNet (24x24 refinement) and
ONet (48x48 output net with 5-point landmarks), with bounding-box regression,
square re-rectification and NMS between stages. The convnets run as jitted
JAX functions; the pyramid/NMS glue is host-side numpy (data-prep path, not
the serving hot path). Weights convert from the facenet_pytorch state dict
layout via ``convert_mtcnn_params`` (the env ships no pretrained file — the
cascade is architecture- and flow-complete, weights load when supplied).

``default_detector(params)`` adapts the cascade to the
``data/canonical_face.py`` Detector interface.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# networks (facenet_pytorch layer plan; PReLU activations)
# ---------------------------------------------------------------------------


def _prelu(p, x):
    a = p.astype(x.dtype)
    return jnp.where(x >= 0, x, a * x)


def _conv(p, x, stride=1):
    return jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), (stride, stride), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["bias"].astype(x.dtype)


def _maxpool_ceil(x, k, stride):
    """MaxPool with ceil_mode=True (torch): right/bottom pad with -inf."""
    b, h, w, c = x.shape
    ph = (-(h - k) % stride) if h > k else 0
    pw = (-(w - k) % stride) if w > k else 0
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, stride, stride, 1),
        [(0, 0), (0, ph), (0, pw), (0, 0)],
    )


def _init_conv(key, cin, cout, k):
    return {
        "kernel": jax.random.normal(key, (k, k, cin, cout)) * (2.0 / (cin * k * k)) ** 0.5,
        "bias": jnp.zeros((cout,)),
    }


def _init_dense(key, cin, cout):
    return {"kernel": jax.random.normal(key, (cin, cout)) * cin ** -0.5,
            "bias": jnp.zeros((cout,))}


def init_mtcnn_params(key) -> Dict[str, Any]:
    k = iter(jax.random.split(key, 32))
    p: Dict[str, Any] = {
        "pnet": {
            "conv1": _init_conv(next(k), 3, 10, 3), "prelu1": jnp.full((10,), 0.25),
            "conv2": _init_conv(next(k), 10, 16, 3), "prelu2": jnp.full((16,), 0.25),
            "conv3": _init_conv(next(k), 16, 32, 3), "prelu3": jnp.full((32,), 0.25),
            "conv4_1": _init_conv(next(k), 32, 2, 1),   # face probs
            "conv4_2": _init_conv(next(k), 32, 4, 1),   # bbox regression
        },
        "rnet": {
            "conv1": _init_conv(next(k), 3, 28, 3), "prelu1": jnp.full((28,), 0.25),
            "conv2": _init_conv(next(k), 28, 48, 3), "prelu2": jnp.full((48,), 0.25),
            "conv3": _init_conv(next(k), 48, 64, 2), "prelu3": jnp.full((64,), 0.25),
            "dense4": _init_dense(next(k), 576, 128), "prelu4": jnp.full((128,), 0.25),
            "dense5_1": _init_dense(next(k), 128, 2),
            "dense5_2": _init_dense(next(k), 128, 4),
        },
        "onet": {
            "conv1": _init_conv(next(k), 3, 32, 3), "prelu1": jnp.full((32,), 0.25),
            "conv2": _init_conv(next(k), 32, 64, 3), "prelu2": jnp.full((64,), 0.25),
            "conv3": _init_conv(next(k), 64, 64, 3), "prelu3": jnp.full((64,), 0.25),
            "conv4": _init_conv(next(k), 64, 128, 2), "prelu4": jnp.full((128,), 0.25),
            "dense5": _init_dense(next(k), 1152, 256), "prelu5": jnp.full((256,), 0.25),
            "dense6_1": _init_dense(next(k), 256, 2),
            "dense6_2": _init_dense(next(k), 256, 4),
            "dense6_3": _init_dense(next(k), 256, 10),  # 5-pt landmarks
        },
    }
    return p


def pnet_apply(p, x):
    """x [B, H, W, 3] normalized -> (probs [B, H', W'], reg [B, H', W', 4]);
    fully convolutional, effective stride 2 / cell 12."""
    h = _prelu(p["prelu1"], _conv(p["conv1"], x))
    h = _maxpool_ceil(h, 2, 2)
    h = _prelu(p["prelu2"], _conv(p["conv2"], h))
    h = _prelu(p["prelu3"], _conv(p["conv3"], h))
    probs = jax.nn.softmax(_conv(p["conv4_1"], h), axis=-1)[..., 1]
    reg = _conv(p["conv4_2"], h)
    return probs, reg


def rnet_apply(p, x):
    """x [B, 24, 24, 3] -> (probs [B], reg [B, 4])."""
    h = _prelu(p["prelu1"], _conv(p["conv1"], x))
    h = _maxpool_ceil(h, 3, 2)
    h = _prelu(p["prelu2"], _conv(p["conv2"], h))
    h = _maxpool_ceil(h, 3, 2)
    h = _prelu(p["prelu3"], _conv(p["conv3"], h))
    # facenet_pytorch flattens after permute(0, 3, 2, 1) — (N, W, H, C)
    # order — so converted dense kernels expect that layout
    h = h.transpose(0, 2, 1, 3).reshape(h.shape[0], -1)
    h = _prelu(p["prelu4"], h @ p["dense4"]["kernel"] + p["dense4"]["bias"])
    probs = jax.nn.softmax(h @ p["dense5_1"]["kernel"] + p["dense5_1"]["bias"], -1)[:, 1]
    reg = h @ p["dense5_2"]["kernel"] + p["dense5_2"]["bias"]
    return probs, reg


def onet_apply(p, x):
    """x [B, 48, 48, 3] -> (probs [B], reg [B, 4], landmarks [B, 10])."""
    h = _prelu(p["prelu1"], _conv(p["conv1"], x))
    h = _maxpool_ceil(h, 3, 2)
    h = _prelu(p["prelu2"], _conv(p["conv2"], h))
    h = _maxpool_ceil(h, 3, 2)
    h = _prelu(p["prelu3"], _conv(p["conv3"], h))
    h = _maxpool_ceil(h, 2, 2)
    h = _prelu(p["prelu4"], _conv(p["conv4"], h))
    # same (N, W, H, C) flatten order as RNet
    h = h.transpose(0, 2, 1, 3).reshape(h.shape[0], -1)
    h = _prelu(p["prelu5"], h @ p["dense5"]["kernel"] + p["dense5"]["bias"])
    probs = jax.nn.softmax(h @ p["dense6_1"]["kernel"] + p["dense6_1"]["bias"], -1)[:, 1]
    reg = h @ p["dense6_2"]["kernel"] + p["dense6_2"]["bias"]
    lmk = h @ p["dense6_3"]["kernel"] + p["dense6_3"]["bias"]
    return probs, reg, lmk


# ---------------------------------------------------------------------------
# cascade glue (host-side numpy, data-prep path)
# ---------------------------------------------------------------------------


def nms(boxes: np.ndarray, scores: np.ndarray, threshold: float,
        method: str = "union") -> np.ndarray:
    """Greedy NMS; method 'union' = IoU, 'min' = overlap / min-area
    (the cascade's final stage uses 'min')."""
    if len(boxes) == 0:
        return np.empty((0,), np.int64)
    x0, y0, x1, y1 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = np.maximum(x1 - x0, 0) * np.maximum(y1 - y0, 0)
    order = scores.argsort()[::-1]
    keep = []
    while order.size:
        i = order[0]
        keep.append(i)
        rest = order[1:]
        ix0 = np.maximum(x0[i], x0[rest])
        iy0 = np.maximum(y0[i], y0[rest])
        ix1 = np.minimum(x1[i], x1[rest])
        iy1 = np.minimum(y1[i], y1[rest])
        inter = np.maximum(ix1 - ix0, 0) * np.maximum(iy1 - iy0, 0)
        if method == "min":
            o = inter / np.maximum(np.minimum(area[i], area[rest]), 1e-9)
        else:
            o = inter / np.maximum(area[i] + area[rest] - inter, 1e-9)
        order = rest[o <= threshold]
    return np.asarray(keep, np.int64)


def _rerec(boxes: np.ndarray) -> np.ndarray:
    """Square boxes around their centers (the cascade crops squares)."""
    w = boxes[:, 2] - boxes[:, 0]
    h = boxes[:, 3] - boxes[:, 1]
    side = np.maximum(w, h)
    out = boxes.copy()
    out[:, 0] += w / 2 - side / 2
    out[:, 1] += h / 2 - side / 2
    out[:, 2] = out[:, 0] + side
    out[:, 3] = out[:, 1] + side
    return out


def _apply_reg(boxes: np.ndarray, reg: np.ndarray) -> np.ndarray:
    w = (boxes[:, 2] - boxes[:, 0])[:, None]
    h = (boxes[:, 3] - boxes[:, 1])[:, None]
    return boxes[:, :4] + reg * np.concatenate([w, h, w, h], 1)


def _bilinear_resize(patch: np.ndarray, sh: int, sw: int) -> np.ndarray:
    yi = np.linspace(0, patch.shape[0] - 1, sh)
    xi = np.linspace(0, patch.shape[1] - 1, sw)
    y_lo = yi.astype(int); x_lo = xi.astype(int)
    y_hi = np.minimum(y_lo + 1, patch.shape[0] - 1)
    x_hi = np.minimum(x_lo + 1, patch.shape[1] - 1)
    wy = (yi - y_lo)[:, None, None]
    wx = (xi - x_lo)[None, :, None]
    return (
        patch[y_lo][:, x_lo] * (1 - wy) * (1 - wx)
        + patch[y_lo][:, x_hi] * (1 - wy) * wx
        + patch[y_hi][:, x_lo] * wy * (1 - wx)
        + patch[y_hi][:, x_hi] * wy * wx
    )


def _crop_resize(img: np.ndarray, boxes: np.ndarray, size: int) -> np.ndarray:
    """Gather square crops (zero-padded at borders) resized to size x size
    with bilinear sampling."""
    hh, ww = img.shape[:2]
    out = np.zeros((len(boxes), size, size, 3), np.float32)
    for i, (x0, y0, x1, y1) in enumerate(boxes[:, :4].astype(int)):
        x0c, y0c = max(x0, 0), max(y0, 0)
        x1c, y1c = min(x1, ww), min(y1, hh)
        if x1c <= x0c or y1c <= y0c:
            continue
        patch = np.zeros((y1 - y0, x1 - x0, 3), np.float32)
        patch[y0c - y0 : y1c - y0, x0c - x0 : x1c - x0] = img[y0c:y1c, x0c:x1c]
        out[i] = _bilinear_resize(patch, size, size)
    return out


def _normalize(x: np.ndarray) -> np.ndarray:
    return (x - 127.5) * (1.0 / 128.0)


def detect_faces(
    params: Dict[str, Any],
    image: np.ndarray,
    *,
    min_size: int = 20,
    thresholds: Tuple[float, float, float] = (0.6, 0.7, 0.7),
    factor: float = 0.709,
    max_proposals: int = 512,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """image uint8 [H, W, 3] -> (boxes [K,4], scores [K], landmarks [K,5,2]).

    Standard three-stage cascade: pyramid PNet proposals -> NMS -> RNet
    refine -> NMS -> ONet score/regress/landmarks -> NMS('min')."""
    img = np.asarray(image, np.float32)
    hh, ww = img.shape[:2]
    m = 12.0 / min_size
    min_dim = min(hh, ww) * m

    # --- stage 1: pyramid PNet ---
    scales = []
    while min_dim >= 12:
        scales.append(m)
        m *= factor
        min_dim *= factor
    all_boxes: List[np.ndarray] = []
    for s in scales:
        sh, sw = int(np.ceil(hh * s)), int(np.ceil(ww * s))
        scaled = _bilinear_resize(img, sh, sw)
        probs, reg = jax.device_get(
            pnet_apply(params["pnet"], jnp.asarray(_normalize(scaled))[None])
        )
        probs, reg = probs[0], reg[0]
        ys, xs = np.where(probs > thresholds[0])
        if len(ys) == 0:
            continue
        score = probs[ys, xs]
        r = reg[ys, xs]
        stride, cell = 2, 12
        b = np.stack([
            (stride * xs + 1) / s, (stride * ys + 1) / s,
            (stride * xs + cell) / s, (stride * ys + cell) / s,
        ], 1).astype(np.float32)
        keep = nms(b, score, 0.5)
        all_boxes.append(np.concatenate(
            [b[keep], score[keep, None], r[keep]], 1))
    if not all_boxes:
        return np.empty((0, 4)), np.empty((0,)), np.empty((0, 5, 2))
    boxes = np.concatenate(all_boxes)
    keep = nms(boxes[:, :4], boxes[:, 4], 0.7)[:max_proposals]
    boxes = boxes[keep]
    b4 = _rerec(_apply_reg(boxes[:, :4], boxes[:, 5:9]))

    # --- stage 2: RNet ---
    crops = _crop_resize(img, b4, 24)
    probs, reg = jax.device_get(rnet_apply(params["rnet"], jnp.asarray(_normalize(crops))))
    sel = probs > thresholds[1]
    if not sel.any():
        return np.empty((0, 4)), np.empty((0,)), np.empty((0, 5, 2))
    b4, probs, reg = b4[sel], probs[sel], reg[sel]
    keep = nms(b4, probs, 0.7)
    b4 = _rerec(_apply_reg(b4[keep], reg[keep]))
    probs = probs[keep]

    # --- stage 3: ONet ---
    crops = _crop_resize(img, b4, 48)
    probs3, reg, lmk = jax.device_get(
        onet_apply(params["onet"], jnp.asarray(_normalize(crops)))
    )
    sel = probs3 > thresholds[2]
    if not sel.any():
        return np.empty((0, 4)), np.empty((0,)), np.empty((0, 5, 2))
    b4, probs3, reg, lmk = b4[sel], probs3[sel], reg[sel], lmk[sel]
    w = (b4[:, 2] - b4[:, 0])[:, None]
    h = (b4[:, 3] - b4[:, 1])[:, None]
    # facenet_pytorch landmark layout: [x1..x5, y1..y5] relative to the box
    lx = b4[:, 0:1] + lmk[:, :5] * w
    ly = b4[:, 1:2] + lmk[:, 5:] * h
    points = np.stack([lx, ly], -1)  # [K, 5, 2]
    b4 = _apply_reg(b4, reg)
    keep = nms(b4, probs3, 0.7, method="min")
    return b4[keep], probs3[keep], points[keep]


def landmark_detector(params: Dict[str, Any], **kwargs):
    """uint8 image -> [5,2] landmarks of the highest-scoring face, or None —
    the detect_fn shape losses/id_loss.py::detector_alignment_mats consumes
    (the reference's extract_faces_and_landmarks picks the largest box,
    criteria/utils.py:43-49; highest score is our equivalent)."""

    def detect(image: np.ndarray):
        boxes, scores, points = detect_faces(params, image, **kwargs)
        if len(boxes) == 0:
            return None
        return points[int(np.argmax(scores))]

    return detect


def default_detector(params: Dict[str, Any], **kwargs):
    """Adapt the cascade to data/canonical_face.py's Detector protocol:
    returns the highest-scoring face or None."""
    from instantrestore_tpu.data.canonical_face import FaceDetection

    def detect(image: np.ndarray) -> Optional[FaceDetection]:
        boxes, scores, points = detect_faces(params, image, **kwargs)
        if len(boxes) == 0:
            return None
        i = int(np.argmax(scores))
        return FaceDetection(bbox=boxes[i], landmarks=points[i])

    return detect


def convert_mtcnn_params(pnet_sd, rnet_sd, onet_sd) -> Dict[str, Any]:
    """facenet_pytorch PNet/RNet/ONet state dicts -> param tree."""

    def np_(t):
        return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)

    def conv(sd, name):
        return {"kernel": jnp.asarray(np_(sd[f"{name}.weight"]).transpose(2, 3, 1, 0)),
                "bias": jnp.asarray(np_(sd[f"{name}.bias"]))}

    def dense(sd, name):
        return {"kernel": jnp.asarray(np_(sd[f"{name}.weight"]).T),
                "bias": jnp.asarray(np_(sd[f"{name}.bias"]))}

    def prelu(sd, name):
        return jnp.asarray(np_(sd[f"{name}.weight"]).reshape(-1))

    return {
        "pnet": {
            "conv1": conv(pnet_sd, "conv1"), "prelu1": prelu(pnet_sd, "prelu1"),
            "conv2": conv(pnet_sd, "conv2"), "prelu2": prelu(pnet_sd, "prelu2"),
            "conv3": conv(pnet_sd, "conv3"), "prelu3": prelu(pnet_sd, "prelu3"),
            "conv4_1": conv(pnet_sd, "conv4_1"), "conv4_2": conv(pnet_sd, "conv4_2"),
        },
        "rnet": {
            "conv1": conv(rnet_sd, "conv1"), "prelu1": prelu(rnet_sd, "prelu1"),
            "conv2": conv(rnet_sd, "conv2"), "prelu2": prelu(rnet_sd, "prelu2"),
            "conv3": conv(rnet_sd, "conv3"), "prelu3": prelu(rnet_sd, "prelu3"),
            "dense4": dense(rnet_sd, "dense4"), "prelu4": prelu(rnet_sd, "prelu4"),
            "dense5_1": dense(rnet_sd, "dense5_1"), "dense5_2": dense(rnet_sd, "dense5_2"),
        },
        "onet": {
            "conv1": conv(onet_sd, "conv1"), "prelu1": prelu(onet_sd, "prelu1"),
            "conv2": conv(onet_sd, "conv2"), "prelu2": prelu(onet_sd, "prelu2"),
            "conv3": conv(onet_sd, "conv3"), "prelu3": prelu(onet_sd, "prelu3"),
            "conv4": conv(onet_sd, "conv4"), "prelu4": prelu(onet_sd, "prelu4"),
            "dense5": dense(onet_sd, "dense5"), "prelu5": prelu(onet_sd, "prelu5"),
            "dense6_1": dense(onet_sd, "dense6_1"),
            "dense6_2": dense(onet_sd, "dense6_2"),
            "dense6_3": dense(onet_sd, "dense6_3"),
        },
    }
