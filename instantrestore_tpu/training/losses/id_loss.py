"""Identity loss: ArcFace IR-SE-50 cosine similarity on aligned face crops.

Re-implements the reference's ID loss stack in JAX
(/root/reference/face_replace/training/criteria/id_loss.py:13-89):

  1. 5-point facial landmarks -> least-squares similarity transform to the
     canonical ArcFace template (matlab_cp2tform semantics: non-reflective
     and reflective solutions, pick the lower residual) — host-side numpy.
  2. differentiable 112x112 warp of the prediction (kornia warp_affine
     equivalent) — JAX bilinear sampling, gradients flow to the generator.
  3. frozen IR-SE-50 embedding, loss = 1 - cos(pred, target).

TPU note on detection: the reference runs MTCNN per step (not TPU-friendly
and facenet_pytorch is not a dependency here). Landmarks are supplied by the
caller — from the dataset's landmark files, an external detector, or None
for the whole-image fallback; samples without landmarks are excluded from
the loss exactly like the reference's invalid_indices (:70-80).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from instantrestore_tpu.ops.primitives import conv2d, dense

# canonical 112x112 ArcFace template (id_loss.py:42-48)
ARCFACE_REFERENCE_POINTS = np.array(
    [
        [38.29459953, 51.69630051],
        [72.53179932, 51.50139999],
        [56.02519989, 71.73660278],
        [41.54930115, 92.3655014],
        [70.72990036, 92.20410156],
    ],
    np.float32,
)

# 3-point template (left eye, right eye, mouth center = mean of the template
# mouth corners) for datasets that carry eye/mouth landmarks but not the full
# MTCNN 5-point set (the reference extracts 5 points per step with MTCNN,
# criteria/utils.py:35-63; a 3-point similarity fit is the TPU-friendly
# dataset-side equivalent)
ARCFACE_REFERENCE_POINTS_3 = np.stack(
    [
        ARCFACE_REFERENCE_POINTS[0],
        ARCFACE_REFERENCE_POINTS[1],
        ARCFACE_REFERENCE_POINTS[3:5].mean(axis=0),
    ]
).astype(np.float32)

IR50_BLOCKS = [(64, 64, 3), (64, 128, 4), (128, 256, 14), (256, 512, 3)]


# ---------------------------------------------------------------------------
# similarity transform (host-side numpy; matlab cp2tform semantics)
# ---------------------------------------------------------------------------


def _nonreflective_similarity(uv: np.ndarray, xy: np.ndarray) -> np.ndarray:
    """matlab cp2tform semantics: LSQ-fit the similarity mapping xy -> uv,
    then invert — NOT a direct uv -> xy fit (the two differ whenever the fit
    is inexact). Returns 2x3 mapping uv -> xy, cv2 convention."""
    n = xy.shape[0]
    x, y = xy[:, 0], xy[:, 1]
    u, v = uv[:, 0], uv[:, 1]
    # fit [u; v] = A(sc, ss, tx, ty) applied to (x, y):
    #   u = sc*x - ss*y + tx ; v = ss*x + sc*y + ty
    A = np.zeros((2 * n, 4), np.float64)
    A[:n, 0], A[:n, 1], A[:n, 2] = x, -y, 1.0
    A[n:, 0], A[n:, 1], A[n:, 3] = y, x, 1.0
    b = np.concatenate([u, v])
    sol, *_ = np.linalg.lstsq(A, b, rcond=None)
    sc, ss, tx, ty = sol
    t_inv = np.array([[sc, -ss, tx], [ss, sc, ty], [0.0, 0.0, 1.0]])  # xy -> uv
    t = np.linalg.inv(t_inv)
    return t[:2].astype(np.float32)


def similarity_transform(src_pts: np.ndarray, dst_pts: np.ndarray,
                         reflective: bool = True) -> np.ndarray:
    """cv2-style 2x3 similarity mapping src_pts -> dst_pts; tries the
    reflected solution too and keeps the lower-error one (cp2tform)."""
    src = np.asarray(src_pts, np.float64)
    dst = np.asarray(dst_pts, np.float64)
    t1 = _nonreflective_similarity(src, dst)
    if not reflective:
        return t1

    # solve against x-mirrored target, then mirror back
    dst_m = dst.copy()
    dst_m[:, 0] = -dst_m[:, 0]
    t2m = _nonreflective_similarity(src, dst_m)
    t2 = t2m.copy()
    t2[0, :] = -t2[0, :]

    def err(t):
        ones = np.ones((src.shape[0], 1))
        mapped = np.hstack([src, ones]) @ t.T
        return np.linalg.norm(mapped - dst)

    return t1 if err(t1) <= err(t2) else t2


def alignment_transforms(
    landmarks: List[Optional[np.ndarray]], output_size: int = 112,
    ref_points: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-sample 2x3 transforms + validity mask from landmark points
    (criteria/utils.py:35-63: identity transform and invalid flag when
    detection failed). ``ref_points`` defaults to the 5-pt ArcFace template;
    pass ARCFACE_REFERENCE_POINTS_3 for eye/eye/mouth-center landmarks."""
    mats, valid = [], []
    base = ARCFACE_REFERENCE_POINTS if ref_points is None else ref_points
    ref = base / 112.0 * output_size
    for lm in landmarks:
        if lm is None:
            mats.append(np.eye(2, 3, dtype=np.float32))
            valid.append(False)
        else:
            mats.append(similarity_transform(np.asarray(lm, np.float32), ref))
            valid.append(True)
    return np.stack(mats).astype(np.float32), np.asarray(valid)


def detector_alignment_mats(
    detect_fn, images_pm1: np.ndarray, output_size: int = 112
) -> Tuple[np.ndarray, np.ndarray]:
    """Detector-based alignment: the reference's per-step MTCNN path
    (criteria/utils.py:35-63) — detect 5-pt landmarks on each image, solve
    cp2tform to the ArcFace template; identity mat + invalid flag on
    detection failure.

    ``detect_fn``: uint8 [H,W,3] -> [5,2] landmark points or None (e.g. the
    in-repo cascade via ``data.mtcnn.landmark_detector(params)``). Host-side
    — intended for validation/logging cadence; the per-step training path
    uses the dataset-precomputed alignment (PARITY.md 'ID alignment')."""
    pts = []
    for im in np.asarray(images_pm1):
        u8 = ((np.clip(im, -1.0, 1.0) + 1.0) * 127.5).astype(np.uint8)
        pts.append(detect_fn(u8))
    return alignment_transforms(pts, output_size=output_size)


# ---------------------------------------------------------------------------
# differentiable warp (JAX)
# ---------------------------------------------------------------------------


def warp_affine(images: jnp.ndarray, mats: jnp.ndarray, out_size: int) -> jnp.ndarray:
    """kornia-equivalent warp: ``mats`` [B,2,3] maps SRC pixel coords to DST;
    output[y,x] bilinearly samples src at M^{-1}(x,y), zero padding.
    images: [B, H, W, C] -> [B, out, out, C]; differentiable in images."""
    b = images.shape[0]
    # invert the affine: [a b tx; c d ty]
    a, bb, tx = mats[:, 0, 0], mats[:, 0, 1], mats[:, 0, 2]
    c, d, ty = mats[:, 1, 0], mats[:, 1, 1], mats[:, 1, 2]
    det = a * d - bb * c
    ia, ib = d / det, -bb / det
    ic, id_ = -c / det, a / det
    itx = -(ia * tx + ib * ty)
    ity = -(ic * tx + id_ * ty)

    ys, xs = jnp.meshgrid(
        jnp.arange(out_size, dtype=jnp.float32),
        jnp.arange(out_size, dtype=jnp.float32),
        indexing="ij",
    )
    # src coords per batch: [B, out, out]
    sx = ia[:, None, None] * xs + ib[:, None, None] * ys + itx[:, None, None]
    sy = ic[:, None, None] * xs + id_[:, None, None] * ys + ity[:, None, None]

    h, w = images.shape[1:3]
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx = sx - x0
    wy = sy - y0

    def gather(yi, xi):
        inside = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        vals = jax.vmap(lambda img, yy, xx: img[yy, xx])(images, yc, xc)
        return vals * inside[..., None].astype(images.dtype)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    wx = wx[..., None].astype(images.dtype)
    wy = wy[..., None].astype(images.dtype)
    return (
        v00 * (1 - wx) * (1 - wy)
        + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy
        + v11 * wx * wy
    )


# ---------------------------------------------------------------------------
# IR-SE-50 backbone (inference-mode, frozen)
# ---------------------------------------------------------------------------


def _bn(p, x, eps=1e-5):
    xf = x.astype(jnp.float32)
    inv = jax.lax.rsqrt(p["var"].astype(jnp.float32) + eps)
    out = (xf - p["mean"]) * inv * p["scale"] + p["bias"]
    return out.astype(x.dtype)


def _prelu(p, x):
    alpha = p["alpha"].astype(x.dtype)
    return jnp.where(x >= 0, x, alpha * x)


def _se(p, x):
    pooled = x.mean(axis=(1, 2), keepdims=True)
    h = jax.nn.relu(conv2d(p["fc1"], pooled, padding=0))
    s = jax.nn.sigmoid(conv2d(p["fc2"], h, padding=0))
    return x * s


def _bottleneck(p, x, stride: int):
    if p.get("shortcut") is None:
        shortcut = x if stride == 1 else x[:, ::stride, ::stride, :]
    else:
        shortcut = _bn(p["shortcut"]["bn"], conv2d(p["shortcut"]["conv"], x, stride=stride, padding=0))
    h = _bn(p["res"]["bn1"], x)
    h = conv2d(p["res"]["conv1"], h, stride=1, padding=1)
    h = _prelu(p["res"]["prelu"], h)
    h = conv2d(p["res"]["conv2"], h, stride=stride, padding=1)
    h = _bn(p["res"]["bn2"], h)
    h = _se(p["res"]["se"], h)
    return h + shortcut


def arcface_apply(params: Dict[str, Any], x: jnp.ndarray) -> jnp.ndarray:
    """x: [B, 112, 112, 3] in [-1, 1] -> l2-normalized embeddings [B, 512]."""
    h = conv2d(params["input"]["conv"], x, padding=1)
    h = _bn(params["input"]["bn"], h)
    h = _prelu(params["input"]["prelu"], h)
    strides = []
    for in_c, depth, units in IR50_BLOCKS:
        strides += [2] + [1] * (units - 1)
    for bp, s in zip(params["body"], strides):
        h = _bottleneck(bp, h, s)
    h = _bn(params["output"]["bn2d"], h)
    # torch flattens NCHW: match by moving channels first
    b = h.shape[0]
    flat = h.transpose(0, 3, 1, 2).reshape(b, -1)
    emb = dense(params["output"]["linear"], flat)
    emb = _bn1d(params["output"]["bn1d"], emb)
    norm = jnp.linalg.norm(emb.astype(jnp.float32), axis=1, keepdims=True)
    return (emb / norm.astype(emb.dtype)).astype(jnp.float32)


def _bn1d(p, x, eps=1e-5):
    xf = x.astype(jnp.float32)
    inv = jax.lax.rsqrt(p["var"].astype(jnp.float32) + eps)
    out = (xf - p["mean"]) * inv
    if "scale" in p:
        out = out * p["scale"] + p["bias"]
    return out.astype(x.dtype)


def init_arcface_params(key, dtype=jnp.float32) -> Dict[str, Any]:
    """Random-init IR-SE-50 tree (tests; real weights via convert)."""
    keys = iter(jax.random.split(key, 512))
    from instantrestore_tpu.ops.primitives import init_conv2d, init_dense

    def bn(c):
        return {
            "scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype),
            "mean": jnp.zeros((c,), dtype), "var": jnp.ones((c,), dtype),
        }

    params = {
        "input": {
            "conv": {"kernel": init_conv2d(next(keys), 3, 64, 3, bias=False)["kernel"]},
            "bn": bn(64),
            "prelu": {"alpha": jnp.full((64,), 0.25, dtype)},
        },
        "body": [],
        "output": {
            "bn2d": bn(512),
            "linear": init_dense(next(keys), 512 * 7 * 7, 512),
            "bn1d": {"mean": jnp.zeros((512,), dtype), "var": jnp.ones((512,), dtype),
                     "scale": jnp.ones((512,), dtype), "bias": jnp.zeros((512,), dtype)},
        },
    }
    for in_c, depth, units in IR50_BLOCKS:
        for u in range(units):
            ic = in_c if u == 0 else depth
            block = {
                "shortcut": None
                if ic == depth
                else {
                    "conv": {"kernel": init_conv2d(next(keys), ic, depth, 1, bias=False)["kernel"]},
                    "bn": bn(depth),
                },
                "res": {
                    "bn1": bn(ic),
                    "conv1": {"kernel": init_conv2d(next(keys), ic, depth, 3, bias=False)["kernel"]},
                    "prelu": {"alpha": jnp.full((depth,), 0.25, dtype)},
                    "conv2": {"kernel": init_conv2d(next(keys), depth, depth, 3, bias=False)["kernel"]},
                    "bn2": bn(depth),
                    "se": {
                        "fc1": {"kernel": init_conv2d(next(keys), depth, depth // 16, 1, bias=False)["kernel"]},
                        "fc2": {"kernel": init_conv2d(next(keys), depth // 16, depth, 1, bias=False)["kernel"]},
                    },
                },
            }
            params["body"].append(block)
    return params


def convert_arcface_params(sd: Dict[str, Any]) -> Dict[str, Any]:
    """torch IR-SE-50 state dict (model_ir_se50.pth schema) -> param tree."""

    def np_(t):
        return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)

    def conv(prefix):
        return {"kernel": jnp.asarray(np_(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0))}

    def bn(prefix):
        return {
            "scale": jnp.asarray(np_(sd[f"{prefix}.weight"])),
            "bias": jnp.asarray(np_(sd[f"{prefix}.bias"])),
            "mean": jnp.asarray(np_(sd[f"{prefix}.running_mean"])),
            "var": jnp.asarray(np_(sd[f"{prefix}.running_var"])),
        }

    params = {
        "input": {
            "conv": conv("input_layer.0"),
            "bn": bn("input_layer.1"),
            "prelu": {"alpha": jnp.asarray(np_(sd["input_layer.2.weight"]))},
        },
        "body": [],
        "output": {},
    }
    i = 0
    while f"body.{i}.res_layer.1.weight" in sd:
        has_shortcut = f"body.{i}.shortcut_layer.0.weight" in sd
        params["body"].append(
            {
                "shortcut": {
                    "conv": conv(f"body.{i}.shortcut_layer.0"),
                    "bn": bn(f"body.{i}.shortcut_layer.1"),
                }
                if has_shortcut
                else None,
                "res": {
                    "bn1": bn(f"body.{i}.res_layer.0"),
                    "conv1": conv(f"body.{i}.res_layer.1"),
                    "prelu": {"alpha": jnp.asarray(np_(sd[f"body.{i}.res_layer.2.weight"]))},
                    "conv2": conv(f"body.{i}.res_layer.3"),
                    "bn2": bn(f"body.{i}.res_layer.4"),
                    "se": {
                        "fc1": conv(f"body.{i}.res_layer.5.fc1"),
                        "fc2": conv(f"body.{i}.res_layer.5.fc2"),
                    },
                },
            }
        )
        i += 1
    params["output"] = {
        "bn2d": bn("output_layer.0"),
        "linear": {
            "kernel": jnp.asarray(np_(sd["output_layer.3.weight"]).transpose(1, 0)),
            "bias": jnp.asarray(np_(sd["output_layer.3.bias"])),
        },
        "bn1d": {
            "mean": jnp.asarray(np_(sd["output_layer.4.running_mean"])),
            "var": jnp.asarray(np_(sd["output_layer.4.running_var"])),
            **(
                {
                    "scale": jnp.asarray(np_(sd["output_layer.4.weight"])),
                    "bias": jnp.asarray(np_(sd["output_layer.4.bias"])),
                }
                if "output_layer.4.weight" in sd
                else {}
            ),
        },
    }
    return params


# ---------------------------------------------------------------------------
# the loss
# ---------------------------------------------------------------------------


def id_loss(
    arcface_params: Dict[str, Any],
    pred: jnp.ndarray,
    target: jnp.ndarray,
    pred_mats: jnp.ndarray,
    target_mats: jnp.ndarray,
    valid: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(loss, mean similarity): 1 - cos over valid samples (id_loss.py:82-89).

    ``*_mats`` [B,2,3] from ``alignment_transforms``; target features are
    stop-gradiented like the reference's no_grad target branch.
    """
    pred_crop = warp_affine(pred.astype(jnp.float32), pred_mats, 112)
    target_crop = warp_affine(target.astype(jnp.float32), target_mats, 112)
    pred_feats = arcface_apply(arcface_params, pred_crop)
    target_feats = jax.lax.stop_gradient(arcface_apply(arcface_params, target_crop))
    sims = jnp.einsum("bi,bi->b", pred_feats, target_feats)
    validf = valid.astype(jnp.float32)
    denom = jnp.maximum(validf.sum(), 1.0)
    loss = ((1.0 - sims) * validf).sum() / denom
    sim = (sims * validf).sum() / denom
    # all-invalid batch -> zero loss (reference returns 0.0)
    any_valid = (validf.sum() > 0).astype(jnp.float32)
    return loss * any_valid, sim * any_valid


def id_loss_whole_image(
    arcface_params: Dict[str, Any],
    pred: jnp.ndarray,
    target: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Detection-free ID loss: area-resize both images to 112 and compare
    embeddings — the reference's effective behavior when MTCNN finds no face
    on pre-cropped training data (AdaptiveAvgPool2d path, id_loss.py:36,52);
    the TPU-friendly default when no alignment is supplied."""
    b = pred.shape[0]

    def pool112(x):
        return jax.image.resize(
            x.astype(jnp.float32), (b, 112, 112, x.shape[-1]), "linear", antialias=True
        )

    pred_feats = arcface_apply(arcface_params, pool112(pred))
    target_feats = jax.lax.stop_gradient(arcface_apply(arcface_params, pool112(target)))
    sims = jnp.einsum("bi,bi->b", pred_feats, target_feats)
    return (1.0 - sims).mean(), sims.mean()
