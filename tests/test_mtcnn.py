"""MTCNN cascade (data/mtcnn.py): nets, NMS, flow, converter, integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instantrestore_tpu.data import mtcnn


@pytest.mark.slow  # >20 s on the 1-CPU CI box (measured round 5)
def test_net_shapes():
    p = mtcnn.init_mtcnn_params(jax.random.PRNGKey(0))
    # PNet fully convolutional: 12x12 -> 1x1 map
    probs, reg = mtcnn.pnet_apply(p["pnet"], jnp.zeros((1, 12, 12, 3)))
    assert probs.shape == (1, 1, 1) and reg.shape == (1, 1, 1, 4)
    probs, reg = mtcnn.pnet_apply(p["pnet"], jnp.zeros((1, 100, 60, 3)))
    assert probs.shape[1] > 40 and reg.shape[-1] == 4
    pr, rr = mtcnn.rnet_apply(p["rnet"], jnp.zeros((5, 24, 24, 3)))
    assert pr.shape == (5,) and rr.shape == (5, 4)
    po, ro, lo = mtcnn.onet_apply(p["onet"], jnp.zeros((5, 48, 48, 3)))
    assert po.shape == (5,) and ro.shape == (5, 4) and lo.shape == (5, 10)
    # probabilities are softmaxed
    assert float(jnp.max(po)) <= 1.0 and float(jnp.min(po)) >= 0.0


def test_nms_union_and_min():
    boxes = np.array([
        [0, 0, 10, 10],
        [1, 1, 11, 11],    # IoU ~0.68 with box 0
        [50, 50, 60, 60],  # disjoint
    ], np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    keep = mtcnn.nms(boxes, scores, 0.5)
    assert list(keep) == [0, 2]
    keep = mtcnn.nms(boxes, scores, 0.9)  # loose threshold keeps all
    assert list(keep) == [0, 1, 2]
    # 'min' method: small box fully inside a big one -> overlap/min = 1
    boxes2 = np.array([[0, 0, 100, 100], [10, 10, 20, 20]], np.float32)
    keep = mtcnn.nms(boxes2, np.array([0.9, 0.8]), 0.5, method="min")
    assert list(keep) == [0]
    assert mtcnn.nms(np.empty((0, 4)), np.empty((0,)), 0.5).size == 0


def test_rerec_and_reg():
    b = np.array([[0.0, 0.0, 20.0, 10.0]])
    sq = mtcnn._rerec(b)
    assert np.allclose(sq, [[0, -5, 20, 15]])
    reg = np.array([[0.1, 0.1, -0.1, -0.1]])
    out = mtcnn._apply_reg(b, reg)
    # offsets scale with box width/height
    assert np.allclose(out, [[2.0, 1.0, 18.0, 9.0]])


def test_detect_faces_flow(rng):
    """Random weights: the cascade must run the full pyramid without crashing
    and return consistent shapes (possibly zero detections)."""
    p = mtcnn.init_mtcnn_params(jax.random.PRNGKey(0))
    img = (rng.uniform(0, 255, (96, 80, 3))).astype(np.uint8)
    boxes, scores, points = mtcnn.detect_faces(p, img, min_size=20)
    assert boxes.ndim == 2 and boxes.shape[1] == 4
    assert len(boxes) == len(scores) == len(points)
    if len(points):
        assert points.shape[1:] == (5, 2)


def test_default_detector_with_canonical_face(rng):
    from instantrestore_tpu.data.canonical_face import CanonicalFaceProcess
    from PIL import Image

    p = mtcnn.init_mtcnn_params(jax.random.PRNGKey(0))
    det = mtcnn.default_detector(p)
    proc = CanonicalFaceProcess(detector=det, output_size=64)
    img = Image.fromarray(rng.uniform(0, 255, (96, 96, 3)).astype(np.uint8))
    out = proc(img)
    assert out["image"].size == (64, 64)  # detector or center-crop fallback


def test_convert_mtcnn_params_layout(rng):
    def conv_sd(cin, cout, k):
        return (rng.normal(size=(cout, cin, k, k)).astype(np.float32),
                np.zeros(cout, np.float32))

    def fill(sd, name, cin, cout, k):
        w, b = conv_sd(cin, cout, k)
        sd[f"{name}.weight"] = w
        sd[f"{name}.bias"] = b

    pnet = {}
    for name, (ci, co, k) in {
        "conv1": (3, 10, 3), "conv2": (10, 16, 3), "conv3": (16, 32, 3),
        "conv4_1": (32, 2, 1), "conv4_2": (32, 4, 1),
    }.items():
        fill(pnet, name, ci, co, k)
    for name, c in {"prelu1": 10, "prelu2": 16, "prelu3": 32}.items():
        pnet[f"{name}.weight"] = np.full((c,), 0.25, np.float32)

    rnet = {}
    for name, (ci, co, k) in {
        "conv1": (3, 28, 3), "conv2": (28, 48, 3), "conv3": (48, 64, 2),
    }.items():
        fill(rnet, name, ci, co, k)
    for name, (ci, co) in {"dense4": (576, 128), "dense5_1": (128, 2),
                           "dense5_2": (128, 4)}.items():
        rnet[f"{name}.weight"] = rng.normal(size=(co, ci)).astype(np.float32)
        rnet[f"{name}.bias"] = np.zeros(co, np.float32)
    for name, c in {"prelu1": 28, "prelu2": 48, "prelu3": 64, "prelu4": 128}.items():
        rnet[f"{name}.weight"] = np.full((c,), 0.25, np.float32)

    onet = {}
    for name, (ci, co, k) in {
        "conv1": (3, 32, 3), "conv2": (32, 64, 3), "conv3": (64, 64, 3),
        "conv4": (64, 128, 2),
    }.items():
        fill(onet, name, ci, co, k)
    for name, (ci, co) in {"dense5": (1152, 256), "dense6_1": (256, 2),
                           "dense6_2": (256, 4), "dense6_3": (256, 10)}.items():
        onet[f"{name}.weight"] = rng.normal(size=(co, ci)).astype(np.float32)
        onet[f"{name}.bias"] = np.zeros(co, np.float32)
    for name, c in {"prelu1": 32, "prelu2": 64, "prelu3": 64, "prelu4": 128,
                    "prelu5": 256}.items():
        onet[f"{name}.weight"] = np.full((c,), 0.25, np.float32)

    params = mtcnn.convert_mtcnn_params(pnet, rnet, onet)
    probs, reg = mtcnn.pnet_apply(params["pnet"], jnp.zeros((1, 12, 12, 3)))
    assert probs.shape == (1, 1, 1)
    pr, rr = mtcnn.rnet_apply(params["rnet"], jnp.zeros((2, 24, 24, 3)))
    assert pr.shape == (2,)
    po, ro, lo = mtcnn.onet_apply(params["onet"], jnp.zeros((2, 48, 48, 3)))
    assert lo.shape == (2, 10)
