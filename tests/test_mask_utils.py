"""Mask-augmentation utilities (re-specified missing-source mask_utils,
SURVEY.md §2.5)."""

import numpy as np

from instantrestore_tpu.data import mask_utils as mu


def _disk(res=64, r=18):
    yy, xx = np.mgrid[:res, :res]
    return ((yy - res // 2) ** 2 + (xx - res // 2) ** 2) <= r * r


def test_outward_normals_point_away_from_centroid():
    t = np.linspace(0, 2 * np.pi, 64, endpoint=False)
    verts = np.stack([32 + 10 * np.cos(t), 32 + 10 * np.sin(t)], axis=1)
    normals = mu.compute_outward_normals(verts)
    np.testing.assert_allclose(np.linalg.norm(normals, axis=1), 1.0, atol=1e-9)
    center = verts.mean(axis=0)
    dots = ((verts - center) * normals).sum(axis=1)
    assert (dots > 0).all()


def test_smooth_shifts_are_smoother_than_raw():
    rng = np.random.default_rng(0)
    s = mu.generate_smooth_shifts(256, -5, 5, smoothness_factor=15, rng=rng)
    raw = np.random.default_rng(0).uniform(-5, 5, 256)
    assert np.abs(np.diff(s)).mean() < np.abs(np.diff(raw)).mean()


def test_get_vertices_recovers_contour():
    verts = mu.get_vertices(_disk())
    assert len(verts) == 1
    v = verts[0]
    d = np.linalg.norm(v - np.array([32, 32]), axis=1)
    np.testing.assert_allclose(d.mean(), 18, atol=1.5)


def test_augmented_mask_perturbs_but_preserves_scale():
    rng = np.random.default_rng(1)
    mask = _disk()
    aug = mu.get_augmented_mask(mask, -0.06, 0.06, smoothness_factor=5, rng=rng)
    assert aug.dtype == bool and aug.shape == mask.shape
    inter = (aug & mask).sum()
    union = (aug | mask).sum()
    iou = inter / union
    assert 0.6 < iou < 1.0  # perturbed, not destroyed
    assert (aug != mask).sum() > 0


def test_shift_points_clip_to_image():
    verts = np.array([[0.0, 0.0], [63.0, 0.0], [63.0, 63.0], [0.0, 63.0]])
    out = mu.shift_points_smoothly(
        verts, (64, 64), 0.2, 0.3, rng=np.random.default_rng(2)
    )
    assert (out >= 0).all() and (out <= 63).all()


def test_recolor_enclosed_regions():
    m = np.zeros((64, 64), np.uint8)
    m[10:50, 10:50] = 1
    m[25:35, 25:35] = 0  # hole enclosed by outer_value
    out = mu.recolor_enclosed_regions(m, outer_value=1, inner_value=2)
    assert (out[27:33, 27:33] == 2).all()
    assert out[0, 0] == 0


def test_draw_landmarks_scales_with_image():
    img = np.zeros((128, 128, 3), np.uint8)
    out = mu.draw_landmarks_on_image(img, [(256.0, 256.0)], reference_size=512)
    ys, xs = np.nonzero(out.sum(axis=2))
    assert abs(ys.mean() - 64) < 3 and abs(xs.mean() - 64) < 3
