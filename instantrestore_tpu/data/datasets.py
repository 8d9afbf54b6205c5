"""Datasets: identity-folder face-restoration data, host-side, numpy NHWC.

Re-specifies the reference's data layer (restore_dataset.py, plus the
missing-source ``CoachDataset``/``PathsDataset`` described in SURVEY.md §2.5)
without torch:

* ``RestoreDataset``   — train: <root>/<identity>/cropped_images/*, paired
  geometric/color transforms, on-the-fly degradation, 1..N same-identity
  reference sampling padded to N (restore_dataset.py:408-445), optional
  landmark-attention targets / pos-neg reference swaps / facial-component
  masks.
* ``RestoreDatasetTest`` — val: <root>/<identity>/{degraded.png, gt.png,
  conditioning/*} (restore_dataset.py:447-569).
* ``collate``          — stacks to the batch schema the train step consumes
  (conditioning padded to max N + valid_indices, restore_dataset.py:572-628).

Batch schema (numpy float32, NHWC, images in [-1, 1]):
  image [B,512,512,3], gt [B,512,512,3], conditioning_images [B,N,512,512,3],
  valid_indices [B] int32, and optional training extras.
"""

from __future__ import annotations

import dataclasses
import random
import zlib
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

from instantrestore_tpu.data import degradations as deg
from instantrestore_tpu.data.transforms import (
    PairedTestTransform,
    PairedTrainTransform,
    infer_transform,
    normalize_pm1,
    to_float01,
)

IMAGE_SUFFIXES = (".jpg", ".png", ".jpeg")

# (heads, spatial size) of the 9 shared self-attention layers in traversal
# order (restore_dataset.py:71-75)
SHARED_LAYER_STATS = [(20, 16)] * 3 + [(10, 32)] * 3 + [(5, 64)] * 3

PROMPT = "A high-quality photo of a person; professional, 8k"

# Fixed (height, width) of the facial-component crops fed to the adversarial
# terms: the reference crops the bbox of the landmark-derived rect masks
# (coach.py:207-218 over restore_dataset.py:233-263 rects) — away from image
# borders those bboxes are exactly these sizes at 512px. Fixed sizes keep the
# crop a static-shape dynamic_slice under jit; at borders the window is
# shifted inward instead of shrunk (documented divergence).
FACIAL_COMP_SIZES = ((71, 101), (71, 101), (91, 161))  # leye, reye, mouth @512
# (dx, dy) from the landmark center to the window origin, at 512px
FACIAL_COMP_OFFSETS = ((50, 50), (50, 50), (80, 30))


def facial_comp_sizes(resolution: int):
    """FACIAL_COMP_SIZES scaled from the reference's 512px geometry."""
    s = resolution / 512.0
    return tuple(
        (max(2, int(round(h * s))), max(2, int(round(w * s))))
        for h, w in FACIAL_COMP_SIZES
    )


def build_landmark_target(gt_lm, cond_lm, layer: int, resolution: int):
    """Gaussian-splatted GT landmark-correspondence map at one shared layer
    (restore_dataset.py:266-328): for each landmark visible at this layer's
    resolution, splat a gaussian (sigma = size/32) at the conditioning image's
    corresponding position into the query row of the input position.

    Returns (attn [heads, q, q] float32, mask [q] bool). Module-level so the
    collate (and the scan-dispatch Coach) can rebuild per-item maps at a
    BATCH-shared layer — per-sample targets at batch>1, fixing the
    reference's 'works for 1 batch' limitation (coach.py:633)."""
    heads, size = SHARED_LAYER_STATS[layer]
    factor = resolution // size
    sigma = 0.03125 * size
    xs = np.arange(size)
    gx, gy = np.meshgrid(xs, xs, indexing="ij")
    attn = np.zeros((size * size, size * size), np.float32)
    mask = np.zeros(size * size, bool)
    for (x_up, y_up), (cx_up, cy_up) in zip(gt_lm, cond_lm):
        x, y = int(x_up) // factor, int(y_up) // factor
        cx, cy = int(cx_up) // factor, int(cy_up) // factor
        if x >= size or y >= size or cx >= size or cy >= size:
            continue
        pos = y * size + x
        g = np.exp(-((gx - cx) ** 2 + (gy - cy) ** 2) / (2 * sigma ** 2))
        attn[pos] += g.reshape(-1)
        mask[pos] = True
    return attn[None].repeat(heads, 0), mask


class CoachDataset:
    """Base dataset (re-specified from the missing coach_dataset.py):
    ordered path list + shuffle + len."""

    def __init__(self):
        self.paths: List[Path] = []

    def __len__(self):
        return len(self.paths)

    def shuffle(self, seed: Optional[int] = None):
        random.Random(seed).shuffle(self.paths)


class PathsDataset(CoachDataset):
    """Trivial path-list dataset (missing paths_dataset.py equivalent)."""

    def __init__(self, image_paths: Sequence, resolution: int = 512):
        super().__init__()
        self.paths = [Path(p) for p in image_paths]
        self.resolution = resolution

    def __getitem__(self, idx):
        return infer_transform(Image.open(self.paths[idx]), self.resolution)


class RestoreDataset(CoachDataset):
    def __init__(
        self,
        dataset_folder,
        identity_names: Optional[Sequence[str]] = None,
        max_conditioning_images: int = 4,
        resolution: int = 512,
        train_input: bool = True,
        get_gt_attn_probs: bool = False,
        get_attn_pos_reg: bool = False,
        get_attn_neg_reg: bool = False,
        get_facial_comps: bool = False,
        get_id_mats: bool = False,
        return_degradation_params: bool = False,
        seed: int = 0,
    ):
        super().__init__()
        folders = dataset_folder if isinstance(dataset_folder, (list, tuple)) else [dataset_folder]
        self.resolution = resolution
        self.max_cond = max_conditioning_images
        self.train_input = train_input
        self.get_gt_attn_probs = get_gt_attn_probs
        self.get_attn_pos_reg = get_attn_pos_reg
        self.get_attn_neg_reg = get_attn_neg_reg
        self.get_facial_comps = get_facial_comps
        self.get_id_mats = get_id_mats
        self.return_degradation_params = return_degradation_params
        self.joined = PairedTrainTransform(resolution)
        self._seed = seed

        self.identity_dirs: List[Path] = []
        for folder in folders:
            folder = Path(folder)
            for identity in sorted(folder.glob("*")):
                imgs_dir = identity / "cropped_images"
                if not identity.is_dir():
                    continue
                imgs = list(imgs_dir.glob("*"))
                if len(imgs) <= 1:
                    continue
                if get_gt_attn_probs and len(list(identity.glob("new_landmarks/*"))) <= 1:
                    continue
                self.identity_dirs.append(identity)

        self.paths = []
        for identity in self.identity_dirs:
            self.paths += [
                p for p in sorted((identity / "cropped_images").glob("*"))
                if p.suffix.lower() in IMAGE_SUFFIXES
            ]

    # -- reference sampling (restore_dataset.py:408-445) --------------------

    def _sample_refs(self, identity_dir: Path, target: Path, rng: random.Random):
        pool = [
            p for p in sorted((identity_dir / "cropped_images").glob("*"))
            if p != target and p.suffix.lower() in IMAGE_SUFFIXES
        ]
        n = min(len(pool), rng.randint(1, self.max_cond))
        chosen = rng.sample(pool, n)
        images = [Image.open(p).convert("RGB") for p in chosen]
        paths = list(chosen)
        # pad to max by cyclic duplication (the reference's train-time pad
        # constructs a flip transform with p=0.0, i.e. plain duplicates;
        # the test dataset uses p=1.0 — we mirror each behavior)
        full_images, full_paths = list(images), list(paths)
        for i in range(self.max_cond - len(images)):
            idx = i % len(images)
            full_images.append(images[idx])
            full_paths.append(paths[idx])
        return full_images, full_paths, n

    # -- landmark-attention targets (restore_dataset.py:266-328) ------------

    def _landmarks(self, identity_dir: Path, image_path: Path) -> Optional[np.ndarray]:
        f = identity_dir / "new_landmarks" / (image_path.stem + ".npy")
        return np.load(f) if f.exists() else None

    def _gt_attn_probs(self, identity_dir, image_path, cond_paths, layer, cond,
                       rng: random.Random):
        gt_lm = self._landmarks(identity_dir, image_path)
        if gt_lm is None:
            return None
        if self.train_input and cond == 0:
            cond_lm = gt_lm
        else:
            cp = cond_paths[cond - 1 if self.train_input else cond]
            cond_lm = self._landmarks(identity_dir, cp)
            if cond_lm is None:
                return None
        attn, mask = build_landmark_target(gt_lm, cond_lm, layer, self.resolution)
        return attn, mask, layer, cond, gt_lm, cond_lm

    # -- facial component masks (restore_dataset.py:233-263) ----------------

    def _facial_comps(self, identity_dir, image_path):
        """Returns (masks, boxes): three [res,res] bool rect masks (for the
        mask-multiply L2/LPIPS terms, coach.py:682-697) and [3,2] int32 (y0,
        x0) crop origins of the fixed-size windows (FACIAL_COMP_SIZES) for
        the adversarial crop terms (coach.py:243-254,272-286)."""
        lm = self._landmarks(identity_dir, image_path)
        if lm is None:
            return None
        res = self.resolution

        def rect(cx, cy, dx0, dy0, dx1, dy1):
            m = np.zeros((res, res), bool)
            x0, x1 = np.clip([cx + dx0, cx + dx1], 0, res)
            y0, y1 = np.clip([cy + dy0, cy + dy1], 0, res)
            m[y0:y1, x0:x1] = True
            return m

        s = res / 512.0
        lx, ly = int(lm[626][0]), int(lm[626][1])
        rx, ry = int(lm[590][0]), int(lm[590][1])
        mx, my = int(lm[0][0]), int(lm[0][1])
        masks = (
            rect(lx, ly, -int(50 * s), -int(50 * s), int(51 * s), int(21 * s)),
            rect(rx, ry, -int(50 * s), -int(50 * s), int(51 * s), int(21 * s)),
            rect(mx, my, -int(80 * s), -int(30 * s), int(81 * s), int(61 * s)),
        )
        centers = ((lx, ly), (rx, ry), (mx, my))
        sizes = facial_comp_sizes(res)
        boxes = np.zeros((3, 2), np.int32)
        for i, ((cx, cy), (ox, oy), (hh, ww)) in enumerate(
            zip(centers, FACIAL_COMP_OFFSETS, sizes)
        ):
            boxes[i, 0] = np.clip(cy - int(round(oy * s)), 0, res - hh)
            boxes[i, 1] = np.clip(cx - int(round(ox * s)), 0, res - ww)
        return masks, boxes

    # -----------------------------------------------------------------------

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        path = self.paths[idx]
        identity_dir = path.parent.parent
        # stable per-item seed: Python's str hash is randomized PER PROCESS
        # (PYTHONHASHSEED), so hash(path.name) would give every process of a
        # multi-host run — and every re-run — a different degradation stream.
        # crc32 is process-stable, keeping items reproducible across hosts,
        # runs, and resume (the torch reference gets this from worker seeds).
        stable = zlib.crc32(path.name.encode("utf-8"))
        rng = random.Random((hash((self._seed, idx)) ^ stable) & 0x7FFFFFFF)
        nprng = np.random.default_rng(rng.randint(0, 2**31 - 1))

        img = Image.open(path).convert("RGB")
        inp, out = self.joined(img, img.copy(), rng)

        params = deg.sample_degradation_params(nprng)
        degraded = deg.degrade(to_float01(inp), params, resolution=self.resolution)

        refs, ref_paths, n_valid = self._sample_refs(identity_dir, path, rng)

        pos_idx = -1
        if self.get_attn_pos_reg and rng.random() < 0.25:
            pos_idx = rng.randint(0, len(refs) - 1)
            refs[pos_idx] = Image.open(path).convert("RGB")
        neg_idx = -1
        if self.get_attn_neg_reg and rng.random() < 0.25:
            other = rng.randrange(len(self.identity_dirs))
            if self.identity_dirs[other] == identity_dir:
                other = len(self.identity_dirs) - 1 - other
            neg_pool = [
                p for p in sorted((self.identity_dirs[other] / "cropped_images").glob("*"))
                if p.suffix.lower() in IMAGE_SUFFIXES
            ]
            neg_idx = rng.randint(0, len(refs) - 1)
            if neg_idx == pos_idx:
                neg_idx = len(refs) - 1 - pos_idx
            refs[neg_idx] = Image.open(rng.choice(neg_pool)).convert("RGB")

        cond = np.stack([infer_transform(r, self.resolution) for r in refs])

        item: Dict[str, Any] = {
            "image": normalize_pm1(degraded).astype(np.float32),
            "gt": normalize_pm1(to_float01(out)).astype(np.float32),
            "conditioning_images": cond.astype(np.float32),
            "valid_indices": np.int32(n_valid),
            "caption": PROMPT,
            "pos_reg_idx": np.int32(pos_idx),
            "neg_reg_idx": np.int32(neg_idx),
        }
        if self.return_degradation_params:
            item["degradation_params"] = params
        if self.get_gt_attn_probs:
            layer = rng.randint(0, 8)
            cond_max = self.max_cond if self.train_input else self.max_cond - 1
            chosen_cond = rng.randint(0, cond_max)
            item["gt_attn_probs"] = self._gt_attn_probs(
                identity_dir, path, ref_paths, layer, chosen_cond, rng
            )
        if self.get_facial_comps:
            fc = self._facial_comps(identity_dir, path)
            if fc is not None:
                item["facial_comps"], item["facial_comp_boxes"] = fc
            else:
                item["facial_comps"] = None
        if self.get_id_mats:
            # aligned-crop ID loss: a 3-pt (eyes + mouth-center) similarity
            # transform to the ArcFace 112px template from the GT landmarks.
            # The same transform aligns pred and target — input/gt/pred share
            # geometry by construction (the reference instead re-detects with
            # MTCNN per step, criteria/utils.py:35-63).
            from instantrestore_tpu.training.losses.id_loss import (
                ARCFACE_REFERENCE_POINTS_3,
                alignment_transforms,
            )

            lm = self._landmarks(identity_dir, path)
            pts = (
                np.stack([lm[626], lm[590], lm[0]]).astype(np.float32)
                if lm is not None and len(lm) > 626
                else None
            )
            mats, valid = alignment_transforms(
                [pts], ref_points=ARCFACE_REFERENCE_POINTS_3
            )
            item["id_mat"] = mats[0]
            item["id_valid"] = bool(valid[0])
        return item


class RestoreDatasetTest(CoachDataset):
    """Validation/inference layout: <identity>/{degraded.png, gt.png,
    conditioning/*} (restore_dataset.py:447-569); refs padded with
    horizontally-flipped duplicates (test pads flip, :560-566)."""

    def __init__(self, dataset_folder, max_conditioning_images: int = 4,
                 resolution: int = 512):
        super().__init__()
        folders = dataset_folder if isinstance(dataset_folder, (list, tuple)) else [dataset_folder]
        self.resolution = resolution
        self.max_cond = max_conditioning_images
        self.joined = PairedTestTransform(resolution)
        self.paths = []
        for folder in folders:
            for identity in sorted(Path(folder).glob("*")):
                if identity.is_dir() and (identity / "degraded.png").exists():
                    self.paths.append(identity)

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        identity = self.paths[idx]
        degraded = Image.open(identity / "degraded.png").convert("RGB")
        gt_path = identity / "gt.png"
        gt = Image.open(gt_path).convert("RGB") if gt_path.exists() else degraded
        degraded, gt = self.joined(degraded, gt)

        pool = [
            p for p in sorted((identity / "conditioning").glob("*"))
            if p.suffix.lower() in IMAGE_SUFFIXES
        ]
        refs = [Image.open(p).convert("RGB") for p in pool[: self.max_cond]]
        n_valid = len(refs)
        for i in range(self.max_cond - n_valid):
            src = refs[i % n_valid]
            refs.append(
                src.transpose(Image.FLIP_LEFT_RIGHT) if i % 2 == 0 else src.copy()
            )
        cond = np.stack([infer_transform(r, self.resolution) for r in refs])
        return {
            "image": normalize_pm1(to_float01(degraded)).astype(np.float32),
            "gt": normalize_pm1(to_float01(gt)).astype(np.float32),
            "conditioning_images": cond.astype(np.float32),
            "valid_indices": np.int32(n_valid),
            "caption": PROMPT,
            "identity": identity.name,
        }


def collate(items: List[Dict[str, Any]]) -> Dict[str, Any]:
    """Stack a list of items to the batch schema (custom_collate_fn twin)."""
    batch: Dict[str, Any] = {
        "image": np.stack([it["image"] for it in items]),
        "gt": np.stack([it["gt"] for it in items]),
        "conditioning_images": np.stack([it["conditioning_images"] for it in items]),
        "valid_indices": np.asarray([it["valid_indices"] for it in items], np.int32),
        "caption": [it["caption"] for it in items],
    }
    if "pos_reg_idx" in items[0]:
        batch["pos_reg_idx"] = np.asarray([it["pos_reg_idx"] for it in items], np.int32)
        batch["neg_reg_idx"] = np.asarray([it["neg_reg_idx"] for it in items], np.int32)
    if items[0].get("gt_attn_probs") is not None:
        entries = [it.get("gt_attn_probs") for it in items]
        if all(e is not None for e in entries):
            # per-sample targets at ONE batch-shared layer (item 0's sampled
            # layer keeps the reference's per-step layer randomness); items
            # whose own sampled layer differs are re-splatted at the shared
            # layer from their raw landmark coordinates. This fixes the
            # reference's batch=1-only landmark loss (coach.py:633 TODO).
            layer = int(entries[0][2])
            resolution = items[0]["image"].shape[0]
            probs, masks, conds, coords = [], [], [], []
            for p, m, l, c, gt_lm, cond_lm in entries:
                if int(l) != layer:
                    p, m = build_landmark_target(gt_lm, cond_lm, layer, resolution)
                probs.append(p)
                masks.append(m)
                conds.append(c)
                coords.append((gt_lm, cond_lm))
            batch["gt_attn_probs"] = (
                np.stack(probs).astype(np.float32),  # [B, heads, q, q]
                np.stack(masks),                     # [B, q]
                layer,
                np.asarray(conds, np.int32),         # [B]
            )
            # raw coordinates ride along host-side so a scan-dispatch loop
            # can re-splat a whole group of batches at one layer
            batch["landmark_coords"] = coords
    if items[0].get("facial_comps") is not None:
        comps = [it["facial_comps"] for it in items]
        if all(c is not None for c in comps):
            batch["facial_comps"] = tuple(
                np.stack([c[k] for c in comps]) for k in range(3)
            )
            batch["facial_comp_boxes"] = np.stack(
                [it["facial_comp_boxes"] for it in items]
            )
    if "id_mat" in items[0]:
        mats = np.stack([it["id_mat"] for it in items]).astype(np.float32)
        batch["id_mats_pred"] = mats
        batch["id_mats_target"] = mats
        batch["id_valid"] = np.asarray([it["id_valid"] for it in items], bool)
    if "degradation_params" in items[0]:
        ps = [it["degradation_params"] for it in items]
        batch["degradation_params"] = {
            "blur_sigma_x": np.asarray([p.blur_sigma_x for p in ps], np.float32),
            "blur_sigma_y": np.asarray([p.blur_sigma_y for p in ps], np.float32),
            "blur_rotation": np.asarray([p.blur_rotation for p in ps], np.float32),
            "downsample_factor": np.asarray([p.downsample_factor for p in ps], np.int32),
            "noise_sigma": np.asarray([p.noise_sigma for p in ps], np.float32),
            "jpeg_quality": np.asarray([p.jpeg_quality for p in ps], np.int32),
        }
    if "identity" in items[0]:
        batch["identity"] = [it["identity"] for it in items]
    return batch


class PairedDataset(CoachDataset):
    """Debug/augmentations dataset over ``<identity>/canonical_images/*``
    (re-specification of the missing paired_dataset.py, SURVEY.md §2.5;
    selected by dataset_type 'debug'/'augmentations', data_setups.py:14-23).

    Pairs are (input, target) views of the same canonical image with the
    joined transforms applied; references are sampled like RestoreDataset but
    WITHOUT degradation — a pipeline smoke-test dataset.
    """

    def __init__(self, dataset_folder, max_conditioning_images: int = 4,
                 resolution: int = 512, images_subdir: str = "canonical_images",
                 seed: int = 0):
        super().__init__()
        folders = dataset_folder if isinstance(dataset_folder, (list, tuple)) else [dataset_folder]
        self.resolution = resolution
        self.max_cond = max_conditioning_images
        self.joined = PairedTestTransform(resolution)
        self._seed = seed
        self.identity_dirs = []
        for folder in folders:
            for identity in sorted(Path(folder).glob("*")):
                sub = identity / images_subdir
                if identity.is_dir() and len(list(sub.glob("*"))) > 1:
                    self.identity_dirs.append((identity, images_subdir))
        self.paths = []
        for identity, sub in self.identity_dirs:
            self.paths += [
                p for p in sorted((identity / sub).glob("*"))
                if p.suffix.lower() in IMAGE_SUFFIXES
            ]

    def __getitem__(self, idx: int):
        path = self.paths[idx]
        rng = random.Random(hash((self._seed, idx)) & 0x7FFFFFFF)
        img = Image.open(path).convert("RGB")
        inp, out = self.joined(img, img.copy())
        pool = [
            p for p in sorted(path.parent.glob("*"))
            if p != path and p.suffix.lower() in IMAGE_SUFFIXES
        ]
        n = min(len(pool), rng.randint(1, self.max_cond))
        chosen = rng.sample(pool, n)
        refs = [Image.open(p).convert("RGB") for p in chosen]
        for i in range(self.max_cond - n):
            refs.append(refs[i % n])
        cond = np.stack([infer_transform(r, self.resolution) for r in refs])
        return {
            "image": normalize_pm1(to_float01(inp)).astype(np.float32),
            "gt": normalize_pm1(to_float01(out)).astype(np.float32),
            "conditioning_images": cond.astype(np.float32),
            "valid_indices": np.int32(n),
            "caption": PROMPT,
        }
