"""Restoration quality evaluation over directories of images.

The paper's evaluation protocol (reference README "Extensive experiments...":
PSNR / SSIM / LPIPS / identity cosine vs ground truth) decoupled from running
the model: point it at a directory of predictions and a directory of ground
truths (matched by filename stem) and it prints one JSON line of aggregate
metrics plus a per-image report file. Works on ANY method's outputs, so
reference-vs-ours comparisons use the same scorer.

Usage:
    python scripts/evaluate.py --pred_dir RESULTS --gt_dir GT \
        [--lpips_vgg vgg16.pth --lpips_lin vgg.pth]   # LPIPS v0.1 weights
        [--arcface model_ir_se50.pth]                 # ID cosine
        [--resolution 512] [--batch 8] [--out eval.json]

LPIPS / ArcFace rows are emitted only when trained weights are supplied —
random-init features would produce meaningless but plausible-looking
numbers (the report's `lpips`/`id_cosine` keys are absent, not fake).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

IMG_EXTS = {".png", ".jpg", ".jpeg", ".webp", ".bmp"}


def _pairs(pred_dir: Path, gt_dir: Path):
    """Match prediction files to ground truths by stem."""
    gts = {p.stem: p for p in gt_dir.iterdir()
           if p.suffix.lower() in IMG_EXTS}
    out = []
    for p in sorted(pred_dir.iterdir()):
        if p.suffix.lower() in IMG_EXTS and p.stem in gts:
            out.append((p, gts[p.stem]))
    return out


def _load(path: Path, resolution: int) -> np.ndarray:
    from PIL import Image

    from instantrestore_tpu.data.transforms import infer_transform

    return infer_transform(Image.open(path).convert("RGB"), resolution)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pred_dir", required=True)
    ap.add_argument("--gt_dir", required=True)
    ap.add_argument("--resolution", type=int, default=512)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lpips_vgg", default=None,
                    help="torchvision vgg16 features state dict (.pth)")
    ap.add_argument("--lpips_lin", default=None,
                    help="LPIPS v0.1 linear-head weights (vgg.pth)")
    ap.add_argument("--arcface", default=None, help="model_ir_se50.pth")
    ap.add_argument("--out", default="eval.json")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from instantrestore_tpu.training.losses.ssim import ssim

    pairs = _pairs(Path(args.pred_dir), Path(args.gt_dir))
    if not pairs:
        print("no matching (prediction, gt) stems found", file=sys.stderr)
        return 1

    lpips_params = None
    if args.lpips_vgg and args.lpips_lin:
        import torch

        from instantrestore_tpu.training.losses.lpips import convert_lpips_params

        lpips_params = convert_lpips_params(
            torch.load(args.lpips_vgg, map_location="cpu", weights_only=True),
            torch.load(args.lpips_lin, map_location="cpu", weights_only=True),
        )
    arcface_params = None
    if args.arcface:
        import torch

        from instantrestore_tpu.training.losses.id_loss import convert_arcface_params

        arcface_params = convert_arcface_params(
            torch.load(args.arcface, map_location="cpu", weights_only=True)
        )

    @jax.jit
    def metrics_batch(pred, gt):
        # images in [-1,1]; PSNR peak-to-peak 2 -> MAX^2 = 4
        mse = jnp.mean(jnp.square(pred - gt), axis=(1, 2, 3))
        out = {
            "psnr": 10.0 * jnp.log10(4.0 / jnp.maximum(mse, 1e-12)),
            "ssim": ssim(pred, gt, data_range=2.0, reduce=False),
        }
        if lpips_params is not None:
            from instantrestore_tpu.training.losses.lpips import lpips

            out["lpips"] = lpips(lpips_params, pred, gt)
        if arcface_params is not None:
            from instantrestore_tpu.training.losses.id_loss import arcface_apply

            b = pred.shape[0]
            both = jnp.concatenate([pred, gt], axis=0)
            both = jax.image.resize(
                both, (2 * b, 112, 112, 3), "linear", antialias=True
            )
            e = arcface_apply(arcface_params, both)
            out["id_cosine"] = jnp.sum(e[:b] * e[b:], axis=-1)
        return out

    rows = []
    for start in range(0, len(pairs), args.batch):
        chunk = pairs[start:start + args.batch]
        # pad the tail so one compiled shape serves every batch
        padded = chunk + [chunk[-1]] * (args.batch - len(chunk))
        pred = jnp.asarray(np.stack([_load(p, args.resolution) for p, _ in padded]))
        gt = jnp.asarray(np.stack([_load(g, args.resolution) for _, g in padded]))
        m = jax.device_get(metrics_batch(pred, gt))
        for i, (p, _) in enumerate(chunk):
            rows.append({"image": p.name,
                         **{k: float(v[i]) for k, v in m.items()}})

    keys = [k for k in rows[0] if k != "image"]
    report = {
        "n_images": len(rows),
        "aggregate": {k: float(np.mean([r[k] for r in rows])) for k in keys},
        "weights": {
            "lpips": "converted" if lpips_params is not None else "absent",
            "arcface": "converted" if arcface_params is not None else "absent",
        },
        "per_image": rows,
    }
    Path(args.out).write_text(json.dumps(report, indent=1))
    print(json.dumps({"n_images": len(rows), **report["aggregate"]}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
