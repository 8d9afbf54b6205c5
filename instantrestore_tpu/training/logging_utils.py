"""Training logger: stdout+file messages, tensorboard scalars, image grids.

CoachLogger twin (/root/reference/face_replace/training/logging/
coach_logger.py:18-78): message log to ``logs/log.txt``, config dump,
per-interval metric prints, tensorboard scalars (the reference's "log2wandb"
flag actually selects tensorboard via accelerate, coach.py:55,145), and
train/val image grids written under ``logs/<title>/``.
"""

from __future__ import annotations

import datetime
import sys
from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np


class CoachLogger:
    def __init__(self, exp_dir, use_tensorboard: bool = True, primary: bool = True):
        """``primary=False`` (non-zero process in a multi-host run) makes
        every method a no-op and touches no files — the multi-host equivalent
        of accelerate's main-process-only logging (reference coach.py:145)."""
        self.primary = primary
        self.exp_dir = Path(exp_dir)
        self.log_dir = self.exp_dir / "logs"
        self.step = 0
        self.tb = None
        if not primary:
            return
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self.log_file = self.log_dir / "log.txt"
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter

                self.tb = SummaryWriter(logdir=str(self.log_dir / "tb"))
            except Exception:
                self.tb = None

    def update_step(self, step: int):
        self.step = step

    def log_message(self, msg: str):
        if not self.primary:
            return
        stamp = datetime.datetime.now().strftime("%Y-%m-%d %H:%M:%S")
        line = f"[{stamp}] step {self.step}: {msg}"
        print(line, file=sys.stderr)
        with open(self.log_file, "a") as f:
            f.write(line + "\n")

    def log_metrics(self, metrics: Dict[str, Any], prefix: str = "train"):
        if not self.primary:
            return
        flat = {k: float(v) for k, v in metrics.items() if np.ndim(v) == 0}
        parts = ", ".join(f"{k}={v:.5f}" for k, v in flat.items())
        self.log_message(f"{prefix}: {parts}")
        if self.tb is not None:
            for k, v in flat.items():
                self.tb.add_scalar(f"{prefix}/{k}", v, self.step)

    def log_config(self, cfg_dict: Dict[str, Any]):
        if not self.primary:
            return
        import yaml

        (self.exp_dir / "config.yaml").write_text(yaml.safe_dump(cfg_dict))

    def vis_batch(self, title: str, images: Dict[str, np.ndarray], max_rows: int = 4):
        """Save a side-by-side grid of named image tensors ([B,H,W,3] in
        [-1,1]) to logs/<title>/step_<n>.png (vis_utils.vis_data twin)."""
        if not self.primary:
            return
        from PIL import Image

        cols = []
        rows = min(max_rows, next(iter(images.values())).shape[0])
        for name, arr in images.items():
            arr = np.asarray(arr[:rows], np.float32)
            if arr.ndim == 5:  # [B, N, H, W, C] reference strips
                arr = arr.reshape(-1, *arr.shape[2:])[:rows]
            cols.append(np.concatenate(list(arr), axis=0))  # stack batch rows
        grid = np.concatenate(cols, axis=1)
        grid = ((np.clip(grid, -1, 1) + 1) / 2 * 255).astype(np.uint8)
        out_dir = self.log_dir / title
        out_dir.mkdir(parents=True, exist_ok=True)
        Image.fromarray(grid).save(out_dir / f"step_{self.step:07d}.jpg", quality=92)

    def save_image(self, title: str, image):
        """Save a ready-made PIL image under logs/<title>/ (attention
        overlays, vis_utils.vis_attn_probs twin)."""
        if not self.primary:
            return
        out_dir = self.log_dir / title
        out_dir.mkdir(parents=True, exist_ok=True)
        image.save(out_dir / f"step_{self.step:07d}.jpg", quality=92)

    def close(self):
        if self.tb is not None:
            self.tb.close()
