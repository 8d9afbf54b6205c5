"""Interactive demo (gradio when available, CLI fallback) — twin of
/root/reference/gradio_demo.py: model selector over the four released
checkpoints (base/adain/lmattn/final, :29-34), bundled identity fixtures
(<data_root>/<identity>/{degraded.png, gt.png, conditioning/*}, :36-54),
restore button returning the prediction plus per-reference attention-mass
percentages (:96-133), and an interactive degradation slider reusing the
training degradation ops (:144-169).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional

import numpy as np
from PIL import Image

from instantrestore_tpu.data import degradations as deg
from instantrestore_tpu.data.transforms import center_crop, resize_shorter_side, to_float01
from instantrestore_tpu.inference.predictor import Predictor

DEFAULT_MODELS = {
    "Base Model": "checkpoints/base_ablation_ckpt.pt",
    "AdaIn Model": "checkpoints/adain_ablation_ckpt.pt",
    "Landmark Attn Loss Model": "checkpoints/landmark_attn_loss_ablation_ckpt.pt",
    "Final Model": "checkpoints/final_model_ckpt.pt",
}


def degrade_image(gt_img: Image.Image, deg_level: float, seed: int = 0) -> Image.Image:
    """Slider-driven degradation with the demo's parameter mapping
    (gradio_demo.py:150-160: sigma 0.1..12, downsample 1..13, noise 0..15,
    quality 99..60)."""
    img = center_crop(resize_shorter_side(gt_img, 512), 512)
    params = deg.DegradationParams(
        blur_sigma_x=11.9 * deg_level / 100 + 0.1,
        blur_sigma_y=11.9 * deg_level / 100 + 0.1,
        blur_rotation=0.0,
        downsample_factor=int(12 * deg_level / 100) + 1,
        noise_sigma=15 * deg_level / 100,
        jpeg_quality=99 - int(39 * deg_level / 100),
        noise_seed=seed,
    )
    out = deg.degrade(to_float01(img), params)
    return Image.fromarray((out * 255).astype(np.uint8))


class Demo:
    def __init__(
        self,
        data_root: str,
        models: Optional[Dict[str, str]] = None,
        predictor_kwargs: Optional[Dict] = None,
    ):
        self.data_root = Path(data_root)
        self.models = models or DEFAULT_MODELS
        # forwarded to Predictor(...) on every model switch: statics override
        # for reduced-size checkpoints (tests), tokenizer_dir, dtype, ...
        self.predictor_kwargs = predictor_kwargs or {}
        self.identities = sorted(
            p.name for p in self.data_root.glob("*")
            if p.is_dir() and (p / "degraded.png").exists()
        )
        self._predictor: Optional[Predictor] = None
        self._current_model: Optional[str] = None

    def select_model(self, name: str):
        if name != self._current_model:
            self._predictor = Predictor(self.models[name], **self.predictor_kwargs)
            self._current_model = name

    def load_identity(self, identity: str):
        d = self.data_root / identity
        refs = sorted((d / "conditioning").glob("*.png"))[:4]
        return {
            "degraded": Image.open(d / "degraded.png").convert("RGB"),
            "gt": Image.open(d / "gt.png").convert("RGB") if (d / "gt.png").exists() else None,
            "conditioning": [Image.open(p).convert("RGB") for p in refs],
        }

    def run(self, model_name: str, identity: str):
        self.select_model(model_name)
        data = self.load_identity(identity)
        pred, attn = self._predictor.predict(
            data["degraded"], data["conditioning"], return_attention=True
        )
        return pred, attn

    def launch_gradio(self, **kwargs):  # pragma: no cover - needs gradio
        try:
            import gradio as gr
        except ImportError as e:
            raise RuntimeError(
                "gradio is not installed in this environment; use Demo.run() "
                "or the CLI (scripts/demo.py)"
            ) from e
        with gr.Blocks() as ui:
            gr.Markdown("# InstantRestore-TPU: personalized face restoration")
            model = gr.Dropdown(list(self.models), value=list(self.models)[0], label="Model")
            ident = gr.Dropdown(self.identities, value=self.identities[0], label="Identity")
            btn = gr.Button("Restore")
            out_img = gr.Image(label="Restored")
            attn_out = gr.JSON(label="Per-reference attention %")
            btn.click(self.run, [model, ident], [out_img, attn_out])
            level = gr.Slider(0, 100, 50, label="Degradation level")
            gt_in = gr.Image(type="pil", label="Clean input")
            deg_out = gr.Image(label="Degraded")
            level.release(lambda l, im: degrade_image(im, l), [level, gt_in], [deg_out])
        return ui.launch(**kwargs)
