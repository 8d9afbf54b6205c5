"""Predictor — the single/batch inference surface.

API twin of /root/reference/face_replace/inference/test.py (Predictor) and
the prediction core of gradio_demo.py: load a checkpoint (reference ``.pt``
via the converter, or a native orbax directory), preprocess with
LANCZOS-resize/512-crop/[-1,1] normalize (test.py:54-59), run ONE restoration
forward at timestep 249 with 4 references (test.py:62,79-111), and optionally
report the per-reference attention-mass percentages aggregated over the 9
shared layers (gradio_demo.py:119-133).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from instantrestore_tpu.data.transforms import denormalize_pm1, infer_transform
from instantrestore_tpu.models.restorer import RestorerStatics, restore_forward


def attention_mass_percentages(
    attn_probs: Sequence[jnp.ndarray], n_refs: int = 4, train_input: bool = False
) -> List[float]:
    """gradio_demo.py:119-133: per-reference mean attention mass summed over
    the 9 shared layers, normalized to percentages.

    The demo indexes segments 0..3 directly (the shipped final model runs
    refs-only, so segments == references); with train_input the first
    segment is the input image and is skipped here to keep the reported
    numbers about the references.
    """
    means = np.zeros(n_refs)
    for probs in attn_probs:
        probs = np.asarray(probs, np.float32)
        q = probs.shape[2]
        offset = 1 if train_input else 0
        for ref_idx in range(n_refs):
            seg = probs[:, :, :, q * (ref_idx + offset) : q * (ref_idx + offset + 1)]
            means[ref_idx] += seg.mean()
    total = means.sum()
    normalized = [round(float(m / total) * 100, 3) for m in means]
    normalized[-1] = round(100 - sum(normalized[:-1]), 3)
    return normalized


class Predictor:
    """Loads weights once, compiles the forward once, restores many."""

    def __init__(
        self,
        checkpoint_path: Optional[str] = None,
        *,
        params: Optional[Dict[str, Any]] = None,
        statics: Optional[RestorerStatics] = None,
        noise_timestep: int = 249,
        dtype=jnp.bfloat16,
        use_fused_attention: Optional[bool] = None,
        seed: int = 0,
        resolution: int = 512,
        deterministic: bool = False,
        face_embed_provider=None,
        base_weights_dir: Optional[str] = None,
        tokenizer_dir: Optional[str] = None,
        prompt_ids=None,
    ):
        if params is None:
            if checkpoint_path is None:
                raise ValueError("need checkpoint_path or params")
            params, statics = load_predictor_params(
                checkpoint_path, statics,
                base_weights_dir=base_weights_dir,
                tokenizer_dir=tokenizer_dir,
                prompt_ids=prompt_ids,
            )
        self.statics = statics or RestorerStatics()
        # caption_enc is precomputed at load; the frozen text tower never
        # runs at inference (pix2pix_turbo.py:100-106), so keep its ~0.7 GB
        # off HBM
        if isinstance(params, dict) and "text_encoder" in params:
            params = {k: v for k, v in params.items() if k != "text_encoder"}
        self.params = jax.tree_util.tree_map(lambda x: jnp.asarray(x, dtype), params)
        self.noise_timestep = noise_timestep
        self.resolution = resolution
        # deterministic: latent mode() instead of posterior sampling and a
        # FIXED rng per call — the cross-framework parity mode (SURVEY §7
        # "host-side variance"; reference samples latent_dist, pix2pix_turbo
        # .py:291, so exact comparison requires pinning both sides)
        self.deterministic = deterministic
        self.rng = jax.random.PRNGKey(seed)
        self._seed = seed
        # FaceID conditioning (condition_on_face_embeds checkpoints): the
        # reference computes insightface buffalo_l normed embeddings per
        # conditioning image (test.py:65-66,113-133). Here the provider is
        # pluggable: a callable PIL.Image -> 512-d embedding (or None on
        # detection failure -> zeros, matching test.py:118-120); defaults to
        # insightface when installed, else precomputed embeds must be passed
        # to predict().
        if face_embed_provider is None and self.statics.condition_on_face_embeds:
            face_embed_provider = _try_insightface_provider()
        self.face_embed_provider = face_embed_provider
        if use_fused_attention is None:
            use_fused_attention = jax.default_backend() == "tpu"
        self._fused = use_fused_attention

        def fwd(params, image, conds, valid, rng, save_attn, face_embeds=None):
            out = restore_forward(
                params, image, conds, valid, rng=rng,
                face_embeds=face_embeds,
                statics=self.statics,
                timestep=self.noise_timestep,
                save_attn_probs=save_attn,
                sample_posterior=not self.deterministic,
                use_fused_attention=self._fused and not save_attn,
            )
            return out

        self._fwd = jax.jit(fwd, static_argnames=("save_attn",))

    def compute_face_embeds(self, cond_imgs, max_refs: int = 4) -> np.ndarray:
        """[N, 512] normed face embeddings of the conditioning images, zeros
        where the provider finds no face (test.py:113-124 semantics)."""
        embeds = []
        for im in cond_imgs[:max_refs]:
            e = self.face_embed_provider(im) if self.face_embed_provider else None
            embeds.append(np.zeros(512, np.float32) if e is None else np.asarray(e, np.float32))
        if not embeds:
            # no conditioning images at all: all-zero embeddings, matching
            # the per-image detection-failure path
            return np.zeros((max_refs, 512), np.float32)
        n = len(embeds)
        for i in range(max_refs - n):
            embeds.append(embeds[i % n])
        return np.stack(embeds)

    # -- preprocessing (test.py:54-59) ----------------------------------

    @staticmethod
    def prepare_image(img: Image.Image, resolution: int = 512) -> np.ndarray:
        return infer_transform(img, resolution)

    def prepare_conditioning_images(
        self, cond_imgs: Sequence[Image.Image], max_refs: int = 4, resolution: int = 512
    ) -> Tuple[np.ndarray, int]:
        refs = [self.prepare_image(im, resolution) for im in cond_imgs[:max_refs]]
        n_valid = len(refs)
        for i in range(max_refs - n_valid):
            refs.append(refs[i % n_valid][:, ::-1] if i % 2 == 0 else refs[i % n_valid])
        return np.stack(refs), n_valid

    # -- prediction ------------------------------------------------------

    def predict(
        self,
        input_img: Image.Image,
        cond_imgs: Sequence[Image.Image],
        *,
        return_attention: bool = False,
        face_embeds: Optional[np.ndarray] = None,
    ):
        """One restoration. Returns (PIL image, attention percentages|None)."""
        image = jnp.asarray(self.prepare_image(input_img, self.resolution))[None]
        conds, n_valid = self.prepare_conditioning_images(
            cond_imgs, resolution=self.resolution
        )
        # the reference Predictor always claims 4 valid refs after padding
        # (test.py:96: valid_indices = 4)
        valid = jnp.full((1,), conds.shape[0], jnp.int32)
        if self.deterministic:
            r = jax.random.PRNGKey(self._seed)
        else:
            self.rng, r = jax.random.split(self.rng)
        fe = None
        if self.statics.condition_on_face_embeds:
            if face_embeds is None:
                face_embeds = self.compute_face_embeds(cond_imgs)
            fe = jnp.asarray(face_embeds, jnp.float32)[None]
        out = self._fwd(
            self.params, image, jnp.asarray(conds)[None], valid, r,
            return_attention, fe,
        )
        pred = np.asarray(out["output_image"][0], np.float32)
        pil = Image.fromarray((denormalize_pm1(pred) * 255).astype(np.uint8))
        attn = None
        if return_attention:
            attn = attention_mass_percentages(
                out["attn_probs"], n_refs=conds.shape[0],
                train_input=self.statics.train_input,
            )
        return pil, attn

    def predict_batch(self, images: np.ndarray, conds: np.ndarray,
                      valid: Optional[np.ndarray] = None) -> np.ndarray:
        """Array-in/array-out batched restore ([B,512,512,3] in [-1,1])."""
        if valid is None:
            valid = np.full((images.shape[0],), conds.shape[1], np.int32)
        self.rng, r = jax.random.split(self.rng)
        out = self._fwd(
            self.params, jnp.asarray(images), jnp.asarray(conds),
            jnp.asarray(valid), r, False,
        )
        return np.asarray(out["output_image"])

    def run_directory(self, data_root: str, results_dir: str = "results",
                      max_refs: int = 4):
        """__main__ loop twin (test.py:165-187): iterate identity dirs with
        {degraded.png, conditioning/*}, write results/<identity>.png."""
        root = Path(data_root)
        out_dir = Path(results_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        for identity in sorted(p for p in root.glob("*") if p.is_dir()):
            degraded = identity / "degraded.png"
            if not degraded.exists():
                continue
            conds = [
                Image.open(p).convert("RGB")
                for p in sorted((identity / "conditioning").glob("*"))
            ][:max_refs]
            pred, _ = self.predict(Image.open(degraded).convert("RGB"), conds)
            pred.save(out_dir / f"{identity.name}.png")


def _try_insightface_provider():
    """insightface buffalo_l provider when the package is installed (the
    reference's FaceAnalysis path, test.py:65-66); None otherwise."""
    try:
        from insightface.app import FaceAnalysis
    except Exception:
        return None
    app = FaceAnalysis(name="buffalo_l", providers=["CPUExecutionProvider"])
    app.prepare(ctx_id=-1, det_size=(640, 640))

    def provider(image):
        faces = app.get(np.array(image))
        if not faces:
            return None
        return np.asarray(faces[0].normed_embedding, np.float32)

    return provider


def load_predictor_params(
    checkpoint_path: str,
    statics: Optional[RestorerStatics],
    *,
    base_weights_dir: Optional[str] = None,
    tokenizer_dir: Optional[str] = None,
    prompt_ids=None,
):
    """Reference .pt or native orbax checkpoint -> (params, statics).

    FULL .pt files decode model statics from the embedded pyrallis cfg
    (inference/test.py:42-43 semantics); LoRA-only .pt files carry no cfg, so
    defaults (or the caller's ``statics``) apply — but their LoRA scaling is
    ALWAYS overridden with the checkpoint's rank under peft's load-time
    alpha=8 quirk (pix2pix_turbo.py:116-121, torch_convert.py docstring),
    because that is determined by the checkpoint, not the config.
    """
    path = Path(checkpoint_path)
    if path.is_file() and path.suffix in (".pt", ".pth", ".ckpt", ".bin"):
        from instantrestore_tpu.training.checkpoints import import_reference_checkpoint
        from instantrestore_tpu.configs.config import ModelConfig, _decode_section

        imported = import_reference_checkpoint(
            str(path),
            base_weights_dir=base_weights_dir,
            tokenizer_dir=tokenizer_dir,
            prompt_ids=prompt_ids,
        )
        bundle = imported["bundle"]
        meta = imported["meta"]
        if statics is None:
            cfg_dict = meta.get("cfg") or {}
            model_cfg = _decode_section(ModelConfig, cfg_dict.get("model", {}))
            statics = RestorerStatics.from_model_config(model_cfg)
        if "unet_lora_scaling" in meta:  # lora_only import
            statics = dataclasses.replace(
                statics,
                unet_lora_scaling=meta["unet_lora_scaling"],
                vae_lora_scaling=meta["vae_lora_scaling"],
            )
        return bundle, statics
    from instantrestore_tpu.training.checkpoints import load_checkpoint

    loaded = load_checkpoint(str(path))
    if statics is None:
        # native checkpoints round-trip their TrainConfig through meta.json
        # (save_checkpoint cfg=…) — decode model statics from it exactly like
        # the FULL .pt path decodes the embedded pyrallis cfg
        from instantrestore_tpu.configs.config import ModelConfig, _decode_section

        cfg_dict = loaded["meta"].get("cfg") or {}
        model_cfg = _decode_section(ModelConfig, cfg_dict.get("model", {}))
        statics = RestorerStatics.from_model_config(model_cfg)
    return loaded["state"]["params"], statics
