"""Continuous batched serving CLI over the identity-cached ServingEngine.

The production counterpart of scripts/infer.py (which is the reference's
per-call Predictor loop, inference/test.py:165-187): identities are onboarded
ONCE into the warm KV cache, then every degraded image runs one VAE encode +
one shared-attention UNet + one VAE decode, batched across identities.

Data layout (same as the reference's gradio_data / run_directory layout):

    <data_root>/<identity>/degraded.png        the image(s) to restore
    <data_root>/<identity>/conditioning/*.png  reference images (>= 1)

Usage:
    python scripts/serve.py --checkpoint ckpt.pt --data_root DIR \
        [--results_dir results] [--batch 16] [--refs 4] \
        [--int8] [--no_calibrate]

--int8 enables the calibrated static-scale int8 serving mode (decoder +
UNet; ~1.2x throughput, NOT parity-exact); calibration runs on the first
real batch unless --no_calibrate.
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, ".")

import numpy as np


def load_identity_refs(identity_dir: Path, n_refs: int, resolution: int):
    """conditioning/* -> [n_refs, res, res, 3] uint8 (cycled if fewer than
    n_refs are present, mirroring RestoreDatasetTest's flip-padding intent)."""
    from PIL import Image

    paths = sorted((identity_dir / "conditioning").glob("*"))
    if not paths:
        return None
    imgs = []
    for i in range(n_refs):
        p = paths[i % len(paths)]
        im = Image.open(p).convert("RGB").resize(
            (resolution, resolution), Image.LANCZOS
        )
        arr = np.asarray(im, np.uint8)
        if i >= len(paths):  # cycled copy: flip like the test dataset's pad
            arr = arr[:, ::-1]
        imgs.append(arr)
    return np.stack(imgs)


def main(argv=None, statics=None):
    """CLI entry. `statics` overrides the checkpoint-decoded model statics
    (tests drive tiny architectures; real checkpoints decode their own)."""
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--data_root", required=True)
    ap.add_argument("--results_dir", default="results")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--refs", type=int, default=4)
    ap.add_argument("--int8", action="store_true",
                    help="calibrated static-scale int8 decoder+UNet")
    ap.add_argument("--no_calibrate", action="store_true",
                    help="with --int8: keep dynamic per-call scales")
    ap.add_argument("--base_weights_dir", default=None,
                    help="sd-turbo/sd-vae base weights for LoRA-only ckpts")
    ap.add_argument("--tokenizer_dir", default=None)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from PIL import Image

    jax.config.update("jax_compilation_cache_dir", str(Path(".jax_cache").resolve()))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    from instantrestore_tpu.data.transforms import denormalize_pm1
    from instantrestore_tpu.inference.predictor import load_predictor_params
    from instantrestore_tpu.inference.serving import ServingEngine
    from instantrestore_tpu.models.restorer import serving_bundle

    params, statics = load_predictor_params(
        args.checkpoint, statics,
        base_weights_dir=args.base_weights_dir,
        tokenizer_dir=args.tokenizer_dir,
    )
    params.pop("text_encoder", None)  # caption_enc is precomputed at load
    params = serving_bundle(params, statics)
    params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)

    eng = ServingEngine(
        params, statics, use_fused_attention=True,
        int8_decoder=args.int8, int8_unet=args.int8,
    )
    res = eng.resolution

    # ---- discover identities and their work items ----------------------
    root = Path(args.data_root)
    identities, refs, work = [], [], []  # work: (identity_slot, image_path)
    for d in sorted(p for p in root.glob("*") if p.is_dir()):
        r = load_identity_refs(d, args.refs, res)
        if r is None:
            continue
        slot = len(identities)
        identities.append(d.name)
        refs.append(r)
        degraded = [d / "degraded.png"] if (d / "degraded.png").exists() else []
        degraded += sorted((d / "degraded").glob("*")) if (d / "degraded").is_dir() else []
        work += [(slot, p) for p in degraded]
    if not work:
        print("no identities with degraded images found", file=sys.stderr)
        return 1

    print(f"# onboarding {len(identities)} identities "
          f"({args.refs} refs each, {res}px)", file=sys.stderr)
    t0 = time.perf_counter()
    eng.onboard(jnp.asarray(np.stack(refs)), rng=jax.random.PRNGKey(args.seed))
    jax.block_until_ready(eng.kv_cache)
    print(f"# onboarded in {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    # ---- batched restore loop ------------------------------------------
    out_dir = Path(args.results_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    def load_image(p):
        im = Image.open(p).convert("RGB").resize((res, res), Image.LANCZOS)
        return np.asarray(im, np.uint8)

    calibrated = False
    n_done, t_restore = 0, 0.0
    for start in range(0, len(work), args.batch):
        chunk = work[start:start + args.batch]
        # fixed batch shape: pad the tail by repeating its last item so the
        # compiled program is reused (padded outputs are simply not written)
        pad = args.batch - len(chunk)
        padded = chunk + [chunk[-1]] * pad
        images = jnp.asarray(np.stack([load_image(p) for _, p in padded]))
        ids = jnp.asarray([s for s, _ in padded], jnp.int32)
        rng = jax.random.PRNGKey(args.seed + 1 + start)
        if args.int8 and not args.no_calibrate and not calibrated:
            n = eng.calibrate_int8([(images, ids, rng)])
            print(f"# calibrated {n} int8 convs on the first batch",
                  file=sys.stderr)
            calibrated = True
        t0 = time.perf_counter()
        out = eng.restore(images, ids, rng)
        out.block_until_ready()
        t_restore += time.perf_counter() - t0
        out_np = np.asarray(out.astype(jnp.float32))
        for (slot, p), img in zip(chunk, out_np):
            pil = Image.fromarray(
                (denormalize_pm1(img) * 255).clip(0, 255).astype(np.uint8)
            )
            name = identities[slot]
            stem = "" if p.name == "degraded.png" else f"_{p.stem}"
            pil.save(out_dir / f"{name}{stem}.png")
        n_done += len(chunk)
        print(f"# {n_done}/{len(work)} restored", file=sys.stderr)

    # first batch includes compile; report steady-state when possible
    print(f"restored {n_done} images from {len(identities)} identities "
          f"in {t_restore:.2f}s device time "
          f"({n_done / max(t_restore, 1e-9):.1f} faces/sec incl. compile)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
