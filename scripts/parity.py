"""Parity / fidelity harness for the BASELINE.md gates.

Three sub-commands, one JSON report each:

* ``gradio``      — run the Predictor over the bundled identity fixtures
  (/root/reference/gradio_data/<id>/{degraded.png, gt.png, conditioning/*},
  gradio_demo.py:25-54) and report per-identity pixel stats (PSNR/L2 vs gt)
  + ArcFace ID cosines (pred-vs-gt and pred-vs-mean-reference embedding)
  + per-reference attention-mass percentages. This is the "matched ArcFace
  ID cosine on gradio_data" gate (BASELINE.json) — meaningful once real
  ArcFace weights are supplied; with random weights the report records
  ``arcface_weights: random`` so nobody mistakes the numbers.
* ``convert-diff`` — given a real reference ``.pt``, golden-diff the weight
  converter per block: every torch key's mapping, per-tensor stats before/
  after conversion, unmapped keys, and missing leaves vs a freshly-initialized
  template tree (SURVEY §7 "disciplined golden-activation diffing").
* ``determinism`` — pin the stochastic inputs (latent mode() + fixed PRNG)
  and dump {input, noise, output} to .npz so a torch-side run can consume the
  IDENTICAL noise for a <1e-2 max-abs cross-framework comparison
  (SURVEY §7 "host-side variance": the reference samples latent_dist and
  fresh gaussian noise per forward, pix2pix_turbo.py:291,306-311).

* ``dump-activations`` — per-stage activation .npz via
  ``restore_forward(debug_taps=True)`` (VAE-enc moments, each UNet down/mid/
  up block, the 9 shared attentions, eps, x0, decode) so a torch-side run can
  attribute any >1e-2 end-to-end divergence block by block.

Usage:
  python scripts/parity.py gradio --checkpoint ckpt [--data .../gradio_data]
                                  [--arcface arcface.npz] [--out report.json]
  python scripts/parity.py convert-diff --pt model.pt [--strict] [--out report.json]
  python scripts/parity.py determinism --checkpoint ckpt --input img.png
                                  --refs dir/ [--dump parity_dump.npz]
  python scripts/parity.py dump-activations --checkpoint ckpt --input img.png
                                  --refs dir/ [--dump activations.npz] [--fp32]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    """PSNR on [-1,1] images (peak = 2)."""
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    return float(10.0 * np.log10(4.0 / max(mse, 1e-12)))


def _arcface_embed(arcface_params, images_pm1: np.ndarray) -> np.ndarray:
    """Whole-image ArcFace embedding at 112px (the detection-free path the
    training ID loss uses on pre-cropped faces, losses/id_loss.py)."""
    import jax
    import jax.numpy as jnp

    from instantrestore_tpu.training.losses.id_loss import arcface_apply

    x = jnp.asarray(images_pm1, jnp.float32)
    b = x.shape[0]
    x = jax.image.resize(x, (b, 112, 112, x.shape[-1]), "linear", antialias=True)
    return np.asarray(arcface_apply(arcface_params, x))


def gradio_report(predictor, data_root, arcface, resolution: int,
                  arc_src: str = "unknown", limit: int = 0) -> dict:
    """Predictor over the gradio_data fixtures -> per-identity parity rows."""
    from PIL import Image

    from instantrestore_tpu.data.transforms import infer_transform

    rows = []
    root = Path(data_root)
    for identity in sorted(p for p in root.glob("*") if p.is_dir()):
        degraded_p = identity / "degraded.png"
        gt_p = identity / "gt.png"
        if not degraded_p.exists():
            continue
        conds = [
            Image.open(p).convert("RGB")
            for p in sorted((identity / "conditioning").glob("*"))
        ][:4]
        if not conds:
            continue
        pred_pil, attn = predictor.predict(
            Image.open(degraded_p).convert("RGB"), conds, return_attention=True
        )
        pred = infer_transform(pred_pil, resolution)
        row = {"identity": identity.name, "attention_pct": attn}
        if gt_p.exists():
            gt = infer_transform(Image.open(gt_p).convert("RGB"), resolution)
            row["psnr_vs_gt"] = _psnr(pred, gt)
            row["l2_vs_gt"] = float(np.mean((pred - gt) ** 2))
            e = _arcface_embed(arcface, np.stack([pred, gt]))
            row["id_cosine_vs_gt"] = float(np.dot(e[0], e[1]))
        ref_arr = np.stack([infer_transform(c, resolution) for c in conds])
        e_refs = _arcface_embed(arcface, ref_arr)
        e_pred = _arcface_embed(arcface, pred[None])[0]
        mean_ref = e_refs.mean(axis=0)
        mean_ref /= max(np.linalg.norm(mean_ref), 1e-12)
        row["id_cosine_vs_refs"] = float(np.dot(e_pred, mean_ref))
        rows.append(row)
        print(json.dumps(row))
        if limit and len(rows) >= limit:
            break

    agg_keys = ["psnr_vs_gt", "id_cosine_vs_gt", "id_cosine_vs_refs"]
    return {
        "mode": "gradio",
        "arcface_weights": arc_src,
        "n_identities": len(rows),
        "aggregate": {
            k: float(np.mean([r[k] for r in rows if k in r]))
            for k in agg_keys
            if any(k in r for r in rows)
        },
        "per_identity": rows,
    }


def cmd_gradio(args) -> dict:
    import jax

    from instantrestore_tpu.inference.predictor import Predictor
    from instantrestore_tpu.training.losses import id_loss as id_mod

    predictor = Predictor(
        args.checkpoint, resolution=args.resolution, deterministic=True
    )
    if args.arcface:
        import torch

        sd = torch.load(args.arcface, map_location="cpu", weights_only=True)
        arcface = id_mod.convert_arcface_params(sd)
        arc_src = "converted"
    else:
        arcface = id_mod.init_arcface_params(jax.random.PRNGKey(0))
        arc_src = "random"
    return gradio_report(
        predictor, args.data, arcface, args.resolution, arc_src=arc_src
    )


def _canonical_torch_key(key: str) -> str:
    """Normalize a peft-decorated torch key to the canonical name our
    exporter emits: strip ``.base_layer`` wrappers, collapse any lora adapter
    name to ``default``."""
    parts = key.split(".")
    out = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if p == "base_layer":
            i += 1
            continue
        if p in ("lora_A", "lora_B") and i + 2 < len(parts):
            out.extend([p, "default", parts[i + 2]])
            i += 3
            continue
        out.append(p)
        i += 1
    return ".".join(out)


def strict_group_check(group_sd, template_tree=None) -> dict:
    """Fail-able converter check for ONE network's state dict.

    * roundtrip: every weight/bias torch key must survive
      torch->tree->torch unchanged (unmapped keys / layout drift FAIL).
    * template: when a freshly-initialized template tree is supplied, the
      converted tree's leaf set must cover it exactly (missing leaves FAIL;
      extra leaves are reported).
    """
    from instantrestore_tpu.utils.torch_convert import (
        convert_state_dict,
        tree_to_torch_state_dict,
    )

    def np_of(t):
        return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)

    tree = convert_state_dict(group_sd)
    back = tree_to_torch_state_dict(tree)
    expected = {
        _canonical_torch_key(k): np_of(v)
        for k, v in group_sd.items()
        if k.split(".")[-1] in ("weight", "bias")
    }
    unmapped = sorted(set(expected) - set(back))
    roundtrip_maxabs = 0.0
    drifted = []
    for k, v in expected.items():
        if k in back:
            d = float(np.abs(back[k].astype(np.float64) - v.astype(np.float64)).max())
            roundtrip_maxabs = max(roundtrip_maxabs, d)
            if d > 1e-6:
                drifted.append({"key": k, "maxabs": d})

    def leaf_paths(t, prefix=""):
        if isinstance(t, dict):
            for k, v in t.items():
                yield from leaf_paths(v, f"{prefix}.{k}" if prefix else str(k))
        elif isinstance(t, list):
            for i, v in enumerate(t):
                yield from leaf_paths(v, f"{prefix}[{i}]")
        else:
            yield prefix

    missing_leaves, extra_leaves = [], []
    if template_tree is not None:
        got = set(leaf_paths(tree))
        want = set(leaf_paths(template_tree))
        missing_leaves = sorted(want - got)
        extra_leaves = sorted(got - want)
    return {
        "n_torch_tensors": len(group_sd),
        "unmapped_keys": unmapped,
        "roundtrip_maxabs": roundtrip_maxabs,
        "drifted_keys": drifted,
        "missing_template_leaves": missing_leaves,
        "extra_template_leaves": extra_leaves,
        "ok": not unmapped and not drifted and not missing_leaves,
    }


def full_size_templates() -> dict:
    """Freshly-initialized full-size trees for template comparison (strict
    mode on the released checkpoints: rank-32 LoRA per pix2pix_turbo.py)."""
    import jax

    from instantrestore_tpu.models.lora import (
        UNET_LORA_TARGETS,
        VAE_LORA_TARGETS,
        attach_lora,
    )
    from instantrestore_tpu.models.text_encoder import init_text_encoder_params
    from instantrestore_tpu.models.unet import init_unet_params
    from instantrestore_tpu.models.vae import init_vae_params

    key = jax.random.PRNGKey(0)
    unet = init_unet_params(key)
    vae = init_vae_params(key)
    return {
        "unet": attach_lora(unet, key, 32, UNET_LORA_TARGETS),
        "vae": attach_lora(vae, key, 32, VAE_LORA_TARGETS),
        "original_unet": unet,
        "original_vae": vae,
        "text_encoder": init_text_encoder_params(key),
    }


def cmd_convert_diff(args) -> dict:
    """Per-block golden diff of the torch->pytree weight conversion."""
    import torch

    from instantrestore_tpu.utils.torch_convert import (
        convert_state_dict,
        split_full_checkpoint,
    )

    raw = torch.load(args.pt, map_location="cpu", weights_only=False)
    sd = raw.get("state_dict", raw) if isinstance(raw, dict) else raw
    sd = {
        k.replace("net.", "", 1).replace("module.", "", 1): v
        for k, v in sd.items()
        if hasattr(v, "shape")
    }
    groups = split_full_checkpoint(sd)

    def leaves(tree, prefix=""):
        if isinstance(tree, dict):
            for k, v in tree.items():
                yield from leaves(v, f"{prefix}.{k}" if prefix else k)
        elif isinstance(tree, list):
            for i, v in enumerate(tree):
                yield from leaves(v, f"{prefix}[{i}]")
        else:
            yield prefix, tree

    templates = full_size_templates() if args.strict and args.template else {}
    report = {"mode": "convert-diff", "pt": str(args.pt),
              "strict": bool(args.strict), "groups": {}}
    failed = []
    for net, group_sd in groups.items():
        tree = convert_state_dict(group_sd)
        out_leaves = dict(leaves(tree))
        stats = []
        torch_mass = 0.0
        ours_mass = 0.0
        for key, t in sorted(group_sd.items()):
            a = t.detach().cpu().numpy().astype(np.float64)
            torch_mass += float(np.abs(a).sum())
            stats.append(
                {
                    "torch_key": key,
                    "shape": list(a.shape),
                    "mean": float(a.mean()),
                    "std": float(a.std()),
                    "absmax": float(np.abs(a).max()),
                    "finite": bool(np.isfinite(a).all()),
                }
            )
        for _, v in out_leaves.items():
            ours_mass += float(np.abs(np.asarray(v, np.float64)).sum())
        report["groups"][net] = {
            "n_torch_tensors": len(group_sd),
            "n_converted_leaves": len(out_leaves),
            # conversion is transpose/reshape only: total |.|-mass must match
            "abs_mass_torch": torch_mass,
            "abs_mass_converted": ours_mass,
            "abs_mass_rel_err": abs(torch_mass - ours_mass) / max(torch_mass, 1e-12),
            "tensors": stats if args.verbose else stats[:8],
        }
        if args.strict:
            check = strict_group_check(group_sd, templates.get(net))
            report["groups"][net]["strict"] = check
            if not check["ok"]:
                failed.append(net)
            print(
                f"{net} strict: unmapped={len(check['unmapped_keys'])} "
                f"drifted={len(check['drifted_keys'])} "
                f"missing={len(check['missing_template_leaves'])} "
                f"-> {'OK' if check['ok'] else 'FAIL'}"
            )
        print(
            f"{net}: {len(group_sd)} torch tensors -> {len(out_leaves)} leaves, "
            f"mass rel err {report['groups'][net]['abs_mass_rel_err']:.2e}"
        )
    report["ok"] = not failed
    if args.strict and failed:
        report["failed_groups"] = failed
        Path(args.out).write_text(json.dumps(report, indent=1))
        print(f"STRICT CONVERT-DIFF FAILED for groups: {failed}; wrote {args.out}")
        sys.exit(1)
    return report


def cmd_dump_activations(args) -> dict:
    """Per-stage activation dump for cross-framework golden diffing.

    Runs the deterministic restore forward (latent mode(), fixed PRNG,
    t=249) with debug_taps=True and writes every stage activation — VAE-enc
    moments, noised latent, each UNet down/mid/up block, each of the 9 shared
    attentions, eps, x0, decode — to an .npz. A GPU-side torch run consuming
    the same {image, conds, noise} can then attribute any >1e-2 end-to-end
    divergence block-by-block (SURVEY §7 'disciplined golden-activation
    diffing'; VERDICT r2 item 2)."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from instantrestore_tpu.inference.predictor import Predictor
    from instantrestore_tpu.models.restorer import restore_forward

    predictor = Predictor(
        args.checkpoint, resolution=args.resolution, deterministic=True,
        dtype=jnp.float32 if args.fp32 else jnp.bfloat16,
    )
    refs = [
        Image.open(p).convert("RGB")
        for p in sorted(Path(args.refs).glob("*"))
        if p.suffix.lower() in (".png", ".jpg", ".jpeg")
    ][:4]
    img = Image.open(args.input).convert("RGB")
    image = predictor.prepare_image(img, predictor.resolution)[None]
    conds, _ = predictor.prepare_conditioning_images(refs, resolution=predictor.resolution)

    out = jax.jit(
        lambda p, im, cd, v, r: restore_forward(
            p, im, cd, v, rng=r, statics=predictor.statics,
            timestep=predictor.noise_timestep, sample_posterior=False,
            debug_taps=True, use_fused_attention=False,
        )
    )(
        predictor.params,
        jnp.asarray(image),
        jnp.asarray(conds)[None],
        jnp.full((1,), conds.shape[0], jnp.int32),
        jax.random.PRNGKey(predictor._seed),
    )
    taps = {k: np.asarray(v, np.float32) for k, v in out["taps"].items()}
    taps["output_image"] = np.asarray(out["output_image"], np.float32)
    taps["input_image"] = image
    taps["conds"] = conds
    np.savez_compressed(args.dump, **taps)
    summary = {
        "mode": "dump-activations",
        "dump": str(args.dump),
        "stages": sorted(taps),
        "stage_absmax": {k: float(np.abs(v).max()) for k, v in taps.items()},
    }
    print(f"dumped {len(taps)} stages to {args.dump}")
    return summary


def cmd_determinism(args) -> dict:
    import jax
    from PIL import Image

    from instantrestore_tpu.inference.predictor import Predictor

    predictor = Predictor(
        args.checkpoint, resolution=args.resolution, deterministic=True
    )
    refs = [
        Image.open(p).convert("RGB")
        for p in sorted(Path(args.refs).glob("*"))
        if p.suffix.lower() in (".png", ".jpg", ".jpeg")
    ][:4]
    img = Image.open(args.input).convert("RGB")
    out1, _ = predictor.predict(img, refs)
    out2, _ = predictor.predict(img, refs)
    a1 = np.asarray(out1, np.float32)
    a2 = np.asarray(out2, np.float32)
    maxabs = float(np.abs(a1 - a2).max())
    report = {
        "mode": "determinism",
        "repeat_maxabs_uint8": maxabs,
        "deterministic": maxabs == 0.0,
    }
    if args.dump:
        image = predictor.prepare_image(img, predictor.resolution)
        conds, _ = predictor.prepare_conditioning_images(
            refs, resolution=predictor.resolution
        )
        # the exact noise the forward will draw: reproduce the PRNG tree of
        # restore_forward (split(rng,4)[2] is r_noise) so a torch run can add
        # the identical noise for a bitwise-comparable path
        r = jax.random.PRNGKey(predictor._seed)
        _, _, r_noise, _ = jax.random.split(r, 4)
        lat = predictor.resolution // 8
        noise = np.asarray(jax.random.normal(r_noise, (1, lat, lat, 4)))
        np.savez(
            args.dump, image=image, conds=conds, noise=noise, output=a1,
            timestep=predictor.noise_timestep,
        )
        report["dump"] = str(args.dump)
    return report


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("gradio")
    g.add_argument("--checkpoint", required=True)
    g.add_argument("--data", default="/root/reference/gradio_data")
    g.add_argument("--arcface", default=None, help="ArcFace model_ir_se50.pth")
    g.add_argument("--resolution", type=int, default=512)
    g.add_argument("--out", default="parity_gradio.json")

    c = sub.add_parser("convert-diff")
    c.add_argument("--pt", required=True)
    c.add_argument("--verbose", action="store_true")
    c.add_argument("--strict", action="store_true",
                   help="fail (exit 1) on unmapped keys, roundtrip drift, "
                        "or missing template leaves")
    c.add_argument("--template", action="store_true", default=True,
                   help="compare against freshly-initialized full-size trees")
    c.add_argument("--no-template", dest="template", action="store_false")
    c.add_argument("--out", default="parity_convert.json")

    da = sub.add_parser("dump-activations")
    da.add_argument("--checkpoint", required=True)
    da.add_argument("--input", required=True)
    da.add_argument("--refs", required=True)
    da.add_argument("--resolution", type=int, default=512)
    da.add_argument("--fp32", action="store_true")
    da.add_argument("--dump", default="activations.npz")
    da.add_argument("--out", default="parity_activations.json")

    d = sub.add_parser("determinism")
    d.add_argument("--checkpoint", required=True)
    d.add_argument("--input", required=True)
    d.add_argument("--refs", required=True)
    d.add_argument("--resolution", type=int, default=512)
    d.add_argument("--dump", default=None)
    d.add_argument("--out", default="parity_determinism.json")

    args = ap.parse_args()
    report = {
        "gradio": cmd_gradio,
        "convert-diff": cmd_convert_diff,
        "determinism": cmd_determinism,
        "dump-activations": cmd_dump_activations,
    }[args.cmd](args)
    Path(args.out).write_text(json.dumps(report, indent=1))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
