"""Torch-side consumer of ``parity.py dump-activations`` — runs in the
REFERENCE environment (torch + diffusers + the snap-research repo), NOT here.

Two-command first-contact procedure on real released checkpoints
(BASELINE.md gate: <1e-2 max-abs per block vs the PyTorch reference):

  # TPU side (this repo, any machine with jax):
  python scripts/parity.py dump-activations --checkpoint ckpt.pt \
         --input img.png --refs refs/ --fp32 --dump activations.npz

  # reference side (GPU box with torch+diffusers and the reference repo):
  python scripts/parity_torch_side.py --checkpoint ckpt.pt \
         --dump activations.npz --reference-repo /path/to/InstantRestore \
         --out parity_report.json

The script loads the released ``.pt`` through the reference's OWN model
class (face_replace/inference/test.py:42-50 load path), replays the dumped
{input, conds} with the SAME determinism substitutions our deterministic
mode makes (latent mode() instead of sample(), pix2pix_turbo.py:291; noise
derived exactly from our dumped latent pairs instead of torch.randn,
pix2pix_turbo.py:306-311), captures every stage at the same boundaries via
forward hooks, and emits per-stage max-abs deltas in pipeline order — any
>1e-2 end-to-end divergence is attributed to the first diverging block.

The comparison core (layout converters + compare_stage_dicts) is pure numpy
and unit-tested in THIS repo (tests/test_parity_torch_side.py); the torch
capture half only runs where torch/diffusers exist.
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path

import numpy as np

# --------------------------------------------------------------------------
# pure-numpy half: stage spec, layout converters, comparison (unit-testable)
# --------------------------------------------------------------------------

# pipeline order of the tap names restore_forward(debug_taps=True) emits
# (models/restorer.py taps dict + models/unet.py capture_taps); indexed
# families expand in index order at their position.
STAGE_ORDER = [
    "input_image",
    "conds",
    "cond_latent",
    "cond_latent_noised",
    "ref_kv.*.k",
    "ref_kv.*.v",
    "vae_enc_mean",
    "vae_enc_logvar",
    "latent",
    "latent_noised",
    "unet.conv_in",
    "unet.down_block_*",
    "unet.mid_block",
    "unet.shared_attn_*",
    "unet.up_block_*",
    "unet_eps",
    "x0",
    "decoded",
    "output_image",
]


def stage_sort_key(name: str):
    """(family position in STAGE_ORDER, numeric index) for pipeline order."""
    generic = re.sub(r"\d+", "*", name)
    nums = tuple(int(x) for x in re.findall(r"\d+", name))
    for pos, pat in enumerate(STAGE_ORDER):
        if name == pat or generic == pat:
            return (pos, nums, name)
    return (len(STAGE_ORDER), nums, name)


def to_nhwc(a: np.ndarray) -> np.ndarray:
    """Torch NCHW -> our NHWC (no-op for non-4D)."""
    if a.ndim == 4:
        return np.transpose(a, (0, 2, 3, 1))
    return a


def torch_kv_to_ours(k: np.ndarray, batch: int, n_refs: int, heads: int) -> np.ndarray:
    """Reference captured K/V layout -> ours.

    The reference stores pre-head-split projections [B*N, S, C]
    (attn_processors.py:74, BEFORE head_to_batch_dim) then reshapes to
    [B, N, S, C] (pix2pix_turbo.py:265-266). Ours are head-split
    [B, N, H, S, d] (models/restorer.py::mask_ref_kv). The torch head split
    is C -> (H, d) with H-major (diffusers head_to_batch_dim)."""
    bn, s, c = k.shape
    assert bn == batch * n_refs, (k.shape, batch, n_refs)
    d = c // heads
    return (
        k.reshape(batch, n_refs, s, heads, d).transpose(0, 1, 3, 2, 4)
    )


def derive_noise(z: np.ndarray, zt: np.ndarray, abar_t: float) -> np.ndarray:
    """Invert DDPM add_noise: zt = sqrt(abar) z + sqrt(1-abar) n  ->  n.

    Exact with fp32 taps (--fp32 on the dump side); lets the torch run inject
    the IDENTICAL noise our forward drew (pix2pix_turbo.py:306 torch.randn_like
    replaced by this), removing PRNG coupling between frameworks."""
    a = np.sqrt(abar_t)
    b = np.sqrt(1.0 - abar_t)
    return (zt.astype(np.float64) - a * z.astype(np.float64)) / b


def compare_stage_dicts(
    ours: dict, theirs: dict, *, atol: float = 1e-2
) -> dict:
    """Per-stage max-abs report over the stages present in BOTH dicts.

    Arrays must already share layout (callers convert torch captures with
    to_nhwc / torch_kv_to_ours). Returns pipeline-ordered rows, the first
    diverging stage, and an overall ok flag; stages present on only one side
    are listed, not failed (e.g. no cond taps when shared attention is off).
    """
    rows = []
    common = sorted(set(ours) & set(theirs), key=stage_sort_key)
    first_divergent = None
    for name in common:
        a = np.asarray(ours[name], np.float64)
        b = np.asarray(theirs[name], np.float64)
        if a.shape != b.shape:
            rows.append({"stage": name, "shape_ours": list(a.shape),
                         "shape_theirs": list(b.shape), "ok": False,
                         "error": "shape mismatch"})
            if first_divergent is None:
                first_divergent = name
            continue
        maxabs = float(np.abs(a - b).max()) if a.size else 0.0
        meanabs = float(np.abs(a - b).mean()) if a.size else 0.0
        scale = float(np.abs(b).max()) if b.size else 0.0
        row = {
            "stage": name,
            "shape": list(a.shape),
            "maxabs": maxabs,
            "meanabs": meanabs,
            "ref_absmax": scale,
            "ok": maxabs <= atol,
        }
        rows.append(row)
        if not row["ok"] and first_divergent is None:
            first_divergent = name
    return {
        "atol": atol,
        "stages": rows,
        "only_ours": sorted(set(ours) - set(theirs), key=stage_sort_key),
        "only_theirs": sorted(set(theirs) - set(ours), key=stage_sort_key),
        "first_divergent": first_divergent,
        "n_compared": len(rows),
        "ok": first_divergent is None and bool(rows),
    }


# --------------------------------------------------------------------------
# torch half: load the reference model, replay the dump, capture stages
# --------------------------------------------------------------------------


def capture_reference_stages(checkpoint: str, dump: dict, *,
                             reference_repo: str, device: str = "cuda",
                             fp32: bool = True) -> dict:
    """Replay {input_image, conds} from the .npz through the reference model
    with our deterministic substitutions, capturing every stage boundary.

    Mirrors Pix2Pix_Turbo.forward / get_conditioning_keys_values
    (pix2pix_turbo.py:242-334) step by step on the loaded net's own modules so
    the stochastic inputs can be pinned; UNet inner blocks are captured with
    forward hooks at the same boundaries as models/unet.py capture_taps."""
    import torch

    sys.path.insert(0, str(reference_repo))
    import pyrallis

    from face_replace.configs.train_config import TrainConfig
    from face_replace.models.face_replace_model import FaceReplaceModel

    ckpt = torch.load(checkpoint, map_location="cpu")
    cfg = pyrallis.decode(TrainConfig, ckpt["cfg"])
    model = FaceReplaceModel(cfg=cfg.model, full_cfg=cfg)
    try:
        model.load_state_dict(ckpt["state_dict"], strict=True)
    except Exception:
        sd = {k.replace(".module.", "."): v for k, v in ckpt["state_dict"].items()}
        model.load_state_dict(sd, strict=True)
    model.eval()
    dtype = torch.float32 if fp32 else torch.float16
    model = model.to(device, dtype)
    net = model.net

    dev = torch.device(device)
    image = torch.from_numpy(
        np.transpose(dump["input_image"], (0, 3, 1, 2))
    ).to(dev, dtype)
    conds = torch.from_numpy(
        np.transpose(dump["conds"], (0, 3, 1, 2))
    ).to(dev, dtype)[None]  # [1, N, 3, H, W]
    b, n = conds.shape[:2]
    timestep = int(dump["timestep"]) if "timestep" in dump else 249

    sf = net.vae.config.scaling_factor
    abar = net.sched.alphas_cumprod.to(torch.float64).cpu().numpy()

    captured: dict = {}

    # ---- UNet inner-stage hooks (active only for the MAIN unet call) ----
    hooks = []
    hook_on = {"v": False}

    def grab(name, pick=None):
        def fn(_mod, _inp, out):
            if not hook_on["v"]:
                return
            o = out[0] if isinstance(out, tuple) else out
            if hasattr(o, "sample"):
                o = o.sample
            captured[name] = to_nhwc(o.detach().float().cpu().numpy())
        return fn

    unet = net.unet
    hooks.append(unet.conv_in.register_forward_hook(grab("unet.conv_in")))
    for i, blk in enumerate(unet.down_blocks):
        hooks.append(blk.register_forward_hook(grab(f"unet.down_block_{i}")))
    hooks.append(unet.mid_block.register_forward_hook(grab("unet.mid_block")))
    shared_idx = 0
    for i, blk in enumerate(unet.up_blocks):
        if hasattr(blk, "attentions") and blk.attentions is not None:
            for att in blk.attentions:
                hooks.append(
                    att.register_forward_hook(
                        grab(f"unet.shared_attn_{shared_idx}")
                    )
                )
                shared_idx += 1
        hooks.append(blk.register_forward_hook(grab(f"unet.up_block_{i}")))

    with torch.no_grad():
        # ---- conditioning branch (get_conditioning_keys_values, :242-279),
        # deterministic: mode() + noise derived from the TPU dump ----
        flat = conds.reshape(b * n, *conds.shape[2:])
        posterior = net.original_vae.encode(flat).latent_dist
        z_cond = posterior.mode() * sf
        captured["cond_latent"] = to_nhwc(z_cond.detach().float().cpu().numpy())

        t1 = torch.tensor([1], device=dev)
        if "cond_latent" in dump and "cond_latent_noised" in dump:
            cond_noise = torch.from_numpy(
                derive_noise(dump["cond_latent"].transpose(0, 3, 1, 2),
                             dump["cond_latent_noised"].transpose(0, 3, 1, 2),
                             abar[1]).astype(np.float32)
            ).to(dev, z_cond.dtype)
        else:
            cond_noise = torch.zeros_like(z_cond)
        zt_cond = net.sched.add_noise(
            z_cond, cond_noise, t1.long().repeat(z_cond.shape[0])
        )
        captured["cond_latent_noised"] = to_nhwc(
            zt_cond.detach().float().cpu().numpy()
        )
        model_input = net.sched.scale_model_input(
            zt_cond, t1.long().repeat(z_cond.shape[0])
        )
        caption = net.caption_enc.repeat(model_input.shape[0], 1, 1).to(dtype)
        net.original_unet(model_input, t1, encoder_hidden_states=caption)

        # collect the captured K/V exactly as the reference does (:260-273)
        from face_replace.models.attn_processors import AttnProcessor

        kv_names = [
            name for name, p in net.original_unet.attn_processors.items()
            if type(p) is AttnProcessor
        ]
        procs = [net.original_unet.attn_processors[nm] for nm in kv_names]
        heads_per_layer = [
            net.original_unet.get_submodule(nm[: -len(".processor")]).heads
            for nm in kv_names
        ]
        valid = torch.full((b,), n, dtype=torch.long)
        for li, (p, h) in enumerate(zip(procs, heads_per_layer)):
            k = p.keys.reshape(b, n, *p.keys.shape[1:])
            v = p.values.reshape(b, n, *p.values.shape[1:])
            for s_i in range(b):
                k[s_i, valid[s_i]:] = 0
                v[s_i, valid[s_i]:] = 0
            captured[f"ref_kv.{li}.k"] = torch_kv_to_ours(
                k.reshape(b * n, *k.shape[2:]).detach().float().cpu().numpy(),
                b, n, h,
            )
            captured[f"ref_kv.{li}.v"] = torch_kv_to_ours(
                v.reshape(b * n, *v.shape[2:]).detach().float().cpu().numpy(),
                b, n, h,
            )
            p.reset()
        # rebuild the reference's [B, N, S, C] keys_/values_ lists (the
        # layout Pix2Pix_Turbo.forward expects) from the masked captures
        keys_, values_ = [], []
        for li in range(len(procs)):
            k5 = captured[f"ref_kv.{li}.k"]  # [B, N, H, S, d]
            v5 = captured[f"ref_kv.{li}.v"]
            B, N, H, S, D = k5.shape
            keys_.append(
                torch.from_numpy(
                    np.ascontiguousarray(
                        k5.transpose(0, 1, 3, 2, 4).reshape(B, N, S, H * D)
                    )
                ).to(dev, dtype)
            )
            values_.append(
                torch.from_numpy(
                    np.ascontiguousarray(
                        v5.transpose(0, 1, 3, 2, 4).reshape(B, N, S, H * D)
                    )
                ).to(dev, dtype)
            )

        # ---- main branch (forward, :292-334), deterministic ----
        posterior = net.vae.encode(image).latent_dist
        captured["vae_enc_mean"] = to_nhwc(
            posterior.mean.detach().float().cpu().numpy()
        )
        captured["vae_enc_logvar"] = to_nhwc(
            posterior.logvar.detach().float().cpu().numpy()
        )
        z = posterior.mode() * sf
        captured["latent"] = to_nhwc(z.detach().float().cpu().numpy())

        t = torch.tensor([timestep], device=dev)
        noise = torch.from_numpy(
            derive_noise(dump["latent"].transpose(0, 3, 1, 2),
                         dump["latent_noised"].transpose(0, 3, 1, 2),
                         abar[timestep]).astype(np.float32)
        ).to(dev, z.dtype)
        ts = t.long().repeat(z.shape[0])
        zt = net.sched.add_noise(z, noise, ts)
        captured["latent_noised"] = to_nhwc(zt.detach().float().cpu().numpy())
        model_input = net.sched.scale_model_input(zt, ts)

        caption_main = net.caption_enc.repeat(model_input.shape[0], 1, 1).to(dtype)
        hook_on["v"] = True
        eps = net.unet(
            model_input, t, encoder_hidden_states=caption_main,
            cross_attention_kwargs={"ref_keys": keys_, "ref_values": values_},
        ).sample
        hook_on["v"] = False
        captured["unet_eps"] = to_nhwc(eps.detach().float().cpu().numpy())

        x0 = net.sched.step(eps, t, zt, return_dict=True).pred_original_sample
        captured["x0"] = to_nhwc(x0.detach().float().cpu().numpy())

        net.vae.decoder.incoming_skip_acts = net.vae.encoder.current_down_blocks
        out = net.vae.decode(x0 / sf).sample
        captured["decoded"] = to_nhwc(out.detach().float().cpu().numpy())
        captured["output_image"] = to_nhwc(
            out.clamp(-1, 1).detach().float().cpu().numpy()
        )

    for h in hooks:
        h.remove()
    captured["input_image"] = dump["input_image"]
    captured["conds"] = dump["conds"]
    return captured


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", required=True, help="released reference .pt")
    ap.add_argument("--dump", required=True,
                    help="activations.npz from `parity.py dump-activations --fp32`")
    ap.add_argument("--reference-repo", required=True,
                    help="path to the snap-research/InstantRestore checkout")
    ap.add_argument("--device", default="cuda")
    ap.add_argument("--fp16", action="store_true",
                    help="run the torch side in fp16 (default fp32; fp32 vs a "
                         "--fp32 TPU dump is the <1e-2 gate configuration)")
    ap.add_argument("--atol", type=float, default=1e-2)
    ap.add_argument("--out", default="parity_torch_report.json")
    args = ap.parse_args()

    dump = dict(np.load(args.dump))
    theirs = capture_reference_stages(
        args.checkpoint, dump, reference_repo=args.reference_repo,
        device=args.device, fp32=not args.fp16,
    )
    ours = {k: v for k, v in dump.items() if k != "timestep"}
    report = compare_stage_dicts(ours, theirs, atol=args.atol)
    report["mode"] = "torch-side-parity"
    report["checkpoint"] = str(args.checkpoint)
    report["dump"] = str(args.dump)
    for row in report["stages"]:
        flag = "OK " if row.get("ok") else "DIVERGED"
        print(f"{flag} {row['stage']:>24}  maxabs={row.get('maxabs', float('nan')):.3e}")
    print(f"first divergent stage: {report['first_divergent']}")
    Path(args.out).write_text(json.dumps(report, indent=1))
    print(f"wrote {args.out}")
    sys.exit(0 if report["ok"] else 1)


if __name__ == "__main__":
    main()
