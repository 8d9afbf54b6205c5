"""The 'final model' training recipe, actually jitted end to end.

Round-2 gate (VERDICT.md #1): with ALL reference loss lambdas positive
(train_landmarkloss_adain.yaml plus the cycle / pos-neg-reg / facial-comp
terms the config surface supports), every term must appear in the jitted
train step's loss dict with a finite value — no silently-dead paths.

Matches /root/reference/face_replace/training/coach.py:531-560 (landmark),
:619-629 (cycle), :243-254,272-286 (facial-comp adversarial), :642-680
(pos/neg attention regularizers).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from instantrestore_tpu.configs.config import TrainConfig
from instantrestore_tpu.models.restorer import RestorerStatics
from instantrestore_tpu.models.unet import UNetConfig
from instantrestore_tpu.models.vae import VAEConfig
from instantrestore_tpu.models.vit import ViTConfig

TINY_STATICS = RestorerStatics(
    unet_cfg=UNetConfig(
        sample_size=8,
        block_out_channels=(32, 64, 64, 64),
        attention_heads=(1, 2, 2, 2),
        cross_attention_dim=16,
        norm_num_groups=8,
    ),
    vae_cfg=VAEConfig(block_out_channels=(8, 16, 16, 16), norm_num_groups=4),
    use_adain=True,
    compute_dtype=jnp.float32,
)
# 9 shared up-block self-attn layers of the tiny UNet: (heads, spatial)
TINY_LAYER_STATS = [(2, 2)] * 3 + [(2, 4)] * 3 + [(1, 8)] * 3

TINY_VIT = ViTConfig(patch_size=14, embed_dim=64, depth=2, num_heads=4,
                     mlp_ratio=2.0, pos_grid=16)

RES = 64


@pytest.fixture(scope="module")
def recipe_root(tmp_path_factory):
    """Two identities with cropped_images AND new_landmarks (627-pt files —
    indices 626/590/0 are the eye/eye/mouth anchors the loaders use)."""
    root = tmp_path_factory.mktemp("recipe_data")
    rng = np.random.default_rng(0)
    for ident in ["a", "b"]:
        d = root / ident / "cropped_images"
        lmd = root / ident / "new_landmarks"
        d.mkdir(parents=True)
        lmd.mkdir(parents=True)
        for i in range(3):
            Image.fromarray(
                rng.integers(0, 255, (RES, RES, 3), np.uint8)
            ).save(d / f"{i}.png")
            lm = rng.uniform(8, RES - 8, (627, 2)).astype(np.float32)
            np.save(lmd / f"{i}.npy", lm)
    return root


@pytest.fixture()
def tiny_layer_stats(monkeypatch):
    from instantrestore_tpu.data import datasets as ds_mod

    monkeypatch.setattr(ds_mod, "SHARED_LAYER_STATS", TINY_LAYER_STATS)


def _full_cfg(root, tmp_path):
    cfg = TrainConfig()
    cfg.compute.batch_size = 1
    cfg.compute.workers = 0
    cfg.data.data_root = str(root)
    cfg.data.val_data_root = str(root)  # unused (overfit)
    cfg.data.dataset_type = "face_restore"
    cfg.data.resolution = RES
    cfg.data.overfit = True
    cfg.log.exp_root = str(tmp_path)
    cfg.log.exp_name = "recipe"
    cfg.log.log2wandb = False
    cfg.steps.max_steps = 2
    cfg.steps.metric_interval = 1
    cfg.steps.image_interval = 100
    cfg.steps.val_interval = 100
    cfg.steps.save_interval = 100
    # the full loss surface (train_landmarkloss_adain.yaml lambdas, plus the
    # config-supported terms that yaml leaves at 0)
    cfg.optim.lambda_l2 = 1.0
    cfg.optim.lambda_lpips = 5.0
    cfg.optim.lambda_ssim = 0.0  # 64px too small for 5-level ms-ssim
    cfg.optim.lambda_id_loss = 0.0  # aligned path covered by its own test
    cfg.optim.lambda_gan = 0.5
    cfg.optim.lambda_attn_reg = 0.1
    cfg.optim.lambda_cycle = 1.0
    cfg.optim.lambda_landmark = 5000.0
    cfg.optim.lambda_pos_reg = 0.1
    cfg.optim.lambda_neg_reg = 0.1
    cfg.optim.lambda_facial_comp = 0.5
    cfg.optim.gradient_accumulation_steps = 1
    cfg.model.lora_rank_unet = 4
    cfg.model.lora_rank_vae = 4
    cfg.model.use_adain = True
    return cfg


def test_full_recipe_all_terms_live(recipe_root, tmp_path, tiny_layer_stats):
    """Every loss term the recipe enables shows up finite in the jitted step."""
    from instantrestore_tpu.models.restorer import init_restorer_params
    from instantrestore_tpu.training.coach import Coach

    cfg = _full_cfg(recipe_root, tmp_path)
    params = init_restorer_params(
        jax.random.PRNGKey(0), TINY_STATICS, lora_rank_unet=4, lora_rank_vae=4
    )
    params["caption_enc"] = jax.random.normal(jax.random.PRNGKey(9), (1, 7, 16))
    coach = Coach(cfg, statics=TINY_STATICS, params=params, vit_cfg=TINY_VIT)

    # drive one G+D step by hand so we can inspect the loss dict
    batch = next(iter(coach.train_loader))
    assert batch.get("gt_attn_probs") is not None, "dataset must emit landmark targets"
    assert batch.get("facial_comps") is not None
    assert "degradation_params" in batch
    dev_batch, landmark_layer = coach._device_batch(batch)
    assert landmark_layer is not None and 0 <= landmark_layer < 9

    rng = jax.random.PRNGKey(1)
    coach.params, coach.g_opt_state, losses, pred = coach._g_step(
        coach.params, coach.g_opt_state, coach.disc_heads, dev_batch, rng,
        landmark_layer=landmark_layer,
    )
    losses = jax.device_get(losses)

    expected = [
        "loss_l2", "loss_lpips", "loss_attn_reg", "loss_cycle",
        "loss_landmark", "loss_attn_pos_reg", "loss_attn_neg_reg",
        "loss_facial_comp_l2", "loss_facial_comp_lpips", "loss_g",
        "fc_loss_g", "loss",
    ]
    for k in expected:
        assert k in losses, f"{k} missing from jitted loss dict: {sorted(losses)}"
        assert np.isfinite(float(losses[k])), f"{k} not finite: {losses[k]}"
    # terms that cannot be exactly zero on random data
    for k in ["loss_l2", "loss_cycle", "loss_landmark", "loss_facial_comp_l2"]:
        assert float(losses[k]) > 0, f"{k} unexpectedly zero"

    # D step with the facial-component crop terms
    coach.disc_heads, coach.d_opt_state, d_loss = coach._d_step(
        coach.disc_heads, coach.d_opt_state, pred, dev_batch["gt"],
        dev_batch.get("facial_comp_boxes"), jax.random.PRNGKey(2),
    )
    assert np.isfinite(float(jax.device_get(d_loss)))


def test_collate_per_sample_landmark_targets(recipe_root, tiny_layer_stats):
    """Batch>1 landmark semantics (VERDICT r2 item 5): collate emits
    PER-SAMPLE maps at one batch-shared layer, re-splatting items whose own
    sampled layer differs — no more reference 'works for 1 batch' bug."""
    from instantrestore_tpu.data.datasets import (
        RestoreDataset,
        build_landmark_target,
        collate,
    )

    ds = RestoreDataset(recipe_root, resolution=RES, get_gt_attn_probs=True)
    items = [ds[i] for i in range(3)]
    assert all(it.get("gt_attn_probs") is not None for it in items)
    batch = collate(items)
    probs, masks, layer, conds = batch["gt_attn_probs"]
    assert probs.shape[0] == 3 and masks.shape[0] == 3 and conds.shape == (3,)
    assert int(layer) == int(items[0]["gt_attn_probs"][2])
    # every sample's map equals a fresh splat of ITS OWN landmarks at the
    # shared layer (not item 0's map broadcast)
    for i, it in enumerate(items):
        gt_lm, cond_lm = it["gt_attn_probs"][4], it["gt_attn_probs"][5]
        want_p, want_m = build_landmark_target(gt_lm, cond_lm, int(layer), RES)
        np.testing.assert_allclose(probs[i], want_p, atol=1e-6)
        np.testing.assert_array_equal(masks[i], want_m)
    # raw coords ride along for the scan-dispatch re-splat
    assert len(batch["landmark_coords"]) == 3


def test_full_recipe_multidevice(recipe_root, tmp_path, tiny_layer_stats):
    """The FULL G+D recipe (landmark + facial-comp crops + GAN + cycle +
    pos/neg + entropy) executes on a multi-device mesh with the batch
    sharded — not just the plain-L2 step (VERDICT r2 item 5)."""
    from instantrestore_tpu.models.restorer import init_restorer_params
    from instantrestore_tpu.training.coach import Coach

    n_dev = min(2, jax.device_count())
    assert n_dev >= 2, "conftest provides an 8-device CPU mesh"
    cfg = _full_cfg(recipe_root, tmp_path)
    cfg.compute.batch_size = n_dev
    cfg.log.exp_name = "recipe_dp"

    params = init_restorer_params(
        jax.random.PRNGKey(0), TINY_STATICS, lora_rank_unet=4, lora_rank_vae=4
    )
    params["caption_enc"] = jax.random.normal(jax.random.PRNGKey(9), (1, 7, 16))
    coach = Coach(cfg, statics=TINY_STATICS, params=params, vit_cfg=TINY_VIT)
    assert coach.device_count == n_dev

    batch = next(iter(coach.train_loader))
    assert batch["image"].shape[0] == n_dev
    dev_batch, landmark_layer = coach._device_batch(batch)
    # per-sample landmark targets sharded over the data axis
    assert dev_batch["gt_attn_probs"].shape[0] == n_dev
    assert dev_batch["gt_attn_cond"].shape == (n_dev,)

    coach.params, coach.g_opt_state, losses, pred = coach._g_step(
        coach.params, coach.g_opt_state, coach.disc_heads, dev_batch,
        jax.random.PRNGKey(1), landmark_layer=landmark_layer,
    )
    losses = jax.device_get(losses)
    for k in ["loss_l2", "loss_landmark", "loss_cycle", "loss_g",
              "loss_facial_comp_l2", "loss_attn_reg", "loss"]:
        assert np.isfinite(float(losses[k])), (k, losses[k])
    coach.disc_heads, coach.d_opt_state, d_loss = coach._d_step(
        coach.disc_heads, coach.d_opt_state, pred, dev_batch["gt"],
        dev_batch.get("facial_comp_boxes"), jax.random.PRNGKey(2),
    )
    assert np.isfinite(float(jax.device_get(d_loss)))


def test_landmark_loss_overfit_decreases(recipe_root, tmp_path, tiny_layer_stats):
    """Landmark-attention loss alone, overfit: must decrease under the jitted
    step (proves gradients flow through the attention probabilities)."""
    from instantrestore_tpu.models.restorer import init_restorer_params
    from instantrestore_tpu.training.coach import Coach

    cfg = _full_cfg(recipe_root, tmp_path)
    cfg.optim.lambda_lpips = 0.0
    cfg.optim.lambda_gan = 0.0
    cfg.optim.lambda_attn_reg = 0.0
    cfg.optim.lambda_cycle = 0.0
    cfg.optim.lambda_pos_reg = 0.0
    cfg.optim.lambda_neg_reg = 0.0
    cfg.optim.lambda_facial_comp = 0.0
    cfg.optim.lambda_l2 = 0.0001  # keep rec tiny; landmark dominates
    cfg.optim.learning_rate = 1e-3
    cfg.optim.lr_warmup_steps = 0
    cfg.log.exp_name = "lm_overfit"

    params = init_restorer_params(
        jax.random.PRNGKey(0), TINY_STATICS, lora_rank_unet=4, lora_rank_vae=4
    )
    params["caption_enc"] = jax.random.normal(jax.random.PRNGKey(9), (1, 7, 16))
    coach = Coach(cfg, statics=TINY_STATICS, params=params, vit_cfg=TINY_VIT)

    batch = next(iter(coach.train_loader))
    dev_batch, layer = coach._device_batch(batch)
    rng = jax.random.PRNGKey(3)
    vals = []
    for _ in range(12):
        coach.params, coach.g_opt_state, losses, _ = coach._g_step(
            coach.params, coach.g_opt_state, coach.disc_heads, dev_batch, rng,
            landmark_layer=layer,
        )
        vals.append(float(jax.device_get(losses["loss_landmark"])))
    assert np.isfinite(vals).all()
    assert np.mean(vals[-3:]) < np.mean(vals[:3]), vals


def test_aligned_id_loss_gradient_flows(recipe_root, tiny_layer_stats):
    """Dataset id_mats feed the aligned-crop ArcFace path; gradient reaches
    the prediction through warp_affine (VERDICT.md #4)."""
    from instantrestore_tpu.data.datasets import RestoreDataset, collate
    from instantrestore_tpu.training.losses import id_loss as id_mod

    ds = RestoreDataset(recipe_root, resolution=RES, get_id_mats=True)
    batch = collate([ds[0]])
    assert batch["id_valid"].all()
    assert batch["id_mats_pred"].shape == (1, 2, 3)

    arc = id_mod.init_arcface_params(jax.random.PRNGKey(0))

    def f(pred):
        loss, _ = id_mod.id_loss(
            arc, pred, jnp.asarray(batch["gt"]),
            jnp.asarray(batch["id_mats_pred"]), jnp.asarray(batch["id_mats_target"]),
            jnp.asarray(batch["id_valid"]),
        )
        return loss

    pred = jnp.asarray(batch["image"])
    g = jax.grad(f)(pred)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_detector_alignment_mats_stub():
    """detector_alignment_mats: the reference's per-step MTCNN semantics
    (criteria/utils.py:35-63) with a pluggable detector — valid mats map the
    detected points to the template; detection failure -> identity + invalid."""
    from instantrestore_tpu.training.losses.id_loss import (
        ARCFACE_REFERENCE_POINTS,
        detector_alignment_mats,
    )

    theta, scale = 0.2, 1.5
    rot = scale * np.array(
        [[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]]
    )
    pts = ARCFACE_REFERENCE_POINTS @ rot.T + np.array([20.0, 8.0])
    calls = []

    def detect(u8):
        calls.append(u8.dtype)
        return pts if len(calls) == 1 else None

    imgs = np.zeros((2, 64, 64, 3), np.float32)
    mats, valid = detector_alignment_mats(detect, imgs)
    assert calls == [np.dtype(np.uint8)] * 2
    assert valid.tolist() == [True, False]
    mapped = np.hstack([pts, np.ones((5, 1))]) @ mats[0].T
    np.testing.assert_allclose(mapped, ARCFACE_REFERENCE_POINTS, atol=1e-2)
    np.testing.assert_allclose(mats[1], np.eye(2, 3), atol=1e-7)


def test_validate_logs_detected_id_sim(recipe_root, tmp_path, tiny_layer_stats):
    """The id_detect_predictions validation hook logs detector-aligned vs
    dataset-aligned ID similarity + their drift (VERDICT r2 item 7)."""
    from instantrestore_tpu.models.restorer import init_restorer_params
    from instantrestore_tpu.training.coach import Coach
    from instantrestore_tpu.training.losses import id_loss as id_mod
    from instantrestore_tpu.training.losses.id_loss import ARCFACE_REFERENCE_POINTS

    cfg = _full_cfg(recipe_root, tmp_path)
    cfg.optim.lambda_gan = 0.0
    cfg.optim.lambda_id_loss = 1.0
    cfg.optim.id_detect_predictions = True
    cfg.log.exp_name = "id_detect"
    params = init_restorer_params(
        jax.random.PRNGKey(0), TINY_STATICS, lora_rank_unet=4, lora_rank_vae=4
    )
    params["caption_enc"] = jax.random.normal(jax.random.PRNGKey(9), (1, 7, 16))
    arc = id_mod.init_arcface_params(jax.random.PRNGKey(1))
    coach = Coach(
        cfg, statics=TINY_STATICS, params=params, vit_cfg=TINY_VIT,
        arcface_params=arc,
    )
    coach._id_detect_fn = lambda u8: ARCFACE_REFERENCE_POINTS * (
        u8.shape[0] / 112.0
    )
    batch = next(iter(coach.train_loader))
    assert "id_mats_pred" in batch
    agg = {}
    pred = np.asarray(batch["image"], np.float32)
    coach._log_detected_id_sim(agg, pred, batch)
    for k in ("id_sim_detected", "id_detect_rate",
              "id_sim_dataset_aligned", "id_align_drift"):
        assert k in agg and np.isfinite(agg[k][0]), (k, agg)
    assert agg["id_detect_rate"][0] == 1.0


def test_id_alignment_maps_landmarks_to_template(recipe_root):
    """The 3-pt similarity mat maps the source landmarks onto the ArcFace
    template (scaled): sanity of alignment_transforms + the dataset wiring."""
    from instantrestore_tpu.training.losses.id_loss import (
        ARCFACE_REFERENCE_POINTS_3,
        alignment_transforms,
    )

    rng = np.random.default_rng(1)
    # synthesize landmarks as a random similarity transform of the template
    theta, scale = 0.3, 2.1
    rot = scale * np.array(
        [[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]]
    )
    shift = np.array([30.0, 12.0])
    src = ARCFACE_REFERENCE_POINTS_3 @ rot.T + shift
    mats, valid = alignment_transforms([src], ref_points=ARCFACE_REFERENCE_POINTS_3)
    assert valid[0]
    mapped = np.hstack([src, np.ones((3, 1))]) @ mats[0].T
    np.testing.assert_allclose(mapped, ARCFACE_REFERENCE_POINTS_3, atol=1e-3)
