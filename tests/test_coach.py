"""End-to-end training smoke test: tiny Coach run (the reference's de-facto
'overfit one batch' sanity check, SURVEY.md §4) with G+D steps, logging,
validation and checkpointing on synthetic data."""

import dataclasses

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

TINY_VIT = ViTConfig(patch_size=14, embed_dim=64, depth=2, num_heads=4,
                     mlp_ratio=2.0, pos_grid=16)


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("coach_data")
    rng = np.random.default_rng(0)
    for ident in ["a", "b"]:
        d = root / ident / "cropped_images"
        d.mkdir(parents=True)
        for i in range(3):
            Image.fromarray(rng.integers(0, 255, (96, 96, 3), np.uint8)).save(d / f"{i}.png")
    val = tmp_path_factory.mktemp("coach_val") / "id1"
    (val / "conditioning").mkdir(parents=True)
    Image.fromarray(rng.integers(0, 255, (96, 96, 3), np.uint8)).save(val / "degraded.png")
    Image.fromarray(rng.integers(0, 255, (96, 96, 3), np.uint8)).save(val / "gt.png")
    Image.fromarray(rng.integers(0, 255, (96, 96, 3), np.uint8)).save(val / "conditioning/c0.png")
    return root, val.parent


def test_coach_smoke(data_root, tmp_path):
    from instantrestore_tpu.models.restorer import init_restorer_params
    from instantrestore_tpu.training.coach import Coach
    import jax

    train_root, val_root = data_root
    cfg = TrainConfig()
    cfg.compute.batch_size = 1
    cfg.compute.workers = 2
    cfg.data.data_root = str(train_root)
    cfg.data.val_data_root = str(val_root)
    cfg.data.dataset_type = "face_restore"
    cfg.data.resolution = 64
    cfg.data.overfit = True
    cfg.log.exp_root = str(tmp_path)
    cfg.log.exp_name = "smoke"
    cfg.log.log2wandb = False
    cfg.steps.max_steps = 2
    cfg.steps.metric_interval = 1
    cfg.steps.image_interval = 1
    cfg.steps.val_interval = 2
    cfg.steps.save_interval = 100
    cfg.optim.lambda_lpips = 0.5
    cfg.optim.lambda_ssim = 0.0  # 64px too small for 5-level ms-ssim
    cfg.optim.lambda_gan = 0.5
    cfg.optim.gradient_accumulation_steps = 1
    cfg.model.lora_rank_unet = 4
    cfg.model.lora_rank_vae = 4

    params = init_restorer_params(
        jax.random.PRNGKey(0), TINY_STATICS, lora_rank_unet=4, lora_rank_vae=4
    )
    params["caption_enc"] = jax.random.normal(jax.random.PRNGKey(9), (1, 7, 16))

    coach = Coach(cfg, statics=TINY_STATICS, params=params, vit_cfg=TINY_VIT)
    before = np.asarray(
        jax.device_get(
            coach.params["unet"]["up_blocks"][1]["attentions"][0]["transformer_blocks"][0][
                "attn1"
            ]["to_q"]["lora_B"]
        )
    ).copy()
    coach.train()

    # lora params actually moved
    after = np.asarray(
        jax.device_get(
            coach.params["unet"]["up_blocks"][1]["attentions"][0]["transformer_blocks"][0][
                "attn1"
            ]["to_q"]["lora_B"]
        )
    )
    assert not np.allclose(before, after)
    # frozen base weights did not move
    exp_dir = cfg.log.exp_dir
    assert (exp_dir / "logs" / "log.txt").exists()
    assert (exp_dir / "checkpoints" / "final").exists()
    assert (exp_dir / "logs" / "train_images").exists()


def test_coach_scan_dispatch(data_root, tmp_path):
    """steps_per_dispatch>1: N G+D steps run inside one scanned program
    (the production loop for dispatch-dominated runtimes, ROADMAP.md) and
    reach the same bookkeeping state as the per-step loop."""
    from instantrestore_tpu.models.restorer import init_restorer_params
    from instantrestore_tpu.training.coach import Coach
    import jax

    train_root, val_root = data_root
    cfg = TrainConfig()
    cfg.compute.batch_size = 1
    cfg.compute.workers = 0
    cfg.compute.steps_per_dispatch = 2
    cfg.data.data_root = str(train_root)
    cfg.data.val_data_root = str(val_root)
    cfg.data.dataset_type = "face_restore"
    cfg.data.resolution = 64
    cfg.data.overfit = True
    cfg.log.exp_root = str(tmp_path)
    cfg.log.exp_name = "scan"
    cfg.log.log2wandb = False
    cfg.steps.max_steps = 4
    cfg.steps.metric_interval = 2
    cfg.steps.image_interval = 4
    cfg.steps.val_interval = 100
    cfg.steps.save_interval = 100
    cfg.optim.lambda_lpips = 0.5
    cfg.optim.lambda_ssim = 0.0
    cfg.optim.lambda_gan = 0.5
    cfg.optim.gradient_accumulation_steps = 1
    cfg.model.lora_rank_unet = 4
    cfg.model.lora_rank_vae = 4

    params = init_restorer_params(
        jax.random.PRNGKey(0), TINY_STATICS, lora_rank_unet=4, lora_rank_vae=4
    )
    params["caption_enc"] = jax.random.normal(jax.random.PRNGKey(9), (1, 7, 16))
    coach = Coach(cfg, statics=TINY_STATICS, params=params, vit_cfg=TINY_VIT)
    before = np.asarray(
        jax.device_get(
            coach.params["unet"]["up_blocks"][1]["attentions"][0][
                "transformer_blocks"
            ][0]["attn1"]["to_q"]["lora_B"]
        )
    ).copy()
    coach.train()
    after = np.asarray(
        jax.device_get(
            coach.params["unet"]["up_blocks"][1]["attentions"][0][
                "transformer_blocks"
            ][0]["attn1"]["to_q"]["lora_B"]
        )
    )
    assert coach.train_step_num == 4
    assert not np.allclose(before, after)
    exp_dir = cfg.log.exp_dir
    assert (exp_dir / "logs" / "train_images").exists()
    # disc heads moved too (D step ran inside the scan)
    assert coach.disc_heads is not None


def test_validate_aggregates_whole_set_and_caps_vis(tmp_path_factory, tmp_path):
    """Reference coach.py:352-361: metrics aggregate over the ENTIRE test
    loader; val_vis_count caps only visualization batches."""
    import jax
    from instantrestore_tpu.models.restorer import init_restorer_params
    from instantrestore_tpu.training.coach import Coach

    rng = np.random.default_rng(1)
    train_root = tmp_path_factory.mktemp("agg_train")
    d = train_root / "a" / "cropped_images"
    d.mkdir(parents=True)
    for i in range(2):
        Image.fromarray(rng.integers(0, 255, (96, 96, 3), np.uint8)).save(d / f"{i}.png")
    val_root = tmp_path_factory.mktemp("agg_val")
    for ident in ["x", "y", "z"]:
        v = val_root / ident
        (v / "conditioning").mkdir(parents=True)
        for name in ["degraded.png", "gt.png", "conditioning/c0.png"]:
            Image.fromarray(rng.integers(0, 255, (96, 96, 3), np.uint8)).save(v / name)

    cfg = TrainConfig()
    cfg.compute.batch_size = 1
    cfg.compute.test_batch_size = 1
    cfg.compute.workers = 0
    cfg.compute.test_workers = 0
    cfg.data.data_root = str(train_root)
    cfg.data.val_data_root = str(val_root)
    cfg.data.dataset_type = "face_restore"
    cfg.data.resolution = 64
    cfg.log.exp_root = str(tmp_path)
    cfg.log.exp_name = "agg"
    cfg.log.log2wandb = False
    cfg.log.val_vis_count = 0  # vis only batch 0 (reference's <= semantics)
    cfg.log.vis_attention = False
    cfg.optim.lambda_gan = 0.0
    cfg.optim.lambda_lpips = 0.0
    cfg.model.lora_rank_unet = 4
    cfg.model.lora_rank_vae = 4

    params = init_restorer_params(
        jax.random.PRNGKey(0), TINY_STATICS, lora_rank_unet=4, lora_rank_vae=4
    )
    params["caption_enc"] = jax.random.normal(jax.random.PRNGKey(9), (1, 7, 16))
    coach = Coach(cfg, statics=TINY_STATICS, params=params)

    eval_calls = []
    orig = coach._eval_step
    coach._eval_step = lambda *a, **k: (eval_calls.append(1), orig(*a, **k))[1]
    val_loss = coach.validate()
    # all 3 val batches contributed to the metric aggregation
    assert len(eval_calls) == 3
    assert val_loss is not None and np.isfinite(val_loss)
    # but only batch 0 was visualized
    vis_root = cfg.log.exp_dir / "logs"
    assert (vis_root / "val_images" / "0000").exists()
    assert not (vis_root / "val_images" / "0001").exists()


def test_overfit_loss_decreases(data_root, tmp_path):
    """The reference's de-facto training sanity check: loss should trend down
    when overfitting one batch (SURVEY.md §4)."""
    import jax
    import numpy as np
    from instantrestore_tpu.configs.config import TrainConfig
    from instantrestore_tpu.models.restorer import init_restorer_params, restore_forward
    from instantrestore_tpu.models.lora import trainable_mask
    from instantrestore_tpu.training.optim import freeze_non_trainable, make_optimizer
    import optax

    train_root, _ = data_root
    from instantrestore_tpu.data.datasets import RestoreDataset, collate

    ds = RestoreDataset(train_root, resolution=64)
    batch = collate([ds[0]])
    batch = {k: v for k, v in batch.items() if k in ("image", "gt", "conditioning_images", "valid_indices")}

    params = init_restorer_params(jax.random.PRNGKey(0), TINY_STATICS, lora_rank_unet=4, lora_rank_vae=4)
    params["caption_enc"] = jax.random.normal(jax.random.PRNGKey(9), (1, 7, 16))
    mask = {
        "unet": trainable_mask(params["unet"], extra_trainable=("conv_in",)),
        "unet_orig_conv_in": trainable_mask(params["unet_orig_conv_in"]),
        "vae": trainable_mask(params["vae"]),
        "caption_enc": False,
    }
    cfg = TrainConfig()
    cfg.optim.learning_rate = 3e-3
    cfg.optim.lr_warmup_steps = 0
    cfg.optim.lambda_l2 = 1.0
    opt = make_optimizer(cfg.optim, max_steps=1000, trainable_mask=mask)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, rng):
        def loss_fn(p):
            p = freeze_non_trainable(p, mask)
            out = restore_forward(
                p, batch["image"], batch["conditioning_images"],
                batch["valid_indices"], rng=rng, statics=TINY_STATICS, timestep=249,
                sample_posterior=False,
            )
            return jnp.mean((out["output_image"] - batch["gt"]) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = jax.random.PRNGKey(42)
    losses = []
    for i in range(15):
        params, opt_state, loss = step(params, opt_state, rng)  # fixed rng: overfit
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-3:]) < np.mean(losses[:3]) * 0.9, losses


def test_coach_save_full_and_resume(data_root, tmp_path):
    """Crash-recovery loop: train 2 steps -> save(full=True) -> fresh Coach
    with log.resume_from -> identical params AND optimizer state restored,
    step counter continues, further training moves weights again."""
    from instantrestore_tpu.models.restorer import init_restorer_params
    from instantrestore_tpu.training.coach import Coach
    import jax

    train_root, val_root = data_root
    cfg = TrainConfig()
    cfg.compute.batch_size = 1
    cfg.compute.workers = 0
    cfg.data.data_root = str(train_root)
    cfg.data.val_data_root = str(val_root)
    cfg.data.dataset_type = "face_restore"
    cfg.data.resolution = 64
    cfg.data.overfit = True
    cfg.log.exp_root = str(tmp_path)
    cfg.log.exp_name = "resume_a"
    cfg.log.log2wandb = False
    cfg.steps.max_steps = 2
    cfg.steps.metric_interval = 100
    cfg.steps.image_interval = 100
    cfg.steps.val_interval = 100
    cfg.steps.save_interval = 100
    cfg.optim.lambda_lpips = 0.0
    cfg.optim.lambda_ssim = 0.0
    cfg.optim.lambda_gan = 0.5  # disc heads + d_opt_state in the checkpoint
    cfg.optim.gradient_accumulation_steps = 1
    cfg.model.lora_rank_unet = 4
    cfg.model.lora_rank_vae = 4

    params = init_restorer_params(
        jax.random.PRNGKey(0), TINY_STATICS, lora_rank_unet=4, lora_rank_vae=4
    )
    params["caption_enc"] = jax.random.normal(jax.random.PRNGKey(9), (1, 7, 16))
    coach = Coach(cfg, statics=TINY_STATICS, params=params, vit_cfg=TINY_VIT)
    coach.train()
    assert coach.train_step_num == 2
    coach.save("resumable", full=True)
    ckpt = cfg.log.exp_dir / "checkpoints" / "resumable"

    saved_lora = np.asarray(jax.device_get(
        coach.params["unet"]["up_blocks"][1]["attentions"][0]
        ["transformer_blocks"][0]["attn1"]["to_q"]["lora_B"]))
    saved_opt = jax.device_get(coach.g_opt_state)

    import copy

    cfg2 = copy.deepcopy(cfg)
    cfg2.log.exp_name = "resume_b"
    cfg2.log.resume_from = str(ckpt)
    cfg2.steps.max_steps = 4
    params2 = init_restorer_params(
        jax.random.PRNGKey(123), TINY_STATICS, lora_rank_unet=4, lora_rank_vae=4
    )
    params2["caption_enc"] = jax.random.normal(jax.random.PRNGKey(9), (1, 7, 16))
    coach2 = Coach(cfg2, statics=TINY_STATICS, params=params2, vit_cfg=TINY_VIT)

    assert coach2.train_step_num == 2  # counter restored
    got_lora = np.asarray(jax.device_get(
        coach2.params["unet"]["up_blocks"][1]["attentions"][0]
        ["transformer_blocks"][0]["attn1"]["to_q"]["lora_B"]))
    np.testing.assert_array_equal(got_lora, saved_lora)
    # optimizer state (incl. adam moments) restored exactly, same structure
    flat_a, tree_a = jax.tree_util.tree_flatten(saved_opt)
    flat_b, tree_b = jax.tree_util.tree_flatten(jax.device_get(coach2.g_opt_state))
    assert tree_a == tree_b
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    coach2.train()  # 2 more steps from the restored state
    assert coach2.train_step_num == 4
    moved = np.asarray(jax.device_get(
        coach2.params["unet"]["up_blocks"][1]["attentions"][0]
        ["transformer_blocks"][0]["attn1"]["to_q"]["lora_B"]))
    assert not np.allclose(moved, saved_lora)


def test_validate_attn_reg_on_every_batch(data_root, tmp_path, monkeypatch):
    """The attention entropy reg must enter the aggregated val loss on EVERY
    batch (streamed segment sums), not only the <=5 visualized ones —
    otherwise best-model selection runs on an inconsistent metric."""
    from instantrestore_tpu.models.restorer import init_restorer_params
    from instantrestore_tpu.training.coach import Coach
    import jax
    from PIL import Image

    train_root, _ = data_root
    # 7 val identities -> 7 batches at test_batch_size=1 (> the 5-batch
    # attention-vis cap)
    rng_np = np.random.default_rng(5)
    val_root = tmp_path / "val"
    for i in range(7):
        d = val_root / f"id{i}"
        (d / "conditioning").mkdir(parents=True)
        Image.fromarray(rng_np.integers(0, 255, (64, 64, 3), np.uint8)).save(
            d / "degraded.png")
        Image.fromarray(rng_np.integers(0, 255, (64, 64, 3), np.uint8)).save(
            d / "gt.png")
        Image.fromarray(rng_np.integers(0, 255, (64, 64, 3), np.uint8)).save(
            d / "conditioning" / "c0.png")

    cfg = TrainConfig()
    cfg.compute.batch_size = 1
    cfg.compute.test_batch_size = 1
    cfg.compute.workers = 0
    cfg.compute.test_workers = 0
    cfg.data.data_root = str(train_root)
    cfg.data.val_data_root = str(val_root)
    cfg.data.dataset_type = "face_restore"
    cfg.data.resolution = 64
    cfg.log.exp_root = str(tmp_path)
    cfg.log.exp_name = "valreg"
    cfg.log.log2wandb = False
    cfg.log.val_vis_count = 2
    cfg.steps.max_steps = 1
    cfg.optim.lambda_lpips = 0.0
    cfg.optim.lambda_ssim = 0.0
    cfg.optim.lambda_gan = 0.0
    cfg.optim.lambda_attn_reg = 0.1
    cfg.model.lora_rank_unet = 4
    cfg.model.lora_rank_vae = 4
    cfg.model.use_adain = True

    params = init_restorer_params(
        jax.random.PRNGKey(0), TINY_STATICS, lora_rank_unet=4, lora_rank_vae=4
    )
    params["caption_enc"] = jax.random.normal(jax.random.PRNGKey(9), (1, 7, 16))
    coach = Coach(cfg, statics=TINY_STATICS, params=params, vit_cfg=TINY_VIT)

    seen = []
    orig = coach._eval_step

    def spy(p, batch, rng, save_attn=False, save_stats=False):
        out = orig(p, batch, rng, save_attn=save_attn, save_stats=save_stats)
        seen.append((save_attn, save_stats, "loss_attn_reg" in out[0]))
        return out

    monkeypatch.setattr(coach, "_eval_step", spy)
    mean_loss = coach.validate()  # returns the mean total 'loss' scalar
    assert len(seen) == 7
    # the reg was computed on every batch; probs only for the vis batches
    assert all(has_reg for _, _, has_reg in seen)
    assert all(stats for _, stats, _ in seen)
    # reference <=5 semantics: attention probs for the first 6 batches only
    assert [sa for sa, _, _ in seen] == [True] * 6 + [False] * 1
    # the aggregated selection metric includes the reg term on every batch
    assert np.isfinite(mean_loss)
