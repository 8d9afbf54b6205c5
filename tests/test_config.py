import textwrap

from instantrestore_tpu.configs.config import (
    SchedulerType,
    TrainConfig,
    encode_config,
    load_config,
)


def test_defaults_match_reference_schema():
    cfg = TrainConfig()
    assert cfg.optim.learning_rate == 5e-4
    assert cfg.optim.scheduler_type == SchedulerType.COSINE
    assert cfg.model.noise_timestep == 249
    assert cfg.data.max_conditioning_images == 4
    assert cfg.compute.test_batch_size == cfg.compute.batch_size


def test_load_reference_style_yaml(tmp_path):
    # shape of config_files/train_base.yaml
    yaml_text = textwrap.dedent(
        """
        compute:
          batch_size: 1
          workers: 12
        optim:
          learning_rate: 5e-4
          scheduler_type: CONSTANT
          lambda_lpips: 5.0
          lambda_ssim: 1.0
          gan_disc_type: dinov2
          gradient_accumulation_steps: 4
        data:
          dataset_type: face_restore
          max_conditioning_images: 4
        model:
          lora_rank_unet: 32
          lora_rank_vae: 32
          use_shared_attention: true
          use_adain: false
          train_input: false
        steps:
          max_steps: 50000
        """
    )
    p = tmp_path / "cfg.yaml"
    p.write_text(yaml_text)
    cfg = load_config(str(p))
    assert cfg.compute.batch_size == 1
    assert cfg.optim.scheduler_type == SchedulerType.CONSTANT
    assert cfg.optim.gradient_accumulation_steps == 4
    assert cfg.model.lora_rank_unet == 32
    assert cfg.model.train_input is False
    assert cfg.steps.max_steps == 50000


def test_cli_overrides(tmp_path):
    p = tmp_path / "cfg.yaml"
    p.write_text("model:\n  lora_rank_unet: 8\n")
    cfg = load_config(str(p), overrides=["model.lora_rank_unet=64", "--optim.lambda_gan=0.1"])
    assert cfg.model.lora_rank_unet == 64
    assert cfg.optim.lambda_gan == 0.1


def test_unknown_field_rejected(tmp_path):
    p = tmp_path / "cfg.yaml"
    p.write_text("model:\n  not_a_field: 1\n")
    import pytest

    with pytest.raises(ValueError):
        load_config(str(p))


def test_encode_roundtrip(tmp_path):
    cfg = TrainConfig()
    d = encode_config(cfg)
    assert d["optim"]["scheduler_type"] == "COSINE"
    import yaml

    p = tmp_path / "enc.yaml"
    p.write_text(yaml.safe_dump(d))
    cfg2 = load_config(str(p))
    assert cfg2.optim.scheduler_type == cfg.optim.scheduler_type
    assert cfg2.model.lora_rank_unet == cfg.model.lora_rank_unet
