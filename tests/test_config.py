"""Config schema parity: the reference's src/config.yaml must load unchanged."""
import pytest
import textwrap

from sdxl_training_improvements_tpu.config import Config

REFERENCE_STYLE_YAML = textwrap.dedent("""
    model:
      pretrained_model_name: "stabilityai/stable-diffusion-xl-base-1.0"
      model_type: "sdxl"
      prediction_type: "v_prediction"
      num_timesteps: 1000
      sigma_min: 0.002
      sigma_max: 20000.0
      use_ztsnr: true
      timestep_bias_strategy: "none"
      timestep_bias_min: 0.0
      timestep_bias_max: 1.0
      min_snr_gamma: 5.0
    optimizer:
      learning_rate: 4.0e-7
      weight_decay: 0.01
      beta1: 0.9
      beta2: 0.999
      epsilon: 1.0e-8
      optimizer_type: "adamw_bf16"
    training:
      batch_size: 4
      num_epochs: 10
      save_every: 1
      method: "ddpm"
      prediction_type: "v_prediction"
      num_workers: 4
      pin_memory: true
      gradient_accumulation_steps: 4
      mixed_precision: "bf16"
      enable_xformers: true
      clip_grad_norm: 1.0
      num_inference_steps: 50
      debug_mode: false
      save_final_model: true
      method_config:
        scheduler:
          rescale_betas_zero_snr: true
          dynamic_thresholding_ratio: 0.995
          sample_max_value: 20000.0
          timestep_spacing: "leading"
    data:
      train_data_dir:
        - "/tmp/images"
      validation_data_dir: null
      image_size: 1024
      center_crop: true
      random_flip: true
      tokenizer_max_length: 77
    global_config:
      cache:
        cache_dir: "cache"
        max_cache_size: 10000
        use_cache: false
        cache_latents: false
        cache_text_embeddings: false
      logging:
        use_wandb: true
        wandb_project: "sdxl-training"
        log_dir: "logs"
        filename: "training.log"
        console_level: "INFO"
        file_level: "INFO"
        capture_warnings: true
        log_every: 10
      image:
        supported_dims:
          - [640, 1536]
          - [1024, 1024]
        max_aspect_ratio: 2.4
        target_size: [1024, 1024]
        max_size: [1536, 1536]
        min_size: [384, 384]
        bucket_step: 64
    tag_weighting:
      enable_tag_weighting: false
      use_cache: false
      min_weight: 0.1
      max_weight: 3.0
      default_weight: 1.0
      smoothing_factor: 0.05
""")


def test_reference_yaml_loads(tmp_path):
    p = tmp_path / "config.yaml"
    p.write_text(REFERENCE_STYLE_YAML)
    cfg = Config.from_yaml(p)
    assert cfg.model.prediction_type == "v_prediction"
    assert cfg.model.sigma_max == 20000.0
    assert cfg.model.use_ztsnr is True
    assert cfg.optimizer.learning_rate == 4.0e-7
    assert cfg.optimizer.optimizer_type == "adamw_bf16"
    assert cfg.training.gradient_accumulation_steps == 4
    assert cfg.training.method == "ddpm"
    assert cfg.training.method_config.scheduler.sample_max_value == 20000.0
    assert cfg.training.method_config.scheduler.timestep_spacing == "leading"
    assert cfg.global_config.cache.cache_latents is False
    assert cfg.global_config.image.bucket_step == 64
    assert cfg.global_config.image.supported_dims == [[640, 1536], [1024, 1024]]
    assert cfg.tag_weighting.max_weight == 3.0
    # defaults preserved for keys absent from YAML
    assert cfg.model.rho == 7.0
    assert cfg.tpu.axis_names == ["data", "fsdp", "tensor"]


def test_missing_file_gives_defaults(tmp_path):
    cfg = Config.from_yaml(tmp_path / "nope.yaml")
    assert cfg.training.batch_size == 4
    assert cfg.model.num_timesteps == 1000


def test_roundtrip(tmp_path):
    cfg = Config()
    cfg.training.method = "flow_matching"
    cfg.tpu.shard_params = True
    p = tmp_path / "out.yaml"
    cfg.save_yaml(p)
    cfg2 = Config.from_yaml(p)
    assert cfg2.training.method == "flow_matching"
    assert cfg2.tpu.shard_params is True
    assert cfg2.to_dict() == cfg.to_dict()


def test_unknown_keys_ignored(tmp_path):
    p = tmp_path / "config.yaml"
    p.write_text("model:\n  bogus_key: 1\n  sigma_min: 0.01\n")
    cfg = Config.from_yaml(p)
    assert cfg.model.sigma_min == 0.01


def test_scalar_section_rejected(tmp_path):
    import pytest
    p = tmp_path / "config.yaml"
    p.write_text("model: 'not-a-dict'\n")
    with pytest.raises(ValueError, match="must be a mapping"):
        Config.from_yaml(p)


import pathlib


@pytest.mark.skipif(not pathlib.Path("/root/reference/src/config.yaml").exists(),
                    reason="reference checkout not present")
def test_reference_repo_config_loads_verbatim():
    """The upstream framework's actual shipped config must load unchanged."""
    cfg = Config.from_yaml("/root/reference/src/config.yaml")
    assert cfg.model.prediction_type == "v_prediction"
    assert cfg.model.sigma_max == 20000.0
    assert cfg.model.use_ztsnr is True
    assert cfg.optimizer.optimizer_type == "adamw_bf16"
    assert cfg.optimizer.learning_rate == 4.0e-7
    assert cfg.training.gradient_accumulation_steps == 4
    assert cfg.training.method == "ddpm"
    assert cfg.training.method_config.scheduler.timestep_spacing == "leading"
    assert cfg.global_config.image.bucket_step == 64
    assert len(cfg.global_config.image.supported_dims) == 9
    assert cfg.tag_weighting.smoothing_factor == 0.05
    # windows path in the shipped config converts for bucketing use
    from sdxl_training_improvements_tpu.data.paths import convert_windows_path
    p = convert_windows_path(cfg.data.train_data_dir[0])
    assert str(p).startswith("/mnt/d/")


class TestShippedConfigs:
    """Every YAML under configs/ (the five BASELINE measurement configs)
    must load and construct its schedule/optimizer/method."""

    @pytest.mark.parametrize("path", sorted(
        __import__("pathlib").Path(__file__).parent.parent.glob(
            "configs/*.yaml")), ids=lambda p: p.stem)
    def test_loads_and_constructs(self, path):
        from sdxl_training_improvements_tpu.config import Config
        from sdxl_training_improvements_tpu.training.methods import get_method
        from sdxl_training_improvements_tpu.training.optimizers import (
            make_optimizer)
        from sdxl_training_improvements_tpu.training.schedules import (
            NoiseSchedule)
        cfg = Config.from_yaml(path)
        sched = NoiseSchedule.from_config(cfg)
        assert sched.num_timesteps == cfg.model.num_timesteps
        assert callable(get_method(cfg.training.method))
        opt = make_optimizer(cfg)
        assert opt.init is not None and opt.update is not None
        assert cfg.training.batch_size >= 1
