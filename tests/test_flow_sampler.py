"""Flow-matching sampler + method routing + validation-loss wiring.

Round-3 closure of two dead-surface defects: a flow-matching-trained UNet
previously had no correct sampler (the ZTSNR sigma-space sampler is
meaningless for it), and ``data.validation_data_dir`` existed but nothing
called ``validation_loss``.
"""
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdxl_training_improvements_tpu.config import Config
from sdxl_training_improvements_tpu.models.sdxl import SDXLModel
from sdxl_training_improvements_tpu.models.tokenizer import TokenizerPair
from sdxl_training_improvements_tpu.training import schedules as S
from sdxl_training_improvements_tpu.training.validation import (
    ValidationSampler)


@pytest.fixture(scope="module")
def model():
    return SDXLModel.create(
        tiny=True, dtype=jnp.float32, init_rng=jax.random.key(0),
        init_components=("unet", "vae", "clip_l", "clip_g"))


class TestSampleFlow:
    def test_exact_linear_field_recovers_target(self):
        """For x1 = c deterministic, the OT velocity is v(x,t) = (c-x)/(1-t)
        and Euler on the fixed grid reproduces the analytic path exactly
        (the ODE is linear): x(1) == c for any starting noise."""
        c = jnp.asarray(np.random.default_rng(0).normal(size=(2, 4, 8, 8)),
                        jnp.float32)

        def model_fn(x, t):
            return (c - x) / (1.0 - t)

        out = S.sample_flow(model_fn, jax.random.key(1), c.shape,
                            num_steps=8)
        np.testing.assert_allclose(np.asarray(out), np.asarray(c),
                                   atol=1e-4, rtol=1e-4)

    def test_constant_velocity_integrates_to_displacement(self):
        v = jnp.full((1, 4, 8, 8), 0.5, jnp.float32)
        out = S.sample_flow(lambda x, t: v, jax.random.key(0), v.shape,
                            num_steps=16)
        start = jax.random.normal(jax.random.key(0), v.shape,
                                  dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(start + v),
                                   atol=1e-5)

    def test_model_call_budget(self):
        calls = []

        def model_fn(x, t):
            calls.append(1)
            return jnp.zeros_like(x)

        S.sample_flow(model_fn, jax.random.key(0), (1, 4, 8, 8),
                      num_steps=28)
        # traced once under scan: one model call in the traced body
        assert len(calls) == 1


class TestSamplerMethodRouting:
    def test_flow_method_generates(self, model):
        sched = S.NoiseSchedule.create(num_timesteps=50)
        sampler = ValidationSampler(
            model, TokenizerPair.fallback(vocab_size=1000), sched,
            num_inference_steps=4, method="flow_matching")
        imgs = sampler.generate(model.params["unet"], ["a cat"],
                                jax.random.key(0), height=64, width=64)
        assert len(imgs) == 1 and imgs[0].shape == (64, 64, 3)

    def test_unknown_method_rejected(self, model):
        sched = S.NoiseSchedule.create(num_timesteps=50)
        with pytest.raises(ValueError, match="flow_matching"):
            ValidationSampler(model, TokenizerPair.fallback(), sched,
                              method="example")

    def test_flow_and_ddpm_paths_differ(self, model):
        """Same weights, same seed: the two sampler families must produce
        different latents (guard against silent fall-through to ZTSNR)."""
        sched = S.NoiseSchedule.create(num_timesteps=50)
        out = {}
        for method in ("ddpm", "flow_matching"):
            sampler = ValidationSampler(
                model, TokenizerPair.fallback(vocab_size=1000), sched,
                num_inference_steps=3, method=method)
            out[method] = sampler.generate(
                model.params["unet"], ["x"], jax.random.key(0),
                height=32, width=32)[0]
        assert not np.array_equal(out["ddpm"], out["flow_matching"])


class TestPipelineMethodDetection:
    def test_detect_from_config_json(self, tmp_path):
        from sdxl_training_improvements_tpu.pipelines import SDXLPipeline
        cfg = Config()
        cfg.training.method = "flow_matching"
        (tmp_path / "config.json").write_text(
            json.dumps(cfg.to_dict(), default=str))
        assert SDXLPipeline.detect_method(tmp_path) == "flow_matching"

    def test_detect_defaults_to_ddpm(self, tmp_path):
        from sdxl_training_improvements_tpu.pipelines import SDXLPipeline
        assert SDXLPipeline.detect_method(tmp_path) == "ddpm"  # no file
        assert SDXLPipeline.declared_method(tmp_path) is None
        (tmp_path / "config.json").write_text("{not json")
        assert SDXLPipeline.detect_method(tmp_path) == "ddpm"
        assert SDXLPipeline.declared_method(tmp_path) is None

    def test_refuses_method_mismatched_checkpoint(self, tmp_path):
        """An explicit method that contradicts the checkpoint's declared
        training.method must refuse (sigma-space sampling of a flow-trained
        UNet emits garbage).  Undeclared checkpoints accept any method."""
        from sdxl_training_improvements_tpu.pipelines import SDXLPipeline
        cfg = Config()
        cfg.training.method = "flow_matching"
        (tmp_path / "config.json").write_text(
            json.dumps(cfg.to_dict(), default=str))
        with pytest.raises(ValueError, match="refusing to sample"):
            SDXLPipeline.from_pretrained(tmp_path, tiny=True, method="ddpm")

    def test_generate_cli_accepts_method(self):
        from sdxl_training_improvements_tpu.generate import build_parser
        args = build_parser().parse_args(
            ["--model", "m", "--prompt", "p", "--method", "flow_matching"])
        assert args.method == "flow_matching"
        with pytest.raises(SystemExit):
            build_parser().parse_args(
                ["--model", "m", "--prompt", "p", "--method", "bogus"])

    def test_pipeline_threads_method(self, model):
        from sdxl_training_improvements_tpu.pipelines import SDXLPipeline
        pipe = SDXLPipeline.from_model(model, method="flow_matching")
        imgs = pipe(["a dog"], height=32, width=32, num_inference_steps=2)
        assert imgs[0].shape == (32, 32, 3)
