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


# fast lane: `pytest -m "not slow"` (compile-heavy module, README: Testing)
pytestmark = pytest.mark.slow


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


class TestPipelineScheduleDetection:
    """The inference schedule must follow the checkpoint's training config —
    an epsilon-trained checkpoint (BASELINE config #1) sampled through the
    default v/ZTSNR composition would be the wrong inverse."""

    def _write_cfg(self, tmp_path, **overrides):
        cfg = Config()
        cfg.training.prediction_type = overrides.get(
            "prediction_type", "epsilon")
        cfg.model.use_ztsnr = overrides.get("use_ztsnr", False)
        cfg.model.sigma_max = overrides.get("sigma_max", 80.0)
        cfg.model.num_timesteps = overrides.get("num_timesteps", 123)
        cfg.model.rho = overrides.get("rho", 5.0)
        cfg.model.min_snr_gamma = overrides.get("min_snr_gamma", None)
        (tmp_path / "config.json").write_text(
            json.dumps(cfg.to_dict(), default=str))
        return cfg

    def test_declared_schedule_reads_training_fields(self, tmp_path):
        from sdxl_training_improvements_tpu.pipelines import SDXLPipeline
        self._write_cfg(tmp_path)
        sched = SDXLPipeline.declared_schedule(tmp_path)
        assert sched is not None
        assert sched.prediction_type == "epsilon"
        assert not sched.use_ztsnr
        assert sched.num_timesteps == 123
        assert sched.rho == 5.0
        assert sched.min_snr_gamma is None
        assert float(sched.sigmas[0]) == pytest.approx(80.0, rel=1e-3)

    def test_declared_schedule_none_without_config(self, tmp_path):
        from sdxl_training_improvements_tpu.pipelines import SDXLPipeline
        assert SDXLPipeline.declared_schedule(tmp_path) is None
        (tmp_path / "config.json").write_text("{not json")
        assert SDXLPipeline.declared_schedule(tmp_path) is None
        (tmp_path / "config.json").write_text("{}")
        assert SDXLPipeline.declared_schedule(tmp_path) is None

    def test_eps_checkpoint_samples_through_eps_branch(self, tmp_path,
                                                       model):
        """End-to-end: export a tiny eps-trained checkpoint, load through
        the pipeline, and verify the reconstructed schedule drives the
        epsilon sampler (different output from a v-schedule pipe on the
        same weights/seed)."""
        from sdxl_training_improvements_tpu.pipelines import SDXLPipeline
        from sdxl_training_improvements_tpu.training.checkpoints import (
            export_diffusers)
        cfg = self._write_cfg(tmp_path)  # writes config.json
        export_diffusers(tmp_path, model.params, cfg)
        pipe = SDXLPipeline.from_pretrained(tmp_path, tiny=True)
        assert pipe.schedule.prediction_type == "epsilon"
        assert not pipe.schedule.use_ztsnr
        img_eps = pipe(["x"], height=32, width=32, num_inference_steps=2)[0]
        assert img_eps.shape == (32, 32, 3)
        # an explicit schedule still wins over the declared one
        pinned = S.NoiseSchedule.create(num_timesteps=7)
        pipe2 = SDXLPipeline.from_pretrained(tmp_path, tiny=True,
                                             schedule=pinned)
        assert pipe2.schedule is pinned
