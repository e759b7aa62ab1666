"""Inference-surface coverage: img2img, inpainting, refiner, and the
base->refiner ensemble handoff.

The reference's inference surface is ``create_pipeline`` handing back a
diffusers ``StableDiffusionXLPipeline`` (``src/models/sdxl.py:188-198``) —
its users reach img2img / inpainting / refiner through diffusers.  A user
switching to this framework needs those flows natively; they ride the same
samplers (``schedules.sample_ztsnr`` / ``sample_flow``) and the
checkpoint-declared UNet topology variants.
"""
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdxl_training_improvements_tpu.config import Config
from sdxl_training_improvements_tpu.models.sdxl import SDXLModel
from sdxl_training_improvements_tpu.models.unet import UNetConfig
from sdxl_training_improvements_tpu.pipelines import SDXLPipeline
from sdxl_training_improvements_tpu.training import schedules as S

# fast lane: `pytest -m "not slow"` (compile-heavy module, README: Testing)
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def base_model():
    return SDXLModel.create(
        tiny=True, dtype=jnp.float32, init_rng=jax.random.key(0),
        init_components=("unet", "vae", "clip_l", "clip_g"))


@pytest.fixture(scope="module")
def inpaint_model():
    return SDXLModel.create(
        tiny=True, dtype=jnp.float32,
        unet_config=UNetConfig.tiny(in_channels=9),
        init_rng=jax.random.key(1),
        init_components=("unet", "vae", "clip_l", "clip_g"))


def _tiny_refiner_unet_cfg():
    # cross/pooled widths matching the tiny CLIP-G (hidden 32, proj 32)
    return UNetConfig.tiny(num_time_ids=5, cross_attention_dim=32,
                           projection_class_embeddings_input_dim=32 + 5 * 8)


@pytest.fixture(scope="module")
def refiner_model():
    return SDXLModel.create(
        tiny=True, dtype=jnp.float32, unet_config=_tiny_refiner_unet_cfg(),
        refiner=True, init_rng=jax.random.key(2),
        init_components=("unet", "vae", "clip_g"))


# --------------------------------------------------------------------------
# Sampler-level semantics (analytic models)
# --------------------------------------------------------------------------

class TestImg2ImgSamplers:
    def test_eps_img2img_converges_to_model_target(self):
        """A perfect eps model for single-point data c predicts
        (x - c)/sigma; img2img from ANY init must land on c (the update is
        linear), at every strength."""
        c = jnp.asarray(np.random.default_rng(0).normal(size=(1, 4, 8, 8)),
                        jnp.float32)
        init = jnp.asarray(np.random.default_rng(1).normal(size=c.shape),
                           jnp.float32)
        sched = S.NoiseSchedule.create(num_timesteps=50, use_ztsnr=False,
                                       sigma_max=80.0,
                                       prediction_type="epsilon")
        for strength in (0.9, 0.5, 0.1):
            out = S.sample_ztsnr(lambda x, s: (x - c) / s, jax.random.key(2),
                                 c.shape, sched, num_steps=6, init=init,
                                 strength=strength)
            np.testing.assert_allclose(np.asarray(out), np.asarray(c),
                                       atol=1e-3, rtol=1e-3)

    def test_flow_img2img_step_budget_and_target(self):
        """Flow img2img integrates [1-strength, 1] in round(strength*N)
        steps; the linear field (c-x)/(1-t) still lands exactly on c."""
        c = jnp.asarray(np.random.default_rng(3).normal(size=(1, 4, 8, 8)),
                        jnp.float32)
        init = jnp.zeros_like(c)
        out = S.sample_flow(lambda x, t: (c - x) / (1.0 - t),
                            jax.random.key(0), c.shape, num_steps=10,
                            init=init, strength=0.4)
        np.testing.assert_allclose(np.asarray(out), np.asarray(c),
                                   atol=1e-4, rtol=1e-4)

    def test_strength_zero_rejected(self):
        sched = S.NoiseSchedule.create(num_timesteps=10)
        with pytest.raises(ValueError, match="strength"):
            S.sample_ztsnr(lambda x, s: x, jax.random.key(0), (1, 4, 4, 4),
                           sched, num_steps=4, strength=0.0)
        with pytest.raises(ValueError, match="strength"):
            S.sample_flow(lambda x, t: x, jax.random.key(0), (1, 4, 4, 4),
                          num_steps=4, strength=1.5)


class TestEnsembleHandoff:
    """denoising_end / denoising_start must compose EXACTLY: walking the
    ramp in two stages equals one uninterrupted walk (same model, same
    noise key), because the handoff passes the noisy latents verbatim and
    the stage-2 grid resumes at the same sigma index."""

    def _model(self):
        w = jnp.asarray(np.random.default_rng(7).normal(
            size=(1, 4, 8, 8)) * 0.1, jnp.float32)
        return lambda x, s: 0.05 * x + w

    @pytest.mark.parametrize("pred", ["v_prediction", "epsilon"])
    @pytest.mark.parametrize("frac", [0.3, 0.8])
    def test_split_equals_full(self, pred, frac):
        sched = S.NoiseSchedule.create(
            num_timesteps=50, prediction_type=pred,
            use_ztsnr=(pred == "v_prediction"),
            sigma_max=80.0)
        key = jax.random.key(11)
        model = self._model()
        shape = (1, 4, 8, 8)
        n = 9
        full = S.sample_ztsnr(model, key, shape, sched, num_steps=n)
        noisy = S.sample_ztsnr(model, key, shape, sched, num_steps=n,
                               denoising_end=frac)
        out = S.sample_ztsnr(model, key, shape, sched, num_steps=n,
                             init=noisy, denoising_start=frac)
        np.testing.assert_allclose(np.asarray(out), np.asarray(full),
                                   rtol=1e-6, atol=1e-6)

    def test_denoising_start_requires_init(self):
        sched = S.NoiseSchedule.create(num_timesteps=10)
        with pytest.raises(ValueError, match="denoising_start"):
            S.sample_ztsnr(lambda x, s: x, jax.random.key(0), (1, 4, 4, 4),
                           sched, num_steps=4, denoising_start=0.5)


# --------------------------------------------------------------------------
# Pipeline-level flows (tiny models, e2e)
# --------------------------------------------------------------------------

def _uint8_images(n, h, w, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8).astype(
        np.uint8) for _ in range(n)]


class TestImg2ImgPipeline:
    def test_images_path(self, base_model):
        pipe = SDXLPipeline.from_model(base_model)
        imgs = pipe.img2img(["a cat"], images=_uint8_images(1, 32, 32),
                            strength=0.5, num_inference_steps=3)
        assert imgs[0].shape == (32, 32, 3)

    def test_latents_path_and_mutual_exclusion(self, base_model):
        pipe = SDXLPipeline.from_model(base_model)
        lat = jnp.zeros((1, 4, 16, 16), jnp.float32)
        imgs = pipe.img2img(["a cat"], latents=lat, strength=0.4,
                            num_inference_steps=2)
        assert imgs[0].shape == (32, 32, 3)
        with pytest.raises(ValueError, match="exactly one"):
            pipe.img2img(["x"], images=_uint8_images(1, 32, 32),
                         latents=lat)
        with pytest.raises(ValueError, match="exactly one"):
            pipe.img2img(["x"])

    def test_flow_method_img2img(self, base_model):
        pipe = SDXLPipeline.from_model(base_model, method="flow_matching")
        imgs = pipe.img2img(["a cat"], images=_uint8_images(1, 32, 32),
                            strength=0.5, num_inference_steps=4)
        assert imgs[0].shape == (32, 32, 3)


class TestInpaintPipeline:
    def test_inpaint_shapes(self, inpaint_model):
        pipe = SDXLPipeline.from_model(inpaint_model)
        h = w = 32
        masks = [np.zeros((h, w), np.uint8)]
        masks[0][8:24, 8:24] = 1
        imgs = pipe.inpaint(["fill the hole"], _uint8_images(1, h, w),
                            masks, num_inference_steps=3)
        assert imgs[0].shape == (h, w, 3)

    def test_inpaint_soft_strength(self, inpaint_model):
        pipe = SDXLPipeline.from_model(inpaint_model)
        h = w = 16
        masks = [np.ones((h, w), np.uint8)]
        imgs = pipe.inpaint(["x"], _uint8_images(1, h, w), masks,
                            strength=0.5, num_inference_steps=2)
        assert imgs[0].shape == (h, w, 3)

    def test_requires_nine_channel_unet(self, base_model):
        pipe = SDXLPipeline.from_model(base_model)
        with pytest.raises(ValueError, match="inpainting UNet"):
            pipe.inpaint(["x"], _uint8_images(1, 16, 16),
                         [np.ones((16, 16))])

    def test_mask_shape_validated(self, inpaint_model):
        pipe = SDXLPipeline.from_model(inpaint_model)
        with pytest.raises(ValueError, match="mask shape"):
            pipe.inpaint(["x"], _uint8_images(1, 16, 16),
                         [np.ones((8, 8))])


class TestRefinerPipeline:
    def test_text2img_with_aesthetic_conditioning(self, refiner_model):
        """5-time-id UNets get [h, w, 0, 0, aesthetic] rows; generation
        must run through the single-encoder (CLIP-G) prompt path."""
        pipe = SDXLPipeline.from_model(refiner_model)
        imgs = pipe(["sharp details"], height=32, width=32,
                    num_inference_steps=2)
        assert imgs[0].shape == (32, 32, 3)

    def test_refinement_pass(self, refiner_model):
        pipe = SDXLPipeline.from_model(refiner_model)
        imgs = pipe.img2img(["sharper"], images=_uint8_images(1, 32, 32),
                            strength=0.25, num_inference_steps=4)
        assert imgs[0].shape == (32, 32, 3)

    def test_two_stage_handoff(self, base_model, refiner_model):
        """base(denoising_end=e, return_latents) -> refiner.refine(
        denoising_start=e): the diffusers ensemble-of-expert-denoisers
        contract, end to end at test size."""
        base = SDXLPipeline.from_model(base_model)
        refiner = SDXLPipeline.from_model(refiner_model)
        noisy = base(["a cat"], height=32, width=32,
                     num_inference_steps=4, denoising_end=0.75)
        assert noisy.shape == (1, 4, 16, 16)  # latents, not images
        imgs = refiner.refine(["a cat"], noisy, denoising_start=0.75,
                              num_inference_steps=4)
        assert imgs[0].shape == (32, 32, 3)

    def test_flow_rejects_handoff_params(self, base_model):
        pipe = SDXLPipeline.from_model(base_model, method="flow_matching")
        with pytest.raises(ValueError, match="sigma-space"):
            pipe(["x"], height=32, width=32, num_inference_steps=2,
                 denoising_end=0.5)


# --------------------------------------------------------------------------
# Checkpoint-declared topology loading
# --------------------------------------------------------------------------

class TestDpmppRouting:
    def test_pipeline_dpmpp_generates(self, base_model):
        pipe = SDXLPipeline.from_model(base_model, sampler="dpmpp_2m")
        imgs = pipe(["a cat"], height=32, width=32, num_inference_steps=4)
        assert imgs[0].shape == (32, 32, 3)

    def test_dpmpp_and_euler_differ(self, base_model):
        outs = {}
        for s in ("euler", "dpmpp_2m"):
            pipe = SDXLPipeline.from_model(base_model, sampler=s)
            outs[s] = pipe(["x"], height=32, width=32,
                           num_inference_steps=4,
                           return_latents=True)
        assert not np.array_equal(np.asarray(outs["euler"]),
                                  np.asarray(outs["dpmpp_2m"]))

    def test_dpmpp_img2img_and_handoff(self, base_model):
        pipe = SDXLPipeline.from_model(base_model, sampler="dpmpp_2m")
        img = pipe.img2img(["x"], latents=jnp.zeros((1, 4, 16, 16)),
                           strength=0.5, num_inference_steps=4)[0]
        assert img.shape == (32, 32, 3)
        noisy = pipe(["x"], height=32, width=32, num_inference_steps=4,
                     denoising_end=0.6)
        out = pipe.refine(["x"], noisy, denoising_start=0.6,
                          num_inference_steps=4)[0]
        assert out.shape == (32, 32, 3)

    def test_flow_rejects_dpmpp(self, base_model):
        from sdxl_training_improvements_tpu.models.tokenizer import (
            TokenizerPair)
        from sdxl_training_improvements_tpu.training.validation import (
            ValidationSampler)
        with pytest.raises(ValueError, match="sigma-space"):
            ValidationSampler(base_model, TokenizerPair.fallback(),
                              S.NoiseSchedule.create(),
                              method="flow_matching", sampler="dpmpp_2m")
        with pytest.raises(ValueError, match="sampler"):
            ValidationSampler(base_model, TokenizerPair.fallback(),
                              S.NoiseSchedule.create(), sampler="bogus")

    def test_cli_flag(self):
        from sdxl_training_improvements_tpu.generate import build_parser
        args = build_parser().parse_args(
            ["--model", "m", "--prompt", "p", "--sampler", "dpmpp_2m"])
        assert args.sampler == "dpmpp_2m"


class TestDeepCache:
    def test_single_call_walk_matches_uncached_exactly(self, base_model):
        """An eps schedule with num_inference_steps=1 makes exactly one
        model call — step 0, which the cached path always runs FULL — so
        deep_cache=3 must reproduce the uncached latents bit-exactly
        (proves the cond/full branch wiring, independent of the
        approximation)."""
        eps_sched = S.NoiseSchedule.create(
            num_timesteps=50, use_ztsnr=False, sigma_max=80.0,
            prediction_type="epsilon")
        outs = {}
        for k in (1, 3):
            pipe = SDXLPipeline.from_model(base_model, schedule=eps_sched,
                                           deep_cache=k)
            outs[k] = np.asarray(pipe(["x"], height=32, width=32,
                                      num_inference_steps=1,
                                      return_latents=True))
        np.testing.assert_array_equal(outs[1], outs[3])

    def test_cached_walk_runs_and_approximates(self, base_model):
        pipe_off = SDXLPipeline.from_model(base_model)
        pipe_on = SDXLPipeline.from_model(base_model, deep_cache=2)
        a = np.asarray(pipe_off(["x"], height=32, width=32,
                                num_inference_steps=4, return_latents=True))
        b = np.asarray(pipe_on(["x"], height=32, width=32,
                               num_inference_steps=4, return_latents=True))
        assert np.isfinite(b).all()
        assert not np.array_equal(a, b)  # the shallow steps do differ

    def test_dpmpp_with_deep_cache(self, base_model):
        pipe = SDXLPipeline.from_model(base_model, sampler="dpmpp_2m",
                                       deep_cache=2)
        img = pipe(["x"], height=32, width=32, num_inference_steps=4)[0]
        assert img.shape == (32, 32, 3)

    def test_validation(self, base_model):
        from sdxl_training_improvements_tpu.models.tokenizer import (
            TokenizerPair)
        from sdxl_training_improvements_tpu.training.validation import (
            ValidationSampler)
        with pytest.raises(ValueError, match="deep_cache_interval"):
            ValidationSampler(base_model, TokenizerPair.fallback(),
                              S.NoiseSchedule.create(),
                              deep_cache_interval=0)
        with pytest.raises(ValueError, match="sigma-space"):
            ValidationSampler(base_model, TokenizerPair.fallback(),
                              S.NoiseSchedule.create(),
                              method="flow_matching", deep_cache_interval=2)

    def test_cli_flag(self):
        from sdxl_training_improvements_tpu.generate import build_parser
        args = build_parser().parse_args(
            ["--model", "m", "--prompt", "p", "--deep-cache", "3"])
        assert args.deep_cache == 3


class TestVariantCheckpointLoading:
    def test_export_writes_unet_config(self, base_model, tmp_path):
        from sdxl_training_improvements_tpu.training.checkpoints import (
            export_diffusers)
        export_diffusers(tmp_path, base_model.params, Config(),
                         unet_config=base_model.unet_config)
        raw = json.loads((tmp_path / "unet" / "config.json").read_text())
        assert raw["_class_name"] == "UNet2DConditionModel"
        got = UNetConfig.from_diffusers_config(raw)
        assert got.block_out_channels == \
            base_model.unet_config.block_out_channels
        assert got.num_time_ids == base_model.unet_config.num_time_ids

    def test_inpainting_checkpoint_roundtrip(self, inpaint_model, tmp_path):
        from sdxl_training_improvements_tpu.training.checkpoints import (
            export_diffusers)
        export_diffusers(tmp_path, inpaint_model.params, Config(),
                         unet_config=inpaint_model.unet_config)
        pipe = SDXLPipeline.from_pretrained(tmp_path, tiny=True)
        assert pipe.model.unet_config.in_channels == 9
        h = w = 16
        masks = [np.ones((h, w), np.uint8)]
        imgs = pipe.inpaint(["x"], _uint8_images(1, h, w), masks,
                            num_inference_steps=2)
        assert imgs[0].shape == (h, w, 3)

    def test_refiner_checkpoint_roundtrip(self, refiner_model, tmp_path):
        from sdxl_training_improvements_tpu.training.checkpoints import (
            export_diffusers)
        export_diffusers(tmp_path, refiner_model.params, Config(),
                         unet_config=refiner_model.unet_config)
        assert not (tmp_path / "text_encoder").exists()  # single-encoder
        pipe = SDXLPipeline.from_pretrained(tmp_path, tiny=True)
        assert pipe.model.clip_l is None
        assert pipe.model.unet_config.num_time_ids == 5
        imgs = pipe(["x"], height=32, width=32, num_inference_steps=2)
        assert imgs[0].shape == (32, 32, 3)


class TestSingleEncoderTokenizers:
    def test_refiner_layout_rejects_tokenizer_l(self, tmp_path):
        from sdxl_training_improvements_tpu.models.tokenizer import (
            load_tokenizers)
        (tmp_path / "tokenizer").mkdir()
        with pytest.raises(FileNotFoundError, match="single-encoder"):
            load_tokenizers(tmp_path, single_encoder=True)

    def test_refiner_layout_fallback_without_dirs(self, tmp_path):
        from sdxl_training_improvements_tpu.models.tokenizer import (
            load_tokenizers)
        pair = load_tokenizers(tmp_path, single_encoder=True)
        ids_l, ids_g = pair(["hello world"])
        np.testing.assert_array_equal(ids_l, ids_g)  # one tokenizer, twice
