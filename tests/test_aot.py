"""AOT serving export (``aot.py``): jax.export round trip.

The artifact must reproduce the live pipeline's latents (same traced
program; tolerances absorb AOT-vs-JIT executable codegen differences — the
CPU AOT path compiles with different machine-feature flags than the live
jit), keep guidance runtime-adjustable, and enforce its static batch.
Exported here for "cpu" only (the test platform); production exports
default to ("tpu", "cpu") multi-platform lowering.

Reference context: the reference's serving hand-off was a diffusers pipeline
object (``src/models/sdxl.py:188-198``) with no deployment artifact story.
"""
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdxl_training_improvements_tpu.aot import AOTPipeline, export_text2img
from sdxl_training_improvements_tpu.models.sdxl import SDXLModel
from sdxl_training_improvements_tpu.models.unet import UNetConfig
from sdxl_training_improvements_tpu.pipelines import SDXLPipeline

# fast lane: `pytest -m "not slow"` (compile-heavy module, README: Testing)
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def base_model():
    return SDXLModel.create(
        tiny=True, dtype=jnp.float32, init_rng=jax.random.key(0),
        init_components=("unet", "vae", "clip_l", "clip_g"))


def _export(pipe, out, **kw):
    kw.setdefault("batch", 1)
    kw.setdefault("height", 32)
    kw.setdefault("width", 32)
    kw.setdefault("num_inference_steps", 3)
    kw.setdefault("platforms", ("cpu",))
    return export_text2img(pipe, out, **kw)


class TestRoundTrip:
    def test_latents_match_direct_pipeline(self, base_model, tmp_path):
        pipe = SDXLPipeline.from_model(base_model)
        art = _export(pipe, tmp_path / "art")
        aot = AOTPipeline.load(art, base_model.params, pipe.tokenizers)
        lat_aot = np.asarray(aot.generate_latents(
            ["a cat"], seed=5, guidance_scale=5.0))
        lat_direct = np.asarray(pipe(
            ["a cat"], height=32, width=32, num_inference_steps=3,
            guidance_scale=5.0, seed=5, return_latents=True))
        np.testing.assert_allclose(lat_aot, lat_direct, rtol=1e-3, atol=5e-4)

    def test_images_decode_and_negative_prompts(self, base_model, tmp_path):
        pipe = SDXLPipeline.from_model(base_model)
        art = _export(pipe, tmp_path / "art")
        aot = AOTPipeline.load(art, base_model.params, pipe.tokenizers)
        imgs = aot(["a cat"], negative_prompts=["blurry"], seed=1)
        assert imgs[0].shape == (32, 32, 3) and imgs[0].dtype == np.uint8
        direct = pipe(["a cat"], height=32, width=32,
                      num_inference_steps=3, seed=1,
                      negative_prompts=["blurry"])
        np.testing.assert_allclose(imgs[0].astype(np.int32),
                                   direct[0].astype(np.int32), atol=2)

    def test_guidance_is_runtime_input(self, base_model, tmp_path):
        """One artifact, two CFG strengths — guidance is traced, not baked."""
        pipe = SDXLPipeline.from_model(base_model)
        art = _export(pipe, tmp_path / "art")
        aot = AOTPipeline.load(art, base_model.params, pipe.tokenizers)
        a = np.asarray(aot.generate_latents(["x"], seed=0,
                                            guidance_scale=5.0))
        b = np.asarray(aot.generate_latents(["x"], seed=0,
                                            guidance_scale=1.0))
        assert np.isfinite(a).all() and np.isfinite(b).all()
        assert not np.array_equal(a, b)
        # and the recorded default applies when the caller passes nothing
        d = np.asarray(aot.generate_latents(["x"], seed=0))
        np.testing.assert_array_equal(a, d)  # default_guidance_scale=5.0

    def test_static_batch_enforced(self, base_model, tmp_path):
        pipe = SDXLPipeline.from_model(base_model)
        art = _export(pipe, tmp_path / "art")
        aot = AOTPipeline.load(art, base_model.params, pipe.tokenizers)
        with pytest.raises(ValueError, match="batch"):
            aot(["a", "b"])
        with pytest.raises(ValueError, match="negative_prompts"):
            aot(["a"], negative_prompts=["x", "y"])


class TestVariants:
    def test_dpmpp_deepcache_export(self, base_model, tmp_path):
        pipe = SDXLPipeline.from_model(base_model, sampler="dpmpp_2m",
                                       deep_cache=2)
        art = _export(pipe, tmp_path / "art", num_inference_steps=4)
        aot = AOTPipeline.load(art, base_model.params, pipe.tokenizers)
        lat = np.asarray(aot.generate_latents(["x"], seed=3))
        direct = np.asarray(pipe(["x"], height=32, width=32,
                                 num_inference_steps=4, seed=3,
                                 return_latents=True))
        np.testing.assert_allclose(lat, direct, rtol=1e-3, atol=5e-4)

    def test_flow_matching_export(self, base_model, tmp_path):
        pipe = SDXLPipeline.from_model(base_model, method="flow_matching")
        art = _export(pipe, tmp_path / "art", num_inference_steps=4)
        aot = AOTPipeline.load(art, base_model.params, pipe.tokenizers)
        lat = np.asarray(aot.generate_latents(["x"], seed=2))
        direct = np.asarray(pipe(["x"], height=32, width=32,
                                 num_inference_steps=4, seed=2,
                                 return_latents=True))
        np.testing.assert_allclose(lat, direct, rtol=1e-3, atol=5e-4)

    def test_refiner_single_encoder_export(self, tmp_path):
        ucfg = UNetConfig.tiny(
            num_time_ids=5, cross_attention_dim=32,
            projection_class_embeddings_input_dim=32 + 5 * 8)
        model = SDXLModel.create(
            tiny=True, dtype=jnp.float32, unet_config=ucfg, refiner=True,
            init_rng=jax.random.key(2),
            init_components=("unet", "vae", "clip_g"))
        pipe = SDXLPipeline.from_model(model)
        art = _export(pipe, tmp_path / "art")
        meta = json.loads((art / "meta.json").read_text())
        assert meta["refiner"] is True
        aot = AOTPipeline.load(art, model.params, pipe.tokenizers)
        imgs = aot(["sharp"], seed=0)
        assert imgs[0].shape == (32, 32, 3)


class TestMetaAndValidation:
    def test_meta_contents(self, base_model, tmp_path):
        pipe = SDXLPipeline.from_model(base_model)
        art = _export(pipe, tmp_path / "art")
        meta = json.loads((art / "meta.json").read_text())
        assert meta["batch"] == 1 and meta["num_inference_steps"] == 3
        assert meta["method"] == "ddpm" and meta["sampler"] == "euler"
        assert meta["schedule"]["prediction_type"] == "v_prediction"
        assert meta["schedule"]["sigma_max"] > meta["schedule"]["sigma_min"]
        assert (art / "denoise.jaxexp").stat().st_size > 0
        assert (art / "decode.jaxexp").stat().st_size > 0

    def test_format_version_checked(self, base_model, tmp_path):
        pipe = SDXLPipeline.from_model(base_model)
        art = _export(pipe, tmp_path / "art")
        meta = json.loads((art / "meta.json").read_text())
        meta["format_version"] = 999
        (art / "meta.json").write_text(json.dumps(meta))
        with pytest.raises(ValueError, match="format_version"):
            AOTPipeline.load(art, base_model.params, pipe.tokenizers)

    def test_export_requires_params(self, tmp_path):
        model = SDXLModel.create(tiny=True, dtype=jnp.float32)  # no init
        pipe = SDXLPipeline.from_model(model)
        with pytest.raises(ValueError, match="missing components"):
            _export(pipe, tmp_path / "art")

    def test_cli_flags(self):
        from sdxl_training_improvements_tpu.generate import build_parser
        args = build_parser().parse_args(
            ["--model", "m", "--prompt", "p", "--export-aot", "d",
             "--aot-platforms", "cpu"])
        assert args.export_aot == "d" and args.aot_platforms == "cpu"
        args = build_parser().parse_args(
            ["--model", "m", "--prompt", "p", "--aot", "d"])
        assert args.aot == "d"

    def test_cli_aot_rejects_other_modes(self, tmp_path):
        from sdxl_training_improvements_tpu.generate import main
        with pytest.raises(SystemExit, match="text2img"):
            main(["--model", "m", "--prompt", "p", "--aot", "d",
                  "--refiner", "r"])

    def test_export_requires_clip_l_when_dual(self, tmp_path):
        """A base (dual-CLIP) model missing only clip_l must fail the
        up-front check, not a raw KeyError inside tracing."""
        model = SDXLModel.create(
            tiny=True, dtype=jnp.float32, init_rng=jax.random.key(3),
            init_components=("unet", "vae", "clip_g"))  # clip_l skipped
        assert model.clip_l is not None  # topology is dual-encoder
        pipe = SDXLPipeline.from_model(model)
        with pytest.raises(ValueError, match="clip_l"):
            _export(pipe, tmp_path / "art")

    def test_load_rejects_refiner_checkpoint_mismatch(self, base_model,
                                                      tmp_path):
        pipe = SDXLPipeline.from_model(base_model)
        art = _export(pipe, tmp_path / "art")
        refiner_like = {k: v for k, v in base_model.params.items()
                        if k != "clip_l"}
        with pytest.raises(ValueError, match="topology"):
            AOTPipeline.load(art, refiner_like, pipe.tokenizers)

    def test_load_rejects_shape_digest_mismatch(self, base_model, tmp_path):
        pipe = SDXLPipeline.from_model(base_model)
        art = _export(pipe, tmp_path / "art")
        other = SDXLModel.create(
            tiny=True, dtype=jnp.float32, init_rng=jax.random.key(4),
            unet_config=UNetConfig.tiny(layers_per_block=2),
            init_components=("unet", "vae", "clip_l", "clip_g"))
        with pytest.raises(ValueError, match="shape digest"):
            AOTPipeline.load(art, other.params, pipe.tokenizers)

    def test_cli_static_flag_conflict_rejected(self, base_model, tmp_path):
        from sdxl_training_improvements_tpu.generate import main
        from sdxl_training_improvements_tpu.config import Config
        from sdxl_training_improvements_tpu.training.checkpoints import (
            export_diffusers)
        ckpt = tmp_path / "ckpt"
        export_diffusers(ckpt, base_model.params, Config(),
                         unet_config=base_model.unet_config)
        pipe = SDXLPipeline.from_pretrained(ckpt, tiny=True)
        art = _export(pipe, tmp_path / "art")  # 3 steps, 32x32, euler
        with pytest.raises(SystemExit, match="static in the"):
            main(["--model", str(ckpt), "--prompt", "p", "--tiny",
                  "--aot", str(art), "--steps", "50",
                  "--out", str(tmp_path / "out")])
        # sampler conflicts too
        with pytest.raises(SystemExit, match="static in the"):
            main(["--model", str(ckpt), "--prompt", "p", "--tiny",
                  "--aot", str(art), "--sampler", "dpmpp_2m",
                  "--out", str(tmp_path / "out")])

    def test_from_pretrained_checkpoint(self, base_model, tmp_path):
        """Artifact + diffusers checkpoint dir — the deployment composition."""
        from sdxl_training_improvements_tpu.config import Config
        from sdxl_training_improvements_tpu.training.checkpoints import (
            export_diffusers)
        ckpt = tmp_path / "ckpt"
        export_diffusers(ckpt, base_model.params, Config(),
                         unet_config=base_model.unet_config)
        pipe = SDXLPipeline.from_pretrained(ckpt, tiny=True)
        art = _export(pipe, tmp_path / "art")
        aot = AOTPipeline.from_pretrained(art, ckpt, tiny=True)
        imgs = aot(["a cat"], seed=0)
        assert imgs[0].shape == (32, 32, 3)
