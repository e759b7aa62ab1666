"""Validation sampling + LoRA adapter tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdxl_training_improvements_tpu.config import Config
from sdxl_training_improvements_tpu.models.lora import (
    extend_token_embedding, lora_init, lora_merge, lora_train_wrappers)
from sdxl_training_improvements_tpu.models.sdxl import SDXLModel
from sdxl_training_improvements_tpu.models.tokenizer import TokenizerPair
from sdxl_training_improvements_tpu.training.schedules import NoiseSchedule
from sdxl_training_improvements_tpu.training.validation import (
    ValidationLogger, ValidationSampler, latents_to_images, validation_loss)


@pytest.fixture(scope="module")
def model():
    return SDXLModel.create(
        tiny=True, dtype=jnp.float32, init_rng=jax.random.key(0),
        init_components=("unet", "vae", "clip_l", "clip_g"))


class TestLoRA:
    def test_init_targets_attention(self, model):
        lora = lora_init(model.params["unet"], jax.random.key(0), rank=2)
        assert len(lora) > 0
        assert all(("to_q" in k or "to_k" in k or "to_v" in k
                    or "to_out_0" in k) for k in lora)
        for v in lora.values():
            assert v["down"].shape[1] == 2 and v["up"].shape[0] == 2
            np.testing.assert_array_equal(np.asarray(v["up"]), 0.0)

    def test_zero_init_is_identity(self, model):
        params = model.params["unet"]
        lora = lora_init(params, jax.random.key(0), rank=2)
        merged = lora_merge(params, lora)
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(merged)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_nonzero_up_changes_output(self, model):
        params = model.params["unet"]
        lora = lora_init(params, jax.random.key(0), rank=2)
        k = next(iter(lora))
        lora[k]["up"] = jnp.ones_like(lora[k]["up"])
        merged = lora_merge(params, lora, alpha=1.0)
        diffs = [float(jnp.abs(a - b).max()) for a, b in
                 zip(jax.tree.leaves(params), jax.tree.leaves(merged))]
        assert max(diffs) > 0

    def test_train_wrapper_grads_flow(self, model):
        ucfg = model.unet_config
        lora_params, apply_fn = lora_train_wrappers(
            model.params["unet"], model.unet_apply, jax.random.key(1), rank=2)
        batch_args = (jnp.zeros((1, 4, 16, 16)), jnp.zeros((1,)),
                      jax.random.normal(jax.random.key(2),
                                        (1, 77, ucfg.cross_attention_dim)),
                      jnp.zeros((1, ucfg.pooled_embed_dim)),
                      jnp.zeros((1, 6)))

        def loss(lp):
            return jnp.mean(apply_fn(lp, *batch_args) ** 2)

        g = jax.grad(loss)(lora_params)
        # up receives gradient (down's grad is 0 at init since up==0)
        gmax = max(float(jnp.abs(v["up"]).max()) for v in g.values())
        assert gmax > 0

    def test_no_match_raises(self, model):
        with pytest.raises(ValueError, match="no kernels matched"):
            lora_init(model.params["unet"], jax.random.key(0),
                      targets=(r"zzz_nothing",))

    def test_extend_token_embedding(self, model):
        new_params, vocab = extend_token_embedding(
            model.params["clip_l"], jax.random.key(0), num_new_tokens=3)
        def emb_shape(tree):
            for k, v in tree.items():
                if k == "token_embedding":
                    return v["embedding"].shape
                if isinstance(v, dict):
                    s = emb_shape(v)
                    if s:
                        return s
        old = emb_shape(model.params["clip_l"])
        new = emb_shape(new_params)
        assert new[0] == old[0] + 3
        assert vocab == old[0]


class TestValidation:
    def test_latents_to_images(self):
        imgs = latents_to_images(jnp.zeros((2, 3, 8, 8)))
        assert len(imgs) == 2
        assert imgs[0].shape == (8, 8, 3) and imgs[0].dtype == np.uint8
        np.testing.assert_array_equal(imgs[0], 127)

    def test_sampler_generates(self, model, tmp_path):
        sched = NoiseSchedule.create(num_timesteps=50)
        sampler = ValidationSampler(model, TokenizerPair.fallback(
            vocab_size=1000), sched, num_inference_steps=4,
            guidance_scale=3.0)
        imgs = sampler.generate(model.params["unet"], ["a cat"],
                                jax.random.key(0), height=64, width=64)
        assert len(imgs) == 1
        assert imgs[0].shape == (64, 64, 3)

    def test_validation_logger_saves_pngs(self, model, tmp_path):
        sched = NoiseSchedule.create(num_timesteps=50)
        sampler = ValidationSampler(model, TokenizerPair.fallback(
            vocab_size=1000), sched, num_inference_steps=2)
        vl = ValidationLogger(sampler, ["prompt one", "prompt two"],
                              tmp_path, height=32, width=32)
        paths = vl.run_validation(model.params["unet"], step=7)
        assert len(paths) == 2
        assert all(p.exists() for p in paths)
        assert "validation-000007" in str(paths[0])

    def test_validation_loss(self, model, tmp_path):
        from PIL import Image
        from sdxl_training_improvements_tpu.data.buckets import (
            supported_dims_buckets)
        from sdxl_training_improvements_tpu.data.cache import CacheManager
        from sdxl_training_improvements_tpu.data.dataset import (
            AspectBucketDataset)
        rng = np.random.default_rng(0)
        for i in range(2):
            Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
                            ).save(tmp_path / f"v{i}.png")
        cfg = Config()
        cfg.training.batch_size = 2
        cfg.global_config.image.supported_dims = [[64, 64]]
        cfg.global_config.image.min_size = [32, 32]
        cfg.global_config.image.max_size = [96, 96]
        paths = sorted(str(p) for p in tmp_path.glob("v*.png"))
        cm = CacheManager(tmp_path / "cache")
        ds = AspectBucketDataset(cfg, paths, ["a", "b"], cm,
                                 buckets=supported_dims_buckets(cfg))
        ucfg = model.unet_config
        for p in paths:
            cm.save_latents(cm.get_cache_key(p),
                            vae_latents=rng.normal(size=(4, 8, 8)).astype(np.float32),
                            time_ids=np.zeros(6, np.float32),
                            prompt_embeds=np.zeros((77, ucfg.cross_attention_dim), np.float32),
                            pooled_prompt_embeds=np.zeros(ucfg.pooled_embed_dim, np.float32))
        loss = validation_loss(model.unet_apply, model.params["unet"], ds,
                               NoiseSchedule.from_config(cfg), cfg,
                               jax.random.key(0))
        assert loss is not None and np.isfinite(loss)
