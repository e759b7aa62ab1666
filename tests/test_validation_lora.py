"""Validation sampling + LoRA adapter tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdxl_training_improvements_tpu.config import Config
from sdxl_training_improvements_tpu.training import checkpoints as C
from sdxl_training_improvements_tpu.models.lora import (
    extend_token_embedding, lora_init, lora_merge, lora_train_wrappers)
from sdxl_training_improvements_tpu.models.sdxl import SDXLModel
from sdxl_training_improvements_tpu.models.tokenizer import TokenizerPair
from sdxl_training_improvements_tpu.training.schedules import NoiseSchedule
from sdxl_training_improvements_tpu.training.validation import (

    ValidationLogger, ValidationSampler, latents_to_images, validation_loss)


# fast lane: `pytest -m "not slow"` (compile-heavy module, README: Testing)
pytestmark = pytest.mark.slow


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


class TestLoRAConfigPath:
    """training.lora.* is a first-class config path (round-2 item): the
    trainer trains the LoRA tree only, dropout matches the reference branch
    semantics (``lora.py:24``), and the adapter exports/imports in the
    diffusers pytorch_lora_weights layout."""

    def _batch(self, model, b=2):
        ucfg = model.unet_config
        k = jax.random.key(9)
        return {
            "vae_latents": jax.random.normal(k, (b, 4, 16, 16)),
            "prompt_embeds": jnp.zeros((b, 77, ucfg.cross_attention_dim)),
            "pooled_prompt_embeds": jnp.zeros((b, ucfg.pooled_embed_dim)),
            "time_ids": jnp.zeros((b, 6)),
            # pin low-sigma timesteps (deterministic-replay override): under
            # the ZTSNR schedule ~70% of uniform draws land where the
            # min-SNR weight is <1e-5 and one optimizer step moves LoRA by
            # ~1e-13 — the movement assertions below would be a coin flip
            # on the PRNG stream
            "timesteps": jnp.asarray([800 + 60 * i for i in range(b)]),
        }

    def test_config_only_lora_finetune_smoke(self, model, tmp_path):
        from sdxl_training_improvements_tpu.training.loop import SDXLTrainer
        cfg = Config()
        cfg.model.model_type = "sdxl_tiny"
        cfg.model.pretrained_model_name = "/nonexistent"
        cfg.training.mixed_precision = "no"
        cfg.training.batch_size = 2
        cfg.training.lora.enabled = True
        cfg.training.lora.rank = 2
        cfg.training.lora.alpha = 1.0
        cfg.tpu.donate_state = False
        cfg.global_config.logging.log_dir = str(tmp_path / "logs")
        trainer = SDXLTrainer(cfg, model=model,
                              output_dir=str(tmp_path / "out"),
                              use_mesh=False)
        # trainable tree is the LoRA tree, not the UNet
        assert all("/kernel" in k for k in trainer.state.params)
        base_before = jax.tree.map(
            lambda x: np.asarray(x).copy(), model.params["unet"])
        state2, metrics = trainer.train_step(trainer.state,
                                             self._batch(model))
        assert np.isfinite(float(metrics["loss"]))
        # LoRA params moved...
        moved = any(
            not np.allclose(np.asarray(a["up"]), np.asarray(b_["up"]))
            for a, b_ in zip(trainer.state.params.values(),
                             state2.params.values()))
        assert moved
        # ...base params did not
        for (p_a, a), (p_b, b_) in zip(
                jax.tree_util.tree_flatten_with_path(base_before)[0],
                jax.tree_util.tree_flatten_with_path(
                    model.params["unet"])[0]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
        # checkpoint writes the adapter file + merged unet
        trainer.state = state2
        path = trainer.save_checkpoint(tag="final")
        C.wait_for_saves()  # saves are async by default; join before reading
        assert (path / "pytorch_lora_weights.safetensors").exists()
        assert (path / "unet" /
                "diffusion_pytorch_model.safetensors").exists()

    def test_dropout_branch_mode(self, model):
        """dropout>0 uses the interception branch: stochastic at train time
        (different rng -> different output), zero-delta at init regardless."""
        base = model.params["unet"]
        lora_params, apply_fn = lora_train_wrappers(
            base, model.unet_apply, jax.random.key(0), rank=2,
            dropout=0.5, module=model.unet)
        b = self._batch(model)
        args = (b["vae_latents"], jnp.zeros((2,)), b["prompt_embeds"],
                b["pooled_prompt_embeds"], b["time_ids"])
        out_base = model.unet_apply(base, *args)
        # up==0 -> delta 0 even under dropout
        out1 = apply_fn(lora_params, *args, rng=jax.random.key(1))
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out_base),
                                   rtol=1e-6)
        # non-zero up: branch is stochastic in rng, merge path (no rng) isn't
        lp = {k: {"down": v["down"],
                  "up": jnp.ones_like(v["up"])}
              for k, v in lora_params.items()}
        o_a = apply_fn(lp, *args, rng=jax.random.key(2))
        o_b = apply_fn(lp, *args, rng=jax.random.key(3))
        assert not np.allclose(np.asarray(o_a), np.asarray(o_b))
        o_det = apply_fn(lp, *args)
        np.testing.assert_array_equal(np.asarray(o_det),
                                      np.asarray(apply_fn(lp, *args)))

    def test_lora_export_import_roundtrip(self, model, tmp_path):
        from sdxl_training_improvements_tpu.training.checkpoints import (
            export_lora, import_lora)
        base = model.params["unet"]
        lora = lora_init(base, jax.random.key(4), rank=3)
        # give up-matrices real values so the roundtrip is non-trivial
        lora = {k: {"down": v["down"],
                    "up": jax.random.normal(jax.random.key(5),
                                            v["up"].shape)}
                for k, v in lora.items()}
        out = export_lora(tmp_path, lora, rank=3, alpha=1.0)
        back = import_lora(out, base)
        assert set(back) == set(lora)
        for k in lora:
            np.testing.assert_allclose(np.asarray(back[k]["down"]),
                                       np.asarray(lora[k]["down"]),
                                       rtol=1e-6)
            np.testing.assert_allclose(np.asarray(back[k]["up"]),
                                       np.asarray(lora[k]["up"]), rtol=1e-6)

    # ---- conv adapters (reference wraps Linear AND Conv2d, lora.py:11-23)

    def test_conv_targets_adapt_conv_kernels(self, model):
        base = model.params["unet"]
        lora = lora_init(base, jax.random.key(0), rank=2,
                         targets=[r"conv"])
        conv_pairs = [v for v in lora.values() if v["down"].ndim == 4]
        assert conv_pairs, "conv targets matched no 4-D kernels"
        for v in conv_pairs:
            kh, kw, cin, r = v["down"].shape
            assert r == 2 and v["up"].shape[0] == 2
        # zero-init identity holds for conv deltas too
        merged = lora_merge(base, lora)
        for a, b in zip(jax.tree.leaves(base), jax.tree.leaves(merged)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)

    def test_conv_branch_matches_merge(self, model):
        """With dropout ~ 0 the interception branch must equal the merged
        forward: conv(x, W) + up-mix(conv(x, down)) == conv(x, W + down*up)
        — validates the branch conv geometry (padding/strides)."""
        ucfg = model.unet_config
        targets = [r"conv", r"attn\d/(to_q|to_out_0)"]
        lora_params, apply_fn = lora_train_wrappers(
            model.params["unet"], model.unet_apply, jax.random.key(1),
            rank=2, targets=targets, dropout=1e-12, module=model.unet)
        # non-trivial adapter: fill ups with noise
        lp = {k: {"down": v["down"],
                  "up": 0.1 * jax.random.normal(
                      jax.random.fold_in(jax.random.key(2), i),
                      v["up"].shape)}
              for i, (k, v) in enumerate(sorted(lora_params.items()))}
        args = (jnp.ones((1, 4, 8, 8)), jnp.array([3.0]),
                jnp.zeros((1, 77, ucfg.cross_attention_dim)),
                jnp.zeros((1, ucfg.pooled_embed_dim)),
                jnp.zeros((1, 6)))
        o_branch = apply_fn(lp, *args, rng=jax.random.key(3))
        o_merge = apply_fn(lp, *args)  # no rng -> merge path
        np.testing.assert_allclose(np.asarray(o_branch),
                                   np.asarray(o_merge), atol=2e-4)

    def test_conv_lora_export_import_roundtrip(self, model, tmp_path):
        from sdxl_training_improvements_tpu.training.checkpoints import (
            export_lora, import_lora)
        base = model.params["unet"]
        lora = lora_init(base, jax.random.key(4), rank=3,
                         targets=[r"conv", r"attn\d/to_q"])
        lora = {k: {"down": v["down"],
                    "up": jax.random.normal(jax.random.key(5),
                                            v["up"].shape)}
                for k, v in lora.items()}
        out = export_lora(tmp_path, lora, rank=3, alpha=1.0)
        back = import_lora(out, base)
        assert set(back) == set(lora)
        assert any(np.asarray(v["down"]).ndim == 4 for v in back.values())
        for k in lora:
            np.testing.assert_allclose(np.asarray(back[k]["down"]),
                                       np.asarray(lora[k]["down"]),
                                       rtol=1e-6)
            np.testing.assert_allclose(np.asarray(back[k]["up"]),
                                       np.asarray(lora[k]["up"]), rtol=1e-6)
        # merged deltas agree end to end (the property consumers rely on)
        m_a = lora_merge(base, lora, alpha=1.0)
        m_b = lora_merge(base, back, alpha=1.0)
        for a, b in zip(jax.tree.leaves(m_a), jax.tree.leaves(m_b)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)


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


class TestNegativePrompts:
    def test_sampler_accepts_negative_prompts(self, model, tmp_path):
        from sdxl_training_improvements_tpu.models.tokenizer import (
            TokenizerPair)
        from sdxl_training_improvements_tpu.training.schedules import (
            NoiseSchedule)
        sampler = ValidationSampler(model, TokenizerPair.fallback(vocab_size=1000),
                                    NoiseSchedule.create(),
                                    num_inference_steps=3)
        imgs_a = sampler.generate(model.params["unet"], ["a cat"],
                                  jax.random.key(0), height=32, width=32)
        imgs_b = sampler.generate(model.params["unet"], ["a cat"],
                                  jax.random.key(0), height=32, width=32,
                                  negative_prompts=["blurry, low quality"])
        assert imgs_a[0].shape == imgs_b[0].shape
        # the negative prompt must change the unconditional CFG rows
        # (check at the denoiser level — the tiny random VAE decodes
        # everything to near-gray, so uint8 images can't discriminate)
        ids_pos, ids_pos_g = TokenizerPair.fallback(vocab_size=1000)(["a cat", ""])
        ids_neg, ids_neg_g = TokenizerPair.fallback(vocab_size=1000)(
            ["a cat", "blurry, low quality"])
        enc_pos = model.encode_prompt(jnp.asarray(ids_pos),
                                      jnp.asarray(ids_pos_g))
        enc_neg = model.encode_prompt(jnp.asarray(ids_neg),
                                      jnp.asarray(ids_neg_g))
        assert not np.allclose(np.asarray(enc_pos["prompt_embeds"][1]),
                               np.asarray(enc_neg["prompt_embeds"][1]))
        with pytest.raises(ValueError, match="must match prompts"):
            sampler.generate(model.params["unet"], ["a", "b"],
                             jax.random.key(0), height=32, width=32,
                             negative_prompts=["only one"])


class TestMeshServing:
    """Mesh-parallel inference: the sampler TP-splits the UNet over the
    tensor axis and shards the CFG-stacked batch over data x fsdp — the
    serving analogue of the training parallelism (same TP_RULES).  The
    reference serves through a single-GPU diffusers pipeline
    (``sdxl.py:188-198``); here a mesh is a first-class pipeline arg."""

    def test_mesh_sampler_matches_single_device(self, model):
        from sdxl_training_improvements_tpu.parallel import mesh as M
        sched = NoiseSchedule.create(num_timesteps=50)
        kwargs = dict(num_inference_steps=3, guidance_scale=3.0)
        single = ValidationSampler(model, TokenizerPair.fallback(vocab_size=1000), sched,
                                   **kwargs)
        mesh = M.create_mesh((2, 2, 2))
        sharded = ValidationSampler(model, TokenizerPair.fallback(vocab_size=1000), sched,
                                    mesh=mesh, **kwargs)
        prompts = ["a cat", "a dog"]  # CFG stack 4 rows = data x fsdp
        a = single.generate(model.params["unet"], prompts, jax.random.key(0),
                            height=32, width=32)
        b = sharded.generate(model.params["unet"], prompts, jax.random.key(0),
                             height=32, width=32)
        assert len(b) == 2 and b[0].shape == (32, 32, 3)
        # TP changes only the matmul reduction order: uint8 images must
        # agree to quantization noise
        for ia, ib in zip(a, b):
            assert np.abs(ia.astype(np.int32) - ib.astype(np.int32)).max() <= 2

    def test_mesh_flow_sampler_runs(self, model):
        from sdxl_training_improvements_tpu.parallel import mesh as M
        mesh = M.create_mesh((2, 2, 2))
        sampler = ValidationSampler(model, TokenizerPair.fallback(vocab_size=1000),
                                    NoiseSchedule.create(),
                                    num_inference_steps=3,
                                    method="flow_matching", mesh=mesh)
        imgs = sampler.generate(model.params["unet"], ["a", "b"],
                                jax.random.key(1), height=32, width=32)
        assert len(imgs) == 2 and imgs[0].shape == (32, 32, 3)

    def test_pipeline_threads_mesh(self, model):
        from sdxl_training_improvements_tpu.parallel import mesh as M
        from sdxl_training_improvements_tpu.pipelines import SDXLPipeline
        mesh = M.create_mesh((2, 2, 2))
        pipe = SDXLPipeline.from_model(model, mesh=mesh)
        assert pipe.mesh is mesh
        imgs = pipe(["x", "y"], height=32, width=32, num_inference_steps=2)
        assert len(imgs) == 2

    def test_indivisible_batch_falls_back(self, model):
        """One prompt -> 2 CFG rows on a dp=4 mesh: the batch constraint
        must no-op (not crash) and sampling still succeeds."""
        from sdxl_training_improvements_tpu.parallel import mesh as M
        mesh = M.create_mesh((2, 2, 2))
        sampler = ValidationSampler(model, TokenizerPair.fallback(vocab_size=1000),
                                    NoiseSchedule.create(),
                                    num_inference_steps=2, mesh=mesh)
        imgs = sampler.generate(model.params["unet"], ["solo"],
                                jax.random.key(2), height=32, width=32)
        assert len(imgs) == 1


class TestReviewRegressions:
    """Round-2 self-review findings (code-review pass)."""

    def test_lora_validation_images_actually_render(self, model, tmp_path):
        """LoRA mode must merge the adapter before sampling — previously
        the raw pair tree hit the UNet and the failure was swallowed."""
        from sdxl_training_improvements_tpu.training.loop import SDXLTrainer
        cfg = Config()
        cfg.model.model_type = "sdxl_tiny"
        cfg.model.pretrained_model_name = "/nonexistent"
        cfg.training.mixed_precision = "no"
        cfg.training.num_inference_steps = 2
        cfg.training.lora.enabled = True
        cfg.training.lora.rank = 2
        cfg.tpu.donate_state = False
        cfg.data.image_size = 32
        cfg.data.validation_prompts = ["a validation prompt"]
        cfg.global_config.logging.log_dir = str(tmp_path / "logs")
        tr = SDXLTrainer(cfg, model=model, output_dir=str(tmp_path / "out"),
                         use_mesh=False)
        tr.run_validation_images()
        pngs = list((tmp_path / "out").rglob("*.png"))
        assert pngs, "LoRA validation sampling produced no images"

    def test_ema_plus_schedule_free_rejected(self):
        from sdxl_training_improvements_tpu.training.optimizers import (
            make_optimizer)
        cfg = Config()
        cfg.optimizer.optimizer_type = "adamw_schedule_free_kahan"
        cfg.training.ema_decay = 0.999
        with pytest.raises(ValueError, match="schedule-free"):
            make_optimizer(cfg)

    def test_import_lora_skips_foreign_prefixes(self, model, tmp_path):
        from sdxl_training_improvements_tpu.models.lora import lora_init
        from sdxl_training_improvements_tpu.models.weights import (
            save_safetensors)
        from sdxl_training_improvements_tpu.training.checkpoints import (
            export_lora, import_lora)
        base = model.params["unet"]
        lora = lora_init(base, jax.random.key(0), rank=2)
        out = export_lora(tmp_path, lora, rank=2, alpha=1.0)
        # append a text_encoder adapter key like real diffusers LoRA files
        from safetensors.numpy import load_file
        state = load_file(str(out))
        state["text_encoder.text_model.encoder.layers.0.self_attn.q_proj"
              ".lora_A.weight"] = np.zeros((2, 32), np.float32)
        save_safetensors(state, out)
        back = import_lora(out, base)  # must not raise
        assert set(back) == set(lora)


class TestFinetuneDemoSmoke:
    """The end-to-end fine-tune proof's CI smoke (VERDICT round-4 #2):
    `tools/finetune_demo.py --fast` must move the concept score in the
    right DIRECTION (the full-margin gate is the full run's job — fast
    step counts only buy direction, not the 0.03 coverage bar)."""

    def test_fast_demo_direction(self, tmp_path, monkeypatch):
        import importlib.util
        import sys as _sys
        from pathlib import Path
        spec = importlib.util.spec_from_file_location(
            "finetune_demo",
            Path(__file__).parent.parent / "tools" / "finetune_demo.py")
        demo = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(demo)
        # redirect the demo's work/artifact trees into the tmp dir
        monkeypatch.setattr(demo, "WORK", tmp_path / "work")
        monkeypatch.setattr(demo, "ART", tmp_path / "art")
        demo.WORK.mkdir(parents=True)
        demo.ART.mkdir(parents=True)
        logs = []
        demo.stage_pretrain(logs.append, fast=True)
        out = demo.stage_lora(logs.append, fast=True, gate=False)
        assert out["concept_score_after"] > out["concept_score_before"], (
            out["concept_score_before"], out["concept_score_after"])
