"""End-to-end orchestration tests: logging, throughput, trainer loop, CLI."""
import json
import logging as pylog

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdxl_training_improvements_tpu.config import Config
from sdxl_training_improvements_tpu.core.logging import (
    LogConfig, MetricsTracker, ProgressPredictor, UnifiedLogger, WandbLogger)
from sdxl_training_improvements_tpu.core.profiling import (
    ThroughputMonitor, device_memory_stats)
from sdxl_training_improvements_tpu.models.tokenizer import (

    HashTokenizer, TokenizerPair)


# fast lane: `pytest -m "not slow"` (compile-heavy module, README: Testing)
pytestmark = pytest.mark.slow


class TestLogging:
    def test_metrics_tracker(self):
        mt = MetricsTracker(window_size=3)
        for v in [1, 2, 3, 4]:
            mt.update("loss", v)
        assert mt.get_average("loss") == 3.0  # window keeps last 3
        assert mt.get_average("nope") is None
        mt.update_many({"a": 1.0, "bad": "str"})
        assert mt.get_all_averages()["a"] == 1.0

    def test_progress_predictor(self):
        pp = ProgressPredictor()
        pp.update()
        assert pp.eta_seconds(10) is None
        pp.update()
        assert pp.eta_seconds(10) is not None
        assert ProgressPredictor.format_time(3725) == "1h02m05s"
        assert ProgressPredictor.format_time(65) == "1m05s"
        assert ProgressPredictor.format_time(None) == "??"

    def test_unified_logger_file_and_metrics(self, tmp_path):
        lg = UnifiedLogger(LogConfig(name="t1", log_dir=str(tmp_path),
                                     filename="t.log", use_wandb=False))
        lg.info("Starting run")
        lg.log_metrics({"loss": 0.5}, step=1)
        lg.log_metrics({"loss": 0.3}, step=2)
        assert lg.metrics.get_average("loss") == 0.4
        lg.update_progress(10, 100)
        lg.finish()
        assert (tmp_path / "t.log").read_text().count("Starting") >= 1

    def test_wandb_noop_without_wandb(self):
        wl = WandbLogger(project="x")  # wandb not installed -> inert
        assert not wl.active
        wl.log_metrics({"a": 1}, step=0)
        wl.log_images({"img": np.zeros((4, 4, 3))})
        wl.finish()


class TestThroughput:
    def test_metrics(self):
        tm = ThroughputMonitor(batch_size=4)
        for _ in range(3):
            tm.start_batch()
            tm.end_batch()
        m = tm.get_metrics()
        assert m["throughput/samples_per_sec"] > 0
        assert m["throughput/batch_time_ms"] >= 0
        assert tm.total_samples == 12

    def test_pickle_roundtrip(self):
        import pickle
        tm = ThroughputMonitor()
        tm.start_batch(); tm.end_batch()
        tm2 = pickle.loads(pickle.dumps(tm))
        assert len(tm2.batch_times) == 1

    def test_device_memory_stats_shape(self):
        stats = device_memory_stats()
        assert isinstance(stats, dict)


class TestTokenizer:
    def test_hash_tokenizer_layout(self):
        t = HashTokenizer(vocab_size=1000, max_length=16)
        ids = t(["hello world", ""])
        assert ids.shape == (2, 16)
        assert ids[0, 0] == 998  # bos
        assert ids[0, 3] == 999  # eos after 2 tokens
        # eos-argmax pooling position: first occurrence of max id
        assert int(np.argmax(ids[0])) == 3
        assert int(np.argmax(ids[1])) == 1  # empty caption: bos then eos

    def test_deterministic(self):
        t = HashTokenizer()
        np.testing.assert_array_equal(t(["a cat"]), t(["a cat"]))

    def test_pair_fallback(self):
        pair = TokenizerPair.fallback(max_length=77)
        l, g = pair(["x"])
        assert l.shape == g.shape == (1, 77)


@pytest.fixture
def trainer_setup(tmp_path):
    """Tiny model + synthetic cached dataset + config -> SDXLTrainer."""
    from PIL import Image
    from sdxl_training_improvements_tpu.data.buckets import supported_dims_buckets
    from sdxl_training_improvements_tpu.data.cache import CacheManager
    from sdxl_training_improvements_tpu.data.dataset import AspectBucketDataset
    from sdxl_training_improvements_tpu.models.sdxl import SDXLModel

    rng = np.random.default_rng(0)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i in range(4):
        Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
                        ).save(img_dir / f"i{i}.png")
        (img_dir / f"i{i}.txt").write_text(f"caption {i}")

    cfg = Config()
    cfg.data.train_data_dir = [str(img_dir)]
    cfg.training.batch_size = 2
    cfg.training.gradient_accumulation_steps = 1
    cfg.training.num_epochs = 2
    cfg.training.mixed_precision = "no"
    cfg.training.save_every = 0
    cfg.optimizer.optimizer_type = "adamw"
    cfg.optimizer.learning_rate = 1e-4
    cfg.global_config.cache.cache_dir = str(tmp_path / "cache")
    cfg.global_config.image.supported_dims = [[64, 64]]
    cfg.global_config.image.min_size = [32, 32]
    cfg.global_config.image.max_size = [96, 96]
    cfg.global_config.logging.log_dir = str(tmp_path / "logs")
    cfg.global_config.logging.log_every = 1

    model = SDXLModel.create(
        tiny=True, dtype=jnp.float32, init_rng=jax.random.key(0),
        init_components=("unet", "vae", "clip_l", "clip_g"))

    paths = sorted(str(p) for p in img_dir.glob("*.png"))
    captions = [f"caption {i}" for i in range(4)]
    cm = CacheManager(tmp_path / "cache")
    ds = AspectBucketDataset(cfg, paths, captions, cm,
                             buckets=supported_dims_buckets(cfg))
    return cfg, model, ds, tmp_path


class TestTrainerLoop:
    def test_full_train_run(self, trainer_setup):
        cfg, model, ds, tmp_path = trainer_setup
        from sdxl_training_improvements_tpu.training.loop import SDXLTrainer
        trainer = SDXLTrainer(cfg, model=model, dataset=ds,
                              output_dir=str(tmp_path / "out"),
                              use_mesh=False)
        trainer.prepare_data()  # real precompute via tiny VAE/CLIP
        assert ds.cache.is_cached(ds.image_paths[0])
        metrics = trainer.train(num_epochs=2)
        assert np.isfinite(metrics["loss"])
        assert int(trainer.state.step) == 4  # 2 epochs x 2 batches
        final = tmp_path / "out" / "final_checkpoint"
        assert (final / "state").exists()
        assert (final / "unet" / "diffusion_pytorch_model.safetensors").exists()
        assert json.loads((final / "config.json").read_text())

    def test_resume_continues(self, trainer_setup):
        cfg, model, ds, tmp_path = trainer_setup
        from sdxl_training_improvements_tpu.training.loop import SDXLTrainer
        t1 = SDXLTrainer(cfg, model=model, dataset=ds,
                         output_dir=str(tmp_path / "out"), use_mesh=False)
        t1.prepare_data()
        t1.train(num_epochs=1)
        step1 = int(t1.state.step)
        cfg.training.resume_from = "auto"
        t2 = SDXLTrainer(cfg, model=model, dataset=ds,
                         output_dir=str(tmp_path / "out"), use_mesh=False)
        assert int(t2.state.step) == step1
        # completed epochs are NOT replayed: training to the same horizon
        # is a no-op, extending the horizon runs only the new epoch
        t2.train(num_epochs=1)
        assert int(t2.state.step) == step1
        t2.train(num_epochs=2)
        assert int(t2.state.step) == 2 * step1


class TestVariantFineTune:
    """Checkpoint-declared topology through the TRAINING path: a refiner
    (single-encoder, 5 time-ids) fine-tunes end to end; an inpainting
    (9-channel) checkpoint is refused loudly (no mask-channel data source
    in the training pipeline yet)."""

    def _export_variant(self, tmp_path, cfg, *, refiner: bool):
        from sdxl_training_improvements_tpu.models.sdxl import SDXLModel
        from sdxl_training_improvements_tpu.models.unet import UNetConfig
        from sdxl_training_improvements_tpu.training.checkpoints import (
            export_diffusers)
        if refiner:
            ucfg = UNetConfig.tiny(
                num_time_ids=5, cross_attention_dim=32,
                projection_class_embeddings_input_dim=32 + 5 * 8)
            comps = ("unet", "vae", "clip_g")
        else:
            ucfg = UNetConfig.tiny(in_channels=9)
            comps = ("unet", "vae", "clip_l", "clip_g")
        m = SDXLModel.create(tiny=True, dtype=jnp.float32, unet_config=ucfg,
                             refiner=refiner, init_rng=jax.random.key(5),
                             init_components=comps)
        ckpt = tmp_path / ("refiner_ckpt" if refiner else "inpaint_ckpt")
        export_diffusers(ckpt, m.params, cfg, unet_config=ucfg)
        return ckpt

    def test_refiner_checkpoint_finetunes(self, trainer_setup):
        cfg, _, ds, tmp_path = trainer_setup
        from sdxl_training_improvements_tpu.training.loop import SDXLTrainer
        ckpt = self._export_variant(tmp_path, cfg, refiner=True)
        cfg.model.model_type = "sdxl_tiny"
        cfg.model.pretrained_model_name = str(ckpt)
        trainer = SDXLTrainer(cfg, dataset=ds,
                              output_dir=str(tmp_path / "ref_out"),
                              use_mesh=False)
        assert trainer.model.clip_l is None  # single-encoder bundle
        assert trainer.model.unet_config.num_time_ids == 5
        trainer.prepare_data()  # precompute through CLIP-G alone
        metrics = trainer.train(num_epochs=1)
        assert np.isfinite(metrics["loss"])
        # the re-export keeps the refiner layout (no text_encoder/)
        final = tmp_path / "ref_out" / "final_checkpoint"
        assert (final / "text_encoder_2").exists()
        assert not (final / "text_encoder").exists()
        raw = json.loads((final / "unet" / "config.json").read_text())
        assert raw["projection_class_embeddings_input_dim"] == 32 + 5 * 8

    def test_inpainting_checkpoint_refused(self, trainer_setup):
        cfg, _, ds, tmp_path = trainer_setup
        from sdxl_training_improvements_tpu.training.loop import SDXLTrainer
        ckpt = self._export_variant(tmp_path, cfg, refiner=False)
        cfg.model.model_type = "sdxl_tiny"
        cfg.model.pretrained_model_name = str(ckpt)
        with pytest.raises(ValueError, match="inpainting"):
            SDXLTrainer(cfg, dataset=ds,
                        output_dir=str(tmp_path / "inp_out"),
                        use_mesh=False)

    def test_adapt_batch_time_ids(self):
        from sdxl_training_improvements_tpu.data.pipeline import (
            adapt_batch_time_ids)
        batch = {"time_ids": np.asarray(
            [[64, 64, 0, 0, 64, 64], [32, 48, 1, 2, 32, 48]], np.float32)}
        out = adapt_batch_time_ids(batch, 5, aesthetic_score=6.0)
        np.testing.assert_array_equal(
            out["time_ids"],
            np.asarray([[64, 64, 0, 0, 6.0], [32, 48, 1, 2, 6.0]],
                       np.float32))
        # identity when widths already match; loud error otherwise
        assert adapt_batch_time_ids(batch, 6) is batch
        with pytest.raises(ValueError, match="cannot adapt"):
            adapt_batch_time_ids(batch, 4)


class TestCLI:
    def test_parser_defaults(self):
        from sdxl_training_improvements_tpu.main import build_parser
        args = build_parser().parse_args([])
        assert args.config == "config.yaml"
        assert args.resume is None
        args = build_parser().parse_args(["--resume"])
        assert args.resume == "auto"
        args = build_parser().parse_args(["--resume", "/x", "--method",
                                          "flow_matching"])
        assert args.resume == "/x" and args.method == "flow_matching"


class TestTrainerWithMesh:
    def test_full_train_on_8dev_mesh(self, trainer_setup, tmp_path):
        """Orchestrated loop with the real mesh path (DP over 8 CPU devices)."""
        cfg, model, _, _ = trainer_setup
        from PIL import Image
        from sdxl_training_improvements_tpu.data.buckets import (
            supported_dims_buckets)
        from sdxl_training_improvements_tpu.data.cache import CacheManager
        from sdxl_training_improvements_tpu.data.dataset import (
            AspectBucketDataset)
        from sdxl_training_improvements_tpu.training.loop import SDXLTrainer
        rng = np.random.default_rng(1)
        img_dir = tmp_path / "mesh_imgs"
        img_dir.mkdir()
        for i in range(8):
            Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
                            ).save(img_dir / f"m{i}.png")
        paths = sorted(str(p) for p in img_dir.glob("*.png"))
        ds = AspectBucketDataset(cfg, paths, [f"c{i}" for i in range(8)],
                                 CacheManager(tmp_path / "mesh_cache"),
                                 buckets=supported_dims_buckets(cfg))
        cfg.training.batch_size = 8  # one example per device
        trainer = SDXLTrainer(cfg, model=model, dataset=ds,
                              output_dir=str(tmp_path / "mesh_out"),
                              use_mesh=True)
        trainer.prepare_data()
        metrics = trainer.train(num_epochs=1)
        assert np.isfinite(float(metrics["loss"]))
        assert dict(trainer.mesh.shape)["data"] == 8

    def test_indivisible_batch_rejected_at_construction(self, trainer_setup):
        """batch_size not divisible by the data-mesh extent fails FAST at
        trainer construction with an actionable message (it used to
        surface as a cryptic device_put error from inside the prefetch
        worker mid-epoch)."""
        cfg, model, ds, tmp_path = trainer_setup
        from sdxl_training_improvements_tpu.training.loop import SDXLTrainer
        cfg.training.batch_size = 2  # not divisible by 8 devices
        with pytest.raises(ValueError,
                           match="divisible by the data-parallel mesh"):
            SDXLTrainer(cfg, model=model, dataset=ds,
                        output_dir=str(tmp_path / "bad_out"), use_mesh=True)

    def test_prefetch_worker_errors_propagate(self):
        """An exception inside the background prefetch worker must surface
        to the consumer, not silently end the epoch."""
        from sdxl_training_improvements_tpu.data.pipeline import (
            prefetch_to_device)

        def gen():
            yield {"x": np.zeros((2, 2), np.float32)}
            raise RuntimeError("worker exploded")

        it = prefetch_to_device(gen(), mesh=None, prefetch=1)
        next(it)
        with pytest.raises(RuntimeError, match="worker exploded"):
            list(it)


class TestPipeline:
    def test_pipeline_from_model(self, trainer_setup):
        cfg, model, ds, tmp_path = trainer_setup
        import numpy as np
        from sdxl_training_improvements_tpu.pipelines import SDXLPipeline
        pipe = SDXLPipeline.from_model(model)
        imgs = pipe(["a test prompt"], height=32, width=32,
                    num_inference_steps=2, guidance_scale=2.0, seed=1)
        assert len(imgs) == 1 and imgs[0].shape == (32, 32, 3)
        assert imgs[0].dtype == np.uint8


class TestValidationInTraining:
    def test_validation_images_at_checkpoint(self, trainer_setup):
        cfg, model, ds, tmp_path = trainer_setup
        from sdxl_training_improvements_tpu.training.loop import SDXLTrainer
        cfg.training.save_every = 1
        cfg.training.num_inference_steps = 2
        cfg.data.image_size = 32
        cfg.data.validation_prompts = ["a validation prompt"]
        trainer = SDXLTrainer(cfg, model=model, dataset=ds,
                              output_dir=str(tmp_path / "vout"),
                              use_mesh=False)
        trainer.prepare_data()
        trainer.train(num_epochs=1)
        pngs = list((tmp_path / "vout").glob("validation-*/*.png"))
        assert pngs, "no validation images produced"


class TestValidationLossWiring:
    """``data.validation_data_dir`` drives a held-out loss at epoch end and
    best-checkpoint selection follows it (round-3 closure of the dead
    ``validation_loss`` surface)."""

    def _val_dir(self, tmp_path):
        from PIL import Image
        rng = np.random.default_rng(7)
        val_dir = tmp_path / "val_imgs"
        val_dir.mkdir()
        for i in range(2):
            Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
                            ).save(val_dir / f"v{i}.png")
            (val_dir / f"v{i}.txt").write_text(f"val caption {i}")
        return val_dir

    def test_no_val_dir_means_none(self, trainer_setup):
        cfg, model, ds, tmp_path = trainer_setup
        from sdxl_training_improvements_tpu.training.loop import SDXLTrainer
        trainer = SDXLTrainer(cfg, model=model, dataset=ds,
                              output_dir=str(tmp_path / "nv"), use_mesh=False)
        assert trainer.prepare_validation_data() is None

    def test_val_loss_integration(self, trainer_setup):
        cfg, model, ds, tmp_path = trainer_setup
        from sdxl_training_improvements_tpu.training.loop import SDXLTrainer
        cfg.data.validation_data_dir = [str(self._val_dir(tmp_path))]
        trainer = SDXLTrainer(cfg, model=model, dataset=ds,
                              output_dir=str(tmp_path / "vl"), use_mesh=False)
        trainer.prepare_data()
        val_ds = trainer.prepare_validation_data()
        assert val_ds is not None and len(val_ds) == 2
        # held-out entries precomputed into their own cache subdir
        assert val_ds.cache is not None
        assert val_ds.cache.is_cached(val_ds.image_paths[0])
        v = trainer.run_validation_loss(val_ds)
        assert v is not None and np.isfinite(v)
        # deterministic: same params -> same value
        assert trainer.run_validation_loss(val_ds) == v

    def test_best_checkpoint_follows_val_loss(self, trainer_setup):
        cfg, model, ds, tmp_path = trainer_setup
        from sdxl_training_improvements_tpu.training.loop import SDXLTrainer
        cfg.data.validation_data_dir = [str(self._val_dir(tmp_path))]
        out = tmp_path / "vbest"
        trainer = SDXLTrainer(cfg, model=model, dataset=ds,
                              output_dir=str(out), use_mesh=False)
        trainer.prepare_data()
        vals = iter([5.0, 0.125])
        seen = []

        def fake(val_ds):
            seen.append(val_ds)
            return next(vals)

        trainer.run_validation_loss = fake
        trainer.train(num_epochs=2)
        assert len(seen) == 2  # once per epoch, real val dataset built
        assert seen[0] is not None
        # best tracks the injected val sequence, not the train loss
        assert trainer.best_loss == 0.125
        assert (out / "best_checkpoint" / "state").exists()
        meta = json.loads(
            (out / "best_checkpoint" / "trainer_state.json").read_text())
        assert meta["best_loss"] == 0.125

    def test_custom_method_skips_images_not_loss(self, trainer_setup):
        cfg, model, ds, tmp_path = trainer_setup
        from sdxl_training_improvements_tpu.training.loop import SDXLTrainer
        cfg.training.method = "example_method"
        cfg.data.validation_prompts = ["p"]
        trainer = SDXLTrainer(cfg, model=model, dataset=ds,
                              output_dir=str(tmp_path / "cm"), use_mesh=False)
        trainer.run_validation_images()  # warns + returns, must not raise
        pngs = list((tmp_path / "cm").glob("validation-*/*.png"))
        assert not pngs


class TestGenerateCLI:
    def test_generate_from_exported_checkpoint(self, trainer_setup, tmp_path):
        """Export a checkpoint, then sample through the generate CLI."""
        cfg, model, ds, _ = trainer_setup
        from sdxl_training_improvements_tpu.generate import main as gen_main
        from sdxl_training_improvements_tpu.training.checkpoints import (
            export_diffusers)
        ckpt = tmp_path / "ckpt"
        export_diffusers(ckpt, model.params)
        out = tmp_path / "samples"
        rc = gen_main(["--model", str(ckpt), "--tiny",
                       "--prompt", "a test", "--negative", "blurry",
                       "--height", "32", "--width", "32", "--steps", "2",
                       "--out", str(out)])
        assert rc == 0
        pngs = list(out.glob("*.png"))
        assert len(pngs) == 1
