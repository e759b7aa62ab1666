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


class TestPackageAPI:
    def test_lazy_exports(self):
        import sdxl_training_improvements_tpu as pkg
        assert pkg.Config is not None
        assert pkg.SDXLModel is not None
        assert pkg.NoiseSchedule is not None
        assert callable(pkg.make_optimizer)
        with pytest.raises(AttributeError):
            pkg.nonexistent_thing
