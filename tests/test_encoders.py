"""CLIP text encoder + VAE tests (tiny configs, CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdxl_training_improvements_tpu.models.clip import (
    CLIPTextConfig, CLIPTextModel, encode_dual)
from sdxl_training_improvements_tpu.models.vae import (
    AutoencoderKL, VAEConfig)


class TestCLIP:
    @pytest.fixture(scope="class")
    def models(self):
        cfg_l = CLIPTextConfig.tiny()
        cfg_g = CLIPTextConfig.tiny(projection=True)
        ml = CLIPTextModel(cfg_l)
        mg = CLIPTextModel(cfg_g)
        ids = jnp.ones((2, 77), dtype=jnp.int32)
        ids = ids.at[:, 5].set(999)  # "eos" = highest id
        pl = ml.init(jax.random.key(0), ids)
        pg = mg.init(jax.random.key(1), ids)
        return ml, pl, mg, pg, ids

    def test_hidden_state_count(self, models):
        ml, pl, *_ , ids = models
        out = ml.apply(pl, ids)
        assert len(out["hidden_states"]) == 3 + 1  # embeddings + 3 layers
        assert out["last_hidden_state"].shape == (2, 77, 32)

    def test_pooled_uses_eos_position(self, models):
        ml, pl, *_ , ids = models
        out = ml.apply(pl, ids)
        # pooled must equal last_hidden_state at the argmax position (5)
        np.testing.assert_allclose(np.asarray(out["pooled_output"]),
                                   np.asarray(out["last_hidden_state"][:, 5]),
                                   rtol=1e-6)

    def test_projection_changes_pooled_dim(self, models):
        _, _, mg, pg, ids = models
        out = mg.apply(pg, ids)
        assert out["pooled_output"].shape == (2, 32)
        # projected pooled differs from raw hidden state
        assert not np.allclose(np.asarray(out["pooled_output"]),
                               np.asarray(out["last_hidden_state"][:, 5]))

    def test_causality(self, models):
        """Changing a later token must not affect earlier positions."""
        ml, pl, *_, ids = models
        out1 = ml.apply(pl, ids)["last_hidden_state"]
        ids2 = ids.at[:, 60].set(123)
        out2 = ml.apply(pl, ids2)["last_hidden_state"]
        np.testing.assert_allclose(np.asarray(out1[:, :60]),
                                   np.asarray(out2[:, :60]), atol=1e-5)
        assert not np.allclose(np.asarray(out1[:, 60:]), np.asarray(out2[:, 60:]))

    def test_encode_dual_concat(self, models):
        ml, pl, mg, pg, ids = models
        out = encode_dual(ml, pl, mg, pg, ids, ids)
        assert out["prompt_embeds"].shape == (2, 77, 64)  # 32 + 32
        assert out["pooled_prompt_embeds"].shape == (2, 32)
        # penultimate (not final-LN) check: equals hidden_states[-2] concat
        hl = ml.apply(pl, ids)["hidden_states"][-2]
        np.testing.assert_allclose(np.asarray(out["prompt_embeds"][..., :32]),
                                   np.asarray(hl), rtol=1e-6)


class TestVAE:
    @pytest.fixture(scope="class")
    def vae(self):
        cfg = VAEConfig.tiny()
        model = AutoencoderKL(cfg)
        px = jnp.zeros((1, 3, 32, 32))
        params = model.init(jax.random.key(0), px, jax.random.key(1))
        return model, params

    def test_encode_shape_and_scaling(self, vae):
        model, params = vae
        px = jax.random.normal(jax.random.key(2), (2, 3, 32, 32))
        # tiny config has 2 stages -> one downsample -> 16x16 latents
        lat = model.apply(params, px, jax.random.key(3), method=model.encode)
        assert lat.shape == (2, 4, 16, 16)
        # deterministic mode = mean * sf
        mean, _ = model.apply(params, px, method=model.moments)
        det = model.apply(params, px, None, sample=False, method=model.encode)
        np.testing.assert_allclose(np.asarray(det),
                                   np.asarray(mean) * 0.13025, rtol=1e-5)

    def test_sampling_is_stochastic(self, vae):
        model, params = vae
        px = jax.random.normal(jax.random.key(2), (1, 3, 32, 32))
        l1 = model.apply(params, px, jax.random.key(10), method=model.encode)
        l2 = model.apply(params, px, jax.random.key(11), method=model.encode)
        assert not np.allclose(np.asarray(l1), np.asarray(l2))

    def test_roundtrip_shapes(self, vae):
        model, params = vae
        px = jax.random.normal(jax.random.key(2), (1, 3, 32, 32))
        out = model.apply(params, px, jax.random.key(3))
        assert out.shape == (1, 3, 32, 32)
        assert np.isfinite(np.asarray(out)).all()

    def test_odd_input_downsample_pad(self, vae):
        """Asymmetric VAE padding: 33x33 input still halves to ceil//2."""
        model, params = vae
        px = jax.random.normal(jax.random.key(2), (1, 3, 34, 34))
        lat = model.apply(params, px, jax.random.key(3), method=model.encode)
        assert lat.shape == (1, 4, 17, 17)
