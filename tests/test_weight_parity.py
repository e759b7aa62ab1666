"""Real-checkpoint parity: diffusers-layout weights -> flax -> same function.

The reference inherits model correctness from diffusers
(``src/models/sdxl.py:25-31``); this suite proves the flax rebuild computes
the same function when fed a diffusers-layout state dict:

* **activation parity** — a PyTorch twin with diffusers' exact key naming
  (``tools/torch_twin.py``; validated by reproducing SDXL-base's published
  2,567,463,684 UNet / 83,653,863 VAE parameter counts and 1680/248 tensor
  counts) is randomly initialised, its ``state_dict()`` loaded through
  ``models/weights.py``, and outputs compared fp32 end-to-end;
* **CLIP parity against the REAL HF implementation** — transformers is
  installed, so the dual-encoder path is checked against genuine
  ``CLIPTextModel`` / ``CLIPTextModelWithProjection`` outputs (penultimate
  hidden state + projected EOS pooling, reference ``clip.py:61-91``);
* **bijective key coverage at full SDXL scale** — the flax SDXL param tree
  (via ``jax.eval_shape``, no memory) must map 1:1 onto the vendored
  SDXL-base key manifests (``tests/fixtures/*.json``): no missing keys, no
  unused keys, shapes equal.
"""
import json
import sys
from pathlib import Path
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent))

torch = pytest.importorskip("torch")


@pytest.fixture(autouse=True)
def _full_precision_matmuls():
    """Other tests import the reference, whose module side effects downgrade
    torch to 'medium' (bf16) matmul precision process-wide; these oracle
    comparisons need full fp32."""
    prev = torch.get_float32_matmul_precision()
    torch.set_float32_matmul_precision("highest")
    yield
    torch.set_float32_matmul_precision(prev)

from sdxl_training_improvements_tpu.models import weights as W
from sdxl_training_improvements_tpu.models.clip import (
    CLIPTextConfig, CLIPTextModel, encode_dual)
from sdxl_training_improvements_tpu.models.unet import SDXLUNet, UNetConfig
from sdxl_training_improvements_tpu.models.vae import AutoencoderKL, VAEConfig
from tools.torch_twin import TorchTwinUNet, TorchTwinVAE

FIXTURES = Path(__file__).parent / "fixtures"


def _np_state(module) -> dict:
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


# --------------------------------------------------------------------------
# UNet
# --------------------------------------------------------------------------

class TestUNetParity:
    @pytest.fixture(scope="class")
    def pair(self):
        cfg = UNetConfig.tiny()
        torch.manual_seed(0)
        twin = TorchTwinUNet(cfg).eval()
        flax_unet = SDXLUNet(config=cfg, dtype=jnp.float32,
                             param_dtype=jnp.float32)
        template = flax_unet.init(
            jax.random.key(0),
            jnp.zeros((1, cfg.in_channels, 16, 16)), jnp.zeros((1,)),
            jnp.zeros((1, 77, cfg.cross_attention_dim)),
            jnp.zeros((1, cfg.pooled_embed_dim)), jnp.zeros((1, 6)))
        state = _np_state(twin)
        params = W.hf_to_flax_params(template, state, strict=True)
        return cfg, twin, flax_unet, params, template, state

    def test_bijective_tiny(self, pair):
        _, _, _, _, template, state = pair
        missing, unused = W.check_bijective(template, state)
        assert missing == [] and unused == []

    def test_activations_match(self, pair):
        cfg, twin, flax_unet, params, _, _ = pair
        rng = np.random.default_rng(1)
        b = 2
        sample = rng.standard_normal((b, cfg.in_channels, 16, 16),
                                     dtype=np.float32)
        t = np.array([3.0, 977.0], np.float32)
        ehs = rng.standard_normal((b, 77, cfg.cross_attention_dim),
                                  dtype=np.float32)
        pooled = rng.standard_normal((b, cfg.pooled_embed_dim),
                                     dtype=np.float32)
        tids = np.array([[512, 512, 0, 0, 512, 512]] * b, np.float32)

        with torch.no_grad():
            ref = twin(torch.from_numpy(sample), torch.from_numpy(t),
                       torch.from_numpy(ehs), torch.from_numpy(pooled),
                       torch.from_numpy(tids)).numpy()
        got = np.asarray(flax_unet.apply(params, jnp.asarray(sample),
                                         jnp.asarray(t), jnp.asarray(ehs),
                                         jnp.asarray(pooled),
                                         jnp.asarray(tids)))
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)

    def test_flax_export_roundtrip(self, pair):
        """flax -> state dict -> flax is the identity (export path)."""
        _, _, _, params, template, state = pair
        exported = W.flax_to_hf_state(params)
        assert set(exported) == set(state)
        for k, v in exported.items():
            np.testing.assert_allclose(v, state[k], rtol=1e-6, atol=0)


class TestVAEParity:
    @pytest.fixture(scope="class")
    def pair(self):
        cfg = VAEConfig.tiny()
        torch.manual_seed(0)
        twin = TorchTwinVAE(cfg).eval()
        vae = AutoencoderKL(cfg)
        f = cfg.downscale_factor
        template = vae.init(jax.random.key(0),
                            jnp.zeros((1, 3, f * 8, f * 8)),
                            jax.random.key(1))
        state = _np_state(twin)
        params = W.hf_to_flax_params(template, state, strict=True)
        return cfg, twin, vae, params, template, state

    def test_bijective_tiny(self, pair):
        _, _, _, _, template, state = pair
        missing, unused = W.check_bijective(template, state)
        assert missing == [] and unused == []

    def test_moments_match(self, pair):
        cfg, twin, vae, params, _, _ = pair
        f = cfg.downscale_factor
        rng = np.random.default_rng(2)
        px = rng.uniform(-1, 1, (2, 3, f * 8, f * 8)).astype(np.float32)
        with torch.no_grad():
            m_ref, lv_ref = twin.moments(torch.from_numpy(px))
        m, lv = vae.apply(params, jnp.asarray(px), method=vae.moments)
        np.testing.assert_allclose(np.asarray(m), m_ref.numpy(),
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(lv), lv_ref.numpy(),
                                   rtol=2e-4, atol=2e-4)

    def test_decode_match(self, pair):
        cfg, twin, vae, params, _, _ = pair
        f = cfg.downscale_factor
        rng = np.random.default_rng(3)
        z = rng.standard_normal((1, cfg.latent_channels, 8, 8),
                                dtype=np.float32) * cfg.scaling_factor
        with torch.no_grad():
            ref = twin.decode(torch.from_numpy(z)).numpy()
        got = np.asarray(vae.apply(params, jnp.asarray(z),
                                   method=vae.decode))
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=5e-5)


# --------------------------------------------------------------------------
# CLIP vs the real transformers implementation
# --------------------------------------------------------------------------

class TestCLIPParityVsTransformers:
    @pytest.fixture(scope="class")
    def hf_pair(self):
        from transformers import CLIPTextConfig as HFConfig
        from transformers import CLIPTextModel as HFModel
        from transformers import CLIPTextModelWithProjection as HFProjModel
        # tiny SDXL-shaped dual towers; eos = highest vocab id (CLIP property
        # the EOS-argmax pooling relies on)
        kw = dict(vocab_size=1000, hidden_size=32, intermediate_size=128,
                  num_hidden_layers=3, num_attention_heads=4,
                  max_position_embeddings=77, bos_token_id=998,
                  eos_token_id=999, pad_token_id=999)
        torch.manual_seed(0)
        hf_l = HFModel(HFConfig(hidden_act="quick_gelu", **kw)).eval()
        hf_g = HFProjModel(HFConfig(hidden_act="gelu", projection_dim=32,
                                    **kw)).eval()
        cfg_l = CLIPTextConfig(vocab_size=1000, hidden_size=32, num_layers=3,
                               num_heads=4, intermediate_size=128,
                               hidden_act="quick_gelu", eos_token_id=999)
        cfg_g = CLIPTextConfig(vocab_size=1000, hidden_size=32, num_layers=3,
                               num_heads=4, intermediate_size=128,
                               hidden_act="gelu", projection_dim=32,
                               eos_token_id=999)
        clip_l, clip_g = CLIPTextModel(cfg_l), CLIPTextModel(cfg_g)
        ids0 = jnp.zeros((1, 77), jnp.int32)
        tmpl_l = clip_l.init(jax.random.key(0), ids0)
        tmpl_g = clip_g.init(jax.random.key(1), ids0)
        params_l = W.hf_to_flax_params(
            tmpl_l, W._clip_hf_to_local(_np_state(hf_l)), strict=True)
        params_g = W.hf_to_flax_params(
            tmpl_g, W._clip_hf_to_local(_np_state(hf_g)), strict=True)
        return hf_l, hf_g, clip_l, clip_g, params_l, params_g, tmpl_l, tmpl_g

    @staticmethod
    def _ids(rng, b=2, s=77):
        """Random token ids with one EOS then pad — SDXL tokenizer shape."""
        ids = rng.integers(1, 900, (b, s))
        for i in range(b):
            n = rng.integers(5, s - 1)
            ids[i, n:] = 999  # eos then eos-padding (CLIP pad == eos)
        return ids.astype(np.int64)

    def test_bijective(self, hf_pair):
        hf_l, hf_g, _, _, _, _, tmpl_l, tmpl_g = hf_pair
        for hf, tmpl in ((hf_l, tmpl_l), (hf_g, tmpl_g)):
            state = W._clip_hf_to_local(_np_state(hf))
            state.pop("position_ids", None)  # HF buffer, not a weight
            missing, unused = W.check_bijective(tmpl, state)
            assert missing == [] and unused == []

    def test_penultimate_and_pooled_match(self, hf_pair):
        hf_l, hf_g, clip_l, clip_g, params_l, params_g, _, _ = hf_pair
        rng = np.random.default_rng(0)
        ids = self._ids(rng)
        with torch.no_grad():
            out_l = hf_l(torch.from_numpy(ids), output_hidden_states=True)
            out_g = hf_g(torch.from_numpy(ids), output_hidden_states=True)
        got = encode_dual(clip_l, params_l, clip_g, params_g,
                          jnp.asarray(ids), jnp.asarray(ids))
        ref_prompt = np.concatenate([out_l.hidden_states[-2].numpy(),
                                     out_g.hidden_states[-2].numpy()],
                                    axis=-1)
        np.testing.assert_allclose(np.asarray(got["prompt_embeds"]),
                                   ref_prompt, rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(got["pooled_prompt_embeds"]),
                                   out_g.text_embeds.numpy(),
                                   rtol=2e-4, atol=2e-5)

    def test_last_hidden_state_matches(self, hf_pair):
        hf_l, _, clip_l, _, params_l, _, _, _ = hf_pair
        rng = np.random.default_rng(7)
        ids = self._ids(rng, b=1)
        with torch.no_grad():
            ref = hf_l(torch.from_numpy(ids)).last_hidden_state.numpy()
        got = clip_l.apply(params_l, jnp.asarray(ids))["last_hidden_state"]
        np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4,
                                   atol=2e-5)


# --------------------------------------------------------------------------
# full-SDXL manifest bijection (no weights materialised)
# --------------------------------------------------------------------------

def _manifest_state(path: Path) -> dict:
    manifest = json.loads(path.read_text())
    return {k: SimpleNamespace(shape=tuple(v)) for k, v in manifest.items()}


class TestFullSDXLManifest:
    def test_unet_manifest_pinned(self):
        """The vendored manifest matches the twin (guards fixture drift) and
        SDXL-base's published totals."""
        from tools.torch_twin import build_unet_manifest
        manifest = json.loads(
            (FIXTURES / "sdxl_unet_manifest.json").read_text())
        assert manifest == build_unet_manifest()
        assert len(manifest) == 1680
        assert sum(int(np.prod(s)) for s in manifest.values()) == 2567463684

    def test_vae_manifest_pinned(self):
        from tools.torch_twin import build_vae_manifest
        manifest = json.loads(
            (FIXTURES / "sdxl_vae_manifest.json").read_text())
        assert manifest == build_vae_manifest()
        assert len(manifest) == 248
        assert sum(int(np.prod(s)) for s in manifest.values()) == 83653863

    def test_full_unet_tree_bijective(self):
        """Every SDXL-base UNet tensor maps 1:1 onto the flax tree."""
        cfg = UNetConfig.sdxl()
        unet = SDXLUNet(config=cfg, dtype=jnp.bfloat16,
                        param_dtype=jnp.bfloat16)
        template = jax.eval_shape(
            lambda: unet.init(jax.random.key(0),
                              jnp.zeros((1, 4, 32, 32)), jnp.zeros((1,)),
                              jnp.zeros((1, 77, 2048)), jnp.zeros((1, 1280)),
                              jnp.zeros((1, 6))))
        state = _manifest_state(FIXTURES / "sdxl_unet_manifest.json")
        missing, unused = W.check_bijective(template, state)
        assert missing == [], f"unmapped model params: {missing[:10]}"
        assert unused == [], f"checkpoint keys ignored: {unused[:10]}"

    @pytest.mark.parametrize("name,cfg", [
        ("clip_l", CLIPTextConfig.clip_l()),
        ("clip_g", CLIPTextConfig.clip_g()),
    ])
    def test_full_clip_tree_bijective(self, name, cfg):
        """Full-scale CLIP manifests are generated from the REAL transformers
        library (meta device) — 123,060,480 / 694,659,840 params, the
        published CLIP-L / OpenCLIP-bigG text-tower sizes."""
        model = CLIPTextModel(cfg)
        template = jax.eval_shape(
            lambda: model.init(jax.random.key(0),
                               jnp.zeros((1, 77), jnp.int32)))
        manifest = json.loads(
            (FIXTURES / f"sdxl_{name}_manifest.json").read_text())
        state = {k: SimpleNamespace(shape=tuple(v))
                 for k, v in W._clip_hf_to_local(manifest).items()}
        # _clip_hf_to_local keeps dict values; shapes stay as given
        missing, unused = W.check_bijective(template, state)
        assert missing == [], f"unmapped model params: {missing[:10]}"
        assert unused == [], f"checkpoint keys ignored: {unused[:10]}"

    def test_full_vae_tree_bijective(self):
        cfg = VAEConfig.sdxl()
        vae = AutoencoderKL(cfg)
        template = jax.eval_shape(
            lambda: vae.init(jax.random.key(0), jnp.zeros((1, 3, 256, 256)),
                             jax.random.key(1)))
        state = _manifest_state(FIXTURES / "sdxl_vae_manifest.json")
        missing, unused = W.check_bijective(template, state)
        assert missing == [], f"unmapped model params: {missing[:10]}"
        assert unused == [], f"checkpoint keys ignored: {unused[:10]}"


class TestForeignCheckpointImport:
    def test_import_diffusers_loads_twin_written_checkpoint(self, tmp_path):
        """End-to-end file path: a checkpoint directory authored by the
        torch twin (foreign torch-layout tensors on disk) loads through
        import_diffusers and reproduces the twin's UNet function."""
        from safetensors.numpy import save_file
        from sdxl_training_improvements_tpu.models.sdxl import SDXLModel
        from sdxl_training_improvements_tpu.training.checkpoints import (
            import_diffusers)
        cfg = UNetConfig.tiny()
        torch.manual_seed(5)
        twin = TorchTwinUNet(cfg).eval()
        vcfg = VAEConfig.tiny()
        twin_vae = TorchTwinVAE(vcfg).eval()
        (tmp_path / "unet").mkdir()
        (tmp_path / "vae").mkdir()
        save_file(_np_state(twin),
                  str(tmp_path / "unet" / "diffusion_pytorch_model"
                      ".safetensors"))
        save_file(_np_state(twin_vae),
                  str(tmp_path / "vae" / "diffusion_pytorch_model"
                      ".safetensors"))
        model = SDXLModel.create(tiny=True, dtype=jnp.float32)
        model.params = import_diffusers(model, tmp_path)
        assert set(model.params) == {"unet", "vae"}
        rng = np.random.default_rng(11)
        sample = rng.standard_normal((1, 4, 16, 16), dtype=np.float32)
        t = np.array([250.0], np.float32)
        ehs = rng.standard_normal((1, 77, cfg.cross_attention_dim),
                                  dtype=np.float32)
        pooled = rng.standard_normal((1, cfg.pooled_embed_dim),
                                     dtype=np.float32)
        tids = np.array([[128, 128, 0, 0, 128, 128]], np.float32)
        with torch.no_grad():
            ref = twin(torch.from_numpy(sample), torch.from_numpy(t),
                       torch.from_numpy(ehs), torch.from_numpy(pooled),
                       torch.from_numpy(tids)).numpy()
        got = np.asarray(model.unet_apply(
            model.params["unet"], jnp.asarray(sample), jnp.asarray(t),
            jnp.asarray(ehs), jnp.asarray(pooled), jnp.asarray(tids)))
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)


# --------------------------------------------------------------------------
# Variant topologies: refiner-like (4-stage, 5 conditioning ids) and
# inpainting-like (9-channel input) — the ``model_type`` surface the
# reference declares (``src/models/base.py:17-30``) but never wires.
# --------------------------------------------------------------------------

def _tiny_refiner_cfg():
    """4 stages, cross-attention only in the middle two + mid block, 5 time
    ids — the SDXL-refiner shape grammar at test size."""
    return UNetConfig(
        block_out_channels=(16, 32, 64, 64), layers_per_block=1,
        transformer_layers_per_block=(0, 1, 1, 0),
        mid_block_transformer_layers=1,
        attention_head_dim=8, cross_attention_dim=32,
        addition_time_embed_dim=4,
        projection_class_embeddings_input_dim=24 + 5 * 4, num_time_ids=5,
        norm_num_groups=8, remat=False, attn_impl="xla")


class TestVariantTopologyParity:
    @pytest.mark.parametrize("which", ["refiner", "inpainting"])
    def test_twin_activation_parity(self, which):
        if which == "refiner":
            cfg = _tiny_refiner_cfg()
        else:
            cfg = UNetConfig.tiny(in_channels=9)
        torch.manual_seed(0)
        twin = TorchTwinUNet(cfg).eval()
        fl = SDXLUNet(config=cfg, dtype=jnp.float32, param_dtype=jnp.float32)
        tmpl = fl.init(
            jax.random.key(0),
            jnp.zeros((1, cfg.in_channels, 16, 16)), jnp.zeros((1,)),
            jnp.zeros((1, 77, cfg.cross_attention_dim)),
            jnp.zeros((1, cfg.pooled_embed_dim)),
            jnp.zeros((1, cfg.num_time_ids)))
        state = _np_state(twin)
        missing, unused = W.check_bijective(tmpl, state)
        assert missing == [] and unused == []
        params = W.hf_to_flax_params(tmpl, state, strict=True)
        rng = np.random.default_rng(1)
        b = 2
        s = rng.standard_normal((b, cfg.in_channels, 16, 16)).astype(np.float32)
        t = np.array([3.0, 700.0], np.float32)
        e = rng.standard_normal((b, 77, cfg.cross_attention_dim)).astype(np.float32)
        p = rng.standard_normal((b, cfg.pooled_embed_dim)).astype(np.float32)
        ti = (np.array([[512, 512, 0, 0, 6.0]] * b, np.float32)
              if cfg.num_time_ids == 5
              else np.array([[512, 512, 0, 0, 512, 512]] * b, np.float32))
        with torch.no_grad():
            ref = twin(*map(torch.from_numpy, (s, t, e, p, ti))).numpy()
        out = np.asarray(fl.apply(params, s, t, e, p, ti))
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)

    def test_refiner_mid_depth_decoupled(self):
        cfg = _tiny_refiner_cfg()
        assert cfg.mid_depth == 1
        assert cfg.pooled_embed_dim == 24
        # default coupling preserved for SDXL-base
        base = UNetConfig.sdxl()
        assert base.mid_depth == base.transformer_layers_per_block[-1]
        assert base.pooled_embed_dim == 1280
