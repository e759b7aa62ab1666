"""Weight conversion + checkpoint/resume tests."""
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdxl_training_improvements_tpu.config import Config
from sdxl_training_improvements_tpu.models import weights as W
from sdxl_training_improvements_tpu.models.sdxl import SDXLModel
from sdxl_training_improvements_tpu.models.unet import SDXLUNet, UNetConfig
from sdxl_training_improvements_tpu.training import checkpoints as C
from sdxl_training_improvements_tpu.training.optimizers import make_optimizer
from sdxl_training_improvements_tpu.training.trainer import create_train_state


@pytest.fixture(scope="module")
def tiny_model():
    return SDXLModel.create(tiny=True, dtype=jnp.float32,
                            init_rng=jax.random.key(0),
                            init_components=("unet", "vae", "clip_l", "clip_g"))


class TestNameMapping:
    def test_unet_key_names_match_diffusers(self, tiny_model):
        state = W.flax_to_hf_state(tiny_model.params["unet"])
        keys = set(state)
        # pin the diffusers naming convention on real structural keys
        for expect in [
            "conv_in.weight", "conv_in.bias",
            "time_embedding.linear_1.weight", "add_embedding.linear_2.bias",
            "down_blocks.0.resnets.0.conv1.weight",
            "down_blocks.0.resnets.0.norm1.weight",
            "down_blocks.0.resnets.0.time_emb_proj.weight",
            "down_blocks.1.attentions.0.proj_in.weight",
            "down_blocks.1.attentions.0.transformer_blocks.0.attn1.to_q.weight",
            "down_blocks.1.attentions.0.transformer_blocks.0.attn2.to_out.0.bias",
            "down_blocks.1.attentions.0.transformer_blocks.0.ff.net.0.proj.weight",
            "down_blocks.1.attentions.0.transformer_blocks.0.ff.net.2.weight",
            "down_blocks.0.downsamplers.0.conv.weight",
            "mid_block.resnets.0.conv1.weight",
            "mid_block.attentions.0.transformer_blocks.0.norm3.weight",
            "up_blocks.0.resnets.1.conv_shortcut.weight",
            "up_blocks.0.upsamplers.0.conv.weight",
            "conv_norm_out.weight", "conv_out.bias",
        ]:
            assert expect in keys, f"missing {expect}"
        # no flax-style names may leak
        assert not any("kernel" in k or "_0." in k for k in keys)

    def test_conv_layout_torch_OIHW(self, tiny_model):
        state = W.flax_to_hf_state(tiny_model.params["unet"])
        w = state["conv_in.weight"]
        # tiny: out=32, in=4, 3x3 -> OIHW
        assert w.shape == (32, 4, 3, 3)

    def test_linear_layout(self, tiny_model):
        state = W.flax_to_hf_state(tiny_model.params["unet"])
        w = state["time_embedding.linear_1.weight"]  # [out, in] = [128, 32]
        assert w.shape == (128, 32)

    def test_clip_key_names(self, tiny_model):
        state = W._clip_flax_to_hf(tiny_model.params["clip_g"], True)
        keys = set(state)
        for expect in [
            "text_model.embeddings.token_embedding.weight",
            "text_model.embeddings.position_embedding.weight",
            "text_model.encoder.layers.0.self_attn.q_proj.weight",
            "text_model.encoder.layers.0.self_attn.out_proj.bias",
            "text_model.encoder.layers.0.layer_norm1.weight",
            "text_model.encoder.layers.0.mlp.fc1.weight",
            "text_model.encoder.layers.2.mlp.fc2.bias",
            "text_model.final_layer_norm.weight",
            "text_projection.weight",
        ]:
            assert expect in keys, f"missing {expect}"

    def test_vae_key_names(self, tiny_model):
        state = W.flax_to_hf_state(tiny_model.params["vae"])
        keys = set(state)
        for expect in [
            "encoder.conv_in.weight",
            "encoder.down_blocks.0.resnets.0.norm1.weight",
            "encoder.down_blocks.0.downsamplers.0.conv.weight",
            "encoder.mid_block.attentions.0.to_q.weight",
            "encoder.mid_block.attentions.0.group_norm.weight",
            "encoder.conv_norm_out.weight",
            "decoder.up_blocks.0.resnets.0.conv1.weight",
            "quant_conv.weight", "post_quant_conv.bias",
        ]:
            assert expect in keys, f"missing {expect}"

    def test_full_sdxl_param_count(self):
        """Full-config UNet must expose the SDXL parameter budget (~2.57B)."""
        cfg = UNetConfig.sdxl()
        model = SDXLUNet(config=cfg)
        tmpl = jax.eval_shape(
            lambda: model.init(jax.random.key(0), jnp.zeros((1, 4, 16, 16)),
                               jnp.zeros((1,)), jnp.zeros((1, 77, 2048)),
                               jnp.zeros((1, 1280)), jnp.zeros((1, 6))))
        n = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(tmpl))
        assert 2.4e9 < n < 2.8e9, f"unexpected param count {n}"


class TestRoundtrip:
    def test_unet_safetensors_roundtrip(self, tiny_model, tmp_path):
        params = tiny_model.params["unet"]
        W.save_unet(params, tmp_path / "unet" / "diffusion_pytorch_model.safetensors")
        tmpl = jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
                            params)
        loaded = W.load_unet_params(tmpl, tmp_path / "unet")
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_clip_roundtrip(self, tiny_model, tmp_path):
        params = tiny_model.params["clip_g"]
        W.save_clip(params, tmp_path / "te2" / "model.safetensors",
                    with_projection=True)
        tmpl = jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
                            params)
        loaded = W.load_clip_params(tmpl, tmp_path / "te2")
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_missing_key_strict(self, tiny_model, tmp_path):
        params = tiny_model.params["unet"]
        state = W.flax_to_hf_state(params)
        state.pop("conv_in.weight")
        tmpl = jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
                            params)
        with pytest.raises(KeyError, match="missing"):
            W.hf_to_flax_params(tmpl, state)

    def test_shape_mismatch_raises(self, tiny_model):
        params = tiny_model.params["unet"]
        state = W.flax_to_hf_state(params)
        state["conv_in.weight"] = np.zeros((1, 1, 3, 3), np.float32)
        tmpl = jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
                            params)
        with pytest.raises(ValueError, match="shape mismatch"):
            W.hf_to_flax_params(tmpl, state)

    def test_export_import_diffusers_dir(self, tiny_model, tmp_path):
        C.export_diffusers(tmp_path / "ckpt", tiny_model.params,
                           config=Config(),
                           scheduler_config={"prediction_type": "v_prediction"})
        assert (tmp_path / "ckpt" / "unet" /
                "diffusion_pytorch_model.safetensors").exists()
        assert (tmp_path / "ckpt" / "text_encoder_2" / "model.safetensors").exists()
        assert json.loads((tmp_path / "ckpt" / "config.json").read_text())
        model2 = SDXLModel.create(tiny=True, dtype=jnp.float32)
        loaded = C.import_diffusers(model2, tmp_path / "ckpt")
        assert set(loaded) == {"unet", "vae", "clip_l", "clip_g"}
        a = jax.tree.leaves(tiny_model.params["unet"])[0]
        b = jax.tree.leaves(loaded["unet"])[0]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestOrbaxResume:
    def test_state_save_restore(self, tiny_model, tmp_path):
        cfg = Config()
        cfg.optimizer.optimizer_type = "adamw"
        opt = make_optimizer(cfg)
        state = create_train_state(tiny_model.params["unet"], opt, seed=7)
        state = state._replace(step=jnp.asarray(42, jnp.int32))
        C.save_train_state(tmp_path / "checkpoint-0042", state, config=cfg)

        fresh = create_train_state(
            jax.tree.map(jnp.zeros_like, tiny_model.params["unet"]), opt)
        restored = C.restore_train_state(tmp_path / "checkpoint-0042", fresh)
        assert int(restored.step) == 42
        a = jax.tree.leaves(state.params)[0]
        b = jax.tree.leaves(restored.params)[0]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_latest_checkpoint(self, tiny_model, tmp_path):
        cfg = Config()
        cfg.optimizer.optimizer_type = "adamw"
        opt = make_optimizer(cfg)
        state = create_train_state(tiny_model.params["unet"], opt)
        assert C.latest_checkpoint(tmp_path) is None
        C.save_train_state(tmp_path / "checkpoint-0001", state)
        C.save_train_state(tmp_path / "checkpoint-0002", state)
        assert C.latest_checkpoint(tmp_path).name == "checkpoint-0002"


class TestAsyncCheckpointing:
    """tpu.async_checkpointing: non-blocking saves (checkpoints.py).

    Orbax's contract: ``save`` with a pending commit returns only after the
    device->host snapshot, so the caller may mutate/donate the live state
    immediately; the ``state/`` dir appears atomically on commit."""

    def test_async_state_save_then_restore(self, tiny_model, tmp_path):
        cfg = Config()
        cfg.optimizer.optimizer_type = "adamw"
        opt = make_optimizer(cfg)
        state = create_train_state(tiny_model.params["unet"], opt, seed=3)
        state = state._replace(step=jnp.asarray(7, jnp.int32))
        snapshot = jax.tree.map(lambda x: np.asarray(x).copy(), state.params)
        C.save_train_state(tmp_path / "ckpt-a", state, config=cfg,
                           blocking=False)
        # "training continues": rebind params to different values while the
        # commit may still be in flight — must not affect the saved bytes
        state = state._replace(
            params=jax.tree.map(lambda x: x + 1.0, state.params))
        C.wait_for_saves()
        fresh = create_train_state(
            jax.tree.map(jnp.zeros_like, tiny_model.params["unet"]), opt)
        restored = C.restore_train_state(tmp_path / "ckpt-a", fresh)
        assert int(restored.step) == 7
        for a, b in zip(jax.tree.leaves(snapshot),
                        jax.tree.leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_back_to_back_async_saves_serialize(self, tiny_model, tmp_path):
        cfg = Config()
        cfg.optimizer.optimizer_type = "adamw"
        opt = make_optimizer(cfg)
        state = create_train_state(tiny_model.params["unet"], opt)
        # second save must wait for the first commit internally, not raise
        C.save_train_state(tmp_path / "checkpoint-0001", state,
                           blocking=False)
        C.save_train_state(tmp_path / "checkpoint-0002", state,
                           blocking=False)
        C.wait_for_saves()
        assert (tmp_path / "checkpoint-0001" / "state").exists()
        assert C.latest_checkpoint(tmp_path).name == "checkpoint-0002"

    def test_background_diffusers_export(self, tiny_model, tmp_path):
        C.export_diffusers(tmp_path / "ckpt", tiny_model.params,
                           config=Config(), blocking=False)
        C.wait_for_saves()
        assert (tmp_path / "ckpt" / "unet" /
                "diffusion_pytorch_model.safetensors").exists()
        model2 = SDXLModel.create(tiny=True, dtype=jnp.float32)
        loaded = C.import_diffusers(model2, tmp_path / "ckpt")
        a = jax.tree.leaves(tiny_model.params["unet"])[0]
        b = jax.tree.leaves(loaded["unet"])[0]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_background_export_failure_surfaces_at_wait(self, tiny_model,
                                                        tmp_path):
        target = tmp_path / "blocked"
        target.write_text("a file where the checkpoint dir must go")
        C.export_diffusers(target, {"unet": tiny_model.params["unet"]},
                           blocking=False)
        with pytest.raises(Exception):
            C.wait_for_saves()
        C.wait_for_saves()  # queue drained; next wait is clean


class TestAdversarialLoading:
    """Round-3 verdict #10: checkpoint-declared topology loading must fail
    LOUDLY, naming the offending file/key — never fall back to defaults on
    a present-but-corrupt declaration."""

    def _export(self, tiny_model, tmp_path):
        ckpt = tmp_path / "ckpt"
        C.export_diffusers(ckpt, tiny_model.params, Config(),
                           unet_config=tiny_model.unet_config)
        return ckpt

    def test_corrupt_config_json_raises(self, tiny_model, tmp_path):
        from sdxl_training_improvements_tpu.pipelines import SDXLPipeline
        ckpt = self._export(tiny_model, tmp_path)
        (ckpt / "config.json").write_text("{not json")
        with pytest.raises(ValueError, match="config.json.*not valid JSON"):
            SDXLPipeline.declared_method(ckpt)
        with pytest.raises(ValueError, match="not valid JSON"):
            SDXLPipeline.from_pretrained(ckpt, tiny=True)

    def test_config_json_wrong_type_raises(self, tiny_model, tmp_path):
        from sdxl_training_improvements_tpu.pipelines import SDXLPipeline
        ckpt = self._export(tiny_model, tmp_path)
        (ckpt / "config.json").write_text(json.dumps([1, 2]))
        with pytest.raises(ValueError, match="JSON object"):
            SDXLPipeline.declared_method(ckpt)
        (ckpt / "config.json").write_text(json.dumps({"training": "ddpm"}))
        with pytest.raises(ValueError, match="'training' must be a mapping"):
            SDXLPipeline.declared_method(ckpt)

    def test_corrupt_schedule_field_names_key(self, tiny_model, tmp_path):
        from sdxl_training_improvements_tpu.pipelines import SDXLPipeline
        ckpt = self._export(tiny_model, tmp_path)
        raw = json.loads((ckpt / "config.json").read_text())
        raw["model"]["sigma_max"] = "twenty-thousand"
        (ckpt / "config.json").write_text(json.dumps(raw))
        with pytest.raises(ValueError, match="model.sigma_max"):
            SDXLPipeline.declared_schedule(ckpt)

    def test_corrupt_unet_config_json_raises(self, tiny_model, tmp_path):
        from sdxl_training_improvements_tpu.pipelines import SDXLPipeline
        ckpt = self._export(tiny_model, tmp_path)
        (ckpt / "unet" / "config.json").write_text("]]")
        with pytest.raises(ValueError, match="unet.*config.json"):
            SDXLPipeline.declared_unet_config(ckpt)

    def test_absent_config_json_is_fine(self, tiny_model, tmp_path):
        """A plain diffusers export (no framework config.json) keeps
        loading with defaults — absence is not corruption."""
        from sdxl_training_improvements_tpu.pipelines import SDXLPipeline
        ckpt = self._export(tiny_model, tmp_path)
        (ckpt / "config.json").unlink()
        assert SDXLPipeline.declared_method(ckpt) is None
        assert SDXLPipeline.declared_schedule(ckpt) is None

    def test_method_mismatch_refused(self, tiny_model, tmp_path):
        from sdxl_training_improvements_tpu.pipelines import SDXLPipeline
        ckpt = self._export(tiny_model, tmp_path)
        raw = json.loads((ckpt / "config.json").read_text())
        raw.setdefault("training", {})["method"] = "flow_matching"
        (ckpt / "config.json").write_text(json.dumps(raw))
        with pytest.raises(ValueError, match="refusing to sample"):
            SDXLPipeline.from_pretrained(ckpt, tiny=True, method="ddpm")

    def test_lora_orphan_half_raises(self, tiny_model, tmp_path):
        """A LoRA file carrying only lora_A (no lora_B) for a module must
        fail at import with the module named."""
        from safetensors.numpy import save_file
        from sdxl_training_improvements_tpu.models.lora import lora_init
        tree = lora_init(tiny_model.params["unet"], jax.random.key(0),
                         rank=2, targets=[r"attn\d/to_q"])
        path = tmp_path / "adapter"
        C.export_lora(path, tree, rank=2, alpha=1.0)
        f = path / "pytorch_lora_weights.safetensors"
        state = __import__("safetensors.numpy", fromlist=["load_file"]
                           ).load_file(str(f))
        orphaned = {k: v for k, v in state.items()
                    if not k.endswith(".lora_B.weight")}
        assert len(orphaned) < len(state)
        save_file(orphaned, str(f))
        with pytest.raises(ValueError, match="missing lora_A or lora_B"):
            C.import_lora(f, tiny_model.params["unet"])

    def test_lora_unknown_module_raises(self, tiny_model, tmp_path):
        from safetensors.numpy import save_file
        f = tmp_path / "bogus.safetensors"
        save_file({"unet.nonexistent.module.lora_A.weight":
                   np.zeros((2, 4), np.float32),
                   "unet.nonexistent.module.lora_B.weight":
                   np.zeros((4, 2), np.float32)}, str(f))
        with pytest.raises(KeyError, match="matches no kernel"):
            C.import_lora(f, tiny_model.params["unet"])
